"""Tests run hermetically on CPU with a virtual 8-device mesh available.

The container's sitecustomize imports jax and registers the TPU backend at
interpreter startup, so env vars alone cannot retarget the platform —
``jax.config.update`` can, as long as no backend has been instantiated yet
(conftest runs before any test module imports trigger device use).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# never drop .s4gc parse caches next to inputs during tests (the e2e
# goldens read from the read-only reference tree); individual tests of the
# DEFAULT next-to-input layout delete this var via monkeypatch
if "SIFT4G_TPU_CACHE_DIR" not in os.environ:
    import tempfile

    os.environ["SIFT4G_TPU_CACHE_DIR"] = tempfile.mkdtemp(
        prefix="sift4g-tpu-test-cache-"
    )

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

jax.config.update("jax_platforms", "cpu")

REFERENCE_TEST_FILES = "/root/reference/test_files"
