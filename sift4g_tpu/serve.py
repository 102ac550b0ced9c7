"""Daemon mode: keep compiled kernels warm across CLI invocations.

The deployment's remote compile service takes minutes per distinct kernel
shape and the JAX persistent compilation cache is never written through it
(measured, docs/PLATFORM.md) — so every fresh process pays the full
compile tax again.  The reference has no analogous problem (its CUDA
kernels compile at build time), but its users would run sift4g repeatedly
over query sets; here every such invocation would recompile.

``sift4g-tpu --serve SOCKET`` starts a single long-lived process that owns
the TPU (only one TPU process may exist at a time on this deployment —
docs/PLATFORM.md) and executes pipeline jobs submitted over a UNIX domain
socket.  ``sift4g-tpu --connect SOCKET <normal flags>`` ships the
invocation to the daemon; compiled executables persist in the daemon's
jit caches, so the second and later jobs skip every compile whose shape
was already seen (the geometric padded-length ladder in align/batch.py
keeps the shape universe small precisely so this converges).

Protocol: one JSON line per request — {"argv": [...]} — answered by one
JSON line {"status": int, "job": int, "elapsed_s": float}.  Jobs run
serially (the TPU is a serial resource here); output files are written by
the daemon process to the job's --out directory as usual, and the job's
stderr log is relayed to the client verbatim.
"""

from __future__ import annotations

import io
import json
import os
import socket
import sys
import time


def _strip_flag(argv, flag, has_value=True):
    out, i = [], 0
    while i < len(argv):
        a = argv[i]
        if a == flag:
            i += 2 if has_value else 1
            continue
        if has_value and a.startswith(flag + "="):
            i += 1
            continue
        out.append(a)
        i += 1
    return out


def serve_forever(socket_path: str, platform: str = "auto") -> int:
    """Run the job loop until SIGTERM/SIGINT.  Returns exit status."""
    from . import cli

    if platform != "auto":
        import jax

        jax.config.update("jax_platforms", platform)

    if os.path.exists(socket_path):
        os.unlink(socket_path)
    srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    srv.bind(socket_path)
    srv.listen(8)
    print(f"** sift4g-tpu daemon listening on {socket_path} **",
          file=sys.stderr)

    jobs = 0
    try:
        while True:
            conn, _ = srv.accept()
            with conn:
                f = conn.makefile("rwb")
                line = f.readline()
                if not line:
                    continue
                try:
                    req = json.loads(line)
                except ValueError:
                    f.write(b'{"status": -1, "error": "bad request"}\n')
                    f.flush()
                    continue
                argv = req.get("argv", [])
                if req.get("shutdown"):
                    f.write(json.dumps({"status": 0, "job": jobs}).encode()
                            + b"\n")
                    f.flush()
                    return 0
                # the daemon owns platform selection and must not recurse
                for flag in ("--platform", "--serve", "--connect"):
                    argv = _strip_flag(argv, flag)
                jobs += 1
                t0 = time.perf_counter()
                log = io.StringIO()
                old_stderr, sys.stderr = sys.stderr, log
                try:
                    status = cli.main(argv)
                except SystemExit as exc:
                    status = int(exc.code or 0)
                except Exception as exc:  # job errors must not kill the daemon
                    print(f"error: {exc}", file=log)
                    status = -1
                finally:
                    sys.stderr = old_stderr
                reply = {
                    "status": status,
                    "job": jobs,
                    "elapsed_s": round(time.perf_counter() - t0, 3),
                    "log": log.getvalue(),
                }
                f.write(json.dumps(reply).encode() + b"\n")
                f.flush()
    except KeyboardInterrupt:
        return 0
    finally:
        srv.close()
        if os.path.exists(socket_path):
            os.unlink(socket_path)


def submit(socket_path: str, argv, shutdown: bool = False) -> int:
    """Ship one invocation to the daemon; relay its log; return status."""
    c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    try:
        c.connect(socket_path)
    except OSError as exc:
        print(f"error: cannot reach daemon at '{socket_path}': {exc}",
              file=sys.stderr)
        return -1
    with c:
        f = c.makefile("rwb")
        req = {"argv": list(argv)}
        if shutdown:
            req["shutdown"] = True
        f.write(json.dumps(req).encode() + b"\n")
        f.flush()
        line = f.readline()
    if not line:
        print("error: daemon closed the connection", file=sys.stderr)
        return -1
    reply = json.loads(line)
    if reply.get("log"):
        sys.stderr.write(reply["log"])
    if not shutdown:
        print(
            f"** job {reply.get('job')} done in {reply.get('elapsed_s')}s "
            f"(status {reply.get('status')}) **",
            file=sys.stderr,
        )
    return int(reply.get("status", -1))
