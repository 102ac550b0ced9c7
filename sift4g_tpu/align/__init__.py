from .records import AlignmentRecord, MOVE_DIAG, MOVE_LEFT, MOVE_UP  # noqa: F401
from .dp_numpy import align_pair, score_pair  # noqa: F401


def best_backend() -> str:
    """Pick the fastest available scoring backend for this process.

    'pallas' on real TPU hardware (the grouped Mosaic kernel); on CPU-only
    hosts the threaded C++ aligner ('native') when built, else the XLA scan.
    """
    try:
        import jax

        if jax.devices()[0].platform != "cpu":
            from . import pallas_sw  # noqa: F401

            return "pallas"
    except Exception:
        pass
    try:
        from ..native import load

        if load() is not None:
            return "native"
    except Exception:
        pass
    return "xla"
