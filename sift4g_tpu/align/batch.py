"""Host-facing batched scoring with shape bucketing.

Pads one query's candidate targets into (B, N_bucket) code arrays, runs the
device scan (align/xla.py) — or the NumPy oracle for backend="numpy" — and
returns exact integer scores.  Shape bucketing (query length and target
length rounded up to multiples, fixed batch) bounds the number of XLA
compilations; padded work is masked out inside the kernel.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from ..core.scorers import Scorer
from .dp_numpy import score_pair

PAD_CODE = 31


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class BatchAligner:
    """Scores one query against many targets; backend 'xla' | 'numpy' | 'pallas'."""

    def __init__(
        self,
        scorer: Scorer,
        mode: str = "SW",
        backend: str = "xla",
        batch: int = 256,
        q_bucket: int = 64,
        t_bucket: int = 128,
    ):
        self.scorer = scorer
        self.mode = mode
        self.backend = backend
        self.batch = batch
        self.q_bucket = q_bucket
        self.t_bucket = t_bucket
        self._matrix32 = None

    def _matrix32_dev(self):
        if self._matrix32 is None:
            from .xla import _extend_matrix
            import jax.numpy as jnp

            self._matrix32 = jnp.asarray(_extend_matrix(self.scorer.matrix))
        return self._matrix32

    def scores(self, query_codes: np.ndarray, targets: Sequence[np.ndarray]) -> np.ndarray:
        if len(targets) == 0:
            return np.zeros(0, dtype=np.int64)
        if self.backend == "numpy":
            return np.array(
                [score_pair(query_codes, t, self.scorer, self.mode) for t in targets],
                dtype=np.int64,
            )
        return self._scores_device(query_codes, targets)

    def _scores_device(self, query_codes: np.ndarray, targets: Sequence[np.ndarray]) -> np.ndarray:
        import jax.numpy as jnp

        from .xla import align_scores_kernel

        m = query_codes.shape[0]
        m_pad = _round_up(max(m, 1), self.q_bucket)
        q = np.full(m_pad, PAD_CODE, dtype=np.int32)
        q[:m] = query_codes

        out = np.zeros(len(targets), dtype=np.int64)
        # group targets into length buckets to bound padding waste
        order = np.argsort([t.shape[0] for t in targets], kind="stable")
        matrix32 = self._matrix32_dev()
        q_dev = jnp.asarray(q)

        pos = 0
        while pos < len(order):
            chunk_idx = order[pos : pos + self.batch]
            chunk = [targets[i] for i in chunk_idx]
            n_max = max(t.shape[0] for t in chunk)
            n_pad = _round_up(max(n_max, 1), self.t_bucket)
            tc = np.full((self.batch, n_pad), PAD_CODE, dtype=np.int32)
            tl = np.zeros(self.batch, dtype=np.int32)
            for r, t in enumerate(chunk):
                tc[r, : t.shape[0]] = t
                tl[r] = t.shape[0]
            scores = align_scores_kernel(
                q_dev,
                jnp.int32(m),
                jnp.asarray(tc),
                jnp.asarray(tl),
                matrix32,
                mode=self.mode,
                gap_open=self.scorer.gap_open,
                gap_extend=self.scorer.gap_extend,
            )
            scores = np.asarray(scores)
            out[chunk_idx] = scores[: len(chunk)]
            pos += self.batch
        return out
