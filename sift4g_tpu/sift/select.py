"""Alignment-string extraction and median-entropy selection.

Mirrors select_alignments.cpp:

* :func:`extract_alignment_strings` — alignmentsExtract (:127-181) + the
  MOVE replay of aligmentStr (:244-300): each alignment becomes a
  query-length row of letter codes where positions outside the aligned
  region and target-gap (MOVE_UP) positions are 'X', and target insertions
  (MOVE_LEFT) are dropped (quirk Q6).
* :func:`alignments_select` — alignmentsSelect (:183-242): grow the prefix
  of best-first alignments until the median over positions of per-position
  column entropy (+ log2 20) drops to <= threshold.  Float32 accumulation
  (quirk Q9) and the get_median len-1 sort quirk (Q1) are reproduced.
  Returns the number of selected rows (>= 1 when any rows exist unless the
  loop exhausts, quirk Q8).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from ..align.records import MOVE_DIAG, MOVE_LEFT, MOVE_UP, AlignmentRecord
from ..constants import LOG_2_20, get_median
from ..core.chain import Chain

X_CODE = ord("X") - ord("A")  # 23


def extract_alignment_strings(
    query: Chain, records: List[AlignmentRecord]
) -> Tuple[List[str], np.ndarray]:
    """Returns (target names, rows (n, L) uint8 letter codes)."""
    L = len(query)
    rows = np.full((len(records), L), X_CODE, dtype=np.uint8)
    names = []
    for r, rec in enumerate(records):
        names.append(rec.target_name)
        moves = rec.moves
        if moves.shape[0] == 0:
            continue
        # vectorized MOVE replay: MOVE_LEFT (target insertion) advances only
        # the target cursor and emits nothing; MOVE_UP leaves 'X' (the row
        # default); MOVE_DIAG copies the target letter at its cursor
        adv_q = moves != MOVE_LEFT
        adv_t = moves != MOVE_UP
        qpos = rec.query_start + np.cumsum(adv_q) - adv_q
        tpos = rec.target_start + np.cumsum(adv_t) - adv_t
        diag = moves == MOVE_DIAG
        rows[r, qpos[diag]] = rec.target_codes[tpos[diag]]
    return names, rows


def alignments_select(rows: np.ndarray, threshold: float) -> int:
    """Number of leading rows selected (alignmentsSelect, :183-242)."""
    n, L = rows.shape
    if n == 0:
        return 0
    threshold = np.float32(threshold)
    median = np.float32(LOG_2_20)
    # cumulative per-position letter counts over the prefix
    counts = np.zeros((L, 26), dtype=np.int64)
    pos_idx = np.arange(L)
    i = 1
    while median > threshold and i <= n:
        row = rows[i - 1]
        not_x = row != X_CODE
        counts[pos_idx[not_x], row[not_x]] += 1
        valid = counts.sum(axis=1)  # rows counted at each position
        with np.errstate(divide="ignore", invalid="ignore"):
            t = counts.astype(np.float32) / valid.astype(np.float32)[:, None]
        # sequential f32 accumulation in amino-acid order, as the reference
        pos_freq = np.zeros(L, dtype=np.float32)
        with np.errstate(divide="ignore", invalid="ignore"):
            for aa in range(26):
                col = counts[:, aa]
                term = np.where(col > 0, t[:, aa] * np.log2(t[:, aa]), np.float32(0.0))
                pos_freq = (pos_freq + term.astype(np.float32)).astype(np.float32)
        # the reference adds the double constant kLog_2_20 to a float lvalue:
        # compute in f64, truncate to f32
        pos_freq = (pos_freq.astype(np.float64) + LOG_2_20).astype(np.float32)
        median = get_median(pos_freq, L)
        i += 1
    return i - 1
