"""BM25 scoring math — one numpy implementation shared by the build
(block-max computation), the query kernels, and nothing else, so the
engine can never disagree with itself.

Variant (pinned in FIXTURES.md §2 / tests/oracle.py):
  idf(t)    = ln(1 + (N - df + 0.5) / (df + 0.5))
  score(t,d)= idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
  k1=1.2, b=0.75, OR semantics, ties by ascending doc_id.
"""

from __future__ import annotations

import numpy as np


def idf(N: int, df: np.ndarray | int) -> np.ndarray | float:
    return np.log(1.0 + (N - np.asarray(df, dtype=np.float64) + 0.5) / (np.asarray(df, dtype=np.float64) + 0.5))


def term_scores(
    tfs: np.ndarray,
    dls: np.ndarray,
    term_idf: float,
    avgdl: float,
    k1: float = 1.2,
    b: float = 0.75,
) -> np.ndarray:
    """Per-entry BM25 contribution of one term, float64."""
    tf = tfs.astype(np.float64)
    dl = dls.astype(np.float64)
    return term_idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def upper_f32(scores: np.ndarray) -> np.ndarray:
    """Round float64 scores UP to float32 so stored block maxima stay
    valid upper bounds (a down-rounded bound would break exact WAND)."""
    f32 = scores.astype(np.float32)
    low = f32.astype(np.float64) < scores
    if low.any():
        f32[low] = np.nextafter(f32[low], np.float32(np.inf))
    return f32
