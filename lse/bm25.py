"""BM25 scoring — exact transcription of scoring/BM25Scorer.java.

Floors/clamps (parity-critical):
* totalDocs floored at 1 (BM25Scorer.java:17, :35);
* avgDocLength <= 0 → 1.0 (BM25Scorer.java:18, :36);
* df clamped to [0, totalDocs] (BM25Scorer.java:23, :37);
* tf <= 0 → score 0.0 (BM25Scorer.java:32-34);
* docLength floored at 0 (BM25Scorer.java:39).

IDF is Lucene-style ``ln((N - df + 0.5)/(df + 0.5) + 1)`` — always > 0.
"""

from __future__ import annotations

import math

import numpy as np

from .constants import BM25_B, BM25_K1


def idf(df: int, total_docs: int) -> float:
    n = max(total_docs, 1)
    bounded = max(0, min(df, n))
    return math.log((n - bounded + 0.5) / (bounded + 0.5) + 1.0)


def score(
    tf: int,
    df: int,
    doc_length: int,
    total_docs: int,
    avg_doc_length: float,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> float:
    if tf <= 0:
        return 0.0
    n = max(total_docs, 1)
    safe_avgdl = avg_doc_length if avg_doc_length > 0 else 1.0
    bounded_df = max(0, min(df, n))
    idf_v = math.log((n - bounded_df + 0.5) / (bounded_df + 0.5) + 1.0)
    norm = 1.0 - b + b * (max(doc_length, 0) / safe_avgdl)
    return idf_v * (tf * (k1 + 1.0)) / (tf + k1 * norm)


def score_vec(
    tf: np.ndarray,
    df,
    dl: np.ndarray,
    total_docs: int,
    avg_doc_length: float,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> np.ndarray:
    """Vectorized BM25; ``df`` may be scalar (per-term call) or array."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.maximum(np.asarray(dl, dtype=np.float64), 0.0)
    n = max(int(total_docs), 1)
    safe_avgdl = avg_doc_length if avg_doc_length > 0 else 1.0
    bounded_df = np.clip(np.asarray(df, dtype=np.float64), 0, n)
    idf_v = np.log((n - bounded_df + 0.5) / (bounded_df + 0.5) + 1.0)
    norm = 1.0 - b + b * (dl / safe_avgdl)
    return np.where(tf > 0, idf_v * (tf * (k1 + 1.0)) / (tf + k1 * norm), 0.0)
