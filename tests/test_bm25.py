"""BM25 tests — property assertions mirroring BM25ScorerTest.java:13-111 plus
exact-value checks against a literal transcription of the reference formula."""

import math

import numpy as np
import pytest

from lse import bm25


def java_score(tf, df, dl, N, avgdl, k1=1.2, b=0.75):
    """Literal transcription of BM25Scorer.java:31-42 for cross-checking."""
    if tf <= 0:
        return 0.0
    N = max(N, 1)
    avgdl = avgdl if avgdl > 0 else 1.0
    df = max(0, min(df, N))
    idf = math.log((N - df + 0.5) / (df + 0.5) + 1)
    norm = 1 - b + b * (max(dl, 0) / avgdl)
    return idf * (tf * (k1 + 1)) / (tf + k1 * norm)


def test_exact_values():
    cases = [
        (1, 1, 10, 100, 50.0),
        (3, 10, 120, 1000, 87.3),
        (5, 999, 1, 1000, 87.3),
        (2, 0, 0, 1, 0.0),
        (7, 5000, 40, 1000, 87.3),  # df clamped to N
    ]
    for tf, df, dl, N, avgdl in cases:
        assert bm25.score(tf, df, dl, N, avgdl) == java_score(tf, df, dl, N, avgdl)


def test_idf_decreases_with_df():
    assert bm25.idf(1, 1000) > bm25.idf(10, 1000) > bm25.idf(500, 1000)


def test_idf_always_positive_even_df_equals_n():
    assert bm25.idf(1000, 1000) > 0


def test_score_increases_with_tf():
    s = [bm25.score(tf, 10, 100, 1000, 100.0) for tf in (1, 2, 5, 20)]
    assert s == sorted(s)


def test_shorter_docs_score_higher():
    assert bm25.score(3, 10, 50, 1000, 100.0) > bm25.score(3, 10, 200, 1000, 100.0)


def test_zero_tf_zero_score():
    assert bm25.score(0, 10, 100, 1000, 100.0) == 0.0
    assert bm25.score(-1, 10, 100, 1000, 100.0) == 0.0


def test_floors():
    # N floored at 1, avgdl<=0 → 1.0
    assert bm25.score(1, 1, 5, 0, 0.0) == java_score(1, 1, 5, 0, 0.0)


def test_custom_k1_b_changes_score():
    base = bm25.score(3, 10, 100, 1000, 100.0)
    assert bm25.score(3, 10, 100, 1000, 100.0, k1=2.0, b=0.1) != base


def test_vectorized_matches_scalar():
    rng = np.random.default_rng(0)
    tf = rng.integers(0, 30, 500)
    df = rng.integers(0, 1200, 500)
    dl = rng.integers(0, 500, 500)
    got = bm25.score_vec(tf, df, dl, 1000, 87.3)
    want = np.array([java_score(int(a), int(b_), int(c), 1000, 87.3) for a, b_, c in zip(tf, df, dl)])
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


def test_vectorized_scalar_df():
    tf = np.array([1, 2, 3])
    dl = np.array([10, 20, 30])
    got = bm25.score_vec(tf, 5, dl, 100, 20.0)
    want = [java_score(t, 5, d, 100, 20.0) for t, d in zip(tf, dl)]
    np.testing.assert_allclose(got, want, atol=1e-12)
