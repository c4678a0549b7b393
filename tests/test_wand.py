"""WAND kernel unit tests (no Spark): exactness vs exhaustive scoring on
seeded-random posting sets, block skipping on adversarial layouts."""

import numpy as np
import pytest

from lse.bm25 import idf as idf_fn
from lse.codec import encode_postings
from lse.wand import TermCursor, exhaustive_scores, topk_from_scores, wand_topk


def make_term(rng, n_docs_universe, df, avgdl, tf_max=8):
    ids = np.sort(rng.choice(n_docs_universe, size=df, replace=False)).astype(np.int64)
    tfs = rng.integers(1, tf_max, size=df)
    dls = rng.integers(5, 300, size=df)
    enc = encode_postings(ids, tfs, dls, avgdl=avgdl)
    return enc, df


def cursors_and_rows(rng, specs, N, avgdl):
    cursors, rows = [], {}
    for i, df in enumerate(specs):
        enc, _ = make_term(rng, N, df, avgdl)
        idf = idf_fn(df, N)
        cursors.append(
            TermCursor(enc.payload, enc.block_last_doc, enc.block_offset,
                       enc.block_max_raw, enc.df, idf)
        )
        rows[f"t{i}"] = [(enc.payload, enc.df, df)]
    return cursors, rows


@pytest.mark.parametrize("kernel_name", ["classic", "bulk"])
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("specs", [
    [5], [50, 400], [1000, 1000, 10], [2000, 700, 300, 40, 5],
])
def test_wand_exact_vs_exhaustive(seed, specs, kernel_name):
    from lse.wand import wand_topk_bulk

    kernel = wand_topk if kernel_name == "classic" else wand_topk_bulk
    rng = np.random.default_rng(seed)
    N, avgdl, k = 5000, 120.0, 10
    cursors, rows = cursors_and_rows(rng, specs, N, avgdl)
    got = kernel(cursors, k, avgdl)
    ids, scores = exhaustive_scores(rows, N, avgdl)
    want = topk_from_scores(ids, scores, k)
    assert [d for d, _ in got] == [d for d, _ in want]
    np.testing.assert_allclose(
        [s for _, s in got], [s for _, s in want], atol=1e-12
    )


@pytest.mark.parametrize("seed", [0, 1])
def test_wand_bulk_skewed_and_ties(seed):
    from lse.wand import wand_topk_bulk

    rng = np.random.default_rng(seed)
    N, avgdl, k = 50_000, 80.0, 7
    # skewed: one huge flat list + one tiny list of dominant scorers, plus
    # uniform tf/dl ties to exercise the (score desc, doc_id asc) tie-break
    ids_a = np.arange(0, 30_000, 3, dtype=np.int64)
    enc_a = encode_postings(
        ids_a, np.ones(ids_a.size, dtype=np.int64),
        np.full(ids_a.size, 200, dtype=np.int64), avgdl=avgdl,
    )
    ids_b = np.sort(rng.choice(30_000, size=5, replace=False)).astype(np.int64)
    enc_b = encode_postings(
        ids_b, np.full(5, 9, dtype=np.int64), np.full(5, 10, dtype=np.int64),
        avgdl=avgdl,
    )
    cursors = [
        TermCursor(enc_a.payload, enc_a.block_last_doc, enc_a.block_offset,
                   enc_a.block_max_raw, enc_a.df, idf_fn(enc_a.df, N)),
        TermCursor(enc_b.payload, enc_b.block_last_doc, enc_b.block_offset,
                   enc_b.block_max_raw, enc_b.df, idf_fn(enc_b.df, N)),
    ]
    rows = {
        "a": [(enc_a.payload, enc_a.df, enc_a.df)],
        "b": [(enc_b.payload, enc_b.df, enc_b.df)],
    }
    got = wand_topk_bulk(cursors, k, avgdl)
    ids, scores = exhaustive_scores(rows, N, avgdl)
    want = topk_from_scores(ids, scores, k)
    assert got == [(int(d), pytest.approx(s, abs=1e-12)) for d, s in want]


def test_wand_k_larger_than_matches():
    rng = np.random.default_rng(9)
    cursors, rows = cursors_and_rows(rng, [7], 1000, 50.0)
    got = wand_topk(cursors, 100, 50.0)
    assert len(got) == 7


def test_wand_skips_blocks():
    """One dominant high-tf doc per block-boundary region: WAND must not
    decode every block (sanity via correctness on a skewed layout)."""
    rng = np.random.default_rng(4)
    N, avgdl, k = 100_000, 100.0, 3
    # term A: huge flat list; term B: tiny list of high scorers
    ids_a = np.arange(0, 50_000, 2, dtype=np.int64)
    tfs_a = np.ones(ids_a.size, dtype=np.int64)
    dls_a = np.full(ids_a.size, 400, dtype=np.int64)  # long docs → low score
    enc_a = encode_postings(ids_a, tfs_a, dls_a, avgdl=avgdl)
    ids_b = np.array([101, 20_001, 49_999], dtype=np.int64)
    enc_b = encode_postings(ids_b, np.array([9, 9, 9]), np.array([10, 10, 10]), avgdl=avgdl)
    rows = {
        "a": [(enc_a.payload, enc_a.df, enc_a.df)],
        "b": [(enc_b.payload, enc_b.df, enc_b.df)],
    }
    cursors = [
        TermCursor(enc_a.payload, enc_a.block_last_doc, enc_a.block_offset,
                   enc_a.block_max_raw, enc_a.df, idf_fn(enc_a.df, N)),
        TermCursor(enc_b.payload, enc_b.block_last_doc, enc_b.block_offset,
                   enc_b.block_max_raw, enc_b.df, idf_fn(enc_b.df, N)),
    ]
    got = wand_topk(cursors, k, avgdl)
    ids, scores = exhaustive_scores(rows, N, avgdl)
    want = topk_from_scores(ids, scores, k)
    assert got == [(int(d), pytest.approx(s, abs=1e-12)) for d, s in want]


def test_equal_score_tiebreak_doc_id_asc():
    # identical tf/dl everywhere → all scores equal → lowest doc_ids win
    ids = np.arange(100, 200, dtype=np.int64)
    tfs = np.full(100, 3, dtype=np.int64)
    dls = np.full(100, 50, dtype=np.int64)
    enc = encode_postings(ids, tfs, dls, avgdl=50.0)
    c = TermCursor(enc.payload, enc.block_last_doc, enc.block_offset,
                   enc.block_max_raw, enc.df, idf_fn(100, 1000))
    got = wand_topk([c], 5, 50.0)
    assert [d for d, _ in got] == [100, 101, 102, 103, 104]


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("specs", [[400, 300], [2000, 50], [900, 600, 100]])
def test_wand_and_exact_vs_exhaustive(seed, specs):
    from lse.wand import wand_topk_and

    rng = np.random.default_rng(seed)
    N, avgdl, k = 3000, 90.0, 10
    cursors, rows = cursors_and_rows(rng, specs, N, avgdl)
    got = wand_topk_and(cursors, k, avgdl)
    # exhaustive AND reference: intersect, then sum
    import numpy as _np

    per_term = []
    for term, shards in rows.items():
        ids, scores = exhaustive_scores({term: shards}, N, avgdl)
        per_term.append(dict(zip(ids.tolist(), scores.tolist())))
    common = set(per_term[0])
    for m in per_term[1:]:
        common &= set(m)
    want_ids = _np.array(sorted(common), dtype=_np.int64)
    want_scores = _np.array([sum(m[d] for m in per_term) for d in want_ids])
    want = topk_from_scores(want_ids, want_scores, k)
    assert [d for d, _ in got] == [d for d, _ in want]
    np.testing.assert_allclose([s for _, s in got], [s for _, s in want], atol=1e-12)


def test_wand_and_disjoint_terms_empty():
    from lse.codec import encode_postings
    from lse.wand import wand_topk_and
    from lse.bm25 import idf as idf_fn

    a = encode_postings(np.array([1, 3, 5]), np.array([1, 1, 1]), np.array([10, 10, 10]), 10.0)
    b = encode_postings(np.array([2, 4, 6]), np.array([1, 1, 1]), np.array([10, 10, 10]), 10.0)
    cursors = [
        TermCursor(e.payload, e.block_last_doc, e.block_offset, e.block_max_raw, e.df, idf_fn(3, 100))
        for e in (a, b)
    ]
    assert wand_topk_and(cursors, 5, 10.0) == []
