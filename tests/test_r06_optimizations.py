"""Focused pins for the round-6 optimization internals:

* `_topk_order`'s int64 bit-view partition must order exactly like the
  naive (score desc, id asc) lexsort for every dtype/shape it claims —
  including heavily tied arrays, -0.0, and the integer sort-key path.
* `warm()`'s collision-free bucket partitioning: every bucket value in
  its own partition, count within [B, 4B], and the serving kernels'
  groupBy/cogroup still exchange-free (the plan side of that is pinned
  in tests/test_warm_plans.py).
* The local tier's field/range/sort caches must return the same answers
  on repeat queries (cache hit path) as on first touch.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lse.local_exec import _topk_order


def _naive(ids, scores, k):
    return np.lexsort((ids, -scores.astype(np.float64)))[:k]


@pytest.mark.parametrize("k", [1, 10, 100])
def test_topk_order_matches_lexsort_float(k):
    rng = np.random.default_rng(7)
    n = 20_000
    ids = np.sort(rng.choice(10_000_000, size=n, replace=False)).astype(np.int64)
    for scores in (
        rng.random(n),                                   # unique-ish
        rng.choice(np.round(rng.random(40) * 3, 6), n),  # heavily tied
        np.where(rng.random(n) < 0.3, 0.0, rng.random(n)),  # many zeros
        np.where(rng.random(n) < 0.1, -0.0, rng.random(n)),  # -0.0 present
    ):
        scores = scores.astype(np.float64)
        got = _topk_order(ids, scores, k)
        want = _naive(ids, scores, k)
        assert np.array_equal(got, want)


def test_topk_order_matches_lexsort_int_keys():
    rng = np.random.default_rng(8)
    n = 20_000
    ids = np.arange(n, dtype=np.int64)
    keys = rng.integers(-1_000_000, 1_000_000, size=n)
    got = _topk_order(ids, keys, 25)
    want = np.lexsort((ids, -keys))[:25]
    assert np.array_equal(got, want)


def test_topk_order_small_and_fallback_paths():
    ids = np.array([5, 1, 9], dtype=np.int64)
    scores = np.array([1.0, 1.0, 2.0])
    assert np.array_equal(_topk_order(ids, scores, 2), _naive(ids, scores, 2))
    # non-float64/non-int dtype takes the exact lexsort fallback
    f32 = scores.astype(np.float32)
    assert np.array_equal(
        _topk_order(ids, f32, 2), np.lexsort((ids, -f32))[:2]
    )


def test_warm_bucket_partitioning_collision_free(spark, fixture_index):
    from lse.engine import SearchEngine

    index_dir, _ = fixture_index
    eng = SearchEngine(spark, index_dir).warm(
        prefetch_terms=0, prefetch_positions=0
    )
    n_buckets = max(int(eng.stats.get("n_buckets", 8)), 1)
    n_parts = eng.postings.rdd.getNumPartitions()
    assert n_buckets <= n_parts <= 4 * n_buckets
    per_part = (
        eng.postings.select("bucket")
        .withColumn("pid", F.spark_partition_id())
        .distinct()
        .groupBy("pid")
        .count()
        .collect()
    )
    # every non-empty partition holds exactly ONE bucket value
    assert all(r["count"] == 1 for r in per_part)


def test_filter_and_sort_caches_stable(spark, fixture_index):
    from lse.engine import SearchEngine

    index_dir, _ = fixture_index
    eng = SearchEngine(spark, index_dir)
    for q in ("lang:java", "size:10..100000", "java sort:size"):
        first = eng.search_result(q, 10)
        second = eng.search_result(q, 10)  # cache-hit path
        assert first[0] == second[0] and first[1] == second[1]


@pytest.fixture(scope="module")
def warm_engine(spark, fixture_index):
    from lse.engine import SearchEngine

    index_dir, _ = fixture_index
    return SearchEngine(spark, index_dir).warm(
        prefetch_terms=0, prefetch_positions=0
    )


def test_term_and_term_rank_path_fires_and_is_bit_identical(warm_engine):
    """The Term-AND-Term rank-space intersection (one boolean scatter +
    gathers) must actually FIRE for high-df terms on a warmed engine and
    return the bit-exact _ScoreSet the generic intersect_sum produces."""
    import lse.local_exec as lx

    eng = warm_engine
    loc = eng.local
    # two terms with df large enough to cross the |a|*8 > N gate
    order = np.argsort(loc._dict_df)[::-1]
    t1, t2 = str(loc._dict_terms[order[0]]), str(loc._dict_terms[order[1]])
    assert int(loc._dict_df[order[1]]) * 8 > eng.N
    calls = {"fast": 0}
    orig = lx.LocalExecutor._intersect_sum_ranked

    def spy(self, node, left, right):
        r = orig(self, node, left, right)
        if r is not None:
            calls["fast"] += 1
        return r

    lx.LocalExecutor._intersect_sum_ranked = spy
    try:
        hits, total = eng.search_result(f"{t1} AND {t2}", 1000)
    finally:
        lx.LocalExecutor._intersect_sum_ranked = orig
    assert calls["fast"] == 1
    # reference: the generic binary-search intersect_sum over the same sets
    a = loc._score_term(t1)
    b = loc._score_term(t2)
    want = a.intersect_sum(b)
    got_ids = np.array([d for d, _ in hits], dtype=np.int64)
    got_scores = np.array([s for _, s in hits])
    k = min(1000, want.ids.size)
    order_w = np.lexsort((want.ids, -want.scores))[:k]
    assert total == want.ids.size
    assert np.array_equal(got_ids, want.ids[order_w])
    # bit-identical scores (same operands, commutative float64 add)
    assert np.array_equal(got_scores, want.scores[order_w])


def test_not_rank_reuse_matches_mask_path(warm_engine):
    """Negation reuses the cached term ranks; its result must equal the
    general member_mask complement exactly."""
    from lse.ids import member_mask

    eng = warm_engine
    loc = eng.local
    order = np.argsort(loc._dict_df)[::-1]
    t = str(loc._dict_terms[order[0]])
    hits, total = eng.search_result(f"-{t}", 1000)
    universe = loc.all_doc_ids()
    child = loc._score_term(t)
    want = universe[~member_mask(universe, child.ids)]
    assert total == want.size
    got = np.sort(np.array([d for d, _ in hits], dtype=np.int64))
    assert len(hits) == min(1000, want.size)
    assert np.array_equal(got, np.sort(want)[: len(hits)])
    assert all(s == 0.0 for _, s in hits)


def test_prefix_expansion_accumulator_matches_chained_union(warm_engine):
    """Prefix expansion now routes >=2-term expansions through the dense OR
    accumulator and returns 1-term expansions directly; results must be
    bit-identical to the chained union_sum."""
    from lse.local_exec import _ScoreSet

    eng = warm_engine
    loc = eng.local
    # derive a prefix with a multi-term expansion from the dictionary
    terms = [str(t) for t in loc._dict_terms]
    by_pfx = {}
    for t in terms:
        by_pfx.setdefault(t[:2], []).append(t)
    multi = sorted(p for p, ts in by_pfx.items() if len(ts) >= 2)
    assert multi, "fixture vocabulary has no shared 2-char prefix"
    p = multi[0]
    hits, total = eng.search_result(f"{p}*", 1000)
    out = _ScoreSet.empty()
    for t in sorted(by_pfx[p]):
        out = out.union_sum(loc._score_term(t))
    k = min(1000, out.ids.size)
    order_w = np.lexsort((out.ids, -out.scores))[:k]
    assert total == out.ids.size
    assert np.array_equal(
        np.array([d for d, _ in hits], dtype=np.int64), out.ids[order_w]
    )
    assert np.array_equal(np.array([s for _, s in hits]), out.scores[order_w])
