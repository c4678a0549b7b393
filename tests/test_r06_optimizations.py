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
