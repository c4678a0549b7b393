"""Local-tier memory machinery: byte-budgeted LRU over decoded postings,
score-array caching, argpartition top-k, dictionary byte cap, and
conf-driven budgets (VERDICT r2 #2/#9)."""

import numpy as np
import pytest

from lse.engine import SearchEngine
from lse.local_exec import LocalExecutor, _ByteLRU, _topk_order


# ------------------------------------------------------------------ _ByteLRU
def test_byte_lru_evicts_lru_order():
    lru = _ByteLRU(100)
    a = (np.zeros(5, dtype=np.int64),)   # 40 bytes
    b = (np.zeros(5, dtype=np.int64),)
    c = (np.zeros(5, dtype=np.int64),)
    lru.put("a", a)
    lru.put("b", b)
    assert lru.bytes == 80
    lru.get("a")          # bump a → b is now LRU
    lru.put("c", c)       # 120 > 100 → evict b
    assert "b" not in lru and "a" in lru and "c" in lru
    assert lru.bytes == 80


def test_byte_lru_keeps_last_entry_even_over_budget():
    lru = _ByteLRU(8)
    big = (np.zeros(100, dtype=np.int64),)
    lru.put("big", big)
    assert "big" in lru  # a single over-budget entry must still be usable


def test_byte_lru_replace_updates_bytes():
    lru = _ByteLRU(1000)
    lru.put("k", (np.zeros(10, dtype=np.int64),))
    lru.put("k", (np.zeros(2, dtype=np.int64),))
    assert lru.bytes == 16 and len(lru) == 1


# ---------------------------------------------------------------- topk order
@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("n,k", [(10, 3), (5000, 10), (50_000, 10), (100, 200)])
def test_topk_order_matches_lexsort(seed, n, k):
    rng = np.random.default_rng(seed)
    ids = rng.permutation(n).astype(np.int64)
    scores = rng.integers(0, max(n // 10, 2), n).astype(np.float64)  # many ties
    want = np.lexsort((ids, -scores))[:k]
    got = _topk_order(ids, scores, k)
    np.testing.assert_array_equal(ids[got], ids[want])
    np.testing.assert_array_equal(scores[got], scores[want])


def test_topk_order_all_tied():
    ids = np.arange(20_000, dtype=np.int64)[::-1].copy()
    scores = np.ones(20_000)
    got = _topk_order(ids, scores, 5)
    np.testing.assert_array_equal(ids[got], np.arange(5))


# ----------------------------------------------------- engine-level behavior
def test_scores_cached_and_results_stable(spark, fixture_index):
    index_dir, _ = fixture_index
    eng = SearchEngine(spark, index_dir)
    first, t1 = eng.local.execute("java OR spark", 10)
    assert len(eng.local._scores_cache) >= 1
    again, t2 = eng.local.execute("java OR spark", 10)
    assert t1 == t2 and first == again


def test_tiny_cache_budget_evicts_but_stays_exact(spark, fixture_index):
    index_dir, _ = fixture_index
    eng = SearchEngine(spark, index_dir)
    ref = SearchEngine(spark, index_dir)
    eng._local = LocalExecutor(eng, cache_byte_budget=1)  # evict ~everything
    for q in ["java", "spark OR query", "java AND programming"]:
        a, ta = eng.local.execute(q, 10)
        b, tb = ref.local.execute(q, 10)
        assert ta == tb and [d for d, _ in a] == [d for d, _ in b]
        for (_, sa), (_, sb) in zip(a, b):
            assert sa == pytest.approx(sb, abs=1e-9)


# ------------------------------------------------------- dictionary byte cap
def test_dict_byte_budget_boundary(spark, fixture_index, caplog):
    import logging

    index_dir, _ = fixture_index
    eng = SearchEngine(spark, index_dir)
    ok = LocalExecutor(eng, dict_byte_budget=256 << 20)
    assert ok._load_dictionary() is True
    n_terms = len(ok._dict_terms)
    # boundary: a budget just below the dictionary's approximate footprint
    approx = int(sum(len(t) for t in ok._dict_terms) * 4 + n_terms * 8 * 5)
    tight = LocalExecutor(eng, dict_byte_budget=approx - 1)
    with caplog.at_level(logging.WARNING, logger="lse.local_exec"):
        assert tight._load_dictionary() is False
    assert any("dict_byte_budget" in r.message for r in caplog.records)
    # below the boundary nothing changes: same budget+1 loads fine
    loose = LocalExecutor(eng, dict_byte_budget=approx + 1)
    assert loose._load_dictionary() is True
    assert len(loose._dict_terms) == n_terms
    # degraded routing still serves correctly (small corpus gate)
    from lse import querydsl

    assert tight.can_execute(querydsl.parse("java").ast) is True  # N small


# ------------------------------------------------------- conf-driven budgets
def test_conf_overrides_local_budgets(spark, fixture_index):
    index_dir, _ = fixture_index
    key = "spark.lse.local.postingsByteBudget"
    spark.conf.set(key, "1")
    try:
        eng = SearchEngine(spark, index_dir)
        assert eng.local.postings_byte_budget == 1
        from lse import querydsl

        assert eng.local.can_execute(querydsl.parse("java").ast) is False
        # …and the query still serves exactly through the distributed tiers
        hits, total = eng.search_result("java", 5)
        ref = SearchEngine(spark, index_dir)
        spark.conf.unset(key)
        hits2, total2 = ref.search_result("java", 5, mode="spark")
        assert total == total2
        assert [d for d, _ in hits] == [d for d, _ in hits2]
    finally:
        try:
            spark.conf.unset(key)
        except Exception:
            pass


# ----------------------------------------------------- accumulator OR path
def test_or_accumulator_matches_union(spark, fixture_index):
    """Multi-term OR through the dense rank-space accumulator must equal
    the sort-based union bit-for-bit (same left-to-right add order),
    including duplicate terms (score added twice)."""
    from lse import querydsl

    index_dir, _ = fixture_index
    eng = SearchEngine(spark, index_dir)
    eng.local.meta()  # materialize the universe → accumulator eligible
    eng.local.all_doc_ids()
    q = "java OR spark OR query OR java"  # duplicate on purpose
    ast = querydsl.parse(q).ast
    flat = eng.local._flat_or_terms(ast)
    assert flat == ["java", "spark", "query", "java"]
    hits_acc, total_acc = eng.local.execute(q, 1000)

    ref = SearchEngine(spark, index_dir)
    ref.local.meta()
    ref.local._query_postings = {}
    ref.local._prefix_terms = {}
    ref.local.fetch_terms(["java", "spark", "query"], [])
    s = ref.local._score_term("java").union_sum(ref.local._score_term("spark"))
    s = s.union_sum(ref.local._score_term("query"))
    s = s.union_sum(ref.local._score_term("java"))
    assert total_acc == s.ids.size
    got = {d: sc for d, sc in hits_acc}
    import numpy as np

    order = np.lexsort((s.ids, -s.scores))[:1000]
    for i in order:
        assert got[int(s.ids[i])] == pytest.approx(float(s.scores[i]), abs=1e-9)


def test_lru_entry_count_cap():
    """Zero-byte (negative-cache) entries must still be bounded: the LRU
    evicts on entry COUNT as well as bytes."""
    import numpy as np

    from lse.local_exec import _ByteLRU

    lru = _ByteLRU(1 << 30, max_entries=10)
    neg = (np.empty(0, dtype=np.int64),) * 3 + (0,)
    for i in range(100):
        lru.put(f"unknown{i}", neg)
    assert len(lru) == 10
    assert "unknown99" in lru and "unknown0" not in lru
