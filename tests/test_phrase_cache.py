"""Warm-phrase serving path: the raw match set is LRU-cached keyed to the
position-decode identities, and unknown terms are negative-cached across
queries — a warm repeat runs no Spark job and no adjacency kernel, while
eviction/refetch invalidates the cached match (never stales it)."""

import numpy as np
import pytest

from lse import querydsl
from lse.engine import SearchEngine


@pytest.fixture()
def eng(spark, fixture_index):
    index_dir, _ = fixture_index
    return SearchEngine(spark, index_dir)


def _count_kernels(monkeypatch):
    """Count invocations of EITHER adjacency kernel (per-query packed-key
    match_phrase or the rank-key fast path match_phrase_ranked)."""
    from lse import phrase as ph

    calls = {"n": 0}
    real_mp, real_mpr = ph.match_phrase, ph.match_phrase_ranked

    def counting_mp(terms, per_term):
        calls["n"] += 1
        return real_mp(terms, per_term)

    def counting_mpr(terms, keys_of, all_ids):
        calls["n"] += 1
        return real_mpr(terms, keys_of, all_ids)

    monkeypatch.setattr(ph, "match_phrase", counting_mp)
    monkeypatch.setattr(ph, "match_phrase_ranked", counting_mpr)
    return calls


def test_phrase_repeat_skips_kernel(eng, monkeypatch):
    calls = _count_kernels(monkeypatch)
    q = '"distributed system"'
    first_hits, first_total = eng.search_result(q, 10)
    assert calls["n"] == 1
    again_hits, again_total = eng.search_result(q, 10)
    assert calls["n"] == 1  # cache hit — kernel not re-run
    assert first_total == again_total
    assert [h[0] for h in first_hits] == [h[0] for h in again_hits]
    for (_, a), (_, b) in zip(first_hits, again_hits):
        assert a == b


def test_phrase_cache_invalidates_on_decode_change(eng, monkeypatch):
    from lse import phrase as ph

    q = '"distributed system"'
    base_hits, base_total = eng.search_result(q, 10)
    # simulate LRU eviction: clearing the positions cache forces a fresh
    # decode with NEW object identities — the phrase cache must miss
    eng.local._positions_cache._d.clear()
    eng.local._positions_cache._sizes.clear()
    eng.local._positions_cache.bytes = 0
    calls = _count_kernels(monkeypatch)
    hits, total = eng.search_result(q, 10)
    assert calls["n"] == 1  # identity changed — kernel re-ran
    assert total == base_total
    assert [h[0] for h in hits] == [h[0] for h in base_hits]


def test_unknown_term_negative_cached_across_queries(eng):
    eng.search_result("zzzqqqxx", 10)
    hit = eng.local._postings_cache.get("zzzqqqxx")
    assert hit is not None and hit[3] == 0  # df == 0 negative entry
    hits, total = eng.search_result("zzzqqqxx", 10)
    assert total == 0 and hits == []


def test_phrase_slot_order_is_semantically_neutral(eng):
    """Rarest-first slot intersection must not change any phrase result —
    cross-check every phrase in the corpus vocabulary mix against the
    pandas oracle."""
    from lse.oracle import OracleIndex

    docs = eng.spark.read.parquet(eng.index_dir + "/docs").toPandas()
    oracle = OracleIndex(docs)
    for q in ['"distributed system"', '"system design"', '"a b c"']:
        hits, total = eng.search_result(q, 10)
        ohits, ototal = oracle.search(q, 10)
        assert total == ototal, q
        assert [h[0] for h in hits] == [h[0] for h in ohits], q
        for (_, a), (_, b) in zip(hits, ohits):
            assert abs(a - b) < 1e-9, q


def test_warm_prefetches_hot_terms(spark, fixture_index):
    """warm() pre-fills the local LRUs with the highest-df terms (postings
    + scores + ranks + positions) so first-touch equals warm for the head
    of the distribution — and results stay identical to a cold engine."""
    index_dir, docs_pdf = fixture_index
    cold = SearchEngine(spark, index_dir)
    warm = SearchEngine(spark, index_dir).warm()
    request_cleanup = spark.catalog.clearCache  # warm() persists tables
    # globally (Spark cache substitution is plan-based) — clear at exit so
    # later plan-shape tests still see parquet scans with PushedFilters
    assert len(warm.local._postings_cache) > 0
    assert len(warm.local._positions_cache) > 0
    # the highest-df dictionary term must be cached with primed scores
    import numpy as np

    top = str(warm.local._dict_terms[int(np.argmax(warm.local._dict_df))])
    assert top in warm.local._postings_cache
    assert warm.local._scores_cache.get(top) is not None
    hits_w, total_w = warm.search_result(top, 10)
    hits_c, total_c = cold.search_result(top, 10)
    assert total_w == total_c
    assert [h[0] for h in hits_w] == [h[0] for h in hits_c]
    for (_, a), (_, b) in zip(hits_w, hits_c):
        assert abs(a - b) < 1e-9
    request_cleanup()


def test_warm_prefetch_disabled(spark, fixture_index):
    index_dir, _ = fixture_index
    eng = SearchEngine(spark, index_dir)
    try:
        eng.warm(prefetch_terms=0, prefetch_positions=0)
        assert len(eng.local._positions_cache) == 0
    finally:
        spark.catalog.clearCache()
