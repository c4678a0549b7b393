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


def test_phrase_repeat_skips_kernel(eng, monkeypatch):
    import lse.local_exec as lx

    calls = {"n": 0}
    real = None
    from lse import phrase as ph

    real = ph.match_phrase

    def counting(terms, per_term):
        calls["n"] += 1
        return real(terms, per_term)

    monkeypatch.setattr(ph, "match_phrase", counting)
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
    calls = {"n": 0}
    real = ph.match_phrase

    def counting(terms, per_term):
        calls["n"] += 1
        return real(terms, per_term)

    monkeypatch.setattr(ph, "match_phrase", counting)
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
