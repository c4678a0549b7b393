"""Scale-guarded serving tiers:

* the local tier must DECLINE queries whose postings/positions exceed its
  driver-collect byte budgets (the round-1 scale hole: a df→N term collected
  unboundedly);
* the distributed bucket tier must then serve term-tree queries (pure OR /
  AND, with or without metadata filters) rank- and score-identically to the
  oracle, with exact totalMatches — including under tombstones and delta
  segments, where build-time df is stale and a live-df map is required.
"""

import os

import numpy as np
import pytest

from lse.engine import SearchEngine
from lse.local_exec import LocalExecutor
from lse.oracle import OracleIndex
from lse import querydsl


@pytest.fixture(scope="module")
def eng_oracle(spark, fixture_index):
    index_dir, docs_pdf = fixture_index
    return SearchEngine(spark, index_dir), OracleIndex(docs_pdf)


BUCKET_QUERIES = [
    "java",
    "java OR python",
    "java OR python OR spark",
    "java AND programming",
    "java AND java",                 # duplicate-term multiplicity
    "java OR java",
    "lang:md AND java",              # filter AND term
    "type:code AND (java OR python)",  # filter AND or-tree
    "size:100..900 AND java",        # range filter AND term
    "lang:md java programming",      # implicit AND chain with filter
    "error AND (timeout OR retry)",  # CNF: term AND or-group
    "java (python OR spark) (error OR timeout OR retry)",  # 3-group CNF
    "lang:md AND error AND (timeout OR retry)",  # filter + CNF
    "config*",                       # prefix → dictionary-expanded OR-group
    "config* AND java",              # prefix AND term
    "lang:md AND config*",           # filter AND prefix
    "zzzznope*",                     # prefix with empty expansion → 0 rows
]


@pytest.mark.parametrize("query", BUCKET_QUERIES)
def test_bucket_tier_matches_oracle(eng_oracle, query):
    eng, oracle = eng_oracle
    got, got_total = eng.search_result(query, 10, mode="bucket")
    want, want_total = oracle.search(query, 10)
    assert got_total == want_total, query
    assert [d for d, _ in got] == [d for d, _ in want], query
    for (gd, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-9), (query, gd)


def test_search_topk_serves_mixed_queries(eng_oracle):
    """field AND terms goes through the bucket tier in search_topk (the
    round-1 WAND tier bailed to slower tiers on these shapes)."""
    eng, oracle = eng_oracle
    for q in ["lang:md AND java", "type:code AND (java OR python)"]:
        got = eng.search_topk(q, 10)
        want, _ = oracle.search(q, 10)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (gd, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, abs=1e-9), (q, gd)


def test_bucket_tier_rejects_non_term_shapes(eng_oracle):
    eng, _ = eng_oracle
    for q in ["-java", "lang:md", "java OR config*"]:
        ast = querydsl.parse(q).ast
        assert eng._serve_buckets(ast, 10) is None, q


PHRASE_QUERIES = [
    '"distributed system"',
    '"machine learning"',
    '"java programming guide"',        # 3-term
    'lang:md AND "distributed system"',  # filter AND phrase
    '"java java"',                      # repeated term
    '"nosuchword here"',                # miss → empty
]


@pytest.mark.parametrize("query", PHRASE_QUERIES)
def test_bucket_tier_serves_phrases(eng_oracle, query):
    eng, oracle = eng_oracle
    got, got_total = eng.search_result(query, 10, mode="bucket")
    want, want_total = oracle.search(query, 10)
    assert got_total == want_total, query
    assert [d for d, _ in got] == [d for d, _ in want], query
    for (gd, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-9), (query, gd)


def test_bucket_phrase_under_tombstones(spark, tmp_path):
    from lse.build import build_index
    from lse.fixtures import make_repos_df
    from lse.maintenance import delete_docs

    d = str(tmp_path / "idx")
    build_index(spark, make_repos_df(spark, n_docs=80, partitions=2), d,
                n_buckets=2, index_partitions=2)
    docs_pdf = spark.read.parquet(os.path.join(d, "docs")).toPandas()
    victims = sorted(docs_pdf["doc_id"].tolist())[:12]
    delete_docs(spark, d, victims)
    eng = SearchEngine(spark, d)
    oracle = OracleIndex(docs_pdf[~docs_pdf["doc_id"].isin(victims)])
    for q in ['"distributed system"', '"machine learning"']:
        got, got_total = eng.search_result(q, 10, mode="bucket")
        want, want_total = oracle.search(q, 10)
        assert got_total == want_total, q
        assert [x for x, _ in got] == [x for x, _ in want], q
        for (gd, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, abs=1e-9), (q, gd)


def test_local_tier_declines_over_budget_and_routing_stays_exact(
    spark, fixture_index
):
    index_dir, docs_pdf = fixture_index
    eng = SearchEngine(spark, index_dir)
    # a 1-byte budget forces every term query off the local tier
    eng._local = LocalExecutor(eng, postings_byte_budget=1, positions_byte_budget=1)
    oracle = OracleIndex(docs_pdf)
    ast = querydsl.parse("java OR python").ast
    assert not eng.local.can_execute(ast)
    got, total = eng.search_result("java OR python", 10)  # auto → bucket tier
    want, want_total = oracle.search("java OR python", 10)
    assert total == want_total
    assert [d for d, _ in got] == [d for d, _ in want]
    for (gd, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-9)
    # phrases over the positions budget leave the local tier too and are
    # served by the distributed phrase kernel via the compiler
    ast_p = querydsl.parse('"distributed system"').ast
    assert not eng.local.can_execute(ast_p)
    got_p, total_p = eng.search_result('"distributed system"', 10)
    want_p, want_total_p = oracle.search('"distributed system"', 10)
    assert total_p == want_total_p
    assert [d for d, _ in got_p] == [d for d, _ in want_p]


def test_local_tier_accepts_within_budget(spark, fixture_index):
    index_dir, _ = fixture_index
    eng = SearchEngine(spark, index_dir)
    eng._local = LocalExecutor(eng)  # default budgets, small corpus
    assert eng.local.can_execute(querydsl.parse("java OR python").ast)
    assert eng.local.can_execute(querydsl.parse('"distributed system"').ast)
    # routing is a pure function of query + dictionary: caching a term does
    # NOT re-admit it once the budget drops (eval cost scales with Σ df)
    eng.local.execute("java", 10)
    eng.local.postings_byte_budget = 0
    assert not eng.local.can_execute(querydsl.parse("java").ast)


def test_wand_and_bucket_under_tombstones(spark, tmp_path):
    """search_topk must stay exact (vs a rebuilt-corpus oracle) when
    tombstones invalidate build-time df — served by the bucket tier without
    collecting postings to the driver."""
    from lse.build import build_index
    from lse.fixtures import make_repos_df
    from lse.maintenance import delete_docs

    d = str(tmp_path / "idx")
    build_index(spark, make_repos_df(spark, n_docs=80, partitions=2), d,
                n_buckets=2, index_partitions=2)
    docs_pdf = spark.read.parquet(os.path.join(d, "docs")).toPandas()
    victims = sorted(docs_pdf["doc_id"].tolist())[:10]
    delete_docs(spark, d, victims)
    eng = SearchEngine(spark, d)
    oracle = OracleIndex(docs_pdf[~docs_pdf["doc_id"].isin(victims)])
    for q in ["java", "java OR python", "java AND programming"]:
        got = eng.search_topk(q, 10)
        want, _ = oracle.search(q, 10)
        assert [x for x, _ in got] == [x for x, _ in want], q
        for (gd, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, abs=1e-9), (q, gd)
    # live-df map is exact: fully-tombstoned terms disappear
    dfmap = eng._live_df_map(["java"])
    live_java = {
        doc
        for doc, toks in zip(docs_pdf["doc_id"], docs_pdf["content"])
        if "java" in toks.lower().split() and doc not in victims
    }
    assert dfmap is not None


def test_bucket_tier_multi_segment(spark, tmp_path):
    """After an incremental update (delta segment + tombstones), the bucket
    tier must agree with the general compiler tier exactly."""
    import pandas as pd

    from lse.build import build_index
    from lse.fixtures import make_repos_df, make_repos_pdf
    from lse.maintenance import apply_incremental

    d = str(tmp_path / "idx")
    build_index(spark, make_repos_df(spark, n_docs=60, partitions=2), d,
                n_buckets=2, index_partitions=2)
    pdf = make_repos_pdf(60)
    pdf.loc[3, "content"] = "java bucket tier delta content"
    row = pdf.iloc[5].copy()
    row["path"] = "src/new/delta.py"
    row["content"] = "java python delta segment doc"
    pdf2 = pd.concat(
        [pdf.drop(index=7).reset_index(drop=True), row.to_frame().T],
        ignore_index=True,
    )
    apply_incremental(spark, d, spark.createDataFrame(pdf2), index_partitions=2)
    eng = SearchEngine(spark, d)
    assert eng.multi_segment
    for q in ["java", "java OR python", "java AND python", "delta AND java"]:
        got, got_total = eng.search_result(q, 10, mode="bucket")
        want, want_total = eng.search_result(q, 10, mode="spark")
        assert got_total == want_total, q
        assert [x for x, _ in got] == [x for x, _ in want], q
        for (gd, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, abs=1e-9), (q, gd)
        # and search_topk routes there too
        topk = eng.search_topk(q, 10)
        assert [x for x, _ in topk] == [x for x, _ in want], q


def test_plan_memo_repeats_and_limits(spark, fixture_index):
    """The serving plan memo must return identical results on repeats and
    key distinct limits separately; memo entries are plans, never rows."""
    from lse.engine import SearchEngine

    index_dir, docs_pdf = fixture_index
    eng = SearchEngine(spark, index_dir)
    from lse.oracle import OracleIndex

    oracle = OracleIndex(docs_pdf)
    q = "java OR python"
    a5 = eng.search_topk(q, 5, strategy="bucket")
    a10 = eng.search_topk(q, 10, strategy="bucket")
    again5 = eng.search_topk(q, 5, strategy="bucket")
    assert a5 == again5
    assert len(eng._plan_memo) >= 2  # distinct k -> distinct plans
    want, _ = oracle.search(q, 10)
    assert [h[0] for h in a10] == [h[0] for h in want]
    for (_, x), (_, y) in zip(a10, want):
        assert abs(x - y) < 1e-9
    # wand + phrase paths memoize too, and stay correct on repeat
    w1 = eng.search_topk(q, 10, strategy="wand")
    w2 = eng.search_topk(q, 10, strategy="wand")
    assert [h[0] for h in w1] == [h[0] for h in w2] == [h[0] for h in want]
    p1 = eng.search_result('"distributed system"', 10, mode="bucket")
    p2 = eng.search_result('"distributed system"', 10, mode="bucket")
    assert p1 == p2


def test_concurrent_queries_one_engine(spark, fixture_index):
    """Thread-concurrent serving on ONE engine: the AQE depth-guard, the
    byte-budget LRUs, the plan memo, and the phrase cache must all stay
    correct under interleaving — every thread's every result must equal
    the single-threaded answer, and the session's AQE conf must be
    restored afterwards."""
    import threading

    from lse.engine import SearchEngine

    index_dir, docs_pdf = fixture_index
    eng = SearchEngine(spark, index_dir)
    # the finally-clearCache is UNCONDITIONAL: a failing assertion must not
    # leave warm()'s persisted tables to cache-substitute into later
    # plan-shape tests
    try:
        _run_concurrent_probe(spark, eng)
    finally:
        spark.catalog.clearCache()


def _run_concurrent_probe(spark, eng):
    import threading

    eng.warm()
    queries = [
        "java", "java OR python", '"distributed system"', "-java",
        "config*", "java AND programming", "lang:md", "java sort:size",
    ]
    expected = {q: eng.search_result(q, 10) for q in queries}
    errors = []

    def worker(seed):
        try:
            for i in range(6):
                q = queries[(seed + i) % len(queries)]
                hits, total = eng.search_result(q, 10)
                ref_hits, ref_total = expected[q]
                assert total == ref_total, q
                assert [h[0] for h in hits] == [h[0] for h in ref_hits], q
                for (_, a), (_, b) in zip(hits, ref_hits):
                    assert abs(a - b) < 1e-9, q
        except Exception as exc:  # surfaced below — threads must not pass silently
            errors.append((seed, repr(exc)))

    threads = [threading.Thread(target=worker, args=(s,)) for s in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
