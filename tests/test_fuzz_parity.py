"""Property-based fuzz (hypothesis): the parser never crashes with anything
but QueryParseError, and for GENERATED well-formed queries every serving
tier agrees with the pandas oracle — rank, scores (±1e-9), and totals."""

import hypothesis.strategies as st
import pytest
from hypothesis import HealthCheck, given, settings

from lse import querydsl
from lse.engine import SearchEngine
from lse.oracle import OracleIndex
from lse.querydsl import QueryParseError

# ---------------------------------------------------------- parser survives
PRINTABLE = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FFF),
    min_size=0, max_size=80,
)


@given(PRINTABLE)
@settings(max_examples=300, deadline=None)
def test_parser_total(q):
    """parse() is total: any input either parses or raises QueryParseError —
    never any other exception (the reference surfaces parse errors as
    SearchResult.error; a stray TypeError would be a crash)."""
    try:
        querydsl.parse(q)
    except QueryParseError:
        pass


# ------------------------------------------------- well-formed query parity
VOCAB_TERMS = st.sampled_from(
    ["java", "spark", "query", "merge", "python", "zzmissing", "the",
     "programming", "machine", "learning", "distributed"]
)


def _leaf():
    return st.one_of(
        VOCAB_TERMS,
        VOCAB_TERMS.map(lambda t: f"-{t}"),
        st.sampled_from(['"machine learning"', '"java programming"',
                         "jo*", "config*", "ext:java", "type:CODE",
                         "size:100..300", "repo:org1/repo1"]),
    )


def _query():
    def combine(parts):
        out = parts[0]
        for op, p in parts[1]:
            out = f"{out} {op} {p}" if op else f"({out}) {op or 'AND'} ({p})"
        return out

    return st.tuples(
        _leaf(),
        st.lists(
            st.tuples(st.sampled_from(["AND", "OR", ""]), _leaf()),
            min_size=0, max_size=3,
        ),
    ).map(lambda t: " ".join([t[0]] + [f"{op} {p}".strip() for op, p in t[1]]))


@pytest.fixture(scope="module")
def parity_env(spark, tmp_path_factory):
    from lse.build import build_index
    from lse.fixtures import make_repos_df

    d = str(tmp_path_factory.mktemp("fuzz") / "idx")
    src = make_repos_df(spark, n_docs=120, partitions=2)
    build_index(spark, src, d, n_buckets=2, index_partitions=2)
    import os

    import pandas as pd

    eng = SearchEngine(spark, d)
    docs_pdf = spark.read.parquet(os.path.join(d, "docs")).toPandas()
    oracle = OracleIndex(docs_pdf)
    return eng, oracle


@given(q=_query())
@settings(
    max_examples=60, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_tiers_match_oracle_on_generated_queries(parity_env, q):
    eng, oracle = parity_env
    try:
        parsed = querydsl.parse(q)
    except QueryParseError:
        return
    want = oracle.evaluate(parsed.ast, eng.N, eng.avgdl)
    hits, total = eng.search_result(q, 1000)
    assert total == len(want), q
    got = dict(hits)
    for doc, score in want.items():
        assert doc in got, (q, doc)
        assert got[doc] == pytest.approx(score, abs=1e-9), (q, doc)
    # the auto top-k path must agree with the oracle's best-k too
    topk = eng.search_topk(q, 10)
    ranked = sorted(want.items(), key=lambda t: (-t[1], t[0]))[:10]
    assert [d for d, _ in topk] == [d for d, _ in ranked], q
