"""End-to-end parity: the Spark engine's (doc_id, score) results must be
rank-identical and score-equal (±1e-9) to the pure-pandas reference replica
(lse.oracle) on the reference query set (FIXTURES.md F4)."""

import pytest

from lse.engine import SearchEngine
from lse.oracle import OracleIndex

QUERIES = [
    "java",                                  # term
    "java programming",                      # implicit AND
    "java AND programming",                  # explicit AND
    "error AND (timeout OR retry)",          # grouping + OR
    "-draft NOT internal",                   # negation
    '"distributed system"',                  # phrase adjacency
    '"machine learning"',                    # JMH phrase query
    "config*",                               # prefix
    "lang:md",                               # field filter
    "ext:java",                              # field alias
    "path:src/core",                         # path prefix
    "type:code",                             # doc-type filter
    "size:100..900",                         # numeric range
    'mtime:"2025-01-01T00:00:00Z".."2025-03-01T00:00:00Z"',  # time range
    "readme.md",                             # direct-filename rewrite
    "java sort:size",                        # sort directive
    "java OR python OR spark",               # multi-OR
    "spark AND -java",                       # AND with negation
    "the",                                   # stopword → empty
    "搜索",                                   # CJK bigram term (dictionary hit)
    "引擎 OR 世界",                            # CJK bigram OR
    "hello 世界",                             # mixed-script implicit AND
]


@pytest.fixture(scope="module")
def engine_and_oracle(spark, fixture_index):
    index_dir, docs_pdf = fixture_index
    return SearchEngine(spark, index_dir), OracleIndex(docs_pdf)


@pytest.mark.parametrize("mode", ["spark", "local"])
@pytest.mark.parametrize("query", QUERIES)
def test_query_parity(engine_and_oracle, query, mode):
    engine, oracle = engine_and_oracle
    got, got_total = engine.search_result(query, limit=10, mode=mode)
    want, want_total = oracle.search(query, limit=10)
    assert got_total == want_total, f"totalMatches mismatch for {query!r}"
    assert [d for d, _ in got] == [d for d, _ in want], f"rank mismatch for {query!r}"
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-9), f"score mismatch for {query!r} doc {gd}"


WAND_QUERIES = ["java", "java OR python", "spark OR index OR search OR engine"]


@pytest.mark.parametrize("query", WAND_QUERIES)
def test_wand_topk_exact(engine_and_oracle, query):
    """Distributed block-max WAND must return exactly the exhaustive top-k."""
    engine, oracle = engine_and_oracle
    got = engine.search_topk(query, limit=10, strategy="wand")
    want, _ = oracle.search(query, limit=10)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-9)


AND_WAND_QUERIES = ["java AND programming", "spark AND query AND index",
                    "java AND java"]


@pytest.mark.parametrize("query", AND_WAND_QUERIES)
def test_wand_and_topk_exact(engine_and_oracle, query):
    """Conjunctive distributed WAND must match the oracle exactly (including
    the duplicate-term double-count semantics of the reference)."""
    engine, oracle = engine_and_oracle
    got = engine.search_topk(query, limit=10, strategy="wand")
    want, _ = oracle.search(query, limit=10)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (gd, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-9)


def test_wand_or_duplicate_term_multiplicity(engine_and_oracle):
    engine, oracle = engine_and_oracle
    got = engine.search_topk("java OR java", limit=5, strategy="wand")
    want, _ = oracle.search("java OR java", limit=5)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (gd, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-9)


def test_search_with_snippets(engine_and_oracle):
    engine, _ = engine_and_oracle
    hits, total = engine.search_with_snippets("java AND programming", 5)
    assert total >= 1 and hits
    top = hits[0]
    assert top["path"] and top["lang"]
    assert top["snippets"], "content is stored in the fixture index"
    joined = " ".join(s["text"].lower() for s in top["snippets"])
    assert "java" in joined or "programming" in joined
    assert all(s["line_number"] >= 1 for s in top["snippets"])


def test_search_with_snippets_miss(engine_and_oracle):
    engine, _ = engine_and_oracle
    hits, total = engine.search_with_snippets("zzzmissingterm", 5)
    assert hits == [] and total == 0


WILDCARD_PATTERNS = ["ja*a", "*ing", "c*f*g", "java*", "zz*zz", "*", ""]


@pytest.mark.parametrize("pattern", WILDCARD_PATTERNS)
def test_wildcard_routes_agree(engine_and_oracle, pattern):
    """search_wildcard's dictionary-expansion route must equal the
    distributed rlike plan (wildcard_scores) — same matched docs, same
    totalMatches, scores ±1e-9; degenerate patterns ('', '*') are empty."""
    from pyspark.sql import functions as F

    engine, _ = engine_and_oracle
    top_a, tot_a = engine.search_wildcard(pattern, 10)
    if not pattern.replace("*", ""):
        assert (top_a, tot_a) == ([], 0)
        return
    sc = engine.wildcard_scores(pattern).cache()
    try:
        tot_b = sc.count()
        top_b = [
            (int(r["doc_id"]), float(r["score"]))
            for r in sc.orderBy(F.desc("score"), F.asc("doc_id")).take(10)
        ]
    finally:
        sc.unpersist()
    assert tot_a == tot_b, pattern
    da, db = dict(top_a), dict(top_b)
    assert set(da) == set(db), pattern
    for k in da:
        assert da[k] == pytest.approx(db[k], abs=1e-9), (pattern, k)


def test_wildcard_star_only_prefix_equivalence(engine_and_oracle):
    """A trailing-star glob must equal the DSL PrefixQuery exactly."""
    engine, oracle = engine_and_oracle
    got, got_total = engine.search_wildcard("config*", 10)
    want, want_total = oracle.search("config*", limit=10)
    assert got_total == want_total
    assert [d for d, _ in got] == [d for d, _ in want]
    for (gd, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-9)


def test_wildcard_over_cap_falls_back_distributed(engine_and_oracle):
    """With cap 0 the expansion declines and the distributed plan serves —
    results identical to the expansion route."""
    engine, _ = engine_and_oracle
    assert engine._expand_wildcard("ja*a", cap=0) is None
    top_a, tot_a = engine.search_wildcard("ja*a", 10)
    exp = engine._expand_wildcard("ja*a")
    assert exp  # normal cap expands fine
    top_b, tot_b = engine.search_result(" OR ".join(exp), 10)
    assert tot_a == tot_b
    assert dict(top_a).keys() == dict(top_b).keys()


# ------------------------------------------------------------------ fuzzy
def _naive_lev(a, b):
    import itertools

    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_levenshtein_leq_matches_naive_dp():
    from lse.engine import SearchEngine

    words = ["", "a", "ab", "java", "jawa", "jva", "javaa", "spark",
             "sparc", "spork", "programming", "programing"]
    for a in words:
        for b in words:
            for d in (0, 1, 2):
                assert SearchEngine._levenshtein_leq(a, b, d) == (
                    _naive_lev(a, b) <= d
                ), (a, b, d)


@pytest.mark.parametrize("term,dist", [
    ("jawa", 1),      # substitution → java
    ("jav", 1),       # deletion → java
    ("javaa", 1),     # insertion → java
    ("qqqqq", 1),     # no match
    ("sistem", 2),    # d=2 reaches system
])
def test_fuzzy_routes_agree(engine_and_oracle, term, dist):
    """search_fuzzy's dictionary-expansion route must equal the distributed
    levenshtein plan (fuzzy_scores) — same docs, same totals, ±1e-9."""
    from pyspark.sql import functions as F

    engine, _ = engine_and_oracle
    top_a, tot_a = engine.search_fuzzy(term, max_dist=dist, limit=10)
    sc = engine.fuzzy_scores(term, max_dist=dist).cache()
    try:
        tot_b = sc.count()
        top_b = [
            (int(r["doc_id"]), float(r["score"]))
            for r in sc.orderBy(F.desc("score"), F.asc("doc_id")).take(10)
        ]
    finally:
        sc.unpersist()
    assert tot_a == tot_b, term
    da, db = dict(top_a), dict(top_b)
    assert set(da) == set(db), term
    for k in da:
        assert da[k] == pytest.approx(db[k], abs=1e-9), (term, k)


def test_fuzzy_exact_term_includes_itself(engine_and_oracle):
    """Distance 0 of an existing term equals the plain term query."""
    engine, _ = engine_and_oracle
    got, got_total = engine.search_fuzzy("java", max_dist=0, limit=10)
    want, want_total = engine.search_result("java", 10)
    assert got_total == want_total
    assert dict(got).keys() == dict(want).keys()


def test_fuzzy_over_cap_falls_back_distributed(engine_and_oracle):
    engine, _ = engine_and_oracle
    assert engine._expand_fuzzy("jawa", cap=0) is None
    top_a, tot_a = engine.search_fuzzy("jawa", max_dist=1, limit=10)
    exp = engine._expand_fuzzy("jawa")
    assert exp
    top_b, tot_b = engine.search_result(" OR ".join(exp), 10)
    assert tot_a == tot_b
    assert dict(top_a).keys() == dict(top_b).keys()
