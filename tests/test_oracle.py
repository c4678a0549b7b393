"""Oracle (reference-replica) engine tests — mini-corpora and expectations
mirroring QueryEngineTest.java:28-262."""

import math

import pandas as pd
import pytest

from lse.oracle import OracleIndex
from lse import bm25
from lse.querydsl import QueryParseError


def corpus(rows):
    return pd.DataFrame(rows)


@pytest.fixture
def idx():
    return OracleIndex(
        corpus(
            [
                dict(doc_id=1, path="src/doc1.md", lang="md", size_bytes=100,
                     mtime="2025-03-01T00:00:00Z", content="Java programming guide"),
                dict(doc_id=2, path="src/doc2.md", lang="md", size_bytes=2000,
                     mtime="2025-06-01T00:00:00Z", content="Python programming tutorial"),
                dict(doc_id=3, path="src/core/doc3.java", lang="java", size_bytes=50,
                     mtime="2024-01-01T00:00:00Z", content="Java tutorial java JAVA"),
                dict(doc_id=4, path="src/readme.md", lang="md", size_bytes=700,
                     mtime="2025-09-01T00:00:00Z",
                     content="distributed system architecture notes"),
                dict(doc_id=5, path="src/notes.txt", lang="txt", size_bytes=90,
                     mtime="2025-01-15T00:00:00Z",
                     content="system distributed design configuration configure"),
            ]
        )
    )


def ids(hits):
    return [d for d, _ in hits]


def test_term_query(idx):
    hits, total = idx.search("Java", 10)
    assert set(ids(hits)) == {1, 3}
    assert total == 2


def test_term_scores_exact(idx):
    hits, _ = idx.search("java", 10)
    N, avgdl = 5, idx.avgdl
    expect = {
        1: bm25.score(1, 2, 3, N, avgdl),
        3: bm25.score(3, 2, 4, N, avgdl),
    }
    for d, s in hits:
        assert s == pytest.approx(expect[d], abs=1e-12)
    # doc3 has tf=3 in a 4-token doc → scores higher (QueryEngineTest.java:157-179)
    assert ids(hits)[0] == 3


def test_and_query(idx):
    hits, total = idx.search("Java AND programming", 10)
    assert ids(hits) == [1]


def test_implicit_and(idx):
    assert ids(idx.search("Java programming", 10)[0]) == [1]


def test_or_query(idx):
    hits, _ = idx.search("java OR python", 10)
    assert set(ids(hits)) == {1, 2, 3}


def test_or_score_is_sum(idx):
    hits, _ = idx.search("java OR guide", 10)
    scores = dict(hits)
    t_java, _ = idx.search("java", 10)
    t_guide, _ = idx.search("guide", 10)
    assert scores[1] == pytest.approx(dict(t_java)[1] + dict(t_guide)[1], abs=1e-12)


def test_not_query(idx):
    hits, total = idx.search("-java", 10)
    assert set(ids(hits)) == {2, 4, 5}
    assert all(s == 0.0 for _, s in hits)
    # NOT-only ties broken by doc_id asc
    assert ids(hits) == [2, 4, 5]


def test_phrase_adjacency(idx):
    # QueryEngineTest.java:73-92 — matches doc4, not doc5 (reversed order)
    hits, total = idx.search('"distributed system"', 10)
    assert ids(hits) == [4]


def test_phrase_score_is_member_sum(idx):
    hits, _ = idx.search('"distributed system"', 10)
    d_hits, _ = idx.search("distributed", 10)
    s_hits, _ = idx.search("system", 10)
    assert dict(hits)[4] == pytest.approx(
        dict(d_hits)[4] + dict(s_hits)[4], abs=1e-12
    )


def test_prefix_query(idx):
    # config* → configuration + configure, both in doc5; scores summed
    hits, _ = idx.search("config*", 10)
    assert ids(hits) == [5]
    c1 = idx._score_term("configuration", 5, max(idx.avgdl, 1.0))[5]
    c2 = idx._score_term("configure", 5, max(idx.avgdl, 1.0))[5]
    assert dict(hits)[5] == pytest.approx(c1 + c2, abs=1e-12)


def test_field_ext(idx):
    hits, _ = idx.search("ext:md", 10)
    assert set(ids(hits)) == {1, 2, 4}
    assert all(s == 1.0 for _, s in hits)


def test_field_path_prefix(idx):
    assert set(ids(idx.search("path:src/core", 10)[0])) == {3}


def test_field_filename_and_direct_rewrite(idx):
    assert ids(idx.search("filename:readme.md", 10)[0]) == [4]
    # direct-filename rewrite path
    assert ids(idx.search("readme.md", 10)[0]) == [4]


def test_field_type(idx):
    assert set(ids(idx.search("type:code", 10)[0])) == {3}
    assert ids(idx.search("type:bogus", 10)[0]) == []


def test_size_range(idx):
    hits, _ = idx.search("size:60..800", 10)
    assert set(ids(hits)) == {1, 4, 5}


def test_size_range_bad_value_empty(idx):
    assert idx.search("size:abc..10", 10)[0] == []


def test_mtime_range(idx):
    hits, _ = idx.search('mtime:"2025-01-01T00:00:00Z".."2025-06-30T00:00:00Z"', 10)
    assert set(ids(hits)) == {1, 2, 5}


def test_field_and_term_combo(idx):
    hits, _ = idx.search("ext:md java", 10)
    assert ids(hits) == [1]
    # combined score = 1.0 (field) + BM25(term)
    t, _ = idx.search("java", 10)
    assert dict(hits)[1] == pytest.approx(1.0 + dict(t)[1], abs=1e-12)


def test_sort_directives(idx):
    hits, _ = idx.search("ext:md sort:size", 10)
    assert ids(hits) == [2, 4, 1]  # size desc
    hits, _ = idx.search("ext:md sort:mtime", 10)
    assert ids(hits) == [4, 2, 1]  # mtime desc


def test_limit_and_total(idx):
    hits, total = idx.search("java OR python OR system", 2)
    assert len(hits) == 2
    assert total == 5  # java:{1,3} ∪ python:{2} ∪ system:{4,5}


def test_miss_returns_empty(idx):
    hits, total = idx.search("zzzmissing", 10)
    assert hits == [] and total == 0


def test_unknown_field_raises(idx):
    with pytest.raises(QueryParseError):
        idx.search("unknown:value", 10)


def test_stopword_query_returns_empty(idx):
    # stopwords are never indexed
    assert idx.search("the", 10)[0] == []


def test_grouping(idx):
    hits, _ = idx.search("tutorial AND (python OR java)", 10)
    assert set(ids(hits)) == {2, 3}
