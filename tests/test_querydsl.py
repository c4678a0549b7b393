"""Query DSL parser tests — mirrors the reference's QueryParserTest.java:11-81
(AST node-type assertions per construct, implicit AND, unclosed quote) plus
the direct-filename rewrite (QueryEngine.java:103-127)."""

import pytest

from lse.querydsl import (
    Bool,
    Field,
    Not,
    ParseResult,
    Phrase,
    Prefix,
    QueryParseError,
    Range,
    Term,
    extract_query_terms,
    normalize_direct_filename,
    parse,
)


def ast(q):
    return parse(q).ast


def test_single_term():
    assert ast("java") == Term("java")


def test_explicit_and():
    assert ast("java AND spark") == Bool("AND", Term("java"), Term("spark"))


def test_implicit_and():
    assert ast("java spark") == Bool("AND", Term("java"), Term("spark"))


def test_or_precedence_lower_than_and():
    # a b OR c → (a AND b) OR c
    assert ast("a1 b2 OR c3") == Bool(
        "OR", Bool("AND", Term("a1"), Term("b2")), Term("c3")
    )


def test_grouping():
    assert ast("error AND (timeout OR retry)") == Bool(
        "AND", Term("error"), Bool("OR", Term("timeout"), Term("retry"))
    )


def test_not_and_minus():
    assert ast("NOT draft") == Not(Term("draft"))
    assert ast("-draft NOT internal") == Bool(
        "AND", Not(Term("draft")), Not(Term("internal"))
    )


def test_phrase():
    assert ast('"distributed system"') == Phrase(("distributed", "system"))


def test_phrase_with_escapes():
    assert ast('"say \\"hi\\""') == Phrase(("say", '"hi"'))


def test_unclosed_quote_raises():
    with pytest.raises(QueryParseError):
        parse('"unclosed')


def test_prefix():
    assert ast("config*") == Prefix("config")


def test_field_queries():
    assert ast("ext:md") == Field("ext", "md")
    assert ast("lang:py") == Field("lang", "py")
    assert ast("path:src/core") == Field("path", "src/core")
    assert ast("filename:readme.md") == Field("filename", "readme.md")
    assert ast("type:code") == Field("type", "code")


def test_unsupported_field_raises():
    with pytest.raises(QueryParseError):
        parse("bogus:value")


def test_range_queries():
    assert ast("size:10..5000") == Range("size", "10", "5000")
    # timestamps contain ':' so they are quoted, as in the reference's own
    # test QueryEngineTest.java:238 (PHRASE tokens are valid range values)
    assert ast('mtime:"2025-01-01T00:00:00Z".."2025-12-31T00:00:00Z"') == Range(
        "mtime", "2025-01-01T00:00:00Z", "2025-12-31T00:00:00Z"
    )


def test_sort_directive():
    r = parse("java sort:size")
    assert r.ast == Term("java")
    assert r.sort is not None and r.sort.field == "size"


def test_empty_query_raises():
    with pytest.raises(QueryParseError):
        parse("")
    with pytest.raises(QueryParseError):
        parse("   ")


def test_query_length_guard():
    with pytest.raises(QueryParseError):
        parse("x" * 3000)


def test_direct_filename_rewrite():
    assert normalize_direct_filename("readme.md") == "filename:readme.md"
    assert normalize_direct_filename("java") == "java"
    assert normalize_direct_filename("a b.md") == "a b.md"
    assert normalize_direct_filename("path:x.md") == "path:x.md"
    assert normalize_direct_filename("-x.md") == "-x.md"
    assert normalize_direct_filename("src/x.md") == "src/x.md"
    # end-to-end through parse()
    assert ast("readme.md") == Field("filename", "readme.md")


def test_extract_query_terms():
    terms = extract_query_terms(ast('Java AND (Spark OR "machine learning") -Draft'))
    assert terms == {"java", "spark", "machine", "learning", "draft"}
    assert extract_query_terms(ast("config*")) == {"config"}
