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


# ------------------------------------------------- caret + suggestion parity
def test_parse_error_caret_rendering():
    """Reference rendering parity (query/QueryParseException.java:27-33):
    'Parse error at position N: <msg>' + the query line + a caret line with
    the ^ under the (clamped) error position."""
    with pytest.raises(QueryParseError) as ei:
        parse('"unclosed')
    lines = str(ei.value).splitlines()
    assert lines[0] == "Parse error at position 0: unclosed quote"
    assert lines[1] == '"unclosed'
    assert lines[2] == "^"

    with pytest.raises(QueryParseError) as ei:
        parse("size:1..")
    lines = str(ei.value).splitlines()
    assert lines[0] == "Parse error at position 8: range query missing end value"
    assert lines[1] == "size:1.."
    assert lines[2] == " " * 8 + "^"  # clamped to len(query)

    with pytest.raises(QueryParseError) as ei:
        parse("bogus:x")
    lines = str(ei.value).splitlines()
    assert lines[0].startswith("Parse error at position 0: unsupported field")
    assert lines[2] == "^"


def test_parse_error_suggestions():
    """suggestFix parity (query/QueryParseException.java:35-42), exact
    strings: blank query, unclosed-quote-at-EOF, generic."""
    from lse.querydsl import QueryParseError as E

    # blank query -> 非空 hint (both '' and whitespace-only)
    with pytest.raises(E) as ei:
        parse("")
    assert ei.value.suggestion == "请输入非空查询"
    with pytest.raises(E) as ei:
        parse("   ")
    assert ei.value.suggestion == "请输入非空查询"
    # pos at/past EOF with an odd quote count -> unclosed-quote hint
    assert (
        E._suggest_fix(9, '"unclosed') == "检测到未闭合引号，请补全右引号"
    )
    # everything else -> generic syntax hint (incl. the lexer's
    # unclosed-quote error, which points at the OPENING quote — same
    # position the reference lexer reports, QueryLexer.java:136)
    with pytest.raises(E) as ei:
        parse('"unclosed')
    assert ei.value.suggestion == "请检查该位置附近的语法，例如括号、引号或布尔运算符"
    with pytest.raises(E) as ei:
        parse("bogus:x")
    assert ei.value.suggestion == "请检查该位置附近的语法，例如括号、引号或布尔运算符"
