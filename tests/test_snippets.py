"""Snippet tests — mirrors SnippetGeneratorTest.java:17-147."""

from lse.snippets import ANSI_HIGHLIGHT, ANSI_RESET, generate


def plain(s: str) -> str:
    return s.replace(ANSI_HIGHLIGHT, "").replace(ANSI_RESET, "")


def test_basic_generation():
    content = (
        "This is a test document. It contains Java programming content. "
        "Java is a popular language. This document is for testing search."
    )
    snippets = generate(content, {"java"})
    assert snippets
    assert "java" in snippets[0].text.lower()


def test_multiple_snippets_capped():
    content = (
        "Java is great. " + "x" * 120 + "Java is also good. " + "y" * 120 + "Java again."
    )
    snippets = generate(content, {"java"}, context_chars=10, max_snippets=3)
    assert 1 < len(snippets) <= 3


def test_empty_content_and_terms():
    assert generate("", {"test"}) == []
    assert generate(None, {"test"}) == []
    assert generate("This is some content.", set()) == []


def test_no_match():
    assert generate("This document is about Python programming.", {"java"}) == []


def test_multiple_query_terms():
    content = (
        "Java and Python are both popular programming languages. "
        "Many developers use Java for enterprise applications."
    )
    snippets = generate(content, {"java", "python"}, context_chars=100, max_snippets=2)
    assert snippets
    t = snippets[0].text.lower()
    assert "java" in t or "python" in t


def test_highlight_spans_present():
    content = (
        "This is a long document about Java programming. "
        "Java is used everywhere. Let's talk more about Java."
    )
    snippets = generate(content, {"java"})
    assert snippets and snippets[0].highlights
    # highlighted region of the plain text is exactly the term
    s, e = snippets[0].highlights[0]
    assert plain(snippets[0].text)[s:e].lower() == "java"


def test_custom_context_length():
    content = "Java is a programming language. " + "a " * 50 + "Java is popular."
    short = generate(content, {"java"}, context_chars=20)
    long_ = generate(content, {"java"}, context_chars=100)
    assert short and long_
    assert len(plain(short[0].text)) < len(plain(long_[0].text))


def test_cjk_content():
    content = "这是一个关于搜索引擎的文档。搜索引擎很重要。这是一个测试文档。"
    snippets = generate(content, {"搜索"})
    assert snippets and "搜索" in snippets[0].text


def test_line_number():
    content = "Line 1\nLine 2\nLine 3 with Java\nLine 4"
    snippets = generate(content, {"java"})
    assert snippets and snippets[0].line_number == 3


def test_windows_ranked_by_hit_density():
    # a dense cluster of hits must outrank an isolated earlier hit
    content = "java " + "z " * 150 + " java java java " + "z " * 150
    snippets = generate(content, {"java"}, context_chars=10, max_snippets=2)
    assert len(snippets) == 2
    assert plain(snippets[0].text).count("java") == 3


def test_ansi_highlighting_applied():
    snippets = generate("say java now", {"java"})
    assert ANSI_HIGHLIGHT + "java" + ANSI_RESET in snippets[0].text
