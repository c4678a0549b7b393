"""Tokenizer golden tests — tuples lifted verbatim from the reference's
src/test/java/com/localengine/text/TokenizerTest.java:14-141."""

import pandas as pd
import pytest

from lse.tokenizer import Token, terms_only, tokenize, tokenize_batch, token_counts_batch


def check(text, expected, stop=True):
    assert tokenize(text, enable_stopwords=stop) == [Token(*e) for e in expected]


def test_english_simple():
    check("Hello world", [("hello", 0, 0, 5), ("world", 1, 6, 11)], stop=False)


def test_english_stopwords():
    check(
        "The quick brown fox",
        [("quick", 0, 4, 9), ("brown", 1, 10, 15), ("fox", 2, 16, 19)],
        stop=True,
    )


def test_english_offsets_and_short_token_drop():
    # TokenizerTest.java:41-48 — "A-1 bb, Ccc!": 'a' and '1' dropped (len<=1)
    check("A-1 bb, Ccc!", [("bb", 0, 4, 6), ("ccc", 1, 8, 11)], stop=False)


def test_bigram_chinese():
    check(
        "搜索引擎",
        [("搜索", 0, 0, 2), ("索引", 1, 1, 3), ("引擎", 2, 2, 4)],
        stop=False,
    )


def test_bigram_japanese():
    check(
        "こんにちは",
        [("こん", 0, 0, 2), ("んに", 1, 1, 3), ("にち", 2, 2, 4), ("ちは", 3, 3, 5)],
        stop=False,
    )


def test_bigram_isolated_single_cjk_chars():
    # "A中B文C" → isolated CJK chars emitted as singletons; ASCII singles dropped
    check("A中B文C", [("中", 0, 1, 2), ("文", 1, 3, 4)], stop=False)


def test_composite_mixed():
    check("Hello 世界", [("hello", 0, 0, 5), ("世界", 1, 6, 8)], stop=False)


def test_composite_global_positions():
    check(
        "Go 搜索 engine 引擎",
        [("go", 0, 0, 2), ("搜索", 1, 3, 5), ("engine", 2, 6, 12), ("引擎", 3, 13, 15)],
        stop=False,
    )


def test_composite_offsets_with_stopwords():
    check("The, A! 搜索-Engine", [("搜索", 0, 8, 10), ("engine", 1, 11, 17)], stop=True)


def test_composite_edge_cases():
    assert tokenize(None) == []
    assert tokenize("") == []
    assert tokenize("...,,,!!!") == []
    check(
        "123, 中文, 45",
        [("123", 0, 0, 3), ("中文", 1, 5, 7), ("45", 2, 9, 11)],
        stop=True,
    )


def test_positions_are_consecutive():
    toks = tokenize("the quick a brown fox is 搜索引擎 ok x yes", enable_stopwords=True)
    assert [t.position for t in toks] == list(range(len(toks)))


@pytest.mark.parametrize("stop", [True, False])
def test_batch_matches_scalar(stop):
    texts = pd.Series(
        [
            "Hello world",
            "The quick brown fox",
            "A-1 bb, Ccc!",
            "搜索引擎 with English words",
            "",
            None,
            "...,,,!!!",
            "123, 中文, 45",
            "public static void main(String[] args) { return 0; }",
        ]
    )
    batch = tokenize_batch(texts, enable_stopwords=stop)
    for text, got in zip(texts, batch):
        assert got == terms_only(text, enable_stopwords=stop)


def test_token_counts_batch():
    texts = pd.Series(["Hello world", "", "the is a"])
    assert list(token_counts_batch(texts)) == [2, 0, 0]
