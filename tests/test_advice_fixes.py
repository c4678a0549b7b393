"""Regression tests for the round-1 advisor findings (ADVICE.md):

1. block-max bounds must be encoded with the floored avgdl the engine
   scores with — otherwise WAND prunes true top-k docs when 0 < avgdl < 1;
2. the vectorized tokenizer fast path must split on the ORIGINAL text
   (U+212A KELVIN SIGN etc. must not merge adjacent tokens);
3. index_status must count docs across base + delta segments;
4. ngram_jaccard_pairs must compute set sizes over the same rare-shingle
   universe as the intersections when the df cap binds;
5. a blank phrase term ⇒ empty result in EVERY tier (reference
   matchesPhraseInDoc semantics).
"""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lse.build import build_index
from lse.engine import SearchEngine
from lse.oracle import OracleIndex
from lse.querydsl import Phrase
from lse.tokenizer import tokenize, tokenize_batch


# ------------------------------------------------------- 1. avgdl < 1 + WAND
def test_wand_exact_when_avgdl_below_one(spark, tmp_path):
    """Corpus where most docs are empty → 0 < avgdl < 1. The engine floors
    avgdl at 1.0 when scoring; the build must encode block maxima with the
    SAME floored value, or WAND returns the wrong top-1."""
    rows = [("r", f"p{i}", "", "txt", "") for i in range(18)]
    # two docs that both contain 'needle'; the higher-tf one must win
    rows.append(("r", "p18", "", "txt", "needle needle needle haystack"))
    rows.append(("r", "p19", "", "txt", "needle haystack"))
    src = spark.createDataFrame(rows, "repo string, path string, commit string, lang string, content string")
    d = str(tmp_path / "idx")
    build_index(spark, src, d, n_buckets=2, index_partitions=2)
    eng = SearchEngine(spark, d)
    assert 0.0 < float(eng.stats["avgdl"]) < 1.0

    wand = eng.search_topk("needle OR haystack", 5, strategy="wand")
    exact, _total = eng.search_result("needle OR haystack", 5, mode="spark")
    assert [d_ for d_, _ in wand] == [d_ for d_, _ in exact]
    for (_, ws), (_, es) in zip(wand, exact):
        assert ws == pytest.approx(es, abs=1e-9)


# -------------------------------------------- 2. tokenizer fast-path unicode
def test_tokenize_batch_unicode_case_fold_parity():
    texts = [
        "aKb plain words",     # KELVIN SIGN lowercases to ASCII 'k'
        "xİy other token",     # LATIN CAPITAL I WITH DOT ABOVE
        "normal Mixed CASE text",
    ]
    batch = tokenize_batch(pd.Series(texts), enable_stopwords=True)
    for text, got in zip(texts, batch):
        want = [t.term for t in tokenize(text, enable_stopwords=True)]
        assert list(got) == want, text


# ------------------------------------------- 3. index_status across segments
def test_index_status_counts_delta_segments(spark, tmp_path):
    from lse.fixtures import make_repos_df, make_repos_pdf
    from lse.maintenance import apply_incremental, index_status

    d = str(tmp_path / "idx")
    build_index(spark, make_repos_df(spark, n_docs=60, partitions=2), d,
                n_buckets=2, index_partitions=2)
    pdf = make_repos_pdf(60)
    pdf.loc[3, "content"] = "updated content for the status test"
    row = pdf.iloc[5].copy()
    row["path"] = "src/new/statusdoc.py"
    pdf2 = pd.concat(
        [pdf.drop(index=7).reset_index(drop=True), row.to_frame().T],
        ignore_index=True,
    )
    apply_incremental(spark, d, spark.createDataFrame(pdf2), index_partitions=2)

    st = index_status(spark, d)
    # base 60 + delta 2 (ADD + UPDATE re-add); 2 tombstoned (old UPDATE, DELETE)
    assert st["doc_count"] == 62
    assert st["tombstones"] == 2
    assert st["live_doc_count"] == 60
    # live_doc_count matches what the engine actually serves
    assert SearchEngine(spark, d).N == 60


# ----------------------------------------- 4. jaccard rare-universe sizing
def test_jaccard_cap_self_consistent(spark):
    from lse.dedup import ngram_jaccard_pairs

    # doc 0/1: identical except the last token; every doc shares the HOT
    # 3-gram "common shared shingle" so its df exceeds the cap
    hot = "common shared shingle"
    body = "alpha beta gamma delta epsilon zeta"
    rows = [
        (0, f"{hot} {body} one"),
        (1, f"{hot} {body} two"),
    ] + [(i, f"{hot} filler{i:02d}x fillery{i:02d} fillerz{i:02d}") for i in range(2, 12)]
    df = spark.createDataFrame(rows, "doc_id long, content string")

    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            df, n=3, threshold=0.01, max_shingle_df=3
        ).collect()
    }
    # rare-universe jaccard for (0,1): shingles of "<hot> <body> one" minus
    # any shingle with df > 3 — computed independently here
    def shingles(text):
        toks = [t for t in text.lower().split() if len(t) > 1]
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    all_sh = [shingles(r[1]) for r in rows]
    from collections import Counter

    df_count = Counter(s for sh in all_sh for s in sh)
    rare0 = {s for s in all_sh[0] if df_count[s] <= 3}
    rare1 = {s for s in all_sh[1] if df_count[s] <= 3}
    want = len(rare0 & rare1) / len(rare0 | rare1)
    assert got[(0, 1)] == pytest.approx(want, abs=1e-9)
    # self-consistency: every reported jaccard is a valid ratio
    assert all(0.0 < v <= 1.0 for v in got.values())


# --------------------------------------------------- 5. blank phrase term
def test_blank_phrase_term_empty_everywhere(spark, fixture_index):
    index_dir, docs_pdf = fixture_index
    eng = SearchEngine(spark, index_dir)
    oracle = OracleIndex(docs_pdf)
    node = Phrase(("java", " "))
    assert eng.compile(node).count() == 0
    assert oracle.evaluate(node, eng.N, max(oracle.avgdl, 1.0)) == {}
    loc = eng.local
    loc._prefix_terms = {}
    loc.fetch_terms(["java"], [])
    positions = loc._positions_for(["java", " "])
    assert loc._eval(node, positions).ids.size == 0
