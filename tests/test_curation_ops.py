"""Dataset-curation operators (textops.add_split / redact_pii): leakage
safety, determinism, and redaction semantics."""

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, content string")


def test_split_deterministic_and_duplicate_consistent(spark):
    from lse.textops import add_split

    rows = [(i, f"document body {i % 40}") for i in range(400)]
    d = _docs(spark, rows)
    out1 = {r["doc_id"]: r["split"] for r in add_split(d).collect()}
    out2 = {r["doc_id"]: r["split"] for r in add_split(d).collect()}
    assert out1 == out2  # pure function of content
    # exact duplicates (i % 40 collapses content) MUST land on the same side
    by_content = {}
    for r in add_split(d).collect():
        key = r["doc_id"] % 40
        by_content.setdefault(key, set()).add(r["split"])
    assert all(len(v) == 1 for v in by_content.values())


def test_split_ratio_approximates_train_pct(spark):
    from lse.textops import add_split

    d = _docs(spark, [(i, f"unique text number {i}") for i in range(1000)])
    counts = {
        r["split"]: r["n"]
        for r in add_split(d, train_pct=90).groupBy("split").agg(
            F.count("*").alias("n")
        ).collect()
    }
    assert 850 <= counts["train"] <= 950  # md5 buckets ≈ uniform
    assert counts["train"] + counts.get("val", 0) == 1000
    # boundary cases
    all_train = add_split(d, train_pct=100).select("split").distinct().collect()
    assert [r["split"] for r in all_train] == ["train"]
    all_val = add_split(d, train_pct=0).select("split").distinct().collect()
    assert [r["split"] for r in all_val] == ["val"]


@pytest.mark.parametrize("text,expect", [
    ("mail me at jane.doe+x@sub.example.org today",
     "mail me at <EMAIL> today"),
    ("server 192.168.10.255 and 8.8.8.8", "server <IP> and <IP>"),
    ("ssn 123456789 card 1234567890123456", "ssn <NUMBER> card <NUMBER>"),
    ("short 12345678 stays", "short 12345678 stays"),  # <9 digits kept
    ("a@b.co near 1.2.3.4 and 999999999", "<EMAIL> near <IP> and <NUMBER>"),
    ("no pii here", "no pii here"),
])
def test_redact_pii_cases(spark, text, expect):
    from lse.textops import redact_pii

    out = redact_pii(_docs(spark, [(1, text)])).first()["redacted"]
    assert out == expect


def test_stratified_sample_rates_and_determinism(spark):
    from lse.textops import stratified_sample

    rows = [
        (i, f"body {i}", "en" if i % 2 == 0 else "fr") for i in range(2000)
    ]
    d = spark.createDataFrame(rows, "doc_id long, content string, lang string")
    out1 = sorted(
        r["doc_id"]
        for r in stratified_sample(d, {"en": 0.25}, strata_col="lang").collect()
    )
    out2 = sorted(
        r["doc_id"]
        for r in stratified_sample(d, {"en": 0.25}, strata_col="lang").collect()
    )
    assert out1 == out2  # pure function of content — no RNG state
    kept = stratified_sample(d, {"en": 0.25}, strata_col="lang").groupBy(
        "lang"
    ).count().collect()
    by_lang = {r["lang"]: r["count"] for r in kept}
    assert by_lang["fr"] == 1000  # default rate 1.0 keeps the whole stratum
    assert 150 <= by_lang["en"] <= 350  # ~25% of 1000, md5-uniform


def test_stratified_sample_duplicate_consistency(spark):
    # exact duplicate contents sample identically even across strata rates
    from lse.textops import stratified_sample

    rows = [(i, f"shared body {i % 30}", "en") for i in range(300)]
    d = spark.createDataFrame(rows, "doc_id long, content string, lang string")
    kept = stratified_sample(d, {"en": 0.5}, strata_col="lang").select(
        "doc_id", "content"
    ).collect()
    kept_contents = {r["content"] for r in kept}
    # every row whose content was kept once is kept every time
    assert len(kept) == sum(1 for i in range(300) if f"shared body {i % 30}" in kept_contents)


def test_stratified_sample_zero_and_full_rates(spark):
    from lse.textops import stratified_sample

    rows = [(i, f"b {i}", "zh") for i in range(50)]
    d = spark.createDataFrame(rows, "doc_id long, content string, lang string")
    assert stratified_sample(d, {"zh": 0.0}, strata_col="lang").count() == 0
    assert stratified_sample(d, {"zh": 1.0}, strata_col="lang").count() == 50
    assert stratified_sample(d, {}, strata_col="lang", default_rate=0.0).count() == 0


# ------------------------------------------------ corpus-statistics ops (r5)
_KW_CORPUS = [
    (1, "apple banana apple"),
    (2, "banana cherry"),
    (3, "cherry cherry dates cherry"),
]


def test_tfidf_keywords_hand_computed(spark):
    import math

    from lse.textops import tfidf_keywords

    out = tfidf_keywords(_docs(spark, _KW_CORPUS), k=2).collect()
    got = {(r["doc_id"], r["kw_rank"]): (r["term"], r["tf"], r["df"], r["tfidf"])
           for r in out}
    idf1 = math.log(4 / 2) + 1   # df=1 terms (apple, dates), N=3
    idf2 = math.log(4 / 3) + 1   # df=2 terms (banana, cherry)
    assert got[(1, 1)][0] == "apple"
    assert got[(1, 1)][3] == pytest.approx(round(2 * idf1, 6), abs=1e-9)
    assert got[(1, 2)][0] == "banana"
    # d2: banana and cherry tie exactly (tf=1, df=2) — term-asc break
    assert got[(2, 1)][0] == "banana" and got[(2, 2)][0] == "cherry"
    assert got[(3, 1)] == ("cherry", 3, 2, pytest.approx(round(3 * idf2, 6)))
    assert got[(3, 2)][0] == "dates"


def test_unigram_logprob_hand_computed(spark):
    import math

    from lse.textops import unigram_logprob

    out = {r["doc_id"]: r for r in
           unigram_logprob(_docs(spark, _KW_CORPUS)).collect()}
    # ctf: apple 2, banana 2, cherry 4, dates 1; total 9
    d2 = (math.log(2 / 9) + math.log(4 / 9)) / 2
    assert out[2]["n_tokens"] == 2
    assert out[2]["avg_logprob"] == pytest.approx(d2, abs=1e-6)
    d1 = (2 * math.log(2 / 9) + math.log(2 / 9)) / 3
    assert out[1]["avg_logprob"] == pytest.approx(d1, abs=1e-6)
    d3 = (3 * math.log(4 / 9) + math.log(1 / 9)) / 4
    assert out[3]["avg_logprob"] == pytest.approx(d3, abs=1e-6)


def test_repetition_stats_hand_computed(spark):
    from lse.textops import repetition_stats

    d = _docs(spark, [
        (1, "aa\nbb\naa\nccc\nccc"),   # dup lines: aa×2, ccc×2
        (2, "unique lines only\nsecond line"),
        (3, ""),                        # degenerate: one empty line
    ])
    out = {r["doc_id"]: r for r in repetition_stats(d).collect()}
    r1 = out[1]
    assert r1["n_lines"] == 5
    assert r1["dup_line_frac"] == pytest.approx(2 / 5)       # 5 slots, 3 distinct
    assert r1["dup_char_frac"] == pytest.approx(10 / 12)     # aa:4 + ccc:6 of 12
    assert r1["top_word_frac"] == pytest.approx(2 / 5)       # aa tf=2 of 5 toks
    r2 = out[2]
    assert r2["dup_line_frac"] == 0.0 and r2["dup_char_frac"] == 0.0
    assert r2["top_word_frac"] == pytest.approx(1 / 5)
    r3 = out[3]
    assert r3["n_lines"] == 1 and r3["dup_char_frac"] == 0.0
    assert r3["top_word_frac"] == 0.0


def test_decontaminate_hand_computed(spark):
    from lse.textops import decontaminate

    docs = _docs(spark, [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "quick brown fox jumps somewhere else entirely today"),
        (3, "completely unrelated content about spark engines"),
        (4, "brown fox jumps over fences and quick brown fox jumps again"),
    ])
    bench = _docs(spark, [(99, "a quick brown fox jumps testcase")])
    # bench 3-grams (len>1 toks): "quick brown fox", "brown fox jumps",
    # "fox jumps testcase"
    out = {r["doc_id"]: r for r in decontaminate(docs, bench, n=3).collect()}
    assert out[1]["n_hits"] == 2 and out[1]["contaminated"]
    assert out[2]["n_hits"] == 2 and out[2]["contaminated"]
    assert out[3]["n_hits"] == 0 and not out[3]["contaminated"]
    # doc 4 contains both grams (each counted once despite repetition)
    assert out[4]["n_hits"] == 2
    # every input doc id appears exactly once
    assert sorted(out) == [1, 2, 3, 4]


def test_decontaminate_broadcasts_benchmark(spark):
    from lse.textops import decontaminate

    docs = _docs(spark, [(i, f"alpha beta gamma {i}") for i in range(50)])
    bench = _docs(spark, [(0, "alpha beta gamma zero")])
    plan = decontaminate(docs, bench, n=2)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan[:2000]
    assert "EvalPython" not in plan


def test_decontaminate_shuffle_regime_above_limit(spark):
    """Above broadcast_gram_limit the benchmark gram set must NOT be
    broadcast (decontaminating against another corpus slice) — and the
    answers must be identical to the broadcast regime."""
    from lse.textops import decontaminate

    docs = _docs(spark, [(i, f"alpha beta gamma {i}") for i in range(20)])
    bench = _docs(spark, [(0, "alpha beta gamma zero"), (1, "delta eps zeta")])
    shuffled = decontaminate(docs, bench, n=2, broadcast_gram_limit=0)
    plan = shuffled._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan.split("Exchange hashpartitioning")[0] or True
    # the gram-probe join itself must be shuffle-based: no broadcast of
    # bench grams anywhere in the plan
    assert "BroadcastExchange" not in plan, plan[:2000]
    broad = decontaminate(docs, bench, n=2, broadcast_gram_limit=10_000)
    a = sorted((r["doc_id"], r["n_hits"], r["contaminated"]) for r in shuffled.collect())
    b = sorted((r["doc_id"], r["n_hits"], r["contaminated"]) for r in broad.collect())
    assert a == b
