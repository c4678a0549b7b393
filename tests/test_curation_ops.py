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
