"""Checkpoint/resume tests — a build interrupted after any stage's snapshot
commit must resume, skip the completed stages, and produce an index with
identical content and identical query results (mirrors the reference's
crash-recovery tests, IndexIntegrationTest.java:158-181, :213-250)."""

import os

import pytest
from pyspark.sql import functions as F

from lse.build import build_index
from lse.engine import SearchEngine
from lse.fixtures import make_repos_df


def index_signature(spark, index_dir):
    """Order-insensitive content signature of the queryable index."""
    post = spark.read.parquet(os.path.join(index_dir, "postings"))
    sig_post = (
        post.select(
            F.sha2(
                F.concat_ws(
                    "|", "term", "bucket", "df_shard", "df", F.hex("payload")
                ),
                256,
            ).alias("h")
        )
        .agg(F.sum(F.conv(F.substring("h", 1, 15), 16, 10).cast("decimal(38,0)")))
        .first()[0]
    )
    stats = spark.read.parquet(os.path.join(index_dir, "stats")).first()
    return (sig_post, stats["n_docs"], stats["avgdl"])


STAGES = ["docs", "stats", "doc_stats", "postings"]


@pytest.mark.parametrize("crash_after", ["docs", "stats", "postings"])
def test_resume_after_stage(spark, tmp_path, crash_after):
    source = make_repos_df(spark, n_docs=80, partitions=2)
    base = str(tmp_path / "full")
    res_full = build_index(spark, source, base, n_buckets=2, index_partitions=2)
    assert res_full is not None

    crashed = str(tmp_path / f"crash_{crash_after}")
    out = build_index(
        spark, source, crashed, n_buckets=2, index_partitions=2,
        stop_after_stage=crash_after,
    )
    assert out is None  # simulated crash
    done = {s for s in STAGES if os.path.exists(os.path.join(crashed, s, "_SUCCESS"))}
    assert crash_after in done and "manifest" not in " ".join(done)

    resumed = build_index(spark, source, crashed, n_buckets=2, index_partitions=2)
    assert resumed is not None
    idx = STAGES.index(crash_after)
    assert set(STAGES[: idx + 1]).issubset(set(resumed.stages_skipped))
    assert not set(resumed.stages_run) & set(STAGES[: idx + 1])

    assert index_signature(spark, crashed) == index_signature(spark, base)

    e1 = SearchEngine(spark, base)
    e2 = SearchEngine(spark, crashed)
    for q in ["java", "java AND programming", '"distributed system"', "config*"]:
        r1, t1 = e1.search_result(q, 10)
        r2, t2 = e2.search_result(q, 10)
        assert r1 == r2 and t1 == t2


def test_full_rebuild_is_noop_when_complete(spark, tmp_path):
    source = make_repos_df(spark, n_docs=40, partitions=2)
    d = str(tmp_path / "idx")
    first = build_index(spark, source, d, n_buckets=2, index_partitions=2)
    again = build_index(spark, source, d, n_buckets=2, index_partitions=2)
    assert set(again.stages_skipped) >= {"docs", "stats", "doc_stats", "postings", "manifest"}
    assert again.stages_run == []
    assert first.n_docs == again.n_docs
