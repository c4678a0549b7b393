"""Spark index-build tests: stage artifacts, invariants, sha256 lineage."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from lse.build import build_index, verify_content_sha
from lse.codec import decode_postings
from lse.fixtures import make_repos_df, make_repos_pdf
from lse.oracle import OracleIndex


def test_stage_artifacts_exist(spark, fixture_index):
    index_dir, _ = fixture_index
    for stage in ("docs", "stats", "doc_stats", "postings", "manifest"):
        assert os.path.exists(os.path.join(index_dir, stage, "_SUCCESS")), stage


def test_stats(spark, fixture_index):
    index_dir, docs_pdf = fixture_index
    stats = spark.read.parquet(os.path.join(index_dir, "stats")).first().asDict()
    assert stats["n_docs"] == 150
    oracle = OracleIndex(docs_pdf)
    assert stats["avgdl"] == pytest.approx(oracle.avgdl, rel=1e-12)


def test_doc_ids_unique_and_stable(spark, fixture_index):
    index_dir, docs_pdf = fixture_index
    assert docs_pdf["doc_id"].is_unique
    # hash ids are a pure function of (repo, path, commit)
    dupe = spark.read.parquet(os.path.join(index_dir, "docs")).select(
        "repo", "path", "commit", "doc_id"
    )
    re_hashed = dupe.withColumn(
        "doc_id2", F.shiftrightunsigned(F.xxhash64("repo", "path", "commit"), 1)
    )
    assert re_hashed.filter(F.col("doc_id") != F.col("doc_id2")).count() == 0


def test_postings_match_oracle_tf_df(spark, fixture_index):
    """Decode every posting shard and compare (term, doc_id, tf) plus df
    against the pandas oracle's index."""
    index_dir, docs_pdf = fixture_index
    oracle = OracleIndex(docs_pdf)
    post = spark.read.parquet(os.path.join(index_dir, "postings")).collect()
    got = {}
    df_global = {}
    for r in post:
        ids, tfs, dls = decode_postings(bytes(r["payload"]), r["df_shard"])
        for d, tf, dl in zip(ids, tfs, dls):
            got[(r["term"], int(d))] = (int(tf), int(dl))
        df_global[r["term"]] = r["df"]
        # doc ids strictly increasing within a shard (PostingList.java:29-31)
        assert (np.diff(ids) > 0).all() or len(ids) <= 1
    want = {}
    for term, plist in oracle.postings.items():
        for doc, tf in plist.items():
            want[(term, doc)] = (tf, oracle.token_count[doc])
    assert got == want
    for term, plist in oracle.postings.items():
        assert df_global[term] == len(plist), term


def test_bucket_sharding_spreads_hot_terms(spark, fixture_index):
    index_dir, _ = fixture_index
    post = spark.read.parquet(os.path.join(index_dir, "postings"))
    hot = (
        post.groupBy("term")
        .agg(F.sum("df_shard").alias("df"), F.countDistinct("bucket").alias("nb"))
        .orderBy(F.desc("df"))
        .first()
    )
    # the highest-df term must be split across all 4 buckets
    assert hot["nb"] == 4


def test_content_sha_invariant(spark, fixture_index):
    index_dir, _ = fixture_index
    source = make_repos_df(spark, n_docs=150)
    assert verify_content_sha(spark, source, index_dir) == 0


def test_positions_match_oracle(spark, fixture_index):
    from lse.codec import decode_positions_blob

    index_dir, docs_pdf = fixture_index
    oracle = OracleIndex(docs_pdf)
    # positions are co-written columns of the postings table
    pos_rows = (
        spark.read.parquet(os.path.join(index_dir, "postings"))
        .selectExpr("term", "pos_n_docs AS n_docs", "pos_payload AS payload")
        .collect()
    )
    got = {}
    for r in pos_rows:
        ids, plists = decode_positions_blob(bytes(r["payload"]), r["n_docs"])
        for d, p in zip(ids, plists):
            got[(r["term"], int(d))] = p.tolist()
    want = {
        (term, doc): plist
        for term, docs in oracle.positions.items()
        for doc, plist in docs.items()
    }
    assert got == want


def test_manifest_lineage(spark, fixture_index):
    index_dir, docs_pdf = fixture_index
    man = spark.read.parquet(os.path.join(index_dir, "manifest"))
    rows = man.collect()
    assert rows, "manifest must not be empty"
    oracle = OracleIndex(docs_pdf)
    total_postings = sum(len(p) for p in oracle.postings.values())
    assert sum(r["doc_count"] for r in rows) == total_postings
    for r in rows:
        assert r["term_min"] <= r["term_max"]
        assert r["rows"] > 0


def test_zero_token_docs_kept(spark, tmp_path):
    import pandas as pd

    pdf = pd.DataFrame(
        [
            dict(repo="r", path="a.md", commit="c1", lang="md", content="real words here"),
            dict(repo="r", path="b.md", commit="c1", lang="md", content="!!! ,,,"),
        ]
    )
    index_dir = str(tmp_path / "idx0")
    build_index(spark, spark.createDataFrame(pdf), index_dir, n_buckets=2, index_partitions=2)
    ds = spark.read.parquet(os.path.join(index_dir, "doc_stats"))
    assert ds.count() == 2
    assert ds.filter(F.col("token_count") == 0).count() == 1
    stats = spark.read.parquet(os.path.join(index_dir, "stats")).first()
    assert stats["n_docs"] == 2
    assert stats["avgdl"] == pytest.approx(3 / 2)
