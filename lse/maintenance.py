"""Index maintenance: status aggregates, incremental snapshot diff, deletes.

* index_status      — docCount/termCount/sizeBytes aggregates
                      (reference IndexStatus, cli/MainCommand.java:226-229)
* incremental_diff  — ADD/UPDATE/DELETE classification between the indexed
                      snapshot and a new source snapshot, as anti/semi joins
                      (reference incremental update collects files and diffs
                      mtime/size against the DocumentTable,
                      docs/IMPLEMENTATION_PROMPT.md:251-256; here the change
                      signal is content_sha256 per the input_hint invariant)
* delete_docs       — tombstone a set of doc ids; queries exclude them and
                      recompute live N/avgdl/df exactly as the reference's
                      live-doc filtering does (query/QueryEngine.java:435-443,
                      docs/PROJECT_SPEC.md:241-246). Tombstones append to a
                      small parquet table; a rebuild compacts them away.
"""

from __future__ import annotations

import os
from typing import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_KEY = ["repo", "path", "commit"]


def index_status(spark: SparkSession, index_dir: str) -> dict:
    stats = spark.read.parquet(os.path.join(index_dir, "stats")).first().asDict()
    post = spark.read.parquet(os.path.join(index_dir, "postings"))
    agg = post.agg(
        F.countDistinct("term").alias("term_count"),
        F.count("*").alias("posting_rows"),
        F.sum("df_shard").alias("postings_total"),
        F.sum(F.octet_length("payload")).alias("payload_bytes"),
    ).first()
    size_bytes = 0
    for root, _dirs, files in os.walk(index_dir):
        size_bytes += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    tomb_dir = os.path.join(index_dir, "tombstones")
    n_tomb = (
        spark.read.parquet(tomb_dir).count() if os.path.exists(tomb_dir) else 0
    )
    return dict(
        doc_count=int(stats["n_docs"]),
        live_doc_count=int(stats["n_docs"]) - n_tomb,
        tombstones=n_tomb,
        term_count=int(agg["term_count"]),
        posting_rows=int(agg["posting_rows"]),
        postings_total=int(agg["postings_total"]),
        payload_bytes=int(agg["payload_bytes"]),
        index_size_bytes=size_bytes,
        avgdl=float(stats["avgdl"]),
        n_buckets=int(stats["n_buckets"]),
        build_id=stats["build_id"],
    )


def incremental_diff(
    spark: SparkSession, index_dir: str, new_source: DataFrame
) -> DataFrame:
    """(op, repo, path, commit) with op ∈ {ADD, UPDATE, DELETE} comparing the
    indexed docs snapshot against a new source snapshot. Pure anti/semi/inner
    joins — Catalyst picks broadcast vs shuffle by size."""
    old = spark.read.parquet(os.path.join(index_dir, "docs")).select(
        *DOC_KEY, F.col("content_sha256").alias("old_sha")
    )
    new = new_source.select(
        *DOC_KEY, F.sha2(F.col("content"), 256).alias("new_sha")
    )
    added = new.join(old, DOC_KEY, "left_anti").select(
        F.lit("ADD").alias("op"), *DOC_KEY
    )
    deleted = old.join(new, DOC_KEY, "left_anti").select(
        F.lit("DELETE").alias("op"), *DOC_KEY
    )
    updated = (
        new.join(old, DOC_KEY, "inner")
        .filter(F.col("new_sha") != F.col("old_sha"))
        .select(F.lit("UPDATE").alias("op"), *DOC_KEY)
    )
    return added.unionByName(updated).unionByName(deleted)


def delete_docs(
    spark: SparkSession, index_dir: str, doc_ids: Sequence[int]
) -> int:
    """Append tombstones for the given doc ids. Returns count appended."""
    ids = sorted({int(d) for d in doc_ids})
    if not ids:
        return 0
    df = spark.createDataFrame([(d,) for d in ids], "doc_id long")
    df.coalesce(1).write.mode("append").parquet(
        os.path.join(index_dir, "tombstones")
    )
    return len(ids)


def delete_by_path(
    spark: SparkSession, index_dir: str, repo: str, path: str
) -> int:
    docs = spark.read.parquet(os.path.join(index_dir, "docs"))
    ids = [
        r["doc_id"]
        for r in docs.filter(
            (F.col("repo") == repo) & (F.col("path") == path)
        ).select("doc_id").collect()
    ]
    return delete_docs(spark, index_dir, ids)
