"""Structured Streaming ingest: micro-batches → incremental index segments.

The reference indexes a static tree and applies incremental updates on
demand (docs/IMPLEMENTATION_PROMPT.md:251-256); the Spark-native analog of
"keep the index fresh as documents arrive" is a ``readStream`` source
driven through ``foreachBatch`` into the SAME segment machinery the batch
path uses (lse.maintenance): each micro-batch becomes tombstones for
superseded doc versions plus one delta segment, and ``SearchEngine`` unions
base + deltas at load with live N/avgdl/df.

Semantics per micro-batch (``upsert_batch``) — UPSERT, not snapshot-diff:
rows are ADDs/UPDATEs of their (repo, path, commit) key; keys absent from
the batch stay live (``maintenance.apply_incremental`` is the
full-snapshot diff where absence means DELETE — wrong for a stream that
delivers increments). Rows whose content sha256 already matches the live
index are SKIPPED, which makes the sink IDEMPOTENT: foreachBatch replays
after a crash (at-least-once delivery) converge to exactly-once EFFECTS
without any external transaction log — the streaming-sink contract Spark
asks a foreachBatch writer to provide.

Scale shape: every step is the batch build's own distributed plan (diff =
broadcast/shuffle anti-joins, delta build = the one-shuffle index build);
nothing collects to the driver except the tombstone id list (bounded by the
batch's UPDATE count).
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .maintenance import DOC_KEY, _all_docs, delete_docs


def upsert_batch(
    spark: SparkSession,
    index_dir: str,
    batch: DataFrame,
    auto_compact_segments: int = None,
    **build_opts,
) -> dict:
    """Apply one micro-batch as an upsert increment.

    * duplicate keys inside the batch collapse to one row (arbitrary-but-
      deterministic: max sha wins — a stream should not carry two versions
      of one (repo,path,commit) in one batch);
    * unchanged rows (same content sha as live) are skipped — replay-safe;
    * changed keys tombstone their old doc ids;
    * new + changed rows build delta segment ``deltas/delta_<gen>`` with
      generation-salted hash ids (collision-free vs live ids);
    * when ``auto_compact_segments`` (default: maintenance.MERGE_FACTOR,
      the reference's tiered-merge trigger) SAME-LEVEL delta segments
      accrete, maintenance.maybe_merge_deltas folds them into one
      next-level delta — write amplification O(log N) per byte and the
      BASE index is never rewritten by the stream; run maintenance.compact
      explicitly for a full single-segment rebuild. Merges keep doc ids,
      so replay idempotence (sha skip) is unaffected. Pass 0 to disable.

    Returns dict(tombstoned=…, delta_docs=…, delta_dir=…, skipped=…,
    merged=…, segments=…).
    """
    from .build import build_index
    from .maintenance import (
        MERGE_FACTOR,
        _next_gen,
        _register_delta,
        maybe_merge_deltas,
        recover_deltas,
    )

    if auto_compact_segments is None:
        auto_compact_segments = MERGE_FACTOR

    if "doc_id" in batch.columns:
        # ids are assigned by the index (base hash / generation-salted
        # delta), never taken from the stream — and a doc_id column would
        # collide with the live-docs join below
        batch = batch.drop("doc_id")

    deltas_root = os.path.join(index_dir, "deltas")
    recover_deltas(index_dir)
    gen = _next_gen(index_dir)
    batch = (
        batch.withColumn("__sha", F.sha2(F.col("content"), 256))
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy(*DOC_KEY).orderBy(F.col("__sha").desc())
            ),
        )
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    old = _all_docs(spark, index_dir).select(
        *DOC_KEY, F.col("content_sha256").alias("__old_sha"), "doc_id"
    )
    joined = batch.join(old, DOC_KEY, "left")
    unchanged = joined.filter(F.col("__sha") == F.col("__old_sha"))
    changed = joined.filter(
        F.col("__old_sha").isNotNull() & (F.col("__sha") != F.col("__old_sha"))
    )
    added = joined.filter(F.col("__old_sha").isNull())
    n_skipped = unchanged.count()
    dead_ids = [r["doc_id"] for r in changed.select("doc_id").collect()]
    n_tomb = delete_docs(spark, index_dir, dead_ids)
    fresh = added.unionByName(changed).drop("__sha", "__old_sha", "doc_id")
    n_fresh = fresh.count()
    delta_dir = None
    if n_fresh:
        delta_dir = os.path.join(deltas_root, f"delta_{gen:04d}")
        stats = spark.read.parquet(os.path.join(index_dir, "stats")).first()
        fresh = fresh.withColumn(
            "doc_id",
            F.shiftrightunsigned(
                F.xxhash64("repo", "path", "commit", F.lit(gen)), 1
            ),
        )
        base_docs_cols = spark.read.parquet(
            os.path.join(index_dir, "docs")
        ).columns
        opts = dict(
            precomputed_doc_id=True,
            n_buckets=int(stats["n_buckets"]),
            enable_stopwords=bool(stats["enable_stopwords"]),
            with_positions=bool(stats["with_positions"]),
            store_content="content" in base_docs_cols,
        )
        opts.update(build_opts)
        build_index(spark, fresh, delta_dir, **opts)
        _register_delta(index_dir, os.path.basename(delta_dir), gen)
    comp = maybe_merge_deltas(
        spark, index_dir, factor=auto_compact_segments, **build_opts
    )
    if delta_dir is not None and comp.get("merged") and not os.path.isdir(delta_dir):
        delta_dir = None  # merged away in this same call — path is gone
    return dict(
        tombstoned=n_tomb,
        delta_docs=int(n_fresh),
        delta_dir=delta_dir,
        skipped=int(n_skipped),
        merged=bool(comp.get("merged")),
        compacted=False,
        segments=int(comp.get("segments", 0)),
    )


def stream_index(
    spark: SparkSession,
    stream_df: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
    processing_time: Optional[str] = None,
    **build_opts,
):
    """Drive a streaming source of (repo, path, commit, lang, content) rows
    into the index: the FIRST micro-batch bootstraps the base index when
    none exists; every further batch applies :func:`upsert_batch`.

    ``trigger_once=True`` (availableNow) drains everything pending then
    stops — the batch-backfill mode; pass ``processing_time='10 seconds'``
    for a continuous micro-batch cadence. Returns the StreamingQuery."""
    from .build import build_index

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if not os.path.exists(os.path.join(index_dir, "stats")):
            build_index(spark, batch_df, index_dir, **build_opts)
        else:
            upsert_batch(spark, index_dir, batch_df, **build_opts)

    writer = stream_df.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    elif trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
