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

MERGE_FACTOR = 10  # reference tiered-merge trigger (config/Constants.java:30-31)


def _segments(index_dir: str):
    segs = [index_dir]
    deltas = os.path.join(index_dir, "deltas")
    if os.path.isdir(deltas):
        segs += [
            os.path.join(deltas, d)
            for d in sorted(os.listdir(deltas))
            if not d.endswith(".diff")
        ]
    return segs


def _all_docs(spark: SparkSession, index_dir: str) -> DataFrame:
    dfs = [
        spark.read.parquet(os.path.join(s, "docs")) for s in _segments(index_dir)
    ]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    # tombstoned docs are no longer part of the logical corpus
    tomb_dir = os.path.join(index_dir, "tombstones")
    if os.path.exists(tomb_dir):
        tombs = spark.read.parquet(tomb_dir).select("doc_id").distinct()
        out = out.join(tombs, "doc_id", "left_anti")
    return out


def index_status(spark: SparkSession, index_dir: str) -> dict:
    stats = spark.read.parquet(os.path.join(index_dir, "stats")).first().asDict()
    # aggregate across ALL segments (base + incremental deltas) — a
    # base-only count under-reports the logical corpus after any increment
    segs = _segments(index_dir)
    post = spark.read.parquet(os.path.join(segs[0], "postings"))
    doc_count = 0
    for s in segs:
        seg_stats = spark.read.parquet(os.path.join(s, "stats")).first()
        doc_count += int(seg_stats["n_docs"])
        if s != segs[0]:
            post = post.unionByName(
                spark.read.parquet(os.path.join(s, "postings")),
                allowMissingColumns=True,
            )
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
        doc_count=doc_count,
        live_doc_count=doc_count - n_tomb,
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
    old = _all_docs(spark, index_dir).select(
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


def apply_incremental(
    spark: SparkSession,
    index_dir: str,
    new_source: DataFrame,
    auto_compact_segments: int = MERGE_FACTOR,
    **build_opts,
) -> dict:
    """Incremental reindex (reference semantics: UPDATE = delete + re-add,
    docs/IMPLEMENTATION_PROMPT.md:251-256):

    1. diff the new source snapshot against the indexed docs;
    2. tombstone the old doc ids of DELETEd and UPDATEd files;
    3. build a DELTA SEGMENT over the ADDed + UPDATEd rows (its doc ids are
       generation-salted hashes so they can never collide with live base
       ids) under ``index_dir/deltas/delta_<gen>``;
    4. SearchEngine unions base + delta segments at load and recomputes live
       N/avgdl/df — queries then see exactly the new logical corpus;
    5. when the segment count reaches ``auto_compact_segments`` (reference
       MERGE_FACTOR), :func:`maybe_compact` merges everything back to one
       segment (pass ``None``/0 to disable).
    """
    from .build import build_index

    deltas_root = os.path.join(index_dir, "deltas")
    gen = 1
    if os.path.exists(deltas_root):
        gen = (
            len([d for d in os.listdir(deltas_root) if not d.endswith(".diff")]) + 1
        )
    # SNAPSHOT the diff before mutating anything it reads: tombstoning
    # changes _all_docs, and a lazily (re)computed diff would then see its
    # own effects and vanish. The parquet snapshot is also the crash-safe
    # record of what this increment is doing.
    diff_dir = os.path.join(deltas_root, f"delta_{gen:04d}.diff")
    incremental_diff(spark, index_dir, new_source).write.mode("overwrite").parquet(
        diff_dir
    )
    diff = spark.read.parquet(diff_dir)
    changed = diff.filter(F.col("op").isin("UPDATE", "DELETE")).select(*DOC_KEY)
    dead_ids = [
        r["doc_id"]
        for r in _all_docs(spark, index_dir)
        .join(changed, DOC_KEY, "left_semi")
        .select("doc_id")
        .collect()
    ]
    n_tombstoned = delete_docs(spark, index_dir, dead_ids)

    fresh_keys = diff.filter(F.col("op").isin("ADD", "UPDATE")).select(*DOC_KEY)
    fresh = new_source.join(fresh_keys, DOC_KEY, "left_semi")
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
        base_docs_cols = spark.read.parquet(os.path.join(index_dir, "docs")).columns
        opts = dict(
            precomputed_doc_id=True,
            n_buckets=int(stats["n_buckets"]),
            enable_stopwords=bool(stats["enable_stopwords"]),
            with_positions=bool(stats["with_positions"]),
            store_content="content" in base_docs_cols,
        )
        opts.update(build_opts)
        build_index(spark, fresh, delta_dir, **opts)
    ops = {r["op"]: r["n"] for r in diff.groupBy("op").agg(F.count("*").alias("n")).collect()}
    comp = maybe_compact(
        spark, index_dir, source=new_source,
        max_segments=auto_compact_segments, **build_opts,
    )
    return dict(
        tombstoned=n_tombstoned,
        delta_docs=int(n_fresh),
        delta_dir=delta_dir,
        ops=ops,
        compacted=bool(comp.get("compacted")),
        segments=int(comp.get("segments", 0)),
    )


def recover_index_dir(index_dir: str) -> str:
    """Roll back a compaction swap interrupted between its two renames.

    States and actions (see :func:`compact` swap protocol):
    * ``index_dir`` present            → healthy; drop any stale ``.old`` /
      ``.compacting`` leftovers (a completed swap's cleanup, or an
      abandoned build) and return "ok".
    * ``index_dir`` missing, ``.old`` present → crashed mid-swap; restore
      ``.old`` → ``index_dir`` (the complete pre-compaction index) and
      return "restored_old".
    * neither present → nothing to recover ("missing").
    """
    import shutil

    base = index_dir.rstrip("/")
    old = base + ".old"
    tmp = base + ".compacting"
    if os.path.isdir(base):
        shutil.rmtree(old, ignore_errors=True)
        shutil.rmtree(tmp, ignore_errors=True)
        return "ok"
    if os.path.isdir(old):
        os.rename(old, base)
        shutil.rmtree(tmp, ignore_errors=True)
        return "restored_old"
    return "missing"


def compact(
    spark: SparkSession,
    index_dir: str,
    source: DataFrame = None,
    **build_opts,
) -> dict:
    """Merge base + delta segments + tombstones into ONE fresh segment —
    the operational analog of the reference's tiered segment merge /
    rebuild compaction (docs/PROJECT_SPEC.md:384-398): after many
    incremental updates or streaming micro-batches, queries union N
    segments and filter tombstones; compaction restores the single-segment
    fast path and reclaims dead postings.

    Content comes from the stored docs snapshots (``store_content=True``
    builds) or from ``source`` (the current upstream table) for
    content-less indexes. Existing doc_ids are KEPT (precomputed), so
    result doc ids are stable across compaction.

    Swap protocol (crash-safe, NOT single-syscall atomic): build into
    ``<index_dir>.compacting``, then rename ``index_dir`` → ``.old``, then
    ``.compacting`` → ``index_dir``, then delete ``.old``. A crash between
    the two renames leaves ``.old`` holding the complete pre-compaction
    index with ``index_dir`` absent; :func:`recover_index_dir` (called on
    compact entry and on SearchEngine load) rolls that window back, so no
    crash point loses the index. Readers that opened the old snapshot
    before the swap keep serving it coherently (parquet files are
    immutable); a reader racing the rename window itself must retry via
    recover — the analog of the reference's segments.gen re-read
    (docs/PROJECT_SPEC.md:236-239).
    """
    import shutil

    from .build import build_index

    recover_index_dir(index_dir)
    live = _all_docs(spark, index_dir)
    stats = spark.read.parquet(os.path.join(index_dir, "stats")).first()
    if "content" in live.columns:
        src = live.select(
            "doc_id", *DOC_KEY, "lang", "content",
            *(["mtime"] if "mtime" in live.columns else []),
        )
    elif source is not None:
        src = source.join(
            live.select("doc_id", *DOC_KEY), DOC_KEY, "inner"
        )
    else:
        raise ValueError(
            "compact: index was built without store_content — pass the "
            "upstream source DataFrame"
        )
    n_live = src.count()
    n_segments = len(_segments(index_dir))
    tmp = index_dir.rstrip("/") + ".compacting"
    shutil.rmtree(tmp, ignore_errors=True)
    opts = dict(
        precomputed_doc_id=True,
        n_buckets=int(stats["n_buckets"]),
        enable_stopwords=bool(stats["enable_stopwords"]),
        with_positions=bool(stats["with_positions"]),
        store_content="content" in live.columns,
        resume=False,
    )
    opts.update(build_opts)
    # build_index's first stage snapshots src into tmp/docs; every later
    # stage reads that snapshot, so nothing references the old directories
    # once the build returns and the swap below is safe
    build_index(spark, src, tmp, **opts)
    old = index_dir.rstrip("/") + ".old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(index_dir, old)
    os.rename(tmp, index_dir)
    shutil.rmtree(old, ignore_errors=True)
    return dict(
        live_docs=int(n_live), segments_merged=n_segments, compacted=True
    )


def maybe_compact(
    spark: SparkSession,
    index_dir: str,
    source: DataFrame = None,
    max_segments: int = MERGE_FACTOR,
    **build_opts,
) -> dict:
    """Auto-compaction trigger — the operational analog of the reference's
    tiered merge policy (MERGE_FACTOR=10 same-level segments → merge,
    config/Constants.java:30-31; docs/PROJECT_SPEC.md:384-398): when the
    segment count (base + deltas) reaches ``max_segments``, run
    :func:`compact`; otherwise no-op. Called automatically by
    ``apply_incremental`` and ``streaming.upsert_batch`` so a long-running
    streaming index never accretes unbounded delta segments (and the
    per-query multi-segment overhead they carry) waiting for an operator.

    Content-less indexes (built with ``store_content=False``) need the
    upstream ``source`` to rebuild; when neither is available the trigger
    declines with ``reason='no_content'`` rather than failing the ingest.
    """
    n_segments = len(_segments(index_dir))
    if max_segments is None or max_segments <= 0 or n_segments < max_segments:
        return dict(compacted=False, segments=n_segments, reason="below_threshold")
    docs_cols = spark.read.parquet(os.path.join(index_dir, "docs")).columns
    if "content" not in docs_cols and source is None:
        return dict(compacted=False, segments=n_segments, reason="no_content")
    res = compact(spark, index_dir, source=source, **build_opts)
    res.update(segments=n_segments)
    return res


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
