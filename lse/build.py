"""The distributed index build — four declarative stages, each an idempotent
parquet snapshot commit (the Spark-native analog of the reference's
WAL + atomic segments.gen protocol, docs/PROJECT_SPEC.md:222-239: a stage
directory with _SUCCESS is a committed checkpoint; resume skips it).

Stage graph (each arrow a Catalyst-planned job):

  source(repo,path,commit,lang,content)
    └─ stage "docs"      assign doc_id + sha256 + metadata        (narrow)
    └─ stage "term_doc"  tokenize + PER-DOC tf/positions pre-agg  (narrow!)
    └─ stage "stats"     N, avgdl                                 (tiny agg)
    └─ stage "doc_stats" per-doc token_count + metadata           (1 shuffle)
    └─ stage "postings"  groupBy(term, bucket) → posting AND
                         position shards co-encoded in one pass   (1 shuffle)
    └─ stage "manifest"  per-file lineage rows + sha256

Skew handling (explicit, per the scale contract): postings are sharded over
fixed GLOBAL doc-id-range buckets — ``bucket = doc_id >> (63-log2 B)`` for
hash ids. A stopword-like term with df→N is split across all B buckets, so
no single reduce task ever assembles a full hot posting list (the reference's
single-machine merge, docs/PROJECT_SPEC.md:384-398, has exactly that
bottleneck). Buckets are aligned across terms, which also gives the query
side an embarrassingly parallel document-at-a-time WAND partitioning.
The tokenizer UDF additionally pre-aggregates (term, doc) tf inside the map
task (Arrow batch), so the shuffle moves one row per (term, doc, bucket) —
never one row per token occurrence.

Tiered segment merging (Constants.java:30-31) has no analog here: the single
groupBy(term, bucket) shuffle IS the global merge, executed once.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass
from typing import Iterable, List, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .codec import encode_postings
from .constants import DEFAULT_DOCTYPE, LANG_TO_DOCTYPE
from .ids import HASH_DOC_SPACE, assign_doc_ids
from .tokenizer import tokenize_batch

TERM_DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("term", T.StringType()),
        T.StructField("tf", T.IntegerType()),
        T.StructField("dl", T.IntegerType()),
        # packed little-endian int32 — one binary blob per (doc, term) row.
        # An array<int> column here cost ~2x the shuffle bytes (8B+ per
        # element in UnsafeRow) and dominated the term_doc persist's
        # serialization CPU (columnar cache compresses per element);
        # positions only ever flow INTO the flat position codec, which
        # wants the flat values anyway (np.frombuffer, zero parse).
        T.StructField("positions", T.BinaryType()),
    ]
)

# one row per (term, doc-range bucket): the compressed posting shard AND —
# when positions are on — the compressed position shard, co-written from ONE
# shuffle. Parquet column pruning means posting-only readers never touch
# pos_payload bytes; the positions "table" is a projection of this one.
POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("bucket", T.IntegerType()),
        T.StructField("df", T.LongType()),
        T.StructField("df_shard", T.LongType()),
        T.StructField("doc_lo", T.LongType()),
        T.StructField("doc_hi", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("block_last_doc", T.ArrayType(T.LongType())),
        T.StructField("block_offset", T.ArrayType(T.LongType())),
        T.StructField("block_max_raw", T.ArrayType(T.DoubleType())),
        T.StructField("max_raw", T.DoubleType()),
        T.StructField("pos_n_docs", T.LongType()),
        T.StructField("pos_payload", T.BinaryType()),
    ]
)


@dataclass
class BuildResult:
    index_dir: str
    build_id: str
    n_docs: int
    avgdl: float
    stages_run: List[str]
    stages_skipped: List[str]


def _stage_dir(index_dir: str, stage: str) -> str:
    return os.path.join(index_dir, stage)


def _stage_done(index_dir: str, stage: str) -> bool:
    d = _stage_dir(index_dir, stage)
    return os.path.exists(os.path.join(d, "_SUCCESS"))


def _bucket_col(doc_id_col, n_buckets: int, doc_space: int):
    if n_buckets & (n_buckets - 1):
        raise ValueError("n_buckets must be a power of two")
    if doc_space == HASH_DOC_SPACE:
        shift = 63 - int(np.log2(n_buckets))
        return F.shiftrightunsigned(doc_id_col, shift).cast("int")
    width = max(1, -(-doc_space // n_buckets))  # ceil div
    return F.floor(doc_id_col / F.lit(width)).cast("int")


def _doctype_expr():
    # ONE lower() + one literal-map probe per row. The previous
    # when-chain evaluated lower(lang) once per branch — 23 ICU
    # case-mapping calls per row, the single hottest frame in the docs
    # stage under thread-dump sampling (guide §7.3). Dict keys are
    # unique so first-match vs map-probe semantics are identical.
    pairs = []
    for lang, dt in LANG_TO_DOCTYPE.items():
        pairs.extend((F.lit(lang), F.lit(dt)))
    mapping = F.create_map(*pairs)
    return F.coalesce(mapping[F.lower(F.col("lang"))], F.lit(DEFAULT_DOCTYPE))


def tokenize_to_term_doc(docs: DataFrame, enable_stopwords: bool = True,
                         with_positions: bool = True) -> DataFrame:
    """(doc_id, content) → (doc_id, term, tf, dl, positions).

    The per-doc grouping happens INSIDE the tokenizer batch, where the doc
    is already local to the worker: one Arrow row out per DISTINCT
    (doc, term) with tf/dl/positions, fully vectorized (factorize → packed
    int64 keys → one stable argsort per batch — no per-doc Python). The
    alternative (posexplode + groupBy(doc_id, term)) SHUFFLES the entire
    token stream — every position, once — before the (term, bucket) encode
    shuffle moves it again; at 100 TB that doubles the build's largest data
    movement. This way the token stream crosses the wire exactly once.
    Positions are the emitted-token indices (reference T1–T5 + A1
    semantics; tokenizer drops never consume a position)."""

    def run(batches):
        # mapInArrow: the output batch is assembled COLUMNARLY — in
        # particular the positions list column comes straight from
        # (offsets, flat int32 values) via ListArray.from_arrays, which
        # replaces np.split's one tiny ndarray per (doc, term) row
        # (~1.4 s per million rows) and the per-row object conversion
        # back through pandas with two O(1)-per-batch buffer handoffs.
        import pyarrow as pa

        out_schema = pa.schema(
            [
                ("doc_id", pa.int64()),
                ("term", pa.string()),
                ("tf", pa.int32()),
                ("dl", pa.int32()),
                ("positions", pa.binary()),
            ]
        )
        for rb in batches:
            pdf = rb.to_pandas()
            token_lists = tokenize_batch(pdf["content"], enable_stopwords)
            n_docs = len(pdf)
            counts = np.fromiter(
                (len(t) for t in token_lists), dtype=np.int64, count=n_docs
            )
            total = int(counts.sum())
            if total == 0:
                yield pa.RecordBatch.from_pylist([], schema=out_schema)
                continue
            flat = np.empty(total, dtype=object)
            o = 0
            for toks in token_lists:
                flat[o : o + len(toks)] = toks
                o += len(toks)
            codes, uniq_terms = pd.factorize(flat)  # hash-based, no sort
            doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
            ends = np.cumsum(counts)
            pos_in_doc = (
                np.arange(total, dtype=np.int64)
                - np.repeat(ends - counts, counts)
            )
            key = (doc_idx << np.int64(32)) | codes.astype(np.int64)
            order = np.argsort(key, kind="stable")  # keeps pos ascending
            ks = key[order]
            first = np.ones(total, dtype=bool)
            first[1:] = ks[1:] != ks[:-1]
            starts = np.flatnonzero(first)
            tf = np.diff(np.append(starts, total)).astype(np.int32)
            gkey = ks[starts]
            g_doc = (gkey >> np.int64(32)).astype(np.int64)
            g_code = (gkey & np.int64(0xFFFFFFFF)).astype(np.int64)
            n_groups = starts.size
            if with_positions:
                # binary column straight from (byte offsets, packed int32
                # values) — the same two O(1)-per-batch buffer handoffs as
                # the former list<int32> layout, but downstream the blob
                # shuffles/caches as ONE value per row
                if total > (2**31 - 1) // 4:  # binary offsets are int32
                    raise ValueError(
                        "tokenize batch exceeds 2^29 positions; lower "
                        "spark.sql.execution.arrow.maxRecordsPerBatch"
                    )
                offsets = np.empty(n_groups + 1, dtype=np.int32)
                offsets[:-1] = starts
                offsets[-1] = total
                np.multiply(offsets, 4, out=offsets)
                vals = pos_in_doc[order].astype("<i4")
                positions_arr = pa.Array.from_buffers(
                    pa.binary(),
                    n_groups,
                    [None, pa.py_buffer(offsets.tobytes()),
                     pa.py_buffer(vals.tobytes())],
                )
            else:
                positions_arr = pa.nulls(n_groups, type=pa.binary())
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(
                        pdf["doc_id"].to_numpy(dtype=np.int64)[g_doc],
                        type=pa.int64(),
                    ),
                    pa.array(uniq_terms[g_code], type=pa.string()),
                    pa.array(tf, type=pa.int32()),
                    pa.array(counts[g_doc].astype(np.int32), type=pa.int32()),
                    positions_arr,
                ],
                schema=out_schema,
            )

    return docs.select("doc_id", "content").mapInArrow(run, TERM_DOC_SCHEMA)


def _encode_groups(avgdl: float, with_positions: bool):
    """Posting/position encode kernel (applyInPandas). The positions
    column (object array of int32 arrays) is flattened through ONE
    pyarrow list-array conversion — flat values + per-row lengths feed
    the codec directly (`encode_positions_flat`), replacing a python
    list() + per-row np.concatenate (2x kernel time at hot-term group
    sizes). An applyInArrow variant was measured byte-identical and 2.5x
    faster per group, but pyspark 4.1's grouped-Arrow input marshalling
    is ~2x slower than the pandas one, losing more than the kernel
    gained — so the pandas marshalling stays (see OPTIMIZATION_r06.md)."""

    def encode(key, pdf: pd.DataFrame) -> pd.DataFrame:
        from .codec import encode_positions_flat

        term, bucket = key
        ids_raw = pdf["doc_id"].to_numpy(dtype=np.int64)
        order = np.argsort(ids_raw)
        ids = ids_raw[order]
        enc = encode_postings(
            ids,
            pdf["tf"].to_numpy(dtype=np.int64)[order],
            pdf["dl"].to_numpy(dtype=np.int64)[order],
            avgdl=avgdl,
        )
        if with_positions:
            # positions arrive as packed-int32 blobs (tokenizer contract):
            # one join + frombuffer yields the flat stream the codec wants
            blobs = pdf["positions"].to_numpy()[order]
            counts = np.fromiter(
                (len(b) for b in blobs), dtype=np.int64, count=blobs.size
            ) >> 2
            flat = np.frombuffer(
                b"".join(blobs), dtype="<i4"
            ).astype(np.int64)
            pos_payload = encode_positions_flat(ids, counts, flat)
            pos_n = ids.size
        else:
            pos_payload = None
            pos_n = 0
        return pd.DataFrame(
            {
                "term": [term],
                "bucket": [bucket],
                "df": [int(pdf["df"].iloc[0])],
                "df_shard": [enc.df],
                "doc_lo": [int(ids[0])],
                "doc_hi": [int(ids[-1])],
                "payload": [enc.payload],
                "block_last_doc": [enc.block_last_doc.tolist()],
                "block_offset": [enc.block_offset.tolist()],
                "block_max_raw": [enc.block_max_raw.tolist()],
                "max_raw": [float(enc.block_max_raw.max())],
                "pos_n_docs": [pos_n],
                "pos_payload": [pos_payload],
            }
        )

    return encode


def build_index(
    spark: SparkSession,
    source: DataFrame,
    index_dir: str,
    *,
    doc_id_mode: str = "hash",
    precomputed_doc_id: bool = False,
    enable_stopwords: bool = True,
    with_positions: bool = True,
    n_buckets: int = 8,
    index_partitions: int = 16,
    store_content: bool = True,
    build_id: Optional[str] = None,
    resume: bool = True,
    stop_after_stage: Optional[str] = None,
    cache_term_doc: Optional[bool] = None,
    broadcast_vocab_limit: int = 4_000_000,
) -> Optional[BuildResult]:
    """Build (or resume) the full index under ``index_dir``.

    ``stop_after_stage`` simulates a crash after that stage's snapshot commit
    (for resume tests). Returns None when stopped early.
    """
    # Scale-adaptive codegen: below ~hundreds of MB of input, every build
    # stage's whole-stage-codegen class costs more to Janino-compile (all
    # sibling tasks block on the compile-cache KeyLock; thread-dump
    # verified) than interpreted execution costs to run. Above the
    # threshold, compiled code wins by far — so gate on the OPTIMIZER'S
    # size estimate of the source, not a constant tuned to either regime.
    codegen_prev: Optional[str] = None
    try:
        src_bytes = int(
            source._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        src_bytes = None
    small_input_limit = int(
        os.environ.get("LSE_CODEGEN_BYTES_MIN", str(256 * 1024 * 1024))
    )
    if src_bytes is not None and 0 <= src_bytes < small_input_limit:
        try:
            codegen_prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
            spark.conf.set("spark.sql.codegen.wholeStage", "false")
        except Exception:
            codegen_prev = None
    try:
        return _build_index_impl(
            spark, source, index_dir,
            doc_id_mode=doc_id_mode,
            precomputed_doc_id=precomputed_doc_id,
            enable_stopwords=enable_stopwords,
            with_positions=with_positions,
            n_buckets=n_buckets,
            index_partitions=index_partitions,
            store_content=store_content,
            build_id=build_id,
            resume=resume,
            stop_after_stage=stop_after_stage,
            cache_term_doc=cache_term_doc,
            broadcast_vocab_limit=broadcast_vocab_limit,
        )
    finally:
        if codegen_prev is not None:
            try:
                spark.conf.set("spark.sql.codegen.wholeStage", codegen_prev)
            except Exception:
                pass


def _build_index_impl(
    spark: SparkSession,
    source: DataFrame,
    index_dir: str,
    *,
    doc_id_mode: str,
    precomputed_doc_id: bool,
    enable_stopwords: bool,
    with_positions: bool,
    n_buckets: int,
    index_partitions: int,
    store_content: bool,
    build_id: Optional[str],
    resume: bool,
    stop_after_stage: Optional[str],
    cache_term_doc: Optional[bool],
    broadcast_vocab_limit: int,
) -> Optional[BuildResult]:
    os.makedirs(index_dir, exist_ok=True)
    build_id = build_id or uuid.uuid4().hex[:12]
    ran: List[str] = []
    skipped: List[str] = []
    stage_secs: dict = {}
    t0 = time.time()

    def committed(stage: str) -> bool:
        if resume and _stage_done(index_dir, stage):
            skipped.append(stage)
            return True
        return False

    def commit(stage: str, df: DataFrame, partition_cols=None, sort_cols=None,
               partitions: Optional[int] = None, how: str = "hash"):
        """Write a stage snapshot. ``how='range'`` gives min/max-stat file
        pruning on the partition columns (worth a sampling pass only for the
        query-facing tables); 'hash' avoids recomputing the input twice."""
        out = df
        if partition_cols:
            n = partitions or index_partitions
            if how == "range":
                out = out.repartitionByRange(n, *partition_cols)
            else:
                out = out.repartition(n, *partition_cols)
            if sort_cols:
                out = out.sortWithinPartitions(*sort_cols)
        out.write.mode("overwrite").parquet(_stage_dir(index_dir, stage))
        ran.append(stage)

    def stop_requested(stage: str) -> bool:
        return stop_after_stage == stage

    # Overlap mode (guide-style concurrent driver jobs): the docs snapshot
    # and doc_stats are OFF the build's critical path
    # (tokenize → stats → postings → manifest) when content is not stored —
    # run them on driver side threads so their jobs back-fill executor slots
    # freed by the critical-path stages' tails. ``stop_after_stage`` (crash /
    # resume tests) keeps the original strictly sequential stage order.
    overlap = stop_after_stage is None and os.environ.get(
        "LSE_BUILD_OVERLAP", "1"
    ) not in ("0", "false", "no")
    side_threads: List = []
    side_errors: List[BaseException] = []

    def _spawn(fn):
        if not overlap:
            fn()
            return None
        from pyspark import InheritableThread

        def wrapped():
            try:
                fn()
            except BaseException as e:  # surfaced at the next join point
                side_errors.append(e)

        th = InheritableThread(target=wrapped, daemon=True)
        th.start()
        side_threads.append(th)
        return th

    def _join_side():
        for th in side_threads:
            th.join()
        if side_errors:
            raise side_errors[0]

    # Pre-warm the Python worker pool first: the first Arrow/pandas stage of
    # a fresh session otherwise pays worker fork + numpy/pandas/tokenizer
    # import + ArrowEval codegen ON the critical path (measured ~2-4 s at 32
    # cores). One row per core, noop sink — constant cost, no data touched,
    # nothing persisted. Spawned before the first plan evaluation below so
    # session planning init overlaps it too.
    def _prewarm_python():
        spark.sparkContext.setJobDescription("build: python worker pre-warm")
        n = spark.sparkContext.defaultParallelism

        def _warm(batches):
            # import (and first-call-warm) exactly what the tokenize and
            # encode kernels use, so the real stages find hot workers
            import pandas as _pd

            from .tokenizer import tokenize_batch as _tb

            _tb(_pd.Series(["warm up the tokenizer"]), True)
            for b in batches:
                yield b

        (
            spark.range(0, n, 1, n)
            .repartition(n)  # exercise the shuffle write/read path too
            .mapInPandas(_warm, "id long")
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    # When the session-creation warmup (lse.session._warm_session) already
    # forked and warmed the worker pool, a second pre-warm is a pure
    # ~0.4 s job-scheduling tax — skip it.
    try:
        _session_warm = spark.conf.get("spark.lse.session.warmed", "0") == "1"
    except Exception:
        _session_warm = False
    if overlap and not _session_warm:
        _spawn(_prewarm_python)

    # ---------------------------------------------------------- stage: docs
    # a single-file / post-crossJoin source arrives with few partitions;
    # everything downstream of the scan would then run serially
    t_stage = time.perf_counter()
    if source.rdd.getNumPartitions() < index_partitions // 2:
        source = source.repartition(index_partitions)
    stage_secs["prep"] = round(time.perf_counter() - t_stage, 3)
    if precomputed_doc_id or "doc_id" in source.columns:
        docs_src = source
    else:
        docs_src = assign_doc_ids(source, mode=doc_id_mode)
    docs_src = docs_src.withColumn("content_sha256", F.sha2(F.col("content"), 256))
    docs_src = docs_src.withColumn(
        "size_bytes", F.octet_length("content").cast("long")
    )
    if "lang" not in docs_src.columns:
        docs_src = docs_src.withColumn("lang", F.lit(""))
    docs_src = docs_src.withColumn("doc_type", _doctype_expr())
    for col in ("repo", "path", "commit"):
        if col not in docs_src.columns:
            docs_src = docs_src.withColumn(col, F.lit(""))
    if "mtime" not in docs_src.columns:
        docs_src = docs_src.withColumn("mtime", F.lit(None).cast("timestamp"))
    def _docs_stage():
        t = time.perf_counter()
        if not committed("docs"):
            cols = [
                "doc_id", "repo", "path", "commit", "lang", "doc_type",
                "size_bytes", "mtime", "content_sha256",
            ]
            # like the reference (content lives with the source, only
            # metadata in the doc table, document/DocumentTable.java:17-32),
            # content is only materialized into the index when snippet
            # serving wants it local
            if store_content:
                cols.append("content")
            spark.sparkContext.setJobDescription("build: docs snapshot")
            commit("docs", docs_src.select(*cols),
                   partition_cols=["doc_id"], sort_cols=["doc_id"])
        stage_secs["docs"] = round(time.perf_counter() - t, 3)

    docs_thread = _spawn(_docs_stage)
    if stop_requested("docs"):
        return None
    if store_content and docs_thread is not None:
        # the tokenizer reads content back from the snapshot — wait for it
        docs_thread.join()
        if side_errors:
            raise side_errors[0]
    # the tokenizer needs content: from the snapshot when stored, else from
    # the (deterministically re-derivable) source frame
    docs_for_tokens = (
        spark.read.parquet(_stage_dir(index_dir, "docs"))
        if store_content
        else docs_src
    )

    doc_space = HASH_DOC_SPACE
    n_docs_precomputed = None
    space_box: dict = {}
    space_thread = None
    if precomputed_doc_id or "doc_id" in source.columns:
        # pre-write frame: identical doc_id values to the snapshot, so no
        # need to wait for the docs commit (column-pruned scan of doc_id).
        # max and count fused into ONE job — stats needs n_docs anyway —
        # and run on a side thread: the value is only needed once the
        # bucket column is attached, after the tokenize plan is defined.
        def _doc_space_job():
            t = time.perf_counter()
            row = docs_src.agg(
                F.max("doc_id").alias("m"), F.count("*").alias("n")
            ).first()
            space_box["doc_space"] = int(row["m"]) + 1
            space_box["n_docs"] = int(row["n"])
            stage_secs["doc_space"] = round(time.perf_counter() - t, 3)

        space_thread = _spawn(_doc_space_job)
    elif doc_id_mode == "dense":
        # dense assignment is expensive to re-derive — read the committed
        # snapshot (requires the docs write to have finished)
        t = time.perf_counter()
        if docs_thread is not None:
            docs_thread.join()
            if side_errors:
                raise side_errors[0]
        doc_space = (
            int(
                spark.read.parquet(_stage_dir(index_dir, "docs"))
                .agg(F.max("doc_id"))
                .first()[0]
            )
            + 1
        )
        stage_secs["doc_space"] = round(time.perf_counter() - t, 3)

    # --------------------------------------------------- pipeline: term_doc
    # The (doc, term) frame is the LARGEST intermediate — bigger than the
    # final index — so it is disk-backed CACHED, not snapshotted: a resumed
    # build recomputes it from the docs snapshot (cheap relative to writing
    # and re-reading it three times). All query-facing stages below remain
    # durable snapshots.
    term_doc = tokenize_to_term_doc(docs_for_tokens, enable_stopwords, with_positions)

    # The doc_space job result is needed only for n_docs (stats) and the
    # bucket column (postings) — NOT for the tokenize pass or the
    # vocabulary aggregate. Resolving it lazily lets the tokenize chain
    # launch immediately and overlap the doc_space scan instead of
    # serializing behind it (~2 s at bench scale). Idempotent.
    def _resolve_space():
        nonlocal doc_space, n_docs_precomputed
        if space_thread is not None:
            space_thread.join()
            if side_errors:
                raise side_errors[0]
        if space_box:
            doc_space = space_box["doc_space"]
            n_docs_precomputed = space_box["n_docs"]

    from pyspark import StorageLevel

    # term_doc has three consumers (stats agg, doc_stats, postings encode).
    # Caching trades 2 full recomputes (tokenize + explode + agg — ~100 s
    # per pass on a 5 GB corpus) for a block-manager resident set; the
    # 100k-file/5 GB target bench measures 256 s cached vs 392 s uncached
    # at 32 threads (BENCH_TARGET.json), and a fresh-process A/B at a 28 MB
    # corpus still favors the cache (10.9 s vs 13.6 s median build+queries:
    # uncached consumers each repay first-stage init, and the overlapped
    # side stages contend re-tokenizing). Default ON; disable per call or
    # via LSE_BUILD_CACHE_TERM_DOC=0 for memory-constrained drivers.
    if cache_term_doc is None:
        env = os.environ.get("LSE_BUILD_CACHE_TERM_DOC")
        cache_term_doc = env is None or env not in ("0", "false", "no")
    if cache_term_doc:
        term_doc = term_doc.persist(StorageLevel.MEMORY_AND_DISK)

    # --------------------------------------------------------- stage: stats
    # ONE vocabulary-sized aggregate serves three former full passes over
    # term_doc: the stats total-token sum, the postings df join input, and
    # the broadcast-regime vocabulary count. term_stats is df-capped
    # (|vocabulary| rows) so persisting it is cheap at any corpus scale —
    # it is kept even when term_doc itself is not cached (one tokenize
    # pass materializes it; every later consumer reads the tiny cache).
    term_stats = (
        term_doc.groupBy("term")
        .agg(F.count("*").alias("df"), F.sum("tf").alias("tokens"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _totals: List[tuple] = []  # [(total_tokens, n_terms)] computed at most once

    def _term_totals():
        if not _totals:
            row = term_stats.agg(
                F.sum("tokens").alias("t"), F.count("*").alias("n")
            ).first()
            _totals.append((int(row["t"] or 0), int(row["n"])))
        return _totals[0]

    # ----------------------------------------------------- stage: doc_stats
    # independent of stats/postings — it only needs the docs snapshot
    # (self-joins the docs thread) and term_doc. In overlap mode it is
    # spawned BEFORE the stats aggregate so its join/write chain runs
    # underneath stats+postings instead of gating the build tail; in
    # sequential (crash-test) mode it keeps its place after stats so the
    # committed-stage order matches the documented stage graph.
    def _doc_stats_stage():
        t = time.perf_counter()
        if not committed("doc_stats"):
            if docs_thread is not None:
                docs_thread.join()
                if side_errors:
                    return  # docs failed; _join_side re-raises
            spark.sparkContext.setJobDescription("build: doc_stats")
            docs = spark.read.parquet(_stage_dir(index_dir, "docs"))
            dl_per_doc = term_doc.groupBy("doc_id").agg(
                F.sum("tf").cast("long").alias("token_count")
            )
            doc_stats = (
                docs.drop("content")
                .join(dl_per_doc, "doc_id", "left")
                .fillna({"token_count": 0})
            )
            commit("doc_stats", doc_stats,
                   partition_cols=["doc_id"], sort_cols=["doc_id"])
        stage_secs["doc_stats"] = round(time.perf_counter() - t, 3)

    if overlap:
        _spawn(_doc_stats_stage)

    t_stage = time.perf_counter()
    stats = None
    if not committed("stats"):
        # totals FIRST: this launches the tokenize pass right away; the
        # doc_space side job finishes underneath it
        total_tokens, _ = _term_totals()
        _resolve_space()
        n_docs = (
            n_docs_precomputed
            if n_docs_precomputed is not None
            else docs_src.count()
        )
        avgdl = float(total_tokens) / n_docs if n_docs else 0.0
        stats = dict(
            build_id=build_id,
            n_docs=n_docs,
            total_tokens=int(total_tokens),
            avgdl=avgdl,
            # 2^63 (hash id space) overflows int64; -1 is its sentinel
            doc_space=doc_space if doc_space < HASH_DOC_SPACE else -1,
            n_buckets=n_buckets,
            enable_stopwords=enable_stopwords,
            with_positions=with_positions,
        )
        # the write is off the critical path — postings only needs the
        # in-memory avgdl; the snapshot lands before build returns
        stats_row = dict(stats)

        def _stats_write():
            spark.createDataFrame(pd.DataFrame([stats_row])).coalesce(
                1
            ).write.mode("overwrite").parquet(_stage_dir(index_dir, "stats"))
            ran.append("stats")

        _spawn(_stats_write)
    stage_secs["stats"] = round(time.perf_counter() - t_stage, 3)
    if stop_requested("stats"):
        return None
    if stats is None:  # resumed past a committed stats stage
        stats = spark.read.parquet(_stage_dir(index_dir, "stats")).first().asDict()

    if not overlap:
        _spawn(_doc_stats_stage)  # synchronous in sequential mode
    if stop_requested("doc_stats"):
        return None

    # ------------------------------------------------------ stage: postings
    # ONE groupBy(term, bucket) shuffle produces BOTH the posting shard and
    # (when enabled) the position shard of every (term, bucket) — the
    # reference writes .inv and .pos from the same in-memory segment
    # (docs/PROJECT_SPEC.md:104-145); co-writing them here halves the
    # build's shuffle volume, and parquet column pruning keeps posting-only
    # scans from ever reading position bytes.
    t_stage = time.perf_counter()
    if not committed("postings"):
        # block maxima MUST be encoded with the same avgdl the engine scores
        # with (engine floors avgdl at 1.0, QueryEngine.java:66-67); encoding
        # with an unfloored 0<avgdl<1 would understate the bound and let WAND
        # prune blocks containing true top-k docs
        score_avgdl = max(float(stats["avgdl"]), 1.0)
        # global df joins into the THIN (doc,term) frame BEFORE encoding —
        # the alternative (joining df onto the encoded output) would
        # shuffle every multi-KB blob by term. The join REGIME decides the
        # skew guard (ADVICE r3, medium):
        # * vocabulary ≤ broadcast_vocab_limit → an EXPLICIT broadcast
        #   hint (deterministic, not cost-estimator-dependent): term_doc
        #   keeps its distribution and the groupBy inserts its own
        #   hash(term,bucket) exchange — one shuffle, hot terms split.
        # * bigger vocabulary (the 10^12-file regime) → sort-merge join
        #   whose hash(term) exchange WOULD satisfy the groupBy's
        #   clustered(term,bucket) requirement as-is, collapsing every
        #   bucket of a hot/stopword term (df→N) into ONE task; the
        #   range repartition below re-splits them — one extra exchange,
        #   paid only in this regime, bounded by the doc-range bucketing
        #   contract (module docstring).
        # The vocab count and df both come from the shared term_stats
        # aggregate (computed once, vocabulary-sized, always cached).
        _, n_terms = _term_totals()
        _resolve_space()
        df_global = term_stats.select("term", "df")
        thin = term_doc.withColumn(
            "bucket", _bucket_col(F.col("doc_id"), n_buckets, doc_space)
        ).select("term", "bucket", "doc_id", "tf", "dl", "positions")
        # ONE exchange for the whole stage: range-partition the THIN rows
        # by (term, bucket). Range partitioning is clustered on its keys,
        # so the groupBy/applyInPandas encode reuses it (no second hash
        # exchange) AND the output is already laid out in contiguous term
        # ranges for the write. The multi-KB encoded payloads are
        # therefore written in place and NEVER cross an exchange
        # (previously they were re-shuffled by a repartitionByRange over
        # the encoded frame, with a persist to keep the kernel from
        # running twice — both now gone). Boundary sampling runs over
        # thin pre-encode rows, so range widths are df-weighted:
        # hot/stopword terms spread across more files than cold ones,
        # which keeps both encode tasks and file sizes balanced under
        # term skew.
        if n_terms <= broadcast_vocab_limit:
            # repartition BEFORE the broadcast join: a broadcast hash
            # join preserves the streamed side's partitioning, so the
            # groupBy still sees clustered(term, bucket) — and the range
            # boundary-sampling job no longer depends on the broadcast
            # exchange, so Spark runs them concurrently instead of
            # serializing sample → broadcast → shuffle.
            joined = thin.repartitionByRange(
                index_partitions, "term", "bucket"
            ).join(F.broadcast(df_global), "term")
        else:
            # big-vocab regime: the sort-merge join inserts its own
            # hash(term) exchange; re-split by (term, bucket) AFTER it so
            # hot terms do not collapse into one task (see note above)
            joined = thin.join(df_global, "term").repartitionByRange(
                index_partitions, "term", "bucket"
            )
        enc = joined.groupBy("term", "bucket").applyInPandas(
            _encode_groups(score_avgdl, with_positions), POSTINGS_SCHEMA
        )
        enc.sortWithinPartitions("term", "bucket").write.mode(
            "overwrite"
        ).parquet(_stage_dir(index_dir, "postings"))
        ran.append("postings")
    stage_secs["postings"] = round(time.perf_counter() - t_stage, 3)
    if stop_requested("postings"):
        return None

    # ------------------------------------------------------ stage: manifest
    # ONE distributed pass: each postings file is read as raw bytes exactly
    # once per executor task, hashed (sha256 — the Spark-native analog of
    # the reference's CRC32 footer, storage/StorageFileUtil.java:86-114),
    # and its lineage stats parsed out of the SAME in-memory buffer with
    # pyarrow. Previously this was two full reads of the postings dir (a
    # parquet lineage agg + a binaryFile sha scan) joined together.
    t_stage = time.perf_counter()
    if not committed("manifest"):
        import glob as _glob

        paths = sorted(
            os.path.abspath(p)
            for p in _glob.glob(
                os.path.join(_stage_dir(index_dir, "postings"), "*.parquet")
            )
        )
        bid = build_id

        def _manifest_batch(batches: Iterable[pd.DataFrame]):
            import hashlib

            import pyarrow as pa
            import pyarrow.compute as pc
            import pyarrow.parquet as pq

            for b in batches:
                out = []
                for p in b["file"]:
                    with open(p, "rb") as fh:
                        raw = fh.read()
                    sha = hashlib.sha256(raw).hexdigest()
                    tbl = pq.ParquetFile(pa.BufferReader(raw)).read(
                        columns=["term", "bucket", "df_shard", "payload"]
                    )
                    out.append(
                        dict(
                            file=p,
                            term_min=pc.min(tbl.column("term")).as_py(),
                            term_max=pc.max(tbl.column("term")).as_py(),
                            bucket_min=pc.min(tbl.column("bucket")).as_py(),
                            bucket_max=pc.max(tbl.column("bucket")).as_py(),
                            rows=tbl.num_rows,
                            doc_count=int(
                                pc.sum(tbl.column("df_shard")).as_py() or 0
                            ),
                            payload_bytes=int(
                                pc.sum(
                                    pc.binary_length(tbl.column("payload"))
                                ).as_py()
                                or 0
                            ),
                            build_id=bid,
                            stage="postings",
                            file_sha256=sha,
                            file_bytes=len(raw),
                        )
                    )
                yield pd.DataFrame(
                    out,
                    columns=[
                        "file", "term_min", "term_max", "bucket_min",
                        "bucket_max", "rows", "doc_count", "payload_bytes",
                        "build_id", "stage", "file_sha256", "file_bytes",
                    ],
                )

        manifest_schema = (
            "file string, term_min string, term_max string, "
            "bucket_min int, bucket_max int, rows long, doc_count long, "
            "payload_bytes long, build_id string, stage string, "
            "file_sha256 string, file_bytes long"
        )
        # Hashing is distributed only when the index is big enough for the
        # executor fan-out to beat its own fixed cost (createDataFrame +
        # Arrow handshakes + 2 jobs, ~0.5 s). Small indexes hash on the
        # driver with a thread pool — same rows, one tiny write job. The
        # gate is on actual on-disk bytes, so it scales itself.
        _local_limit = int(
            os.environ.get("LSE_MANIFEST_LOCAL_BYTES", str(64 * 1024 * 1024))
        )
        _total_bytes = sum(os.path.getsize(p) for p in paths)
        if paths and _total_bytes <= _local_limit:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(16, len(paths))) as pool:
                rows_out = [
                    r
                    for b in pool.map(
                        lambda p: _manifest_batch(
                            iter([pd.DataFrame({"file": [p]})])
                        ),
                        paths,
                    )
                    for pdf_out in b
                    for r in pdf_out.to_dict("records")
                    if r["rows"] > 0
                ]
            # Below the gate the WRITE is driver-local too: one pyarrow
            # parquet file + _SUCCESS, schema-typed exactly like the Spark
            # write (string/int32/int64), read back by spark.read.parquet
            # identically. The createDataFrame → repartition(1) → write
            # round-trip cost two jobs + an Arrow handshake (~0.4-0.6 s)
            # to move 32 driver-resident rows through the executors.
            import pyarrow as _pa
            import pyarrow.parquet as _pq

            _mdir = _stage_dir(index_dir, "manifest")
            os.makedirs(_mdir, exist_ok=True)
            for _old in _glob.glob(os.path.join(_mdir, "*")):
                os.remove(_old)
            _cols = [
                ("file", _pa.string()), ("term_min", _pa.string()),
                ("term_max", _pa.string()), ("bucket_min", _pa.int32()),
                ("bucket_max", _pa.int32()), ("rows", _pa.int64()),
                ("doc_count", _pa.int64()), ("payload_bytes", _pa.int64()),
                ("build_id", _pa.string()), ("stage", _pa.string()),
                ("file_sha256", _pa.string()), ("file_bytes", _pa.int64()),
            ]
            _tbl = _pa.table(
                {
                    name: _pa.array([r[name] for r in rows_out], type=typ)
                    for name, typ in _cols
                }
            )
            _pq.write_table(
                _tbl, os.path.join(_mdir, "part-00000.parquet")
            )
            with open(os.path.join(_mdir, "_SUCCESS"), "w"):
                pass
            ran.append("manifest")
            lineage = None
        elif paths:
            lineage = (
                spark.createDataFrame(
                    pd.DataFrame({"file": pd.Series(paths, dtype="object")})
                )
                .repartition(min(len(paths), 32))
                .mapInPandas(_manifest_batch, manifest_schema)
                # files with zero rows carry no lineage (parity with the old
                # parquet-agg path, which grouped by input_file_name)
                .filter(F.col("rows") > 0)
            )
        else:  # empty corpus — no postings part files
            lineage = spark.createDataFrame([], manifest_schema)
        # repartition(1), NOT coalesce(1): coalesce would pipeline the
        # Python kernel into a single task that pays the per-invocation
        # Arrow handshake once per upstream partition (measured 4.2 s vs
        # 0.5 s); the explicit shuffle boundary keeps the kernel parallel
        if lineage is not None:
            lineage.repartition(1).write.mode("overwrite").parquet(
                _stage_dir(index_dir, "manifest")
            )
            ran.append("manifest")
    stage_secs["manifest"] = round(time.perf_counter() - t_stage, 3)

    _join_side()
    if cache_term_doc:
        term_doc.unpersist()
    term_stats.unpersist()
    meta = dict(
        build_id=build_id,
        built_at_unix=int(t0),
        wall_secs=time.time() - t0,
        stages_run=ran,
        stages_skipped=skipped,
        stage_secs=stage_secs,
    )
    with open(os.path.join(index_dir, "build_meta.json"), "w") as fh:
        json.dump(meta, fh, indent=2)

    return BuildResult(
        index_dir=index_dir,
        build_id=build_id,
        n_docs=int(stats["n_docs"]),
        avgdl=float(stats["avgdl"]),
        stages_run=ran,
        stages_skipped=skipped,
    )


def _norm_file(col, uri_encoded: bool = False):
    """Normalize a file path column to the RAW filesystem path.

    ``input_file_name()`` returns a URI-ENCODED path (space → %20) while the
    binaryFile source's ``path`` is raw — joining them unfixed silently
    null-joins every file under an index_dir containing a space/percent.
    Pass ``uri_encoded=True`` for input_file_name(); the %XX escapes are
    decoded (with '+' pre-escaped so url_decode's form-encoding rule can't
    corrupt a literal plus)."""
    col = F.regexp_replace(col, "^file:/*", "/")
    if uri_encoded:
        col = F.url_decode(F.regexp_replace(col, r"\+", "%2B"))
    return col


def _file_shas(spark: SparkSession, index_dir: str) -> DataFrame:
    """(file, file_sha256, file_bytes) for every postings parquet file —
    computed ON EXECUTORS via the binaryFile source."""
    return (
        spark.read.format("binaryFile")
        .load(os.path.join(_stage_dir(index_dir, "postings"), "*.parquet"))
        .select(
            _norm_file(F.col("path")).alias("file"),
            F.sha2(F.col("content"), 256).alias("file_sha256"),
            F.col("length").alias("file_bytes"),
        )
    )


def verify_index(spark: SparkSession, index_dir: str) -> List[dict]:
    """Integrity check on load (reference: magic/version/CRC verified by
    every reader, storage/StorageFileUtil.java:101-114): recompute each
    postings file's sha256 and compare with the manifest. Returns a list of
    problem dicts (empty == intact): corrupted, missing, or unknown files.

    Hashing happens on EXECUTORS (Arrow batches of file PATHS, one raw read
    per file) rather than through the binaryFile source: a verifier must
    survive undecodable bytes, but Hadoop's LocalFileSystem throws a
    ChecksumException from its .crc sidecars before binaryFile can even
    return the corrupt payload."""
    import glob
    import hashlib
    from urllib.parse import unquote

    # manifest `file` paths are raw filesystem paths recorded at BUILD time
    # (_norm_file decodes the input_file_name URI escapes; unquote repairs
    # pre-fix manifests). An index directory may have been RENAMED or moved
    # since — compaction swaps `<dir>.compacting` into place, operators
    # rsync indexes between hosts — so comparison is by the path's
    # stage-relative BASENAME (every manifest entry lives flat under
    # postings/), while hashing uses the CURRENT on-disk location.
    postings_dir = _stage_dir(index_dir, "postings")
    manifest = {}
    for r in (
        spark.read.parquet(_stage_dir(index_dir, "manifest"))
        .select("file", "file_sha256")
        .collect()
    ):
        f = r["file"]
        if not os.path.exists(f):
            f = unquote(f)
        manifest[os.path.basename(f)] = r["file_sha256"]
    current = {
        os.path.basename(p): os.path.abspath(p)
        for p in glob.glob(os.path.join(postings_dir, "*.parquet"))
    }
    all_files = sorted(set(manifest) | set(current))
    if not all_files:
        return []

    def sha_batch(batches: Iterable[pd.DataFrame]):
        for b in batches:
            shas = []
            for p in b["file"]:
                try:
                    with open(p, "rb") as fh:
                        shas.append(hashlib.sha256(fh.read()).hexdigest())
                except OSError:
                    shas.append(None)
            yield pd.DataFrame({"file": b["file"], "actual_sha": shas})

    # hash every file that exists at its CURRENT location; names only in
    # the manifest hash nothing (missing)
    paths = [current[f] for f in all_files if f in current]
    actual_by_path = {}
    if paths:
        actual_by_path = {
            r["file"]: r["actual_sha"]
            for r in spark.createDataFrame(pd.DataFrame({"file": paths}))
            .repartition(min(len(paths), 32))
            .mapInPandas(sha_batch, "file string, actual_sha string")
            .collect()
        }
    problems = []
    for f in all_files:
        expected = manifest.get(f)
        got = actual_by_path.get(current.get(f))
        path = current.get(f, os.path.join(postings_dir, f))
        if expected is None:
            problems.append(dict(file=path, problem="not_in_manifest"))
        elif got is None:
            problems.append(dict(file=path, problem="missing"))
        elif expected != got:
            problems.append(dict(file=path, problem="corrupted"))
    return problems


def verify_content_sha(spark: SparkSession, source: DataFrame, index_dir: str) -> int:
    """Per-row content-sha256 invariant vs the source table (input_hint).
    Returns the number of mismatching/missing rows (0 == verified)."""
    docs = spark.read.parquet(_stage_dir(index_dir, "docs")).select(
        "repo", "path", "commit", F.col("content_sha256").alias("indexed_sha")
    )
    src = source.select(
        "repo", "path", "commit", F.sha2(F.col("content"), 256).alias("src_sha")
    )
    joined = src.join(docs, ["repo", "path", "commit"], "full_outer")
    return joined.filter(
        F.col("indexed_sha").isNull()
        | F.col("src_sha").isNull()
        | (F.col("indexed_sha") != F.col("src_sha"))
    ).count()
