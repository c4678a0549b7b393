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

import json
import os
import re
from typing import Iterable, List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_KEY = ["repo", "path", "commit"]

MERGE_FACTOR = 10  # reference tiered-merge trigger (config/Constants.java:30-31)

# ---------------------------------------------------------------------------
# Delta-segment manifest — the segments.gen analog (docs/PROJECT_SPEC.md:
# 236-239). ``deltas/SEGMENTS.json`` is the single source of truth for which
# delta segments are active and for the monotonic generation counter; it is
# committed with an atomic ``os.replace`` so readers see either the old or
# the new segment set, never a partial one. When the manifest is absent
# (indexes written before it existed, or a fresh build with no deltas) the
# directory listing is the fallback — names parse as
# ``delta_<gen>[_L<level>]``; plain ``delta_<gen>`` is level 0.
# ---------------------------------------------------------------------------

_MANIFEST = "SEGMENTS.json"
_NAME_RE = re.compile(r"^delta_(\d+)(?:_L(\d+))?(?:\.diff)?$")


def _manifest_path(index_dir: str) -> str:
    return os.path.join(index_dir, "deltas", _MANIFEST)


def _read_manifest(index_dir: str) -> Optional[dict]:
    p = _manifest_path(index_dir)
    if not os.path.exists(p):
        return None
    with open(p, "r", encoding="utf-8") as f:
        return json.load(f)


def _write_manifest(index_dir: str, manifest: dict) -> None:
    """Atomic commit: write sibling tmp, fsync, os.replace (single syscall)."""
    p = _manifest_path(index_dir)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    tmp = p + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(manifest, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, p)


def _listdir_entries(index_dir: str) -> List[dict]:
    """Fallback (no manifest): parse active delta dirs from the listing."""
    deltas = os.path.join(index_dir, "deltas")
    if not os.path.isdir(deltas):
        return []
    out = []
    for d in sorted(os.listdir(deltas)):
        if d.endswith((".diff", ".merging", ".tmp")) or d == _MANIFEST:
            continue
        m = _NAME_RE.match(d)
        if m is None:
            continue
        out.append(
            dict(name=d, gen=int(m.group(1)), level=int(m.group(2) or 0))
        )
    return out


def _delta_entries(index_dir: str) -> List[dict]:
    man = _read_manifest(index_dir)
    if man is not None:
        return list(man.get("active", []))
    return _listdir_entries(index_dir)


def _next_gen(index_dir: str) -> int:
    """Monotonic generation counter. Generations salt delta doc ids
    (xxhash64(key, gen)), so a gen may NEVER be reused even after the
    segment that carried it is merged away — a reused gen would mint a new
    doc with the same id as a (possibly tombstoned) earlier doc. The
    manifest persists the counter; the fallback takes max(parsed gen)+1
    across segment dirs AND .diff snapshots so pre-manifest indexes keep
    counting from where they left off."""
    man = _read_manifest(index_dir)
    if man is not None:
        return int(man["next_gen"])
    deltas = os.path.join(index_dir, "deltas")
    top = 0
    if os.path.isdir(deltas):
        for d in os.listdir(deltas):
            m = _NAME_RE.match(d)
            if m:
                top = max(top, int(m.group(1)))
    return top + 1


def _register_delta(index_dir: str, name: str, gen: int, level: int = 0) -> None:
    """Commit a freshly built delta segment into the manifest (creating the
    manifest from the directory listing on first use)."""
    man = _read_manifest(index_dir)
    if man is None:
        man = dict(active=_listdir_entries(index_dir), next_gen=gen)
    active = [e for e in man.get("active", []) if e["name"] != name]
    active.append(dict(name=name, gen=int(gen), level=int(level)))
    _write_manifest(
        index_dir,
        dict(active=active, next_gen=max(int(man.get("next_gen", 1)), gen + 1)),
    )


def _resolve_delta_path(index_dir: str, name: str) -> str:
    """A manifest entry whose final rename hasn't landed yet (crash or racing
    reader between the manifest commit and the ``.merging`` → final rename)
    still resolves: the ``.merging`` directory holds the complete build."""
    p = os.path.join(index_dir, "deltas", name)
    if not os.path.isdir(p) and os.path.isdir(p + ".merging"):
        return p + ".merging"
    return p


def _segments(index_dir: str):
    return [index_dir] + [
        _resolve_delta_path(index_dir, e["name"])
        for e in sorted(_delta_entries(index_dir), key=lambda e: e["gen"])
    ]


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
    # live count via the anti-join, not doc_count - n_tomb: leveled delta
    # merges drop tombstoned docs from the merged segment while their
    # tombstone rows remain (harmless no-ops), so subtraction undercounts
    live_count = (
        _all_docs(spark, index_dir).count() if n_tomb else doc_count
    )
    return dict(
        doc_count=doc_count,
        live_doc_count=live_count,
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
    5. when ``auto_compact_segments`` (reference MERGE_FACTOR) same-level
       delta segments accrete, :func:`maybe_merge_deltas` merges ONLY those
       deltas into one next-level delta segment — the base index is never
       rewritten by the automatic trigger (pass ``None``/0 to disable; run
       :func:`compact` explicitly for a full single-segment rebuild).
    """
    from .build import build_index

    deltas_root = os.path.join(index_dir, "deltas")
    recover_deltas(index_dir)
    gen = _next_gen(index_dir)
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
        _register_delta(index_dir, os.path.basename(delta_dir), gen)
    ops = {r["op"]: r["n"] for r in diff.groupBy("op").agg(F.count("*").alias("n")).collect()}
    comp = maybe_merge_deltas(
        spark, index_dir, factor=auto_compact_segments, **build_opts
    )
    if delta_dir is not None and comp.get("merged") and not os.path.isdir(delta_dir):
        # the just-built delta was merged away in the same call — never hand
        # the caller a path that no longer exists
        delta_dir = None
    return dict(
        tombstoned=n_tombstoned,
        delta_docs=int(n_fresh),
        delta_dir=delta_dir,
        ops=ops,
        merged=bool(comp.get("merged")),
        compacted=False,
        segments=int(comp.get("segments", 0)),
    )


def recover_index_dir(index_dir: str, reap_tmp: bool = True) -> str:
    """Roll back a compaction swap interrupted between its two renames.

    States and actions (see :func:`compact` swap protocol):
    * ``index_dir`` present            → healthy; drop any stale ``.old`` /
      ``.compacting`` leftovers (a completed swap's cleanup, or an
      abandoned build) and return "ok". ``reap_tmp=False`` (the
      SearchEngine read path) leaves ``.compacting`` alone — a reader must
      not delete a concurrent writer's in-flight compact build; stale tmp
      dirs are reaped by the next writer-side compact instead.
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
        if reap_tmp:
            shutil.rmtree(tmp, ignore_errors=True)
        return "ok"
    if os.path.isdir(old):
        os.rename(old, base)
        shutil.rmtree(tmp, ignore_errors=True)
        return "restored_old"
    return "missing"


def recover_deltas(index_dir: str) -> dict:
    """WRITER-side recovery for the leveled delta-merge protocol. Called on
    entry to every mutating operation (apply_incremental, upsert_batch,
    merge_deltas) — never from the read path, because a racing reader must
    not reap a writer's in-flight ``.merging`` build or a fresh delta that
    hasn't been registered yet (single-writer assumption, as the reference's
    IndexWriter lock implies, docs/PROJECT_SPEC.md:236-239).

    * a manifest entry whose final dir is missing but whose ``.merging``
      build exists → finish the rename (crash between manifest commit and
      rename);
    * delta dirs (final-named or ``.merging``) NOT referenced by the
      manifest → reap (crash after manifest commit but before source-dir
      deletion, or an abandoned merge build). Only runs when a manifest
      exists: in listdir-fallback mode every dir is authoritative.
    """
    import shutil

    man = _read_manifest(index_dir)
    if man is None:
        return dict(renamed=0, reaped=0)
    deltas = os.path.join(index_dir, "deltas")
    active = {e["name"] for e in man.get("active", [])}
    renamed = reaped = 0
    for name in active:
        final = os.path.join(deltas, name)
        merging = final + ".merging"
        if not os.path.isdir(final) and os.path.isdir(merging):
            os.rename(merging, final)
            renamed += 1
    if os.path.isdir(deltas):
        for d in os.listdir(deltas):
            if d == _MANIFEST or d.endswith(".diff"):
                continue
            base = d[: -len(".merging")] if d.endswith(".merging") else d
            if base not in active:
                shutil.rmtree(os.path.join(deltas, d), ignore_errors=True)
                reaped += 1
    return dict(renamed=renamed, reaped=reaped)


def merge_deltas(
    spark: SparkSession,
    index_dir: str,
    entries: Sequence[dict],
    **build_opts,
) -> dict:
    """Merge the given delta segments into ONE next-level delta segment —
    the reference's tiered merge (config/Constants.java:30-31,
    docs/PROJECT_SPEC.md:384-398): ≥MERGE_FACTOR same-level segments fold
    into a single level+1 segment, so each indexed byte is rewritten
    O(log N) times over the index's life and the BASE index is never
    touched. Doc ids are kept (precomputed), tombstoned docs are dropped
    from the merged segment (their tombstone rows stay — a tombstone whose
    doc is absent is a no-op for the anti-join), and the new segment is a
    normal build_index segment, so block maxima / dictionary stats hold.

    Commit protocol (crash-safe via the SEGMENTS.json manifest):
      1. build completely into ``deltas/<new>.merging``;
      2. atomically replace the manifest (sources out, merged in) —
         THE commit point; readers resolve a still-``.merging`` name via
         :func:`_resolve_delta_path`;
      3. rename ``.merging`` → final;
      4. delete source dirs. A crash at any point is healed by
         :func:`recover_deltas` on the next writer entry.
    """
    import shutil

    from .build import build_index

    entries = sorted(entries, key=lambda e: e["gen"])
    names = [e["name"] for e in entries]
    level = max(int(e.get("level", 0)) for e in entries) + 1
    gen = max(int(e["gen"]) for e in entries)
    deltas_root = os.path.join(index_dir, "deltas")
    new_name = f"delta_{gen:04d}_L{level}"
    seg_dirs = [os.path.join(deltas_root, n) for n in names]

    docs = None
    for s in seg_dirs:
        d = spark.read.parquet(os.path.join(s, "docs"))
        docs = d if docs is None else docs.unionByName(d, allowMissingColumns=True)
    if "content" not in docs.columns:
        raise ValueError(
            "merge_deltas: delta segments were built without store_content — "
            "leveled merge needs the stored content to re-encode postings"
        )
    tomb_dir = os.path.join(index_dir, "tombstones")
    if os.path.exists(tomb_dir):
        tombs = spark.read.parquet(tomb_dir).select("doc_id").distinct()
        docs = docs.join(tombs, "doc_id", "left_anti")
    src = docs.select(
        "doc_id", *DOC_KEY, "lang", "content",
        *(["mtime"] if "mtime" in docs.columns else []),
    )
    n_live = src.count()

    man = _read_manifest(index_dir)
    if man is None:  # first merge on a pre-manifest index: import the listing
        man = dict(active=_listdir_entries(index_dir), next_gen=_next_gen(index_dir))
    survivors = [e for e in man["active"] if e["name"] not in set(names)]

    if n_live == 0:
        # every doc in these deltas is dead — drop them without a new segment
        _write_manifest(index_dir, dict(active=survivors, next_gen=man["next_gen"]))
        for s in seg_dirs:
            shutil.rmtree(s, ignore_errors=True)
        return dict(
            merged=True, new_segment=None, level=level,
            sources=names, live_docs=0,
        )

    stats = spark.read.parquet(os.path.join(index_dir, "stats")).first()
    merging = os.path.join(deltas_root, new_name + ".merging")
    shutil.rmtree(merging, ignore_errors=True)
    opts = dict(
        precomputed_doc_id=True,
        n_buckets=int(stats["n_buckets"]),
        enable_stopwords=bool(stats["enable_stopwords"]),
        with_positions=bool(stats["with_positions"]),
        store_content=True,
        resume=False,
    )
    opts.update(build_opts)
    build_index(spark, src, merging, **opts)

    survivors.append(dict(name=new_name, gen=gen, level=level))
    _write_manifest(index_dir, dict(active=survivors, next_gen=man["next_gen"]))
    os.rename(merging, os.path.join(deltas_root, new_name))
    for s in seg_dirs:
        shutil.rmtree(s, ignore_errors=True)
    return dict(
        merged=True, new_segment=new_name, level=level,
        sources=names, live_docs=int(n_live),
    )


def maybe_merge_deltas(
    spark: SparkSession,
    index_dir: str,
    factor: int = MERGE_FACTOR,
    **build_opts,
) -> dict:
    """Leveled auto-merge trigger (reference tiered policy): whenever any
    level holds ≥ ``factor`` delta segments, merge that level's segments
    into one level+1 segment; cascade until no level meets the threshold.
    Write amplification is O(log_factor N) per byte — the base index is
    never rewritten here (explicit :func:`compact` does that, reclaiming
    base tombstones too). Content-less delta segments can't re-encode, so
    the trigger declines with ``reason='no_content'`` rather than failing
    the ingest."""
    if factor is None or factor <= 0:
        return dict(
            merged=False, segments=len(_segments(index_dir)), reason="disabled"
        )
    recover_deltas(index_dir)
    merges = []
    while True:
        entries = _delta_entries(index_dir)
        by_level: dict = {}
        for e in entries:
            by_level.setdefault(int(e.get("level", 0)), []).append(e)
        level = next(
            (lv for lv in sorted(by_level) if len(by_level[lv]) >= factor), None
        )
        if level is None:
            break
        group = by_level[level]
        docs_cols = spark.read.parquet(
            os.path.join(
                _resolve_delta_path(index_dir, group[0]["name"]), "docs"
            )
        ).columns
        if "content" not in docs_cols:
            return dict(
                merged=bool(merges), merges=merges,
                segments=len(_segments(index_dir)), reason="no_content",
            )
        merges.append(merge_deltas(spark, index_dir, group, **build_opts))
    return dict(
        merged=bool(merges),
        merges=merges,
        segments=len(_segments(index_dir)),
        reason="below_threshold" if not merges else "merged",
    )


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
    compact entry and on every SearchEngine load) rolls that window back,
    so no crash point loses the index. Only a WARMED reader (tables pinned
    in the block manager via ``engine.warm()``, as
    test_warm_reader_serves_across_compact_swap exercises) keeps serving
    the pre-swap snapshot coherently — the final step deletes ``.old``, so
    an unwarmed engine opened before the swap hits FileNotFound on its
    next scan and must reload; a reader racing the rename window itself
    must retry via recover — the analog of the reference's segments.gen
    re-read (docs/PROJECT_SPEC.md:236-239).
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
    """FULL-compaction trigger: when the segment count (base + deltas)
    reaches ``max_segments``, run :func:`compact` — a complete
    single-segment rebuild that also reclaims tombstoned base docs. Since
    round 5 this is an EXPLICIT operator tool only; the automatic trigger
    inside ``apply_incremental`` / ``streaming.upsert_batch`` is
    :func:`maybe_merge_deltas` (the reference's leveled policy), which
    rewrites only delta bytes and never the base.

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
