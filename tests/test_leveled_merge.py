"""Leveled delta compaction (reference tiered merge policy:
MERGE_FACTOR same-level segments -> one level+1 segment,
config/Constants.java:30-31, docs/PROJECT_SPEC.md:384-398).

Pins the round-5 guarantees:
* 30+ micro-batches NEVER touch a base parquet byte — only explicit
  compact rewrites the base;
* bytes written are O(delta_bytes * levels), not O(base * batches/10);
* the SEGMENTS.json manifest commit is crash-safe at every step of the
  merge protocol (recover_deltas heals, readers resolve mid-swap);
* generation numbers are monotonic across merges (a reused gen would
  re-mint old doc-id salts — the latent hazard the manifest counter fixes);
* tombstoned delta docs are dropped by the merge and index_status stays
  exact.
"""

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from lse.build import build_index
from lse.engine import SearchEngine
from lse.fixtures import make_repos_df
from lse.maintenance import (
    _delta_entries,
    _next_gen,
    _read_manifest,
    _segments,
    compact,
    delete_docs,
    index_status,
    merge_deltas,
    recover_deltas,
)
from lse.streaming import upsert_batch

SCHEMA = (
    "repo string, path string, commit string, lang string, content string"
)


def _walk_sizes(root, skip_top=()):
    out = {}
    for r, _dirs, files in os.walk(root):
        rel = os.path.relpath(r, root)
        if rel != "." and rel.split(os.sep)[0] in skip_top:
            continue
        for f in files:
            p = os.path.join(r, f)
            st = os.stat(p)
            out[p] = (st.st_mtime_ns, st.st_size)
    return out


def _scores(spark, index_dir, queries, ids=True):
    """ids=True pins (doc_id, score) — for before/after states of the SAME
    index (merges keep doc ids). ids=False pins totals + the sorted score
    multiset — for cross-index parity where a streamed index's
    generation-salted doc ids legitimately differ from a batch build's."""
    eng = SearchEngine(spark, index_dir)
    out = {}
    for q in queries:
        hits, total = eng.search_result(q, 20)
        if ids:
            out[q] = (total, [(d, round(s, 9)) for d, s in hits])
        else:
            out[q] = (total, sorted(round(s, 9) for _d, s in hits))
    return out


def test_thirty_batches_never_touch_base(spark, tmp_path):
    """THE VERDICT round-5 done-criterion: 30+ micro-batches with
    auto-merge factor 3 (so the cascade reaches level 3) leave every base
    parquet file byte-identical, keep segment counts bounded by
    factor*levels, and keep bytes-written O(sum(delta bytes) * levels)."""
    src = make_repos_df(spark, n_docs=110, partitions=2).select(
        "repo", "path", "commit", "lang", "content"
    )
    rows = src.collect()
    index_dir = str(tmp_path / "idx")
    build_index(
        spark, spark.createDataFrame(rows[:14], SCHEMA), index_dir,
        n_buckets=2, index_partitions=2,
    )
    base_before = _walk_sizes(index_dir, skip_top=("deltas", "tombstones"))

    deltas_root = os.path.join(index_dir, "deltas")
    seen_bytes = {}  # every (path -> size) ever observed under deltas/
    seg_counts, levels_seen = [], set()
    for i in range(14, 110, 3):  # 32 micro-batches of 3 docs
        batch = spark.createDataFrame(rows[i : i + 3], SCHEMA)
        res = upsert_batch(
            spark, index_dir, batch,
            auto_compact_segments=3, n_buckets=2, index_partitions=2,
        )
        assert res["compacted"] is False
        for r, _d, files in os.walk(deltas_root):
            for f in files:
                p = os.path.join(r, f)
                seen_bytes.setdefault(p, os.path.getsize(p))
        seg_counts.append(len(_segments(index_dir)))
        levels_seen |= {e["level"] for e in _delta_entries(index_dir)}

    # base untouched across all 32 batches
    assert _walk_sizes(index_dir, skip_top=("deltas", "tombstones")) == base_before
    # the cascade actually ran multiple levels deep
    assert levels_seen >= {0, 1, 2}, levels_seen
    # segment count stays bounded: <= base + factor per active level + 1,
    # never the naive 33
    assert max(seg_counts) <= 1 + 3 * (max(levels_seen) + 1), seg_counts
    # bytes written across the whole run are a small multiple of the final
    # delta payload (each byte rewritten once per level), nowhere near
    # 32 batches' worth of full-index rewrites
    final_delta_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _d, fs in os.walk(deltas_root) for f in fs
    )
    total_written = sum(seen_bytes.values())
    base_bytes = sum(sz for _m, sz in base_before.values())
    n_merges_worth = total_written / max(final_delta_bytes, 1)
    assert n_merges_worth < 12, (total_written, final_delta_bytes)
    assert total_written < 10 * base_bytes + 20 * final_delta_bytes

    # parity with a batch build over the same corpus
    batch_dir = str(tmp_path / "batch_idx")
    build_index(
        spark, spark.createDataFrame(rows[:110], SCHEMA), batch_dir,
        n_buckets=2, index_partitions=2,
    )
    queries = ["spark", "java OR python", '"distributed system"', "-spark"]
    assert _scores(spark, index_dir, queries, ids=False) == _scores(
        spark, batch_dir, queries, ids=False
    )
    # explicit compact is the only base rewrite — and it works after merges
    streamed_before = _scores(spark, index_dir, queries)  # with doc ids
    assert compact(spark, index_dir)["compacted"]
    assert len(_segments(index_dir)) == 1
    assert _scores(spark, index_dir, queries) == streamed_before


@pytest.fixture()
def three_deltas(spark, tmp_path):
    """Base of 20 docs + three 5-doc delta segments."""
    src = make_repos_df(spark, n_docs=35, partitions=2).select(
        "repo", "path", "commit", "lang", "content"
    )
    rows = src.collect()
    d = str(tmp_path / "idx")
    build_index(
        spark, spark.createDataFrame(rows[:20], SCHEMA), d,
        n_buckets=2, index_partitions=2,
    )
    for i in range(20, 35, 5):
        upsert_batch(
            spark, d, spark.createDataFrame(rows[i : i + 5], SCHEMA),
            auto_compact_segments=0, n_buckets=2, index_partitions=2,
        )
    return d, rows


def test_merge_preserves_results_and_doc_ids(spark, three_deltas):
    d, _rows = three_deltas
    queries = ["spark", "java OR python", "-spark", '"distributed system"']
    before = _scores(spark, d, queries)
    res = merge_deltas(spark, d, _delta_entries(d))
    assert res["merged"] and res["live_docs"] == 15 and res["level"] == 1
    assert len(_delta_entries(d)) == 1
    assert _scores(spark, d, queries) == before


def test_merge_drops_tombstoned_docs_and_status_exact(spark, three_deltas):
    d, _rows = three_deltas
    # tombstone two docs that live in delta segments
    delta_docs = spark.read.parquet(
        os.path.join(_segments(d)[1], "docs")
    ).select("doc_id").limit(2).collect()
    victims = [r["doc_id"] for r in delta_docs]
    delete_docs(spark, d, victims)
    before = index_status(spark, d)
    assert before["live_doc_count"] == 33
    merge_deltas(spark, d, _delta_entries(d))
    merged_dir = _segments(d)[1]
    merged_ids = {
        r["doc_id"]
        for r in spark.read.parquet(
            os.path.join(merged_dir, "docs")
        ).select("doc_id").collect()
    }
    assert not (merged_ids & set(victims))  # dead docs reclaimed
    after = index_status(spark, d)
    # live count stays exact even though the tombstone rows remain
    assert after["live_doc_count"] == 33
    assert after["doc_count"] == 33  # merged segment stats exclude the dead


def test_gen_monotonic_across_merges(spark, three_deltas):
    """Generations salt delta doc ids; after a merge shrinks the dir count
    the next generation must keep counting upward, never reuse."""
    d, rows = three_deltas
    assert _next_gen(d) == 4
    merge_deltas(spark, d, _delta_entries(d))
    assert _next_gen(d) == 4  # merge consumes no gen
    res = upsert_batch(
        spark, d, spark.createDataFrame(rows[10:12], SCHEMA),
        auto_compact_segments=0, n_buckets=2, index_partitions=2,
    )
    assert res["skipped"] == 2  # replay of base rows — idempotent
    res = upsert_batch(
        spark, d,
        spark.createDataFrame(
            [("rz", "brand/new.py", "c9", "py", "fresh genprobe doc")], SCHEMA
        ),
        auto_compact_segments=0, n_buckets=2, index_partitions=2,
    )
    assert res["delta_dir"].endswith("delta_0004")


def test_crash_between_manifest_and_rename(spark, three_deltas):
    """Crash window: manifest committed but .merging not yet renamed.
    A READER resolves the .merging dir transparently; the next WRITER
    entry (recover_deltas) finishes the rename and reaps the sources."""
    d, _rows = three_deltas
    queries = ["spark", "java OR python"]
    before = _scores(spark, d, queries)
    merge_deltas(spark, d, _delta_entries(d))
    deltas_root = os.path.join(d, "deltas")
    [entry] = _delta_entries(d)
    final = os.path.join(deltas_root, entry["name"])
    os.rename(final, final + ".merging")  # simulate the crash state
    assert _scores(spark, d, queries) == before  # reader: via .merging
    healed = recover_deltas(d)
    assert healed["renamed"] == 1
    assert os.path.isdir(final) and not os.path.isdir(final + ".merging")
    assert _scores(spark, d, queries) == before


def test_crash_before_source_deletion_reaps(spark, three_deltas):
    """Crash window: manifest committed, merged dir final, but source
    delta dirs not yet deleted. They are UNREFERENCED; a reader ignores
    them (manifest is truth) and the next writer entry reaps them."""
    d, _rows = three_deltas
    queries = ["spark", "java OR python"]
    before = _scores(spark, d, queries)
    srcs = [_segments(d)[1], _segments(d)[2]]
    man_before = _read_manifest(d)
    merge_deltas(spark, d, _delta_entries(d))
    # resurrect two source dirs as the crash would leave them
    for s in srcs:
        name = os.path.basename(s)
        shutil.copytree(
            _segments(d)[1], os.path.join(d, "deltas", name + ".zombie")
        )
        os.rename(
            os.path.join(d, "deltas", name + ".zombie"),
            os.path.join(d, "deltas", name),
        )
    assert man_before is not None
    assert _scores(spark, d, queries) == before  # reader ignores zombies
    healed = recover_deltas(d)
    assert healed["reaped"] == 2
    assert len(_delta_entries(d)) == 1
    assert _scores(spark, d, queries) == before


def test_merge_all_docs_dead_drops_segments(spark, three_deltas):
    d, _rows = three_deltas
    all_delta_ids = []
    for seg in _segments(d)[1:]:
        all_delta_ids += [
            r["doc_id"]
            for r in spark.read.parquet(os.path.join(seg, "docs"))
            .select("doc_id").collect()
        ]
    delete_docs(spark, d, all_delta_ids)
    res = merge_deltas(spark, d, _delta_entries(d))
    assert res["merged"] and res["live_docs"] == 0 and res["new_segment"] is None
    assert len(_segments(d)) == 1
    st = index_status(spark, d)
    assert st["doc_count"] == 20 and st["live_doc_count"] == 20


def test_manifest_atomic_and_fallback_equivalent(spark, three_deltas):
    """Deleting SEGMENTS.json must leave a pre-manifest index the listdir
    fallback reads identically (backward compat), and _next_gen keeps
    counting from the parsed names."""
    d, _rows = three_deltas
    with_man = [os.path.basename(s) for s in _segments(d)[1:]]
    gen_with = _next_gen(d)
    os.remove(os.path.join(d, "deltas", "SEGMENTS.json"))
    assert [os.path.basename(s) for s in _segments(d)[1:]] == with_man
    assert _next_gen(d) == gen_with
