"""Structured Streaming ingest (lse.streaming): a parquet file-source
stream drained through foreachBatch must leave an index whose query results
equal a batch build over the LATEST version of every doc, and the upsert
sink must be idempotent under micro-batch replay (at-least-once delivery →
exactly-once effects)."""

import os

import pytest
from pyspark.sql import functions as F

from lse.build import build_index
from lse.engine import SearchEngine
from lse.fixtures import make_repos_df
from lse.streaming import stream_index, upsert_batch

SCHEMA = (
    "repo string, path string, commit string, lang string, content string"
)


def _queries_equal(spark, dir_a, dir_b, queries):
    ea, eb = SearchEngine(spark, dir_a), SearchEngine(spark, dir_b)
    for q in queries:
        ha, ta = ea.search_result(q, 20)
        hb, tb = eb.search_result(q, 20)
        assert ta == tb, (q, ta, tb)
        assert [s for _, s in ha] == pytest.approx(
            [s for _, s in hb], abs=1e-9
        ), q


def test_stream_matches_batch_build(spark, tmp_path):
    src = make_repos_df(spark, n_docs=120, partitions=2).select(
        "repo", "path", "commit", "lang", "content"
    )
    rows = src.collect()
    src_dir = str(tmp_path / "incoming")
    os.makedirs(src_dir)
    # three arrival chunks, written as separate parquet files
    chunks = [rows[:40], rows[40:90], rows[90:]]
    for i, chunk in enumerate(chunks[:1]):
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.parquet(
            os.path.join(src_dir, f"chunk_{i}")
        )
    index_dir = str(tmp_path / "stream_idx")
    ck = str(tmp_path / "ck")

    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(src_dir + "/*")
    q = stream_index(
        spark, stream, index_dir, ck, n_buckets=2, index_partitions=2
    )
    q.awaitTermination(120)
    # drop the remaining chunks and drain again (new files → new batches)
    for i, chunk in enumerate(chunks[1:], start=1):
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.parquet(
            os.path.join(src_dir, f"chunk_{i}")
        )
    stream2 = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(src_dir + "/*")
    q2 = stream_index(
        spark, stream2, index_dir, ck, n_buckets=2, index_partitions=2
    )
    q2.awaitTermination(180)

    batch_dir = str(tmp_path / "batch_idx")
    build_index(spark, src, batch_dir, n_buckets=2, index_partitions=2)
    _queries_equal(
        spark, index_dir, batch_dir,
        ["java", "java AND programming", "python OR spark", "-java",
         '"machine learning"', "repo:org1/repo1 AND java"],
    )


def test_upsert_idempotent_and_updates(spark, tmp_path):
    base = make_repos_df(spark, n_docs=60, partitions=2).select(
        "repo", "path", "commit", "lang", "content"
    )
    index_dir = str(tmp_path / "idx")
    build_index(spark, base, index_dir, n_buckets=2, index_partitions=2)

    # replaying the SAME rows is a no-op (sha-match skip). NOTE: plain
    # limit() without order is nondeterministic across evaluations — pin
    # the subset so both upsert calls see identical rows.
    sub = base.orderBy("repo", "path", "commit").limit(25)
    res = upsert_batch(spark, index_dir, sub)
    assert res["tombstoned"] == 0 and res["delta_docs"] == 0
    assert res["skipped"] == 25 and res["delta_dir"] is None

    # an updated doc tombstones the old id and lands in a delta segment
    one = base.orderBy("repo", "path", "commit").limit(1)
    updated = one.withColumn(
        "content", F.concat(F.col("content"), F.lit(" zzzupdated token"))
    )
    res2 = upsert_batch(spark, index_dir, updated)
    assert res2["tombstoned"] == 1 and res2["delta_docs"] == 1
    eng = SearchEngine(spark, index_dir)
    hits, total = eng.search_result("zzzupdated", 5)
    assert total == 1
    # replaying the update is again a no-op
    res3 = upsert_batch(spark, index_dir, updated)
    assert res3["tombstoned"] == 0 and res3["delta_docs"] == 0
    assert res3["skipped"] == 1

    # a brand-new doc is an ADD
    new_doc = spark.createDataFrame(
        [("r9/new", "src/new.py", "c1", "py", "completely fresh streamed doc")],
        SCHEMA,
    )
    res4 = upsert_batch(spark, index_dir, new_doc)
    assert res4["delta_docs"] == 1 and res4["tombstoned"] == 0
    eng2 = SearchEngine(spark, index_dir)
    _h, total2 = eng2.search_result("streamed", 5)
    assert total2 == 1


def test_upsert_dedupes_batch_keys(spark, tmp_path):
    base = make_repos_df(spark, n_docs=20, partitions=1).select(
        "repo", "path", "commit", "lang", "content"
    )
    index_dir = str(tmp_path / "idx")
    build_index(spark, base, index_dir, n_buckets=2, index_partitions=2)
    dup = spark.createDataFrame(
        [
            ("rX", "a.py", "c", "py", "version alpha duplicatekey"),
            ("rX", "a.py", "c", "py", "version beta duplicatekey"),
        ],
        SCHEMA,
    )
    res = upsert_batch(spark, index_dir, dup)
    assert res["delta_docs"] == 1  # one key → one surviving version
    eng = SearchEngine(spark, index_dir)
    _h, total = eng.search_result("duplicatekey", 5)
    assert total == 1


def test_leveled_auto_merge_trigger(spark, tmp_path):
    """Reference tiered-merge policy (MERGE_FACTOR=10 SAME-LEVEL segments ->
    one level+1 segment, config/Constants.java:30-31,
    docs/PROJECT_SPEC.md:384-398): driving >10 micro-batches through
    upsert_batch must fire leveled delta merges at the threshold, NEVER
    rewrite the base index, keep the segment count bounded, and leave every
    query result identical to a batch build over the same corpus."""
    src = make_repos_df(spark, n_docs=130, partitions=2).select(
        "repo", "path", "commit", "lang", "content"
    )
    rows = src.collect()
    index_dir = str(tmp_path / "auto_idx")
    build_index(
        spark, spark.createDataFrame(rows[:10], SCHEMA), index_dir,
        n_buckets=4, index_partitions=4,
    )

    def base_files():
        """(path, mtime_ns, size) of every BASE parquet file (deltas and
        tombstones excluded) — leveled merges must leave all of it alone."""
        out = {}
        for root, dirs, files in os.walk(index_dir):
            rel = os.path.relpath(root, index_dir)
            if rel.split(os.sep)[0] in ("deltas", "tombstones"):
                continue
            for f in files:
                p = os.path.join(root, f)
                st = os.stat(p)
                out[p] = (st.st_mtime_ns, st.st_size)
        return out

    base_before = base_files()
    merges = []
    seg_counts = []
    from lse.maintenance import _delta_entries, _segments

    for i in range(10, 130, 10):  # 12 further micro-batches
        batch = spark.createDataFrame(rows[i : i + 10], SCHEMA)
        res = upsert_batch(
            spark, index_dir, batch, n_buckets=4, index_partitions=4
        )
        assert res["compacted"] is False  # auto path never full-compacts
        if res["merged"]:
            merges.append(res)
        seg_counts.append(len(_segments(index_dir)))
    # deltas merged at the threshold: 12 L0 deltas -> one L1 merge at #10,
    # leaving bounded segment counts throughout (never the naive 13)
    assert len(merges) >= 1, seg_counts
    assert max(seg_counts) <= 11, seg_counts
    levels = {e["level"] for e in _delta_entries(index_dir)}
    assert 1 in levels, _delta_entries(index_dir)
    # THE leveled-merge guarantee: every base parquet byte untouched
    assert base_files() == base_before
    # parity: the streamed+merged index equals a fresh batch build
    batch_dir = str(tmp_path / "batch_idx")
    build_index(spark, src, batch_dir, n_buckets=4, index_partitions=4)
    _queries_equal(
        spark, index_dir, batch_dir,
        ["spark", "java OR python", '"distributed system"', "-spark"],
    )
    # replay idempotence survives the merge (doc ids are kept)
    replay = upsert_batch(
        spark, index_dir, spark.createDataFrame(rows[50:60], SCHEMA),
        n_buckets=4, index_partitions=4,
    )
    assert replay["skipped"] == 10 and replay["delta_docs"] == 0
    # an explicit compact still collapses everything to one segment with
    # identical results
    from lse.maintenance import compact

    res = compact(spark, index_dir)
    assert res["compacted"]
    assert len(_segments(index_dir)) == 1
    _queries_equal(
        spark, index_dir, batch_dir,
        ["spark", "java OR python", '"distributed system"', "-spark"],
    )
