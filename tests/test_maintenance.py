"""Maintenance tests: status aggregates, incremental snapshot diff,
tombstoned deletes with live-doc query semantics (mirrors the reference's
incremental add/update/delete integration tests,
IndexIntegrationTest.java:112-155, :257-274)."""

import os

import pytest
from pyspark.sql import functions as F

from lse.build import build_index
from lse.engine import SearchEngine
from lse.fixtures import make_repos_df, make_repos_pdf
from lse.maintenance import delete_by_path, delete_docs, incremental_diff, index_status
from lse.oracle import OracleIndex


@pytest.fixture()
def built(spark, tmp_path):
    source = make_repos_df(spark, n_docs=60, partitions=2)
    d = str(tmp_path / "idx")
    build_index(spark, source, d, n_buckets=2, index_partitions=2)
    return d


def test_index_status(spark, built):
    st = index_status(spark, built)
    assert st["doc_count"] == 60 and st["live_doc_count"] == 60
    assert st["term_count"] > 50
    assert st["postings_total"] > 0
    assert st["index_size_bytes"] > 0
    assert st["tombstones"] == 0


def test_incremental_diff(spark, built):
    pdf = make_repos_pdf(60)
    # mutate: change one content, drop one row, add one row
    pdf.loc[3, "content"] = "totally new content here"
    pdf2 = pdf.drop(index=7)
    new_row = pdf.iloc[5].copy()
    new_row["path"] = "src/new/brandnew.py"
    pdf2 = __import__("pandas").concat(
        [pdf2, new_row.to_frame().T], ignore_index=True
    )
    new_source = spark.createDataFrame(pdf2)
    diff = {
        (r["op"], r["path"])
        for r in incremental_diff(spark, built, new_source).collect()
    }
    assert ("UPDATE", pdf.loc[3, "path"]) in diff
    assert ("DELETE", pdf.loc[7, "path"]) in diff
    assert ("ADD", "src/new/brandnew.py") in diff
    assert len(diff) == 3


def test_delete_matches_rebuilt_oracle(spark, built):
    """After tombstoning docs, every query must return exactly what an
    oracle over the REMAINING corpus returns (live N/avgdl/df semantics)."""
    docs_pdf = spark.read.parquet(os.path.join(built, "docs")).toPandas()
    victims = sorted(docs_pdf["doc_id"].tolist())[:8]
    delete_docs(spark, built, victims)

    engine = SearchEngine(spark, built)  # reload picks up tombstones
    surviving = docs_pdf[~docs_pdf["doc_id"].isin(victims)]
    oracle = OracleIndex(surviving)
    assert engine.N == len(surviving)

    for q in ["java", "java AND programming", "-java", "config*",
              '"distributed system"', "lang:md", "java OR python"]:
        got, got_total = engine.search_result(q, 10)
        want, want_total = oracle.search(q, 10)
        assert got_total == want_total, q
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (gd, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, abs=1e-9), (q, gd)
        # the spark tier agrees too
        got_sp, total_sp = engine.search_result(q, 10, mode="spark")
        assert total_sp == want_total, q
        assert [d for d, _ in got_sp] == [d for d, _ in want], q

    st = index_status(spark, built)
    assert st["tombstones"] == 8 and st["live_doc_count"] == 52


def test_delete_by_path(spark, built):
    docs = spark.read.parquet(os.path.join(built, "docs"))
    row = docs.first()
    n = delete_by_path(spark, built, row["repo"], row["path"])
    assert n == 1
    engine = SearchEngine(spark, built)
    assert int(engine.tomb_ids[0]) == row["doc_id"]


def make_source_v2():
    import pandas as pd

    pdf = make_repos_pdf(60)
    pdf.loc[3, "content"] = "java streaming incremental reindex test content"
    pdf2 = pdf.drop(index=7).reset_index(drop=True)
    row = pdf.iloc[5].copy()
    row["path"] = "src/new/brandnew.py"
    row["content"] = "java programming brand new delta document"
    return pd.concat([pdf2, row.to_frame().T], ignore_index=True)


def test_apply_incremental_matches_oracle(spark, built):
    from lse.maintenance import apply_incremental

    pdf2 = make_source_v2()
    res = apply_incremental(
        spark, built, spark.createDataFrame(pdf2), index_partitions=2
    )
    assert res["ops"] == {"ADD": 1, "UPDATE": 1, "DELETE": 1}
    assert res["tombstoned"] == 2 and res["delta_docs"] == 2

    engine = SearchEngine(spark, built)
    assert engine.multi_segment
    oracle = OracleIndex(
        spark.createDataFrame(pdf2)
        .withColumn("doc_id", F.monotonically_increasing_id())
        .toPandas()
        .assign(size_bytes=lambda d: d["content"].str.len())
    )
    # doc ids differ between engine and this oracle, so compare rank-ordered
    # SCORES and totals (ids are engine-internal); plus engine self-consistency
    for q in ["java", "java AND programming", "config*", '"distributed system"',
              "java OR python", "-java"]:
        got, got_total = engine.search_result(q, 10)
        want, want_total = oracle.search(q, 10)
        assert got_total == want_total, q
        for (gd, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, abs=1e-9), (q, gd)
        got_sp, total_sp = engine.search_result(q, 10, mode="spark")
        assert total_sp == got_total and [
            round(s, 9) for _, s in got_sp
        ] == [round(s, 9) for _, s in got], q

    # the new delta-only content is findable
    hits, total = engine.search_result("brand AND delta", 10)
    assert total == 1

    # second increment on top of the first: delete the brand-new doc again
    pdf3 = pdf2[pdf2["path"] != "src/new/brandnew.py"].reset_index(drop=True)
    res2 = apply_incremental(
        spark, built, spark.createDataFrame(pdf3), index_partitions=2
    )
    assert res2["ops"] == {"DELETE": 1}
    engine2 = SearchEngine(spark, built)
    assert engine2.search_result("brand AND delta", 10)[1] == 0
    oracle3 = OracleIndex(
        spark.createDataFrame(pdf3)
        .withColumn("doc_id", F.monotonically_increasing_id())
        .toPandas()
        .assign(size_bytes=lambda d: d["content"].str.len())
    )
    got, got_total = engine2.search_result("java", 10)
    want, want_total = oracle3.search("java", 10)
    assert got_total == want_total
    for (gd, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-9)


def test_compact_merges_segments_and_preserves_results(spark, tmp_path):
    """After incremental updates + deletes, compact() must collapse to ONE
    segment with identical query results (same doc ids, scores at 1e-9,
    totals) and no tombstones/deltas left."""
    import os

    from pyspark.sql import functions as F

    from lse.build import build_index
    from lse.engine import SearchEngine
    from lse.fixtures import make_repos_df
    from lse.maintenance import compact
    from lse.streaming import upsert_batch

    d = str(tmp_path / "idx")
    base = make_repos_df(spark, n_docs=80, partitions=2).select(
        "repo", "path", "commit", "lang", "content"
    )
    build_index(spark, base, d, n_buckets=2, index_partitions=2)
    # two upsert generations: one update, one add
    one = base.orderBy("repo", "path", "commit").limit(1)
    upsert_batch(spark, d, one.withColumn(
        "content", F.concat(F.col("content"), F.lit(" compactprobe"))))
    upsert_batch(spark, d, spark.createDataFrame(
        [("rz", "new.py", "c", "py", "freshly added compactprobe doc")],
        "repo string, path string, commit string, lang string, content string",
    ))

    before_eng = SearchEngine(spark, d)
    queries = ["java", "compactprobe", "java AND programming", "-java",
               '"machine learning"']
    before = {q: before_eng.search_result(q, 50) for q in queries}
    assert before_eng.multi_segment and before_eng.tomb_ids.size > 0

    res = compact(spark, d)
    assert res["compacted"] and res["segments_merged"] == 3
    eng = SearchEngine(spark, d)
    assert not eng.multi_segment
    assert eng.tomb_ids.size == 0
    assert not os.path.exists(os.path.join(d, "deltas"))
    for q in queries:
        hits, total = eng.search_result(q, 50)
        bh, bt = before[q]
        assert total == bt, q
        assert [x[0] for x in hits] == [x[0] for x in bh], q
        for (_, sa), (_, sb) in zip(hits, bh):
            assert sa == pytest.approx(sb, abs=1e-9)
    # integrity of the fresh segment
    from lse.build import verify_index

    assert verify_index(spark, d) == []


# ------------------------------------------- concurrent reader vs writer
def test_reader_snapshot_isolation_under_upsert(spark, tmp_path):
    """A SearchEngine opened before an upsert keeps serving ITS snapshot —
    results identical to pre-upsert — while a freshly opened engine sees
    the new logical corpus (the reference's segments.gen contract:
    docs/PROJECT_SPEC.md:236-239, adapted to immutable parquet segments)."""
    from lse.streaming import upsert_batch

    src = make_repos_df(spark, n_docs=80, partitions=2)
    d = str(tmp_path / "iso_idx")
    build_index(spark, src, d, n_buckets=2, index_partitions=2)
    queries = ["spark", "java OR python", '"distributed system"', "-spark"]
    reader = SearchEngine(spark, d)
    before = {q: reader.search_result(q, 20) for q in queries}

    batch = (
        src.limit(15)
        .withColumn("content", F.concat(F.col("content"), F.lit(" zzznewterm")))
        .select("repo", "path", "commit", "lang", "content")
    )
    res = upsert_batch(spark, d, batch, n_buckets=2, index_partitions=2)
    assert res["tombstoned"] == 15 and res["delta_docs"] == 15

    for q in queries:  # the old reader's snapshot is unchanged
        hits, total = reader.search_result(q, 20)
        assert total == before[q][1], q
        assert [h[0] for h in hits] == [h[0] for h in before[q][0]], q
    fresh = SearchEngine(spark, d)
    assert fresh.search_result("zzznewterm", 20)[1] == 15
    assert reader.search_result("zzznewterm", 20)[1] == 0


def test_warm_reader_serves_across_compact_swap(spark, tmp_path):
    """A WARMED engine keeps serving correct results while compact swaps
    the directory under it (its tables are pinned in the block manager;
    parquet segments are immutable), and a reopened engine returns the
    same results from the single compacted segment."""
    from lse.maintenance import _segments, compact
    from lse.streaming import upsert_batch

    src = make_repos_df(spark, n_docs=80, partitions=2)
    cols = "repo string, path string, commit string, lang string, content string"
    rows = src.select("repo", "path", "commit", "lang", "content").collect()
    d = str(tmp_path / "swap_idx")
    build_index(
        spark,
        spark.createDataFrame(rows[:60], cols),
        d, n_buckets=2, index_partitions=2,
    )
    upsert_batch(
        spark, d, spark.createDataFrame(rows[60:], cols),
        n_buckets=2, index_partitions=2, auto_compact_segments=0,
    )
    assert len(_segments(d)) == 2
    reader = SearchEngine(spark, d)
    reader.warm()
    queries = ["spark", "java OR python", '"distributed system"']
    before = {q: reader.search_result(q, 20) for q in queries}

    compact(spark, d)
    assert len(_segments(d)) == 1

    for q in queries:  # old snapshot still serves, old or new — never a mix
        hits, total = reader.search_result(q, 20)
        assert total == before[q][1], q
        assert [h[0] for h in hits] == [h[0] for h in before[q][0]], q
        for (_, a), (_, b) in zip(hits, before[q][0]):
            assert abs(a - b) < 1e-9
    fresh = SearchEngine(spark, d)
    for q in queries:  # compaction preserved doc ids and scores
        hits, total = fresh.search_result(q, 20)
        assert total == before[q][1], q
        assert [h[0] for h in hits] == [h[0] for h in before[q][0]], q


def test_maybe_compact_declines_without_content(spark, tmp_path):
    """A content-less index (store_content=False) with no source must
    DECLINE auto-compaction rather than fail the ingest."""
    from lse.maintenance import maybe_compact

    src = make_repos_df(spark, n_docs=30, partitions=2)
    d = str(tmp_path / "nc_idx")
    build_index(spark, src, d, n_buckets=2, index_partitions=2,
                store_content=False)
    res = maybe_compact(spark, d, max_segments=1)  # threshold already met
    assert res["compacted"] is False and res["reason"] == "no_content"
    # with the upstream source supplied, the same trigger compacts
    res2 = maybe_compact(spark, d, source=src, max_segments=1,
                         index_partitions=2)
    assert res2.get("compacted") is True
