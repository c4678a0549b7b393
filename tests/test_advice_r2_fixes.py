"""Regression tests for the round-2 advisor findings (ADVICE.md r2):

1. wand_topk_bulk (and the classic kernels) must not crash on k=0 —
   search_topk clamps limit to >=0 so limit=0 reaches the kernels;
2. filter-id sets must ship to executors as a Spark broadcast (not a
   closure-captured 16 MB pickle per task) and membership must be the
   sorted binary-search mask, not linear np.isin;
3. _serving_conf must be concurrency-safe: nested / overlapping serving
   queries on one SparkSession may not interleave AQE set/restore pairs;
4. ngram_jaccard_pairs: when the shingle-df cap binds, the rare-universe
   Jaccard over-estimates for pairs whose DROPPED shingles are unshared
   (recall-preserving direction) — pin that direction;
5. verify_index must URL-decode manifest paths so an index_dir containing
   spaces (URI-encoded by input_file_name/binaryFile) still verifies clean.
"""

import numpy as np
import pytest

from lse.bm25 import idf as idf_fn
from lse.codec import encode_postings
from lse.engine import SearchEngine
from lse.ids import member_mask
from lse.wand import TermCursor, wand_topk, wand_topk_and, wand_topk_bulk


# --------------------------------------------------------------- 1. k == 0
def _one_cursor():
    ids = np.arange(1, 400, dtype=np.int64)
    enc = encode_postings(ids, np.ones(ids.size, np.int64), np.full(ids.size, 30), avgdl=30.0)
    return TermCursor(enc.payload, enc.block_last_doc, enc.block_offset,
                      enc.block_max_raw, enc.df, idf_fn(ids.size, 1000))


@pytest.mark.parametrize("kernel", [wand_topk, wand_topk_and, wand_topk_bulk])
def test_wand_kernels_k_zero(kernel):
    assert kernel([_one_cursor()], 0, 30.0) == []


def test_search_topk_limit_zero(spark, fixture_index):
    index_dir, _ = fixture_index
    eng = SearchEngine(spark, index_dir)
    assert eng.search_topk("java OR spark", 0, strategy="wand") == []
    assert eng.search_topk("java AND spark", 0, strategy="wand") == []


# ------------------------------------------- 2. filter ids: broadcast + mask
def test_member_mask_matches_isin():
    rng = np.random.default_rng(0)
    sset = np.unique(rng.integers(0, 10_000, 500).astype(np.int64))
    vals = rng.integers(-50, 10_050, 2000).astype(np.int64)
    np.testing.assert_array_equal(member_mask(vals, sset), np.isin(vals, sset))
    # edges: empty set, empty values, all-above-max, all-below-min
    assert not member_mask(vals, np.empty(0, dtype=np.int64)).any()
    assert member_mask(np.empty(0, dtype=np.int64), sset).size == 0
    assert not member_mask(np.array([10_100, 10_200]), sset).any()
    assert not member_mask(np.array([-1]), sset).any()


def test_filtered_bucket_query_uses_broadcast_and_stays_exact(spark, fixture_index):
    index_dir, _ = fixture_index
    eng = SearchEngine(spark, index_dir)
    q = "repo:org1/repo1 AND java"
    hits_b, total_b = eng.search_result(q, 10, mode="bucket")
    # the broadcast path ran (fid shipped via sparkContext.broadcast once,
    # not re-pickled per task in the kernel closure)
    from pyspark import Broadcast

    assert isinstance(getattr(eng, "_last_filter_bc", None), Broadcast)
    hits_s, total_s = eng.search_result(q, 10, mode="spark")
    assert total_b == total_s
    assert [d for d, _ in hits_b] == [d for d, _ in hits_s]
    for (_, sb), (_, ss) in zip(hits_b, hits_s):
        assert sb == pytest.approx(ss, abs=1e-9)


# ------------------------------------------------- 3. AQE guard concurrency
def test_serving_conf_nested_and_threaded(spark, fixture_index):
    index_dir, _ = fixture_index
    eng = SearchEngine(spark, index_dir)
    key = "spark.sql.adaptive.enabled"
    spark.conf.set(key, "true")
    with eng._serving_conf():
        assert spark.conf.get(key) == "false"
        with eng._serving_conf():  # inner enter must not re-save "false"
            assert spark.conf.get(key) == "false"
        # inner exit must NOT restore early
        assert spark.conf.get(key) == "false"
    assert spark.conf.get(key) == "true"

    # overlapping enters/exits from two threads never leave AQE off
    import threading

    errs = []

    def worker():
        try:
            for _ in range(50):
                with eng._serving_conf():
                    assert spark.conf.get(key) == "false"
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=worker) for _ in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    assert spark.conf.get(key) == "true"


# --------------------------------------------- 4. jaccard cap: direction
def test_jaccard_cap_binding_direction(spark):
    """Corpus where the df cap BINDS: every doc shares the same boilerplate
    (its shingles exceed max_shingle_df and are dropped); one pair also
    shares rare content. The rare-universe Jaccard must (a) still surface
    that pair, (b) over-estimate its true Jaccard — the recall-preserving
    direction documented in ngram_jaccard_pairs."""
    from lse.dedup import ngram_jaccard_pairs, token_ngrams

    boiler = "copyright header license apache version two point zero"
    rare_a = "quantum flux capacitor resonates wildly overnight"
    rows = [(i, f"{boiler} filler{i} pad{i} word{i}") for i in range(20)]
    rows.append((100, f"{boiler} {rare_a}"))
    rows.append((101, f"{boiler} {rare_a}"))
    df = spark.createDataFrame(rows, "doc_id long, content string")

    got = ngram_jaccard_pairs(df, n=3, threshold=0.5, max_shingle_df=5).toPandas()
    pair = got[(got.doc_a == 100) & (got.doc_b == 101)]
    assert len(pair) == 1  # surfaced despite the dropped boilerplate

    # true Jaccard over ALL shingles (no cap) for that pair
    sh = token_ngrams(df.filter("doc_id >= 100"), n=3).toPandas()
    a = set(sh[sh.doc_id == 100].shingle)
    b = set(sh[sh.doc_id == 101].shingle)
    true_j = len(a & b) / len(a | b)
    est = float(pair.jaccard.iloc[0])
    # identical docs: true == est == 1.0 would not pin direction; make sure
    # the est >= true inequality is what the cap produces here
    assert est >= true_j - 1e-12


def test_jaccard_cap_unshared_drop_overestimates(spark):
    """Pair where one side carries extra HIGH-DF shingles: dropping them
    shrinks that side's size → est > true. Pin the over-estimate."""
    from lse.dedup import ngram_jaccard_pairs, token_ngrams

    boiler = " ".join(f"common{j} token{j} run{j}" for j in range(4))
    rare = "unique payload sentence shared by exactly two docs"
    rows = [(i, boiler) for i in range(10)]
    rows.append((100, rare))
    rows.append((101, f"{rare} {boiler}"))
    df = spark.createDataFrame(rows, "doc_id long, content string")
    got = ngram_jaccard_pairs(df, n=3, threshold=0.3, max_shingle_df=5).toPandas()
    pair = got[(got.doc_a == 100) & (got.doc_b == 101)]
    assert len(pair) == 1
    sh = token_ngrams(df.filter("doc_id >= 100"), n=3).toPandas()
    a = set(sh[sh.doc_id == 100].shingle)
    b = set(sh[sh.doc_id == 101].shingle)
    true_j = len(a & b) / len(a | b)
    assert float(pair.jaccard.iloc[0]) > true_j


# --------------------------------------------- 5. verify_index with spaces
def test_verify_index_dir_with_space(spark, tmp_path):
    from lse.build import build_index, verify_index
    from lse.fixtures import make_repos_df

    d = str(tmp_path / "dir with space" / "idx")
    src = make_repos_df(spark, n_docs=40, partitions=2)
    build_index(spark, src, d, n_buckets=2, index_partitions=2)
    assert verify_index(spark, d) == []
