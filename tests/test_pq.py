"""Product-quantization ANN (train_pq_codebooks / pq_encode /
cosine_topk_pq / cosine_topk_pq_refine): code shape + compression, recall
gates for raw ADC and the refine path, determinism, and plan shape
(the ADC scan is one Arrow stage over the code column)."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _emb(spark, n=400, dim=32, seed=5):
    """Clustered synthetic vectors (so near-neighbor structure exists)."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((8, dim)) * 3.0
    x = centers[np.arange(n) % 8] + rng.standard_normal((n, dim))
    rows = [(i, [float(v) for v in x[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


@pytest.fixture(scope="module")
def pq(spark):
    from lse.similarity import pq_encode, train_pq_codebooks

    e = _emb(spark)
    books = train_pq_codebooks(e, m=8, n_codes=32, seed=13)
    coded = pq_encode(e, books).cache()
    coded.count()
    yield e, books, coded
    coded.unpersist()


def test_codes_are_m_bytes_and_bounded(pq):
    e, books, coded = pq
    m, n_codes, dsub = books.shape
    assert (m, n_codes, dsub) == (8, 32, 4)
    rows = coded.select("pq_code").collect()
    assert all(len(r["pq_code"]) == m for r in rows)
    assert all(max(r["pq_code"]) < n_codes for r in rows)
    # the compression claim: a float32 vector is dim*4 bytes, the code is m
    dim = len(e.first()["embedding"])
    assert dim * 4 // m == 16  # 16x smaller scoring payload


def test_pq_training_and_encoding_deterministic(spark, pq):
    from lse.similarity import pq_encode, train_pq_codebooks

    e, books, coded = pq
    books2 = train_pq_codebooks(e, m=8, n_codes=32, seed=13)
    assert np.array_equal(books, books2)
    again = {r["vec_id"]: r["pq_code"] for r in pq_encode(e, books2).collect()}
    for r in coded.collect():
        assert again[r["vec_id"]] == r["pq_code"]


def _recall(spark, e, coded, books, refine, qids, k=10):
    from lse.similarity import cosine_topk, cosine_topk_pq, cosine_topk_pq_refine

    tot = 0.0
    for qid in qids:
        qv = e.filter(F.col("vec_id") == qid).first()["embedding"]
        if refine:
            approx = cosine_topk_pq_refine(coded, books, qv, k=k, shortlist=5)
        else:
            approx = cosine_topk_pq(coded, books, qv, k=k)
        a = {r["vec_id"] for r in approx.collect()}
        b = {r["vec_id"] for r in cosine_topk(e, qv, k=k).collect()}
        tot += len(a & b) / k
    return tot / len(qids)


def test_adc_recall_floor(spark, pq):
    e, books, coded = pq
    assert _recall(spark, e, coded, books, refine=False, qids=[0, 51, 102]) >= 0.5


def test_refine_recall_floor_and_exact_scores(spark, pq):
    """The refine path must clear a much higher recall bar AND return TRUE
    cosine values (not ADC approximations) for what it does return."""
    from lse.similarity import cosine_topk, cosine_topk_pq_refine

    e, books, coded = pq
    assert _recall(spark, e, coded, books, refine=True, qids=[0, 51, 102]) >= 0.8
    qv = e.filter(F.col("vec_id") == 0).first()["embedding"]
    got = {r["vec_id"]: r["cos"] for r in
           cosine_topk_pq_refine(coded, books, qv, k=10, shortlist=5).collect()}
    exact = {r["vec_id"]: r["cos"] for r in cosine_topk(e, qv, k=50).collect()}
    for vid, cos in got.items():
        assert cos == pytest.approx(exact[vid], abs=1e-9)
    assert got[0] == pytest.approx(1.0)


def test_adc_scan_reads_codes_in_one_arrow_stage(pq):
    """The ADC plan: one MapInPandas over the codes, partial top-k per
    batch, global TakeOrdered — no join, no Window, no extra shuffle of
    the corpus."""
    from lse.similarity import cosine_topk_pq

    e, books, coded = pq
    qv = e.filter(F.col("vec_id") == 0).first()["embedding"]
    plan = cosine_topk_pq(coded, books, qv, k=10)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan and "TakeOrderedAndProject" in plan
    assert "Window" not in plan and "Join" not in plan
    assert "Exchange" not in plan  # partial top-k means no shuffle at all


def test_n_codes_over_256_rejected(spark):
    from lse.similarity import train_pq_codebooks

    with pytest.raises(ValueError, match="256"):
        train_pq_codebooks(_emb(spark, n=20), m=8, n_codes=512)


def test_dim_not_divisible_rejected(spark):
    from lse.similarity import train_pq_codebooks

    with pytest.raises(ValueError, match="divisible"):
        train_pq_codebooks(_emb(spark, n=20, dim=30), m=8)


def test_ivf_pq_composition(spark, pq):
    """The full IVFPQ shape: `ivf_assign` and `pq_encode` are independent
    ingest-time columns, so cell-pruning the coded table then running
    ADC+refine inside the probed cells composes without any new operator.
    Recall stays high because refine recomputes true cosine."""
    from lse.similarity import (
        cosine_topk,
        cosine_topk_pq_refine,
        ivf_assign,
        train_ivf_centroids,
    )
    from pyspark.sql import functions as F2

    e, books, coded = pq
    cent = train_ivf_centroids(e, n_cells=8, seed=11)
    both = ivf_assign(coded, cent)  # (embedding, pq_code, ivf_cell)
    qv = e.filter(F2.col("vec_id") == 0).first()["embedding"]
    qn = np.asarray(qv, dtype=np.float64)
    qn = qn / max(float(np.linalg.norm(qn)), 1e-12)
    probe = np.argsort(-(cent @ qn), kind="stable")[:3]
    pruned = both.filter(F2.col("ivf_cell").isin([int(c) for c in probe]))
    got = {r["vec_id"] for r in
           cosine_topk_pq_refine(pruned, books, qv, k=10, shortlist=5).collect()}
    want = {r["vec_id"] for r in cosine_topk(e, qv, k=10).collect()}
    assert len(got & want) / 10 >= 0.7
    assert 0 in got  # the self-match survives both pruning stages


def test_custom_id_col_flows_through_refine(spark, pq):
    """ADVICE r5: cosine_topk_pq hardcoded its output column to vec_id, so
    any non-default id_col raised AnalysisException in the refine join."""
    from lse.similarity import cosine_topk_pq, cosine_topk_pq_refine

    e, books, coded = pq
    renamed = coded.select(
        F.col("vec_id").alias("item_id"), "embedding", "pq_code"
    )
    qv = e.filter(F.col("vec_id") == 0).first()["embedding"]
    adc = cosine_topk_pq(renamed, books, qv, k=5, id_col="item_id")
    assert adc.columns == ["item_id", "score"]
    # refine output keeps cosine_topk's documented (vec_id, cos) contract;
    # the fix is that the ADC shortlist join no longer explodes on id_col
    got = cosine_topk_pq_refine(
        renamed, books, qv, k=5, id_col="item_id"
    ).collect()
    want = cosine_topk_pq_refine(coded, books, qv, k=5).collect()
    assert [(r["vec_id"], r["cos"]) for r in got] == [
        (r["vec_id"], r["cos"]) for r in want
    ]


def test_malformed_pq_code_raises_named_error(spark, pq):
    """ADVICE r5: a null / wrong-length pq_code crashed the ADC kernel with
    an opaque reshape TypeError; it must instead name the column and row."""
    from pyspark.errors.exceptions.captured import PythonException

    from lse.similarity import cosine_topk_pq

    e, books, coded = pq
    qv = e.filter(F.col("vec_id") == 0).first()["embedding"]
    broken = coded.withColumn(
        "pq_code",
        F.when(F.col("vec_id") == 7, F.lit(b"\x00\x01")).otherwise(
            F.col("pq_code")
        ),
    )
    with pytest.raises(PythonException, match="8-byte PQ codes"):
        cosine_topk_pq(broken, books, qv, k=5).collect()
