"""k-NN JOIN operators: exact (broadcast query side) and IVF-cogrouped
approximate variant with a recall gate."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _emb(spark, n=200, dim=16, seed=3):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, dim))
    rows = [(i, [float(v) for v in x[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_knn_join_matches_per_query_topk(spark):
    """The join's per-query rows equal running cosine_topk per query."""
    from lse.similarity import cosine_topk, knn_join

    e = _emb(spark, n=120)
    q = e.filter(F.col("vec_id") % 40 == 0)  # 3 queries
    out = knn_join(q, e, k=4).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["qid"], []).append((r["rnk"], r["vec_id"], r["cos"]))
    assert sorted(by_q) == [0, 40, 80]
    for qid, rows in by_q.items():
        qv = e.filter(F.col("vec_id") == qid).first()["embedding"]
        expect = cosine_topk(e, qv, k=4).collect()
        rows.sort()
        assert [v for _, v, _ in rows] == [r["vec_id"] for r in expect]
        for (_, _, got), r in zip(rows, expect):
            assert got == pytest.approx(round(r["cos"], 4), abs=2e-4)
    # self-match ranks first at cos 1.0
    for qid, rows in by_q.items():
        assert rows[0][1] == qid and rows[0][2] == pytest.approx(1.0)


def test_knn_join_broadcasts_query_side(spark):
    from lse.similarity import knn_join

    e = _emb(spark, n=100)
    q = e.filter(F.col("vec_id") < 2)
    plan = knn_join(q, e, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "EvalPython" not in plan  # scoring is pure JVM


def test_knn_join_ivf_recall_gate(spark):
    """Cell-cogrouped approximate join reaches recall@5 ≥ 0.9 vs exact at
    n_probe=4 of 16 cells, at ~4/16 of the flops."""
    from lse.similarity import (
        ivf_assign, knn_join, knn_join_ivf, train_ivf_centroids,
    )

    # clustered data (prototype + noise) — the realistic embedding
    # distribution IVF is built for; isotropic gaussian noise with no
    # cluster structure is the adversarial case and needs higher n_probe
    rng = np.random.default_rng(9)
    protos = rng.standard_normal((8, 24)) * 3.0
    x = protos[rng.integers(0, 8, 400)] + rng.standard_normal((400, 24))
    e = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(400)],
        "vec_id long, embedding array<float>",
    )
    q = e.filter(F.col("vec_id") % 80 == 0)  # 5 queries
    cent = train_ivf_centroids(e, n_cells=16, seed=11)
    assigned = ivf_assign(e, cent)
    exact = knn_join(q, e, k=5).collect()
    approx = knn_join_ivf(q, assigned, cent, k=5, n_probe=4).collect()
    want = {}
    for r in exact:
        want.setdefault(r["qid"], set()).add(r["vec_id"])
    got = {}
    for r in approx:
        got.setdefault(r["qid"], set()).add(r["vec_id"])
    recalls = [
        len(want[qid] & got.get(qid, set())) / len(want[qid]) for qid in want
    ]
    assert sum(recalls) / len(recalls) >= 0.9
    # ranks within each query are 1..k with no duplicate candidates
    for qid, s in got.items():
        assert len(s) == 5


def test_knn_join_bulk_parity_with_exact(spark):
    """The Arrow matmul kernel returns the same neighbor sets and cosines
    (±1e-9 before rounding → equal at 4 dp) as the JVM expression path."""
    from lse.similarity import knn_join, knn_join_bulk

    e = _emb(spark, n=300, dim=32, seed=5)
    q = e.filter(F.col("vec_id") % 60 == 0)  # 5 queries
    a = knn_join(q, e, k=7).collect()
    b = knn_join_bulk(q, e, k=7).collect()
    key = lambda rows: {
        r["qid"]: sorted((r2["vec_id"], r2["cos"]) for r2 in rows
                         if r2["qid"] == r["qid"])
        for r in rows
    }
    ka, kb = key(a), key(b)
    assert ka.keys() == kb.keys()
    for qid in ka:
        ids_a = [v for v, _ in ka[qid]]
        ids_b = [v for v, _ in kb[qid]]
        assert ids_a == ids_b, qid
        for (_, ca), (_, cb) in zip(ka[qid], kb[qid]):
            assert ca == pytest.approx(cb, abs=2e-4)


def test_knn_join_bulk_empty_queries(spark):
    from lse.similarity import knn_join_bulk

    e = _emb(spark, n=20)
    q = e.filter(F.col("vec_id") < 0)
    assert knn_join_bulk(q, e, k=3).count() == 0


def test_knn_join_ivf_no_broadcast_above_limit(spark):
    """Above broadcast_query_limit the exploded query side must NOT be
    broadcast (a 10M-query side would OOM the driver): both sides meet on
    a shuffle of the cell id, and results are identical to the broadcast
    regime (join strategy must never change the answer)."""
    from lse.similarity import ivf_assign, knn_join_ivf, train_ivf_centroids

    e = _emb(spark, n=160, dim=8, seed=7)
    cents = train_ivf_centroids(e, n_cells=4, iters=4)
    corpus = ivf_assign(e, cents)
    q = e.filter(F.col("vec_id") % 20 == 0)  # 8 queries

    big = knn_join_ivf(q, corpus, cents, k=3, n_probe=2,
                       broadcast_query_limit=0)
    plan = big._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" not in plan, plan[:2000]

    small = knn_join_ivf(q, corpus, cents, k=3, n_probe=2,
                         broadcast_query_limit=100)
    plan_s = small._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan_s, plan_s[:2000]

    norm = lambda rows: sorted(
        (r["qid"], r["rnk"], r["vec_id"], round(r["cos"], 4)) for r in rows
    )
    assert norm(big.collect()) == norm(small.collect())
