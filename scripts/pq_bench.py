#!/usr/bin/env python
"""PQ storage/scan-path evidence: exact float-column cosine top-k vs
ADC over the pre-encoded one-byte-code column vs ADC + exact refine, on a
replicated embeddings table (~512k vectors by default).

The point being measured is the 100-TB storage lever: after `pq_encode`
at ingest, the query-time scan reads the m-byte code column instead of
the d*4-byte float column. Both tables are written to parquet first so
each path pays its real scan. Reports per-path wall time over a warm
query set, scan-payload bytes per row, and refine-vs-exact top-k overlap.

Writes BENCH_PQ.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICATION = int(os.environ.get("LSE_PQ_REPLICATION", "256"))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
M, N_CODES = 16, 64
K, SHORTLIST = 10, 5
N_QUERIES = 5


def main():
    from pyspark.sql import functions as F

    from lse.session import get_spark
    from lse.similarity import (
        cosine_topk,
        cosine_topk_pq,
        cosine_topk_pq_refine,
        pq_encode,
        train_pq_codebooks,
    )

    spark = get_spark(
        "pq_bench", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    base = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    n_base = base.count()
    dim = len(base.first()["embedding"])

    work = tempfile.mkdtemp(prefix="lse_pq_bench_")
    out = {
        "input": f"{SF_DIR} x{REPLICATION}",
        "n_vectors": n_base * REPLICATION,
        "dim": dim,
        "m": M,
        "n_codes": N_CODES,
        "float_bytes_per_vec": dim * 4,
        "code_bytes_per_vec": M,
        "payload_ratio": round(dim * 4 / M, 1),
    }
    try:
        # ------------------------------------------------ ingest (once)
        big = (
            base.select(
                F.col("vec_id"),
                F.col("embedding"),
                F.explode(F.sequence(F.lit(0), F.lit(REPLICATION - 1))).alias("rep"),
            )
            .select(
                (F.col("vec_id") + F.col("rep") * n_base).alias("vec_id"),
                "embedding",
            )
        )
        books = train_pq_codebooks(base, m=M, n_codes=N_CODES, seed=13)
        t0 = time.time()
        pq_encode(big, books).write.mode("overwrite").parquet(
            os.path.join(work, "coded")
        )
        out["encode_sec"] = round(time.time() - t0, 2)
        coded = spark.read.parquet(os.path.join(work, "coded"))

        qvs = [
            [float(x) for x in r["embedding"]]
            for r in base.filter(F.col("vec_id") < N_QUERIES).collect()
        ]

        def timed(fn):
            fn(qvs[0])  # warm the path once (JIT, codebook bc, file index)
            t0 = time.time()
            res = [fn(q) for q in qvs]
            return (time.time() - t0) / len(qvs), res

        # ------------------------------------------------ exact (floats)
        sec, exact = timed(
            lambda q: [
                (r["vec_id"], round(r["cos"], 6))
                for r in cosine_topk(coded, q, k=K).collect()
            ]
        )
        out["exact_sec_per_query"] = round(sec, 3)

        # ------------------------------------------------ raw ADC (codes)
        sec, adc = timed(
            lambda q: [
                (r["vec_id"], r["score"])
                for r in cosine_topk_pq(coded, books, q, k=K).collect()
            ]
        )
        out["adc_sec_per_query"] = round(sec, 3)

        # ------------------------------------------------ ADC + refine
        sec, ref = timed(
            lambda q: [
                (r["vec_id"], round(r["cos"], 6))
                for r in cosine_topk_pq_refine(
                    coded, books, q, k=K, shortlist=SHORTLIST
                ).collect()
            ]
        )
        out["refine_sec_per_query"] = round(sec, 3)

        out["adc_speedup_vs_exact"] = round(
            out["exact_sec_per_query"] / max(out["adc_sec_per_query"], 1e-9), 2
        )
        out["refine_speedup_vs_exact"] = round(
            out["exact_sec_per_query"] / max(out["refine_sec_per_query"], 1e-9), 2
        )
        overlaps = [
            len({v for v, _ in e} & {v for v, _ in r}) / K
            for e, r in zip(exact, ref)
        ]
        out["refine_recall_at_k"] = round(sum(overlaps) / len(overlaps), 3)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_PQ.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
