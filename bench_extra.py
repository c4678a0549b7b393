#!/usr/bin/env python
"""Extra benchmarks (guide §1.4): per-stage build attribution + isolated
query kernels. NOT the driver contract — bench.py stays frozen; this file
exists so optimization evidence can be cited in OPTIMIZATION_r06.md.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py [--repeat N]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def entry_audit() -> None:
    """Time every __spark_entry__.queries() operator end-to-end (count()
    sink) at the given SF — the whole-surface audit for the optimization
    round. Usage: python bench_extra.py --entries [sf_dir]."""
    sf = sys.argv[sys.argv.index("--entries") + 1] if (
        len(sys.argv) > sys.argv.index("--entries") + 1
    ) else "/root/testdata/sf0.01"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from lse.session import get_spark

    spark = get_spark(
        "lse-entry-audit", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as m

    out = {}
    for name, fn in m.queries().items():
        spark.sparkContext.setJobDescription(f"entry {name}")
        t0 = time.perf_counter()
        df = fn(spark, sf)
        n = df.count()
        out[name] = {"sec": round(time.perf_counter() - t0, 2), "rows": n}
    print(json.dumps({"sf_dir": sf, "entries": out}))
    spark.stop()


def main() -> None:
    if "--entries" in sys.argv:
        return entry_audit()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    repeat = 1
    if "--repeat" in sys.argv:
        repeat = int(sys.argv[sys.argv.index("--repeat") + 1])

    from lse.session import get_spark

    spark = get_spark(
        "lse-bench-extra", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
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

    runs = []
    for i in range(repeat):
        index_dir = tempfile.mkdtemp(prefix="lse_benchx_idx_")
        try:
            spark.sparkContext.setJobDescription(f"build run {i}")
            t0 = time.perf_counter()
            build_index(
                spark, source, index_dir,
                precomputed_doc_id=True,
                n_buckets=8,
                index_partitions=max(8, min(int(cpus), n_files // 500)),
                store_content=False,
                resume=False,
            )
            build_sec = time.perf_counter() - t0
            meta = json.load(open(os.path.join(index_dir, "build_meta.json")))
            run = {"build_sec": round(build_sec, 3),
                   "stage_secs": meta.get("stage_secs", {})}

            # warm + forced kernels, same protocol as bench.py
            spark.sparkContext.setJobDescription(f"warm run {i}")
            t1 = time.perf_counter()
            engine = SearchEngine(spark, index_dir)
            engine.warm()
            engine.search_result("warmup", 10)
            run["warm_sec"] = round(time.perf_counter() - t1, 3)

            forced = {}
            for name, (q, strat) in {
                "term_topk_wand": ("spark", "wand"),
                "multi_or_wand": ("spark OR query OR join OR merge", "wand"),
                "term_topk_bucket": ("spark", "bucket"),
                "multi_or_bucket": ("spark OR query OR join OR merge", "bucket"),
            }.items():
                spark.sparkContext.setJobDescription(f"forced {name}")
                engine.search_topk(q, 10, strategy=strat)  # cold
                laps = []
                for _ in range(3):
                    t2 = time.perf_counter()
                    engine.search_topk(q, 10, strategy=strat)
                    laps.append(time.perf_counter() - t2)
                forced[name] = round(sum(laps) / len(laps), 4)
            run["forced"] = forced
            runs.append(run)
        finally:
            shutil.rmtree(index_dir, ignore_errors=True)
    print(json.dumps({"sf_dir": sf_dir, "cpus": int(cpus),
                      "n_files": n_files, "runs": runs}, indent=1))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
