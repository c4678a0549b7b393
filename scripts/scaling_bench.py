#!/usr/bin/env python
"""Two-cluster-size scaling evidence (north rule, sandbox adaptation).

No real cluster exists here, so the N vs 4N executor criterion is evidenced
by running the IDENTICAL build+query job at two parallelism levels —
local[8] and local[32] — on the same input, and reporting throughput at both
plus scaling efficiency. The input is the sf0.1 documents table replicated
REPLICATION× (doc ids offset per copy) so that tokenize/shuffle compute
dominates Spark's fixed job overhead, as it would at real scale.

Also asserts the determinism contract: both parallelism levels must produce
identical query results (same top-k ids and scores ±1e-9).

Writes BENCH_SCALING.json and prints a summary table.
"""

from __future__ import annotations

import json
import os
import sys
import shutil
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPLICATION = int(os.environ.get("LSE_SCALE_REPLICATION", "64"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# The north rule's criterion is N vs 4N executors. Default 8 vs 32 uses the
# whole box; LSE_SCALE_CORES_LOW/HIGH pick a different N/4N pair. A pure-CPU
# probe (scripts/host_ceiling_probe.py → BENCH_HOST_CEILING.json) bounds
# what each pair can show on this host: 2→8 sustains ~0.90, 8→32 a noisy
# 0.73–0.90 (the upper 16 "cores" are SMT siblings), so 2 vs 8 is the pair
# where the hardware expresses the plan's scalability most cleanly.
CORES_LOW = int(os.environ.get("LSE_SCALE_CORES_LOW", "8"))
CORES_HIGH = int(os.environ.get("LSE_SCALE_CORES_HIGH", "32"))
# LSE_SCALE_TMPDIR=/dev/shm removes the single shared DISK from the loop
# (index + shuffle dirs on tmpfs): the criterion describes N→4N executors
# each adding disks/NIC/memory channels, which one spindle cannot emulate —
# tmpfs exposes the plan's actual CPU scalability on this box.
SCALE_TMP = os.environ.get("LSE_SCALE_TMPDIR", tempfile.gettempdir())
# identical physical plan at both parallelism levels: only the core count
# differs, the partitioning of every stage is pinned
PARTITIONS = int(os.environ.get("LSE_SCALE_PARTITIONS", "64"))
QUERIES = [
    "spark", "spark AND query", "filter AND (join OR merge)", "-spark",
    '"table scan"', "jo*", "spark OR query OR join OR merge",
]


def _master_for(cores: int) -> str:
    """local[cores] by default. LSE_SCALE_MASTER_TMPL switches to REAL
    multi-executor mode on one box — e.g. 'local-cluster[{n},8,6144]'
    spawns {n}=cores//8 SEPARATE executor JVMs × 8 cores each, with real
    netty shuffle between them: the closest in-sandbox realization of the
    north rule's 'N vs 4N executors' (each executor gets its own JVM heap,
    GC, and python worker pool — the artifacts a single-JVM local[k] run
    shares across all threads)."""
    tmpl = os.environ.get("LSE_SCALE_MASTER_TMPL")
    if tmpl:
        return tmpl.format(n=max(1, cores // 8))
    return f"local[{cores}]"


def run_at(cores: int) -> dict:
    from pyspark.sql import functions as F

    from lse.build import build_index
    from lse.engine import SearchEngine
    from lse.session import get_spark

    extra = {"spark.local.dir": SCALE_TMP}
    if os.environ.get("LSE_SCALE_MASTER_TMPL"):
        extra["spark.executor.memory"] = os.environ.get(
            "LSE_SCALE_EXEC_MEM", "6g"
        )
    spark = get_spark(
        f"lse-scale-{cores}", master=_master_for(cores),
        shuffle_partitions=PARTITIONS, extra_conf=extra,
    )
    if os.environ.get("LSE_SCALE_MASTER_TMPL"):
        # separate executor JVMs spawn their own python workers, which do
        # NOT inherit the driver's sys.path — ship the package the way a
        # real cluster submit would (spark-submit --py-files / addPyFile)
        import zipfile

        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        zpath = os.path.join(tempfile.gettempdir(), "lse_pkg.zip")
        with zipfile.ZipFile(zpath, "w") as z:
            pkg = os.path.join(repo_root, "lse")
            for f in sorted(os.listdir(pkg)):
                if f.endswith(".py"):
                    z.write(os.path.join(pkg, f), arcname=f"lse/{f}")
        spark.sparkContext.addPyFile(zpath)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        base_n = docs.count()
        # replicate AFTER repartitioning so row generation is parallel —
        # a crossJoin against a 1-partition parquet scan would materialize
        # the whole replicated corpus through a single task
        big = docs.repartition(PARTITIONS).select(
            "*", F.explode(F.sequence(F.lit(0), F.lit(REPLICATION - 1))).alias("copy")
        ).select(
            (F.col("doc_id") + F.col("copy") * base_n).alias("doc_id"),
            F.col("text").alias("content"),
            "lang",
            F.concat(F.col("source"), F.lit("_c"), F.col("copy")).alias("repo"),
            F.concat(
                F.col("source"), F.lit("/d"), F.col("doc_id").cast("string"),
                F.lit("_"), F.col("copy").cast("string"),
            ).alias("path"),
            F.lit("").alias("commit"),
        )
        n_files = base_n * REPLICATION
        index_dir = tempfile.mkdtemp(prefix=f"lse_scale_{cores}_", dir=SCALE_TMP)
        t0 = time.perf_counter()
        build_index(
            spark, big, index_dir,
            precomputed_doc_id=True, n_buckets=32,
            index_partitions=PARTITIONS, store_content=False, resume=False,
        )
        build_sec = time.perf_counter() - t0

        engine = SearchEngine(spark, index_dir)
        engine.warm()  # serving mode: postings pinned on executors
        engine.search_result("warmup", 10)
        q_first = {}
        q_warm = {}
        results = {}
        for q in QUERIES:
            t1 = time.perf_counter()
            hits, total = engine.search_result(q, 10)
            q_first[q] = round(time.perf_counter() - t1, 4)
            best = float("inf")
            for _ in range(3):
                t2 = time.perf_counter()
                engine.search_result(q, 10)
                best = min(best, time.perf_counter() - t2)
            q_warm[q] = round(best, 4)
            results[q] = (hits, total)
        shutil.rmtree(index_dir, ignore_errors=True)
        return dict(
            cores=cores,
            n_files=n_files,
            build_sec=round(build_sec, 2),
            files_per_sec=round(n_files / build_sec, 2),
            query_lat=q_first,
            query_warm=q_warm,
            results=results,
        )
    finally:
        spark.stop()


def main() -> None:
    import pickle

    if len(sys.argv) > 1 and sys.argv[1].isdigit():
        cores = int(sys.argv[1])
        res = run_at(cores)
        with open(f"/tmp/lse_scale_{cores}.pkl", "wb") as fh:
            pickle.dump(res, fh)
        print(f"cores={cores} build_sec={res['build_sec']} files/s={res['files_per_sec']}")
        return

    lo_pkl = f"/tmp/lse_scale_{CORES_LOW}.pkl"
    hi_pkl = f"/tmp/lse_scale_{CORES_HIGH}.pkl"
    if os.path.exists(lo_pkl) and os.path.exists(hi_pkl):
        low = pickle.load(open(lo_pkl, "rb"))
        high = pickle.load(open(hi_pkl, "rb"))
    else:
        low = run_at(CORES_LOW)
        high = run_at(CORES_HIGH)

    # determinism across parallelism levels
    mismatches = []
    for q in QUERIES:
        h_lo, t_lo = low["results"][q]
        h_hi, t_hi = high["results"][q]
        ids_ok = [d for d, _ in h_lo] == [d for d, _ in h_hi]
        sc_ok = all(abs(a - b) <= 1e-9 for (_, a), (_, b) in zip(h_lo, h_hi))
        if not (ids_ok and sc_ok and t_lo == t_hi):
            mismatches.append(q)

    efficiency = (low["build_sec"] / high["build_sec"]) / (CORES_HIGH / CORES_LOW)
    out = dict(
        input=f"{SF_DIR} x{REPLICATION}",
        n_files=low["n_files"],
        low=dict(cores=CORES_LOW, build_sec=low["build_sec"], files_per_sec=low["files_per_sec"]),
        high=dict(cores=CORES_HIGH, build_sec=high["build_sec"], files_per_sec=high["files_per_sec"]),
        scaling_efficiency=round(efficiency, 3),
        speedup=round(low["build_sec"] / high["build_sec"], 2),
        results_identical=not mismatches,
        mismatched_queries=mismatches,
        query_lat_low=low["query_lat"],
        query_lat_high=high["query_lat"],
        query_warm_low=low.get("query_warm", {}),
        query_warm_high=high.get("query_warm", {}),
    )
    out_path = os.environ.get("LSE_SCALE_OUT", "BENCH_SCALING.json")
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
