#!/usr/bin/env python
"""Profile the warm local-tier phrase path at ~1.28M docs (sf0.1 x 256).

Builds (or reuses) a replicated index under /dev/shm, warms the engine,
then times + cProfiles repeated phrase queries to locate the warm-latency
floor. Iteration tool for the sub-100ms warm-phrase target; not part of
the driver bench protocol.
"""

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lse.build import build_index
from lse.engine import SearchEngine
from lse.session import get_spark

REPLICATION = int(os.environ.get("LSE_SCALE_REPLICATION", "256"))
SF_DIR = "/root/testdata/sf0.1"
IDX = f"/dev/shm/lse_phrase_prof_x{REPLICATION}"


def main():
    spark = get_spark(
        "phrase-prof", master="local[32]", shuffle_partitions=64,
        extra_conf={"spark.local.dir": "/dev/shm"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(IDX, "postings", "_SUCCESS")):
        docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        base_n = docs.count()
        big = docs.repartition(64).select(
            "*", F.explode(F.sequence(F.lit(0), F.lit(REPLICATION - 1))).alias("copy")
        ).select(
            (F.col("doc_id") + F.col("copy") * base_n).alias("doc_id"),
            F.col("text").alias("content"),
            "lang",
            F.concat(F.col("source"), F.lit("_c"), F.col("copy")).alias("repo"),
            F.concat(F.col("source"), F.lit("/d"), F.col("doc_id").cast("string")).alias("path"),
            F.lit("").alias("commit"),
        )
        t0 = time.perf_counter()
        build_index(
            spark, big, IDX, precomputed_doc_id=True, n_buckets=32,
            index_partitions=64, store_content=False, resume=False,
        )
        print("build_sec", round(time.perf_counter() - t0, 1))
    eng = SearchEngine(spark, IDX)
    eng.warm()
    eng.search_result("warmup", 10)

    queries = ['"table scan"', '"machine learning"', "spark", "spark AND query"]
    for q in queries:
        eng.search_result(q, 10)  # first touch
        best = float("inf")
        for _ in range(5):
            t = time.perf_counter()
            hits, total = eng.search_result(q, 10)
            best = min(best, time.perf_counter() - t)
        print(f"warm {q!r}: {best*1000:.1f} ms  (total={total})")

    pr = cProfile.Profile()
    pr.enable()
    for _ in range(10):
        eng.search_result('"table scan"', 10)
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(30)
    print(s.getvalue())


if __name__ == "__main__":
    main()
