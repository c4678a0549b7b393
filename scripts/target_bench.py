#!/usr/bin/env python
"""Reference headline-target bench: 100k files / ~5 GB text ≤ 300 s
(README.md:162-163, docs/PROJECT_SPEC.md:12-13 — corpus scale and full
index build time on one machine).

Synthesizes the 100k×~50 KB corpus distributed (sf0.1's 5,000 docs
replicated ×REPLICAS with text inflated ×INFLATE — no driver
materialization), builds the full index (postings + positions + manifest),
and prints one JSON line with wall-clock, files/s and MB/s. Writes
BENCH_TARGET.json.
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
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICAS = int(os.environ.get("LSE_TARGET_REPLICAS", "20"))   # 5k → 100k files
INFLATE = int(os.environ.get("LSE_TARGET_INFLATE", "50"))     # ~1 KB → ~50 KB
PARTITIONS = int(os.environ.get("LSE_TARGET_PARTITIONS", "128"))
TMP = os.environ.get("LSE_TARGET_TMPDIR", tempfile.gettempdir())
WITH_POSITIONS = os.environ.get("LSE_TARGET_POSITIONS", "1") not in ("0", "false")


def main() -> None:
    from pyspark.sql import functions as F

    from lse.build import build_index
    from lse.engine import SearchEngine
    from lse.session import get_spark

    spark = get_spark(
        "lse-target", master=f"local[{CPUS}]", shuffle_partitions=PARTITIONS,
        extra_conf={"spark.local.dir": TMP},
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    base_n = docs.count()
    big = docs.repartition(PARTITIONS).select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1))).alias("copy")
    ).select(
        (F.col("doc_id") + F.col("copy") * base_n).alias("doc_id"),
        F.repeat(F.col("text"), INFLATE).alias("content"),
        "lang",
        F.concat(F.col("source"), F.lit("_c"), F.col("copy")).alias("repo"),
        F.concat(
            F.col("source"), F.lit("/d"), F.col("doc_id").cast("string"),
            F.lit("_"), F.col("copy").cast("string"),
        ).alias("path"),
        F.lit("").alias("commit"),
    )
    n_files = base_n * REPLICAS
    total_bytes = int(
        big.agg(F.sum(F.octet_length("content"))).first()[0]
    )
    index_dir = tempfile.mkdtemp(prefix="lse_target_idx_", dir=TMP)
    try:
        t0 = time.perf_counter()
        build_index(
            spark, big, index_dir, precomputed_doc_id=True,
            n_buckets=32, index_partitions=PARTITIONS,
            store_content=False, resume=False,
            with_positions=WITH_POSITIONS,
        )
        build_sec = time.perf_counter() - t0
        # sanity: the index answers a query
        eng = SearchEngine(spark, index_dir)
        hits, total = eng.search_result("spark AND query", 10)
        out = dict(
            n_files=n_files,
            corpus_bytes=total_bytes,
            corpus_gb=round(total_bytes / (1 << 30), 2),
            build_sec=round(build_sec, 1),
            files_per_sec=round(n_files / build_sec, 1),
            mb_per_sec=round(total_bytes / (1 << 20) / build_sec, 1),
            reference_target_sec=300,
            meets_target=build_sec <= 300,
            sanity_query_total=total,
            cpus=CPUS,
            with_positions=WITH_POSITIONS,
        )
        with open(
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "BENCH_TARGET.json"), "w"
        ) as fh:
            json.dump(out, fh, indent=2)
        print(json.dumps(out))
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
