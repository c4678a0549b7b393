#!/usr/bin/env python
"""Build-side skew evidence (VERDICT r3 #6): a corpus where ONE term is
~50% of all tokens must not create a straggler task in the (term,bucket)
encode stage — the doc-id-range bucketing is the explicit salting that
splits a hot posting list across tasks.

Method: build the index twice over the same skewed corpus —
  * n_buckets=1  (control: the hot term's entire posting list is one
    shuffle group → one task) and
  * n_buckets=8  (the production layout)
— then read per-task durations of every completed stage from the Spark UI
REST API and report max/median task-time ratio for the heaviest stages.
PASS = the bucketed build's worst-stage ratio < 3 while the control shows
the straggler (ratio well above it), i.e. the skew is real and the
bucketing absorbs it.

Writes BENCH_BUILD_SKEW.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("LSE_BSKEW_DOCS", "300000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PARTITIONS = int(os.environ.get("LSE_BSKEW_PARTITIONS", "32"))


def skewed_corpus(spark, n_docs: int):
    """Each doc: 50 occurrences of the hot term + 20 filler tokens from a
    SMALL (2000-term) vocabulary → 'hot' is ~71% of all tokens with df = N,
    and its single (term,bucket) group carries ~15M positions while every
    filler group carries ~3k — the encode-stage straggler shape. The filler
    vocabulary is deliberately small so per-group kernel overhead cannot
    drown the skew signal."""
    from pyspark.sql import functions as F

    d = spark.range(n_docs).repartition(PARTITIONS)
    filler = F.concat_ws(
        " ",
        *[
            F.concat(F.lit(f"w{j}x"), ((F.col("id") * 37 + j) % 100).cast("string"))
            for j in range(20)
        ],
    )
    hot = F.concat_ws(" ", *[F.lit("hot")] * 50)
    return d.select(
        F.col("id").alias("doc_id"),
        F.concat(hot, F.lit(" "), filler).alias("content"),
        F.lit("txt").alias("lang"),
        F.lit("skew").alias("repo"),
        F.concat(F.lit("skew/d"), F.col("id").cast("string")).alias("path"),
        F.lit("").alias("commit"),
    )


def stage_task_ratios(ui_url: str, app_id: str):
    """[(stage_name, n_tasks, max_ms, median_ms, ratio)] for completed
    stages, heaviest first, via the Spark UI REST API."""
    base = f"{ui_url}/api/v1/applications/{app_id}/stages?status=complete"
    stages = json.load(urllib.request.urlopen(base, timeout=30))
    rows = []
    for st in stages:
        sid, att = st["stageId"], st["attemptId"]
        q = (
            f"{ui_url}/api/v1/applications/{app_id}/stages/{sid}/{att}/"
            f"taskSummary?quantiles=0.0,0.5,1.0"
        )
        try:
            summ = json.load(urllib.request.urlopen(q, timeout=30))
        except Exception:
            continue  # stages with no task metrics
        run = summ.get("executorRunTime") or []
        if len(run) != 3 or run[2] <= 0:
            continue
        median, mx = max(run[1], 1.0), run[2]
        rows.append(
            dict(
                stage=f"{sid}: {st['name'].splitlines()[0][:80]}",
                n_tasks=st["numCompleteTasks"],
                max_ms=round(mx, 1),
                median_ms=round(median, 1),
                ratio=round(mx / median, 2),
            )
        )
    rows.sort(key=lambda r: -r["max_ms"])
    return rows


def run_build(n_buckets: int) -> dict:
    from lse.build import build_index
    from lse.session import get_spark

    spark = get_spark(
        f"lse-bskew-{n_buckets}", master=f"local[{CPUS}]",
        shuffle_partitions=PARTITIONS,
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4055"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        src = skewed_corpus(spark, N_DOCS)
        idx = tempfile.mkdtemp(prefix=f"lse_bskew_{n_buckets}_")
        t0 = time.perf_counter()
        build_index(
            spark, src, idx, precomputed_doc_id=True, n_buckets=n_buckets,
            index_partitions=PARTITIONS, store_content=False, resume=False,
        )
        build_sec = time.perf_counter() - t0
        ui = spark.sparkContext.uiWebUrl
        app_id = spark.sparkContext.applicationId
        stages = stage_task_ratios(ui, app_id)
        shutil.rmtree(idx, ignore_errors=True)
        # the straggler diagnostic: worst ratio among the 5 heaviest stages
        # (the encode/groupBy stages dominate; tiny stages' ratios are noise)
        heavy = stages[:5]
        return dict(
            n_buckets=n_buckets,
            n_docs=N_DOCS,
            build_sec=round(build_sec, 2),
            worst_heavy_ratio=max((s["ratio"] for s in heavy), default=0.0),
            heavy_stages=heavy,
        )
    finally:
        spark.stop()


def main():
    # separate processes would be cleaner, but one JVM per run keeps the
    # UI app scoped; run control first, then the production layout
    import subprocess

    results = {}
    for nb in (1, 8):
        out = subprocess.run(
            [sys.executable, __file__, str(nb)],
            capture_output=True, text=True, timeout=1200,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(out.stdout, out.stderr)
            raise SystemExit(f"run n_buckets={nb} failed")
        results[f"buckets_{nb}"] = json.loads(line[-1])
    control = results["buckets_1"]["worst_heavy_ratio"]
    bucketed = results["buckets_8"]["worst_heavy_ratio"]
    out = dict(
        input=f"synthetic 50%-hot-term corpus, {N_DOCS} docs, local[{CPUS}]",
        control_unbucketed=results["buckets_1"],
        production_bucketed=results["buckets_8"],
        straggler_absorbed=bool(bucketed < 3.0 <= control),
    )
    with open("BENCH_BUILD_SKEW.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    if len(sys.argv) > 1:
        print(json.dumps(run_build(int(sys.argv[1]))))
    else:
        main()
