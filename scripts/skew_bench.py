#!/usr/bin/env python
"""Block-max WAND win-regime evidence (VERDICT r2 #1).

The uniform synthetic corpus gives WAND nothing to prune (every block's
bound ≈ the global bound), so the bucket kernel wins there and
``strategy='auto'`` rightly picks it. This bench builds the SKEWED corpus
(lse.fixtures.make_skewed_df: zipf-like tf spikes on a hot term + a rare
high-idf term — the regime the reference's skip lists exist for,
storage/PostingsWriter.java:48-60) and measures:

1. end-to-end `search_topk` latency, strategy='wand' vs strategy='bucket'
   (min-of-N warm, rank/score parity asserted);
2. KERNEL-level time on the collected postings (one thread, no Spark job
   floor): range-bulk block-max WAND vs exhaustive decode+score — the
   per-bucket work a 1000-executor cluster multiplies;
3. what strategy='auto' picks for each query (must be 'wand' here and
   'bucket' on the uniform corpus).

Writes BENCH_SKEW.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("LSE_SKEW_DOCS", "2000000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PARTITIONS = int(os.environ.get("LSE_SKEW_PARTITIONS", "32"))
N_BUCKETS = int(os.environ.get("LSE_SKEW_BUCKETS", "8"))
RARE_EVERY = int(os.environ.get("LSE_SKEW_RARE_EVERY", "20000"))

# the win-regime queries (rare term(s) against a stopword-like list) plus
# one contrast query with FAT companion lists, where the vectorized bucket
# kernel must win and strategy='auto' must say so
QUERIES = [
    "rare OR hot",
    "rare OR rare2 OR hot",
    "rare AND hot",
    "rare OR hot OR warm1 OR warm2",
]


def kernel_times(eng, terms, k=10, reps=3):
    """Driver-side kernel comparison in the PER-BUCKET shape the bucket
    tier actually executes (one kernel per doc-range bucket; the driver
    folds k·B rows): range-bulk BMW (block bounds first, decode only
    unpruned ranges) vs exhaustive decode-everything + top-k. Reported
    times are the SUM over buckets — single-thread CPU cost, i.e. the
    per-executor work a cluster multiplies."""
    import numpy as np
    from pyspark.sql import functions as F

    from lse.wand import (
        TermCursor, exhaustive_scores, topk_from_scores, wand_topk_bulk,
    )

    rows = (
        eng.postings.filter(F.col("term").isin(sorted(set(terms))))
        .select("term", "bucket", "payload", "df_shard", "df",
                "block_last_doc", "block_offset", "block_max_raw")
        .collect()
    )
    N = eng.N
    buckets = sorted({r["bucket"] for r in rows})

    def idf_of(r):
        b = min(max(int(r["df"]), 0), N)
        return float(np.log((N - b + 0.5) / (b + 0.5) + 1.0))

    wand_best = exh_best = float("inf")
    for _ in range(reps):
        w_total = e_total = 0.0
        w_all, e_all = [], []
        for bk in buckets:
            brows = [r for r in rows if r["bucket"] == bk]
            t0 = time.perf_counter()
            cur = [
                TermCursor(bytes(r["payload"]), r["block_last_doc"],
                           r["block_offset"], r["block_max_raw"],
                           int(r["df_shard"]), idf_of(r))
                for r in brows
            ]
            w_all.extend(wand_topk_bulk(cur, k, eng.avgdl))
            w_total += time.perf_counter() - t0
            term_rows = {}
            for r in brows:
                term_rows.setdefault(r["term"], []).append(
                    (bytes(r["payload"]), int(r["df_shard"]), int(r["df"]))
                )
            t0 = time.perf_counter()
            ids, scores = exhaustive_scores(term_rows, N, eng.avgdl)
            e_all.extend(topk_from_scores(ids, scores, k))
            e_total += time.perf_counter() - t0
        wand_best = min(wand_best, w_total)
        exh_best = min(exh_best, e_total)
        fold = lambda hits: sorted(hits, key=lambda t: (-t[1], t[0]))[:k]
        wand_hits, exh_hits = fold(w_all), fold(e_all)
    assert [d for d, _ in wand_hits] == [d for d, _ in exh_hits], (
        wand_hits, exh_hits)
    for (_, ws), (_, es) in zip(wand_hits, exh_hits):
        assert abs(ws - es) < 1e-9
    return dict(
        wand_kernel_sec=round(wand_best, 4),
        exhaustive_kernel_sec=round(exh_best, 4),
        kernel_speedup=round(exh_best / max(wand_best, 1e-9), 2),
    )


def main() -> None:
    from lse.build import build_index
    from lse.engine import SearchEngine
    from lse.fixtures import make_skewed_df
    from lse.session import get_spark

    spark = get_spark(
        "lse-skew", master=f"local[{CPUS}]", shuffle_partitions=PARTITIONS
    )
    spark.sparkContext.setLogLevel("ERROR")
    index_dir = tempfile.mkdtemp(prefix="lse_skew_idx_")
    out = dict(n_docs=N_DOCS, cpus=CPUS, n_buckets=N_BUCKETS, queries={})
    try:
        src = make_skewed_df(spark, N_DOCS, partitions=PARTITIONS,
                             rare_every=RARE_EVERY)
        t0 = time.perf_counter()
        build_index(
            spark, src, index_dir, precomputed_doc_id=True,
            n_buckets=N_BUCKETS, index_partitions=PARTITIONS,
            store_content=False, resume=False,
        )
        out["build_sec"] = round(time.perf_counter() - t0, 2)
        eng = SearchEngine(spark, index_dir).warm()
        eng.search_topk("warmup", 10)

        for q in QUERIES:
            rec = {}
            import lse.querydsl as querydsl

            ast = querydsl.parse(q).ast
            or_terms = eng.wand_terms(ast, "OR")
            and_terms = eng.wand_terms(ast, "AND")
            terms = or_terms if or_terms is not None else and_terms
            rec["auto_choice"] = eng.choose_topk_strategy(
                terms, conjunctive=or_terms is None
            )
            results = {}
            for strat in ("wand", "bucket"):
                eng.search_topk(q, 10, strategy=strat)  # first-touch
                best = float("inf")
                for _ in range(3):
                    t1 = time.perf_counter()
                    results[strat] = eng.search_topk(q, 10, strategy=strat)
                    best = min(best, time.perf_counter() - t1)
                rec[f"{strat}_sec"] = round(best, 4)
            assert [d for d, _ in results["wand"]] == [
                d for d, _ in results["bucket"]
            ], (q, results)
            for (_, ws), (_, bs) in zip(results["wand"], results["bucket"]):
                assert abs(ws - bs) < 1e-9
            rec["e2e_speedup"] = round(
                rec["bucket_sec"] / max(rec["wand_sec"], 1e-9), 2
            )
            if or_terms is not None:
                rec.update(kernel_times(eng, terms))
            out["queries"][q] = rec
            print(q, rec, flush=True)

        with open(
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "BENCH_SKEW.json"), "w"
        ) as fh:
            json.dump(out, fh, indent=2)
        print(json.dumps(out))
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
