#!/usr/bin/env python
"""spark-submit entry point — the analog of the reference CLI
(cli/MainCommand.java subcommands index/search/status/rebuild).

    spark-submit --py-files lse.zip scripts/lse_cli.py index \
        --source /path/to/table.parquet --index /path/to/index
    spark-submit ... search --index /path/to/index --query 'java AND spark' \
        --limit 10 [--json]
    spark-submit ... status --index /path/to/index
    spark-submit ... rebuild --source ... --index ...
    spark-submit ... delete --index ... --repo R --path P

The source table must have the input_hint shape
(repo, path, commit, lang, content) or a documents-style shape with an
existing doc_id + text column (auto-adapted).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def adapt_source(df):
    """Map a documents-style table onto the input_hint shape (works on both
    batch and streaming DataFrames)."""
    from pyspark.sql import functions as F

    if "content" not in df.columns and "text" in df.columns:
        df = df.withColumnRenamed("text", "content")
    if "repo" not in df.columns and "source" in df.columns:
        df = df.withColumnRenamed("source", "repo")
    if "path" not in df.columns and {"repo", "doc_id"} <= set(df.columns):
        df = df.withColumn(
            "path",
            F.concat(F.col("repo"), F.lit("/doc_"), F.col("doc_id").cast("string")),
        )
    return df


def load_source(spark, path: str):
    return adapt_source(spark.read.parquet(path))


def main() -> int:
    p = argparse.ArgumentParser(prog="lse")
    sub = p.add_subparsers(dest="cmd", required=True)

    for name in ("index", "rebuild"):
        s = sub.add_parser(name)
        s.add_argument("--source", required=True)
        s.add_argument("--index", required=True)
        s.add_argument("--buckets", type=int, default=8)
        s.add_argument("--partitions", type=int, default=32)
        s.add_argument("--no-positions", action="store_true")
        s.add_argument("--store-content", action="store_true")
        s.add_argument("--tree", action="store_true",
                       help="--source is a raw file tree (distributed "
                            "binaryFile scan), not a parquet table")
        s.add_argument("--glob", default=None,
                       help="pathGlobFilter for --tree, e.g. '*.py'")

    s = sub.add_parser("search")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("--limit", type=int, default=10)
    s.add_argument("--json", action="store_true")
    s.add_argument(
        "--mode", default="auto", choices=["auto", "local", "spark", "bucket"]
    )

    s = sub.add_parser("status")
    s.add_argument("--index", required=True)

    s = sub.add_parser("verify")  # per-file sha256 integrity vs manifest
    s.add_argument("--index", required=True)

    s = sub.add_parser("delete")
    s.add_argument("--index", required=True)
    s.add_argument("--repo", required=True)
    s.add_argument("--path", required=True)

    s = sub.add_parser("update")  # incremental reindex against a new snapshot
    s.add_argument("--source", required=True)
    s.add_argument("--index", required=True)

    s = sub.add_parser("compact")  # merge base+deltas+tombstones → 1 segment
    s.add_argument("--index", required=True)
    s.add_argument("--source", default=None,
                   help="upstream parquet (only needed for content-less indexes)")

    s = sub.add_parser("stream")  # Structured Streaming ingest (file source)
    s.add_argument("--source", required=True, help="parquet dir watched as a stream")
    s.add_argument("--index", required=True)
    s.add_argument("--checkpoint", required=True)
    s.add_argument("--continuous", metavar="INTERVAL", default=None,
                   help="micro-batch cadence, e.g. '10 seconds'; default drains once")
    s.add_argument("--buckets", type=int, default=8)
    s.add_argument("--partitions", type=int, default=32)

    args = p.parse_args()

    from lse.session import get_spark

    spark = get_spark("lse-cli")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        if args.cmd in ("index", "rebuild"):
            from lse.build import build_index

            if args.cmd == "rebuild" and os.path.exists(args.index):
                shutil.rmtree(args.index)  # MainCommand.java:264-283
            if args.tree:
                from lse.sources import read_file_tree

                source_df = read_file_tree(spark, args.source, path_glob=args.glob)
            else:
                source_df = load_source(spark, args.source)
            res = build_index(
                spark,
                source_df,
                args.index,
                n_buckets=args.buckets,
                index_partitions=args.partitions,
                with_positions=not args.no_positions,
                store_content=args.store_content,
            )
            print(json.dumps(dict(
                n_docs=res.n_docs, avgdl=round(res.avgdl, 3),
                build_id=res.build_id, stages_run=res.stages_run,
                stages_skipped=res.stages_skipped,
            )))
        elif args.cmd == "search":
            from lse.engine import SearchEngine
            from lse.querydsl import QueryParseError

            eng = SearchEngine(spark, args.index)
            try:
                hits, total = eng.search_result(args.query, args.limit, mode=args.mode)
            except QueryParseError as e:
                # caret rendering + fix suggestion, matching the reference
                # CLI's error surface (query/QueryParseException.java:6-42)
                print(f"query error: {e}\nsuggestion: {e.suggestion}", file=sys.stderr)
                return 2
            if args.json:
                print(json.dumps(dict(
                    query=args.query, total_matches=total,
                    hits=[dict(doc_id=d, score=s) for d, s in hits],
                )))
            else:
                print(f"total matches: {total}")
                for rank, (d, s) in enumerate(hits, 1):
                    print(f"{rank:3d}. doc={d} score={s:.6f}")
        elif args.cmd == "status":
            from lse.maintenance import index_status

            print(json.dumps(index_status(spark, args.index)))
        elif args.cmd == "verify":
            from lse.build import verify_index

            problems = verify_index(spark, args.index)
            print(json.dumps(dict(intact=not problems, problems=problems)))
            return 0 if not problems else 3
        elif args.cmd == "delete":
            from lse.maintenance import delete_by_path

            n = delete_by_path(spark, args.index, args.repo, args.path)
            print(json.dumps(dict(deleted=n)))
        elif args.cmd == "update":
            from lse.maintenance import apply_incremental

            res = apply_incremental(
                spark, args.index, load_source(spark, args.source)
            )
            print(json.dumps(res))
        elif args.cmd == "compact":
            from lse.maintenance import compact

            src = load_source(spark, args.source) if args.source else None
            print(json.dumps(compact(spark, args.index, source=src)))
        elif args.cmd == "stream":
            from lse.streaming import stream_index

            # schema comes from a batch read of the same dir (file-source
            # streams require an explicit schema); the same column
            # adaptation applies to the stream
            schema = spark.read.parquet(args.source).schema
            stream = adapt_source(
                spark.readStream.schema(schema).parquet(args.source)
            )
            q = stream_index(
                spark, stream, args.index, args.checkpoint,
                trigger_once=args.continuous is None,
                processing_time=args.continuous,
                n_buckets=args.buckets, index_partitions=args.partitions,
            )
            q.awaitTermination()
            print(json.dumps(dict(streamed=True, index=args.index)))
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
