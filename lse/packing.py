"""Sequence packing for pretraining pipelines: assign every document to a
fixed-token-budget pack (the batch/sequence grouping step before an LLM
data loader concatenates documents).

Definition (deterministic, order = ``id_col`` ascending): a document joins
the pack its FIRST token falls into —
``pack_id = floor(exclusive_prefix_sum(tokens) / budget)``.

Scale shape — the distributed SCAN pattern: a naive
``sum() OVER (ORDER BY id)`` window forces Spark to a SINGLE partition (a
global ordered cumsum), which is a non-starter at 10^12 rows. Instead the
classic two-phase prefix sum:

1. rows get a fixed arithmetic id-range part (same contract as the index
   build's doc-range buckets — deterministic, no sampling, so both phases
   agree without persisting an intermediate);
2. per-part token totals (one tiny groupBy collect, ≤ n_parts rows on the
   driver) become exclusive per-part OFFSETS;
3. one ``applyInPandas`` per part computes the local exclusive cumsum and
   adds its offset — every part is independent, so the heavy pass is
   embarrassingly parallel.

The result is bit-identical to the single-partition window (the DuckDB
oracle transcribes exactly that), at O(rows/n_parts) per task.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# auto-sizing target: one applyInPandas group should hold at most ~4M rows
# (a few hundred MB of pandas) no matter the corpus size — at 10^12 rows the
# fixed old default of 64 parts would have put ~1.6e10 rows in one group
_TARGET_ROWS_PER_PART = 4_000_000


def _auto_parts(n_rows: int) -> int:
    """Part count for a given row count: never fewer than 64 (parallelism
    floor on small inputs), and scaling linearly so no part exceeds
    ~``_TARGET_ROWS_PER_PART`` rows at any corpus size."""
    return max(64, -(-int(n_rows) // _TARGET_ROWS_PER_PART))


def assign_pack_ids(
    df: DataFrame,
    budget: int = 2048,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    n_parts: Optional[int] = None,
    out: str = "pack_id",
) -> DataFrame:
    """Append ``pack_id`` (long) per the exclusive-prefix definition above.

    ``token_col`` must be a non-negative integer column; rows keep all
    original columns. Empty input returns an empty frame with the added
    column. ``n_parts=None`` (default) auto-sizes from the row count via
    :func:`_auto_parts`; pass an explicit value only to pin tests."""
    if budget <= 0:
        raise ValueError("assign_pack_ids: budget must be positive")
    stats = df.agg(
        F.min(id_col).alias("lo"), F.max(id_col).alias("hi"),
        F.count("*").alias("n"),
    ).first()
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out, T.LongType())]
    )
    if stats["lo"] is None:
        return df.sparkSession.createDataFrame([], schema)
    if n_parts is None:
        n_parts = _auto_parts(int(stats["n"]))
    lo, hi = int(stats["lo"]), int(stats["hi"])
    width = max(1, (hi - lo + n_parts) // n_parts)
    part_expr = f"CAST(({id_col} - {lo}) DIV {width} AS LONG)"
    d = df.withColumn("__part", F.expr(part_expr))
    # phase 2: per-part totals -> exclusive offsets (driver-tiny)
    totals = {
        int(r["__part"]): int(r["t"])
        for r in d.groupBy("__part").agg(F.sum(token_col).alias("t")).collect()
    }
    offsets = {}
    run = 0
    for p in sorted(totals):
        offsets[p] = run
        run += totals[p]
    bc = df.sparkSession.sparkContext.broadcast(offsets)

    def pack(key, pdf: pd.DataFrame) -> pd.DataFrame:
        off = bc.value.get(int(key[0]), 0)
        pdf = pdf.sort_values(id_col)
        excl = pdf[token_col].cumsum() - pdf[token_col] + off
        pdf = pdf.drop(columns="__part")
        pdf[out] = (excl // budget).astype("int64")
        return pdf

    return d.groupBy("__part").applyInPandas(pack, schema)


def pack_sequences(
    df: DataFrame,
    budget: int = 2048,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    text_col: str = "content",
    sep: str = "\n\n",
    n_parts: Optional[int] = None,
) -> DataFrame:
    """Materialize the packed sequences: (pack_id, n_docs, total_tokens,
    text) — documents concatenated in ``id_col`` order within each pack,
    separated by ``sep`` (the step a pretraining data loader tokenizes).

    Scale shape: after :func:`assign_pack_ids` the heavy work is ONE
    groupBy(pack_id) shuffle; a pack holds ~budget tokens regardless of
    corpus size, so no group can skew (the pack boundary is the salt)."""
    packed = assign_pack_ids(
        df, budget=budget, id_col=id_col, token_col=token_col, n_parts=n_parts
    )
    return (
        packed.groupBy("pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(token_col).alias("total_tokens"),
            F.array_join(
                F.array_sort(
                    F.collect_list(F.struct(F.col(id_col), F.col(text_col)))
                ).getField(text_col),
                sep,
            ).alias("text"),
        )
    )
