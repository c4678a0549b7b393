"""Event-stream operators over the ``events`` table — the time-series /
clickstream side of a training-data platform (activity sessionization for
user-level corpus stats, windowed rollups for ingest monitoring).

* sessionize           — gaps-and-islands sessionization (batch)
* event_window_counts  — tumbling-window per-type rollup (batch)
* stream_sessionize    — the same session semantics as a STATEFUL
                         Structured Streaming operator (applyInPandasWithState)

Float-exactness: monetary ``value`` sums go through integer cents
(``round(value·100)::long``) so aggregates are order-independent and
bit-identical cross-engine; only the final ÷100 is a float op, applied to
the same integer on both sides.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

GAP_MINUTES = 30


def _cents(col):
    return F.round(F.col(col) * 100, 0).cast("long")


def _us(col):
    """Epoch microseconds; accepts TIMESTAMP and TIMESTAMP_NTZ (the parquet
    events table is NTZ — unix_micros rejects it without the cast). Only
    ever used in DIFFERENCES, so the session-timezone offset the cast
    introduces cancels out."""
    return F.unix_micros(col.cast("timestamp"))


def sessionize(events: DataFrame, gap_minutes: int = GAP_MINUTES) -> DataFrame:
    """Per-user session assignment with an inactivity gap (gaps-and-islands):
    a new session starts when the time since the user's previous event
    exceeds ``gap_minutes``. Returns one row per (user_id, session_id):
    ``n_events, start_ts, end_ts, duration_us, total_value``.

    Scale shape: ONE shuffle keyed by user_id (the window partition); state
    per task is bounded by that user's events in the partition — for a
    whale user at 100 TB, pre-split by (user_id, day) first and merge
    boundary sessions, the standard two-phase refinement. Ordering ties on
    (ts, event_id) so the lag/cumsum chain is deterministic; the identical
    ORDER BY appears in the DuckDB oracle."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = int(gap_minutes) * 60_000_000
    flagged = events.withColumn(
        "new_sess",
        F.when(
            (_us(F.col("ts")) - _us(F.lag("ts").over(w))) > F.lit(gap_us),
            1,
        )
        .otherwise(0)
        .cast("long"),
    )
    with_id = flagged.withColumn(
        "session_id",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        + 1,
    )
    return (
        with_id.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
            F.sum(_cents("value")).alias("cents"),
        )
        .select(
            "user_id",
            "session_id",
            "n_events",
            "start_ts",
            "end_ts",
            (_us(F.col("end_ts")) - _us(F.col("start_ts"))).alias("duration_us"),
            (F.col("cents") / 100.0).alias("total_value"),
        )
    )


def event_window_counts(events: DataFrame, hours: int = 1) -> DataFrame:
    """Tumbling-window rollup: (win_start, event_type, n_events,
    total_value) per ``hours``-wide window. Uses Spark's native
    ``F.window`` (epoch-aligned tumbling windows — identical bucketing to
    ``date_trunc`` for 1-hour windows); one hash-agg shuffle keyed by
    (window, type), map-side partials absorb hot types."""
    return (
        events.groupBy(
            F.window("ts", f"{int(hours)} hour").alias("win"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_cents("value")).alias("cents"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n_events",
            (F.col("cents") / 100.0).alias("total_value"),
        )
    )


def stream_window_counts(
    events_stream: DataFrame,
    hours: int = 1,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming tumbling-window rollup with a WATERMARK: the streaming
    face of :func:`event_window_counts`. Late events older than
    ``max(event time seen) − watermark`` are dropped by the engine and the
    corresponding window state is reclaimed — bounded state at any corpus
    rate, the standard Structured Streaming windowed-agg pattern.

    Run in ``update`` output mode and keep the last row per
    (win_start, event_type) — counts are monotone per key, so the final
    snapshot equals the batch rollup over the non-late subset. Note Spark
    filters late INPUT against the previous micro-batch's watermark while
    evicting STATE with the current one, so an event is only dropped once
    a prior batch advanced the watermark past it (both behaviors pinned by
    tests/test_events.py)."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{int(hours)} hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_cents("value")).alias("cents"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n_events",
            (F.col("cents") / 100.0).alias("total_value"),
        )
    )


_SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("start_ts", T.TimestampType()),
        T.StructField("end_ts", T.TimestampType()),
        T.StructField("duration_us", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("cents", T.LongType()),
    ]
)


def _session_fold(gap_minutes: int):
    """Build the applyInPandasWithState function: per user, fold incoming
    events (sorted by ts, event_id within the batch) into the open-session
    state and emit the CURRENT view of every session the batch touched —
    update-mode semantics: downstream keeps the last row per
    (user_id, session_id), which converges to exactly the batch
    :func:`sessionize` output once the replay drains."""
    gap_us = int(gap_minutes) * 60_000_000

    def fold(
        key: Tuple,
        pdfs: Iterator[pd.DataFrame],
        state,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            session_id, n_events, start_us, last_us, cents = state.get
        else:
            session_id, n_events, start_us, last_us, cents = 0, 0, 0, 0, 0
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            ts_us = pdf["ts"].astype("int64")  # ns → keep µs below
            for t_ns, val in zip(ts_us, pdf["value"]):
                t_us = t_ns // 1000
                c = int(round(float(val) * 100))
                if n_events == 0 or t_us - last_us > gap_us:
                    if n_events > 0:
                        out.append(
                            (user_id, session_id, n_events, start_us, last_us, cents)
                        )
                    session_id += 1
                    n_events, start_us, cents = 0, t_us, 0
                n_events += 1
                last_us = t_us
                cents += c
        # always emit the open session's current view (update semantics)
        if n_events > 0:
            out.append((user_id, session_id, n_events, start_us, last_us, cents))
        state.update((session_id, n_events, start_us, last_us, cents))
        if out:
            o = pd.DataFrame(
                out,
                columns=[
                    "user_id", "session_id", "n_events", "start_us",
                    "last_us", "cents",
                ],
            )
            yield pd.DataFrame(
                {
                    "user_id": o["user_id"],
                    "session_id": o["session_id"],
                    "n_events": o["n_events"],
                    "start_ts": pd.to_datetime(o["start_us"], unit="us"),
                    "end_ts": pd.to_datetime(o["last_us"], unit="us"),
                    "duration_us": o["last_us"] - o["start_us"],
                    "total_value": o["cents"] / 100.0,
                }
            )

    return fold


def stream_sessionize(
    events_stream: DataFrame, gap_minutes: int = GAP_MINUTES
) -> DataFrame:
    """STATEFUL streaming sessionization via ``applyInPandasWithState``:
    per-user open-session state (id, bounds, integer cents) lives in the
    state store; each micro-batch folds its events in arrival order and
    emits the updated view of every touched session. Run in ``update``
    output mode; the last row per (user_id, session_id) converges to the
    batch :func:`sessionize` result (pinned by tests/test_events.py and
    the ``stream_sessions`` driver entry).

    Scale shape: state is keyed by user_id — O(users) entries of five
    longs each, partitioned across executors by the state-store shuffle;
    per-batch work is one Arrow round trip per user group. Within-user
    event order must be preserved by the source (file replay / kafka
    partition-per-user); cross-batch reordering is the watermark's job in
    a production topology."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events_stream.groupBy("user_id").applyInPandasWithState(
        _session_fold(gap_minutes),
        outputStructType=_SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
