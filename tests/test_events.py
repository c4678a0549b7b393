"""Event-stream operators: gaps-and-islands sessionization (batch),
tumbling-window rollups, and the stateful streaming sessionizer
(applyInPandasWithState) converging to the batch result on replay."""

import datetime as dt
import os
import tempfile

import pytest
from pyspark.sql import functions as F

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double"
)


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, minute // 60, minute % 60, second)


def _events(spark, rows):
    return spark.createDataFrame(rows, EV_SCHEMA)


@pytest.fixture
def ev(spark):
    # user 7: events at 0m, 10m, 50m (gap 40m > 30m → two sessions)
    # user 8: single event
    return _events(spark, [
        (1, _ts(0), 7, "click", 1.25),
        (2, _ts(10), 7, "click", 2.50),
        (3, _ts(50), 7, "buy", 10.00),
        (4, _ts(5), 8, "click", 0.75),
    ])


def test_sessionize_hand_computed(spark, ev):
    from lse.events import sessionize

    out = {(r["user_id"], r["session_id"]): r
           for r in sessionize(ev, gap_minutes=30).collect()}
    assert sorted(out) == [(7, 1), (7, 2), (8, 1)]
    s1 = out[(7, 1)]
    assert s1["n_events"] == 2
    assert s1["start_ts"] == _ts(0) and s1["end_ts"] == _ts(10)
    assert s1["duration_us"] == 10 * 60 * 1_000_000
    assert s1["total_value"] == pytest.approx(3.75)
    s2 = out[(7, 2)]
    assert s2["n_events"] == 1 and s2["total_value"] == pytest.approx(10.0)
    assert out[(8, 1)]["duration_us"] == 0


def test_sessionize_gap_boundary_exclusive(spark):
    # a gap of EXACTLY gap_minutes does not split (strict >)
    from lse.events import sessionize

    d = _events(spark, [
        (1, _ts(0), 1, "a", 1.0),
        (2, _ts(30), 1, "a", 1.0),          # exactly 30m later → same session
        (3, _ts(60, 1), 1, "a", 1.0),       # 30m01s later → new session
    ])
    out = sessionize(d, gap_minutes=30).collect()
    assert sorted((r["session_id"], r["n_events"]) for r in out) == [(1, 2), (2, 1)]


def test_sessionize_deterministic_tiebreak(spark):
    # same-ts events order by event_id; cumsum chain stays deterministic
    from lse.events import sessionize

    d = _events(spark, [
        (2, _ts(0), 1, "a", 2.0),
        (1, _ts(0), 1, "a", 1.0),
        (3, _ts(45), 1, "a", 4.0),
    ])
    out = {r["session_id"]: r for r in sessionize(d, gap_minutes=30).collect()}
    assert out[1]["n_events"] == 2 and out[1]["total_value"] == pytest.approx(3.0)
    assert out[2]["n_events"] == 1


def test_event_window_counts(spark, ev):
    from lse.events import event_window_counts

    out = {(str(r["win_start"]), r["event_type"]): r
           for r in event_window_counts(ev, hours=1).collect()}
    r = out[("2024-01-01 00:00:00", "click")]
    assert r["n_events"] == 3
    assert r["total_value"] == pytest.approx(4.50)
    assert out[("2024-01-01 00:00:00", "buy")]["n_events"] == 1


def _drain_stream(spark, df_stream, name, ck):
    q = (
        df_stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name).toPandas()


def test_stream_window_counts_matches_batch(spark):
    """Chronological replay (no late data): the last update per window/type
    equals the batch tumbling rollup exactly."""
    from lse.events import event_window_counts, stream_window_counts

    rows = []
    t = dt.datetime(2024, 1, 1)
    for i in range(120):
        t = t + dt.timedelta(minutes=7)
        rows.append((i, t, i % 3, "ab"[i % 2], round(1.0 + (i % 9) * 0.37, 2)))
    df = _events(spark, rows)
    batch = event_window_counts(df, hours=1).toPandas()

    src = tempfile.mkdtemp(prefix="lse_evw_src_")
    ck = tempfile.mkdtemp(prefix="lse_evw_ck_")
    pdf = df.toPandas().sort_values(["ts", "event_id"]).reset_index(drop=True)
    for c in range(3):
        spark.createDataFrame(pdf.iloc[c * 40:(c + 1) * 40], EV_SCHEMA) \
            .coalesce(1).write.parquet(os.path.join(src, f"chunk_{c}"))
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    upd = _drain_stream(
        spark, stream_window_counts(stream, hours=1, watermark="2 hours"),
        "evw_updates", ck,
    )
    final = (
        upd.sort_values("n_events")
        .groupby(["win_start", "event_type"], as_index=False)
        .last()
    )
    b = batch.sort_values(["win_start", "event_type"]).reset_index(drop=True)
    f = final.sort_values(["win_start", "event_type"]).reset_index(drop=True)
    assert b["n_events"].tolist() == f["n_events"].tolist()
    assert b["total_value"].tolist() == pytest.approx(f["total_value"].tolist())


def test_stream_window_counts_drops_too_late_events(spark):
    """An out-of-order event older than the late-events watermark is
    DROPPED: its window's final count stays at the pre-late value while a
    batch rollup over the full data would include it. Spark filters late
    input against the PREVIOUS batch's watermark (eviction uses the
    current one), so the late file must arrive a batch after the on-time
    file that advanced the watermark past it."""
    import time

    from lse.events import stream_window_counts

    f1 = [(i, _ts(i * 10), 1, "a", 1.0) for i in range(6)]       # 00:00–00:50
    f2 = [(10 + i, dt.datetime(2024, 1, 1, 10 + i), 1, "a", 1.0)
          for i in range(2)]                                      # 10:00, 11:00
    f3 = [(15, dt.datetime(2024, 1, 1, 12), 1, "a", 1.0)]        # 12:00
    late = [(20, _ts(30, 30), 1, "a", 1.0)]                       # 00:30:30 — late
    src = tempfile.mkdtemp(prefix="lse_evl_src_")
    ck = tempfile.mkdtemp(prefix="lse_evl_ck_")
    for i, chunk in enumerate((f1, f2, f3, late)):
        _events(spark, chunk).coalesce(1).write.parquet(
            os.path.join(src, f"chunk_{i}")
        )
        time.sleep(1.1)  # distinct mtimes pin the file-source arrival order
    stream = (
        spark.readStream.schema(_events(spark, f1).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = (
        stream_window_counts(stream, hours=1, watermark="2 hours")
        .writeStream.format("memory")
        .queryName("evl_updates")
        .outputMode("update")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        if p["stateOperators"]
    )
    assert dropped == 1  # the 00:30:30 event (late-filter wm 09:00)
    upd = spark.table("evl_updates").toPandas()
    final = (
        upd.sort_values("n_events")
        .groupby(["win_start", "event_type"], as_index=False)
        .last()
    )
    by_win = {str(r["win_start"]): r["n_events"] for _, r in final.iterrows()}
    assert by_win["2024-01-01 00:00:00"] == 6   # late event NOT merged
    assert by_win["2024-01-01 10:00:00"] == 1
    assert by_win["2024-01-01 11:00:00"] == 1
    assert by_win["2024-01-01 12:00:00"] == 1


def test_stream_sessionize_converges_to_batch(spark):
    """Replay a 200-event corpus through the file source one chunk at a
    time; the last update per (user, session) must equal batch sessionize
    exactly — including sessions that SPAN micro-batch boundaries."""
    import pandas as pd

    from lse.events import sessionize, stream_sessionize

    rows = []
    t = dt.datetime(2024, 1, 1)
    for i in range(200):
        user = i % 5
        # users advance at different paces; every ~8th event jumps > gap
        t = t + dt.timedelta(minutes=3 if i % 8 else 45)
        rows.append((i, t, user, "e", round(0.5 + (i % 13) * 1.07, 2)))
    df = _events(spark, rows)
    batch = sessionize(df, gap_minutes=30).toPandas()

    src = tempfile.mkdtemp(prefix="lse_ev_src_")
    ck = tempfile.mkdtemp(prefix="lse_ev_ck_")
    # four chronological arrival chunks (per-user order preserved)
    pdf = df.toPandas().sort_values(["ts", "event_id"]).reset_index(drop=True)
    for c in range(4):
        chunk = pdf.iloc[c * 50:(c + 1) * 50]
        spark.createDataFrame(chunk, EV_SCHEMA).coalesce(1).write.parquet(
            os.path.join(src, f"chunk_{c}")
        )
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = (
        stream_sessionize(stream, gap_minutes=30)
        .writeStream.format("memory")
        .queryName("sess_updates")
        .outputMode("update")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    upd = spark.table("sess_updates").toPandas()
    assert len(upd) >= len(batch)  # sessions re-emitted as they grow
    # last update per key: n_events is monotone within a session
    final = (
        upd.sort_values("n_events")
        .groupby(["user_id", "session_id"], as_index=False)
        .last()
    )
    b = batch.sort_values(["user_id", "session_id"]).reset_index(drop=True)
    f = final.sort_values(["user_id", "session_id"]).reset_index(drop=True)
    assert len(b) == len(f)
    for col in ("user_id", "session_id", "n_events", "duration_us"):
        assert b[col].tolist() == f[col].tolist(), col
    assert b["total_value"].tolist() == pytest.approx(f["total_value"].tolist())
    assert pd.to_datetime(b["start_ts"]).tolist() == pd.to_datetime(f["start_ts"]).tolist()
    assert pd.to_datetime(b["end_ts"]).tolist() == pd.to_datetime(f["end_ts"]).tolist()
