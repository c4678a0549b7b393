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
