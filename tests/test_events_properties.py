"""Property tests for the event sessionizers.

The streaming fold (lse.events._session_fold) is pure Python over pandas
batches, so hypothesis can drive it directly — no Spark roundtrip: for ANY
event sequence and ANY chronological micro-batch split, folding batch by
batch and keeping the last update per session must equal a simple
reference sessionizer. The batch operator is then pinned against the same
reference through Spark on seeded datasets.
"""

import datetime as dt

import hypothesis.strategies as st
import pandas as pd
import pytest
from hypothesis import given, settings

GAP_MIN = 30
GAP_US = GAP_MIN * 60_000_000
BASE = dt.datetime(2024, 1, 1)


def ref_sessions(events):
    """Reference gaps-and-islands: events = [(event_id, ts_us, value_cents)]
    for ONE user, any order; returns {session_id: (n, start_us, end_us,
    cents)}."""
    out = {}
    sid = n = start = last = cents = 0
    for eid, t, c in sorted(events, key=lambda e: (e[1], e[0])):
        if n == 0 or t - last > GAP_US:
            if n:
                out[sid] = (n, start, last, cents)
            sid += 1
            n, start, cents = 0, t, 0
        n += 1
        last = t
        cents += c
    if n:
        out[sid] = (n, start, last, cents)
    return out


class FakeState:
    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def run_fold(events, cuts):
    """Drive _session_fold over chronological batches cut at the given
    positions; return {session_id: (n, start_us, end_us, cents)} from the
    last update per session."""
    from lse.events import _session_fold

    fold = _session_fold(GAP_MIN)
    ordered = sorted(events, key=lambda e: (e[1], e[0]))
    bounds = sorted(set(cuts)) + [len(ordered)]
    state = FakeState()
    final = {}
    lo = 0
    for hi in bounds:
        chunk = ordered[lo:hi]
        lo = hi
        if not chunk:
            continue
        pdf = pd.DataFrame(
            {
                "event_id": [e[0] for e in chunk],
                "ts": pd.to_datetime([BASE + dt.timedelta(microseconds=e[1])
                                      for e in chunk]),
                "value": [e[2] / 100.0 for e in chunk],
            }
        )
        for out in fold((7,), iter([pdf]), state):
            for r in out.itertuples():
                final[r.session_id] = (
                    r.n_events,
                    int(r.start_ts.value // 1000),
                    int(r.end_ts.value // 1000),
                    int(round(r.total_value * 100)),
                )
    return final


EVENTS = st.lists(
    st.tuples(
        st.integers(0, 10_000),                 # event_id
        st.integers(0, 5 * GAP_US),             # ts offset µs
        st.integers(0, 50_000),                 # cents
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda e: e[0],
)


@given(
    events=EVENTS,
    cuts=st.lists(st.integers(0, 60), max_size=5),
)
@settings(max_examples=200, deadline=None)
def test_stream_fold_equals_reference_for_any_batch_split(events, cuts):
    base_us = [(e[0], e[1], e[2]) for e in events]
    want = ref_sessions(base_us)
    got = run_fold(base_us, cuts)
    # epoch base offset: ref uses raw µs offsets, fold output is absolute —
    # normalize via BASE
    base_epoch = int(pd.Timestamp(BASE).value // 1000)
    got_rel = {
        sid: (n, s - base_epoch, e - base_epoch, c)
        for sid, (n, s, e, c) in got.items()
    }
    assert got_rel == want


@pytest.mark.parametrize("seed", [1, 7, 23])
def test_batch_sessionize_equals_reference(spark, seed):
    import numpy as np

    from lse.events import sessionize

    rng = np.random.default_rng(seed)
    rows, raw = [], {}
    eid = 0
    for user in range(6):
        t = 0
        for _ in range(int(rng.integers(1, 40))):
            t += int(rng.integers(1, 2 * GAP_US))
            cents = int(rng.integers(0, 10_000))
            rows.append(
                (eid, BASE + dt.timedelta(microseconds=t), user, "e",
                 cents / 100.0)
            )
            raw.setdefault(user, []).append((eid, t, cents))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double",
    )
    out = sessionize(df, gap_minutes=GAP_MIN).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], {})[r["session_id"]] = (
            r["n_events"],
            r["duration_us"],
            int(round(r["total_value"] * 100)),
        )
    for user, evs in raw.items():
        want = {
            sid: (n, e - s, c)
            for sid, (n, s, e, c) in ref_sessions(evs).items()
        }
        assert by_user[user] == want, user
