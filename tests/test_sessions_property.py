"""Property test: sessionization invariants hold on arbitrary event
streams (random users, random inter-arrival gaps around the threshold)."""

import datetime as dt

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from s2_geometry_library_java_spark.operators import sessions

GAP = 60
BASE = dt.datetime(2025, 6, 1)


@st.composite
def event_streams(draw):
    n_users = draw(st.integers(1, 4))
    out = []
    eid = 0
    for u in range(n_users):
        n = draw(st.integers(1, 12))
        t = draw(st.integers(0, 100))
        for _ in range(n):
            out.append((u, t, eid))
            eid += 1
            # gaps cluster around the threshold to hammer the boundary
            t += draw(st.sampled_from([1, 30, 59, 60, 61, 120, 500]))
    return out


@settings(max_examples=12, deadline=None)
@given(event_streams())
def test_session_invariants(spark, stream):
    rows = [(u, BASE + dt.timedelta(seconds=t), e, 1.0) for (u, t, e) in stream]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )
    assigned = sessions.with_sessions(df, "user_id", "ts", "event_id", GAP).collect()
    # 1) sessions partition the events: every event has exactly one seq
    assert len(assigned) == len(rows)
    by_user = {}
    for r in assigned:
        by_user.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["session_seq"])
        )
    for u, evs in by_user.items():
        evs.sort()
        seqs = [s for (_, _, s) in evs]
        # 2) seqs start at 1 and are non-decreasing, stepping by at most 1
        assert seqs[0] == 1
        assert all(b - a in (0, 1) for a, b in zip(seqs, seqs[1:]))
        # 3) break iff gap > GAP between consecutive events
        for (t0, _, s0), (t1, _, s1) in zip(evs, evs[1:]):
            gap = (t1 - t0).total_seconds()
            assert (s1 == s0 + 1) == (gap > GAP), (u, t0, t1, gap, s0, s1)
    # 4) session_stats counts sum back to the event count
    stats = sessions.session_stats(df, "user_id", "ts", "event_id", GAP).collect()
    assert sum(r["n_events"] for r in stats) == len(rows)
    for r in stats:
        assert r["duration_s"] == r["last_ts"] - r["first_ts"] >= 0
