"""Sessionization (operators/sessions.py): hand-computed gaps-and-islands
oracle, boundary semantics (gap == threshold stays in-session), tie-break
determinism, and the one-shuffle plan claim."""

from datetime import datetime

from pyspark.sql import functions as F

from s2_geometry_library_java_spark.operators import sessions


def _ts(s):
    return datetime(2024, 1, 1, 0, 0, s) if s < 60 else datetime(
        2024, 1, 1, s // 3600, (s // 60) % 60, s % 60
    )


ROWS = [
    # user 1: events at t=0, 100, 200 (gap 100 <= 120 stays), then 500
    # (gap 300 > 120 breaks), then 560.
    (1, 0, 10, 1.0),
    (1, 100, 11, 2.0),
    (1, 200, 12, 3.0),
    (1, 500, 13, 4.0),
    (1, 560, 14, 5.0),
    # user 2: single event.
    (2, 50, 20, 7.5),
    # user 3: two events exactly gap apart (120) — SAME session (strict >).
    (3, 0, 30, 1.25),
    (3, 120, 31, 1.25),
]


def _df(spark):
    data = [(u, _ts(t), e, v) for (u, t, e, v) in ROWS]
    return spark.createDataFrame(
        data, "user_id long, ts timestamp, event_id long, value double"
    )


def test_session_assignment(spark):
    out = sessions.with_sessions(_df(spark), "user_id", "ts", "event_id", 120)
    got = {r["event_id"]: r["session_seq"] for r in out.collect()}
    assert got == {10: 1, 11: 1, 12: 1, 13: 2, 14: 2, 20: 1, 30: 1, 31: 1}


def test_session_stats_exact(spark):
    cents = F.round(F.col("value") * 100).cast("long")
    out = sessions.session_stats(
        _df(spark), "user_id", "ts", "event_id", 120, cents_col=cents
    ).collect()
    got = {
        (r["user_id"], r["session_seq"]): (
            r["n_events"], r["last_ts"] - r["first_ts"], r["duration_s"],
            r["value_cents"],
        )
        for r in out
    }
    assert got[(1, 1)] == (3, 200, 200, 600)
    assert got[(1, 2)] == (2, 60, 60, 900)
    assert got[(2, 1)] == (1, 0, 0, 750)
    assert got[(3, 1)] == (2, 120, 120, 250)
    # epoch values are real epoch seconds, not ordinals: user 2's first
    # event is 50s after user 1's
    firsts = {r["user_id"]: r["first_ts"] for r in out if r["session_seq"] == 1}
    assert firsts[2] - firsts[1] == 50


def test_tiebreak_same_timestamp(spark):
    # two events at the identical timestamp: ordering falls back to
    # event_id, both land in one session, count = 2.
    df = spark.createDataFrame(
        [(9, _ts(0), 91, 1.0), (9, _ts(0), 90, 1.0)],
        "user_id long, ts timestamp, event_id long, value double",
    )
    out = sessions.session_stats(df, "user_id", "ts", "event_id", 10).collect()
    assert len(out) == 1 and out[0]["n_events"] == 2


def test_single_shuffle_plan(spark):
    """The groupBy after the window must NOT add a second Exchange: hash
    partitioning on user_id already clusters (user_id, session_seq)."""
    plan = sessions.session_stats(
        _df(spark), "user_id", "ts", "event_id", 120
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
