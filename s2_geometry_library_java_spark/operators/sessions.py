"""Event sessionization (gaps-and-islands) for large-scale event pipelines.

A session is a maximal run of one user's events in which no two consecutive
events are more than ``gap_seconds`` apart. This is the standard
training-data / analytics sessionization op (the batch twin of Spark's
streaming ``session_window``), expressed as two window functions over ONE
shuffle:

* partition by user, order by (ts, tiebreak), ``lag`` the previous
  timestamp, flag a session break when the gap strictly exceeds the
  threshold, and running-sum the flags into a per-user session ordinal;
* the follow-up ``groupBy(user, session_seq)`` needs NO second shuffle —
  hash-partitioning on ``user`` already clusters every ``(user, session)``
  group, and Catalyst recognizes the subset-key distribution (verified in
  the plan: one Exchange total).

All outputs are exact integers (epoch seconds, counts, cents) so the DuckDB
oracle hash-matches bit-for-bit; the break rule and tie-break ordering are
mirrored verbatim in SQL (same mirrored-algorithm rule as the other gates).

At 100 TB the single shuffle is keyed by user — the natural key, hot users
are bounded by human behavior, and AQE skew-split covers the rest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def with_sessions(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    order_col: str,
    gap_seconds: int,
) -> DataFrame:
    """Add ``session_seq`` (1-based per-user session ordinal) to every event.

    Ordering inside a user is (ts, order_col) so ties are deterministic.
    A new session starts when the event is the user's first or when
    ``ts - prev_ts > gap_seconds`` (strict: a gap of exactly
    ``gap_seconds`` stays in the same session).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    # TIMESTAMP_NTZ (parquet) has no direct long cast; via TIMESTAMP the
    # session timezone applies, which the gate pins to UTC.
    ts_s = F.col(ts_col).cast("timestamp").cast("long")
    prev_s = F.lag(ts_s).over(w)
    brk = F.when(
        prev_s.isNull() | ((ts_s - prev_s) > F.lit(int(gap_seconds))), 1
    ).otherwise(0)
    run = Window.partitionBy(user_col).orderBy(ts_col, order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_seq", F.sum(brk).over(run).cast("long"))


def session_stats(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    order_col: str,
    gap_seconds: int,
    cents_col: Column | None = None,
) -> DataFrame:
    """One row per (user, session): event count, first/last epoch seconds,
    duration, and an optional exact-integer value rollup.

    The aggregation reuses ``with_sessions``'s partitioning (subset-key
    clustering) so the whole operator is a single shuffle.
    """
    s = with_sessions(df, user_col, ts_col, order_col, gap_seconds)
    ts_s = F.col(ts_col).cast("timestamp").cast("long")
    aggs = [
        F.count("*").alias("n_events"),
        F.min(ts_s).alias("first_ts"),
        F.max(ts_s).alias("last_ts"),
    ]
    if cents_col is not None:
        aggs.append(F.sum(cents_col).alias("value_cents"))
    out = s.groupBy(F.col(user_col), F.col("session_seq")).agg(*aggs)
    return out.withColumn(
        "duration_s", (F.col("last_ts") - F.col("first_ts")).cast("long")
    )
