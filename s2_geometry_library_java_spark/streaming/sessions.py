"""Streaming sessionization: the watermarked twin of
operators/sessions.session_stats.

Spark's built-in ``session_window`` keeps per-(user, open-session) state
and merges windows as late-but-in-watermark events arrive; sessions
finalize once the watermark passes their close. Semantics match the batch
gaps-and-islands operator with one documented boundary difference: the
batch rule keeps ``diff == gap`` in-session (strict ``>`` breaks) while
``session_window`` closes at exactly ``ts + gap`` (two events exactly
``gap`` apart do NOT merge). Everything else — counts, first/last epoch
seconds, exact cents rollups — is the same arithmetic, asserted
batch-vs-stream in tests.

At scale the state store is bounded by (open sessions per user) x (users
active inside the watermark) — the stream shuffles once, keyed by user,
same as the batch plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def streaming_session_stats(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int,
    watermark: str = "1 hour",
    cents_col: Column | None = None,
) -> DataFrame:
    """One finalized row per (user, session): n_events, first_ts/last_ts
    (epoch seconds), duration_s, and an optional exact-integer value
    rollup — append-mode safe (rows emit only when the watermark closes
    the session)."""
    e = events.withWatermark(ts_col, watermark)
    ts_s = F.col(ts_col).cast("timestamp").cast("long")
    aggs = [
        F.count("*").alias("n_events"),
        F.min(ts_s).alias("first_ts"),
        F.max(ts_s).alias("last_ts"),
    ]
    if cents_col is not None:
        aggs.append(F.sum(cents_col).alias("value_cents"))
    out = e.groupBy(
        F.col(user_col),
        F.session_window(F.col(ts_col), f"{int(gap_seconds)} seconds"),
    ).agg(*aggs)
    return out.select(
        F.col(user_col),
        F.col("session_window.start").alias("session_start"),
        *[c for c in ("n_events", "first_ts", "last_ts")],
        *(["value_cents"] if cents_col is not None else []),
    ).withColumn("duration_s", (F.col("last_ts") - F.col("first_ts")).cast("long"))
