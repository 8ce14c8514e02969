"""Streaming sessionization (streaming/sessions.py): finalized streaming
sessions over a file-source stream match the batch gaps-and-islands
operator on the same rows (fixture avoids the documented diff==gap
boundary difference)."""

import datetime as dt

from pyspark.sql import functions as F

from s2_geometry_library_java_spark.operators import sessions as batch_sessions
from s2_geometry_library_java_spark.streaming import sessions as stream_sessions

GAP = 120  # seconds

BASE = dt.datetime(2026, 1, 1)

# per-user event offsets (seconds); no two consecutive offsets are exactly
# GAP apart, so batch (diff > gap breaks) and streaming (windows merge iff
# diff < gap) agree on every boundary.
OFFSETS = {
    1: [0, 50, 100, 400, 450],       # sessions [0..100], [400..450]
    2: [10],                          # single event
    3: [0, 119, 360],                 # [0..119], [360]
    # watermark flush: one far-future event advances the global watermark
    # past every real session's close, so append mode finalizes them all;
    # this user's own session stays open and must NOT be emitted.
    99: [100_000],
}


def _rows():
    out = []
    eid = 0
    for u, offs in OFFSETS.items():
        for o in offs:
            out.append((BASE + dt.timedelta(seconds=o), u, eid, 1.5))
            eid += 1
    return out


def test_streaming_matches_batch(spark, tmp_path):
    schema = "ts timestamp, user_id long, event_id long, value double"
    src = str(tmp_path / "session_events")
    batch_df = spark.createDataFrame(_rows(), schema)
    batch_df.write.parquet(src)

    cents = F.round(F.col("value") * 100).cast("long")
    want = {
        (r["user_id"], r["first_ts"]): (
            r["n_events"], r["last_ts"], r["duration_s"], r["value_cents"]
        )
        for r in batch_sessions.session_stats(
            batch_df, "user_id", "ts", "event_id", GAP, cents_col=cents
        ).collect()
        if r["user_id"] != 99
    }

    stream = spark.readStream.schema(schema).parquet(src)
    out = stream_sessions.streaming_session_stats(
        stream, "user_id", "ts", GAP, watermark="10 seconds", cents_col=cents
    )
    q = (
        out.writeStream.format("memory")
        .queryName("t_stream_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ss_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["first_ts"]): (
            r["n_events"], r["last_ts"], r["duration_s"], r["value_cents"]
        )
        for r in spark.sql("SELECT * FROM t_stream_sessions").collect()
    }
    assert got == want
    assert len(got) == 5  # 2 + 1 + 2 sessions
