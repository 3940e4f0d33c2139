"""Event-time streaming operators: tumbling windows, session windows,
watermark-bounded dedup (SURVEY.md §2.9).

Each takes an event-time streaming DataFrame (schema of the driver `events`
table: event_id, user_id, event_type, ts, value) and is the streaming twin of
a batch query in crawler_spark/queries.py (st1/st2/st3). The twins are
equality-tested: running the stream with trigger=availableNow over the same
parquet produces the same rows as the batch query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _ts(events: DataFrame) -> DataFrame:
    """Watermarks require TIMESTAMP (with local TZ); parquet event time is
    often TIMESTAMP_NTZ — cast is value-preserving under the engine's fixed
    UTC session timezone."""
    return events.withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """st1 twin: per tumbling event-time window, count + sum(value).
    Late rows beyond `watermark` are dropped (streaming state bound)."""
    return (_ts(events).withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("win"))
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .select(F.unix_timestamp(F.col("win.start")).alias("win_start"),
                    "n", "sum_value"))


def sliding_counts(events: DataFrame, window: str = "1 hour",
                   slide: str = "15 minutes",
                   watermark: str = "2 hours") -> DataFrame:
    """st4 twin: per SLIDING event-time window (each event lands in
    window/slide overlapping windows), count + sum(value). Works on batch
    and streaming DataFrames alike — the st4 batch query calls this very
    function, so the streaming twin is definitionally the same plan."""
    return (_ts(events).withWatermark("ts", watermark)
            .groupBy(F.window("ts", window, slide).alias("win"))
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .select(F.unix_timestamp(F.col("win.start")).alias("win_start"),
                    "n", "sum_value"))


def session_counts(events: DataFrame, gap: str = "30 minutes",
                   watermark: str = "2 hours") -> DataFrame:
    """st2 twin: native session windows (gap-based), one row per
    (user, session) — aggregate per user downstream to get n_sessions."""
    return (_ts(events).withWatermark("ts", watermark)
            .groupBy("user_id", F.session_window("ts", gap).alias("sess"))
            .agg(F.count("*").alias("n_events"))
            .select("user_id", F.unix_timestamp(F.col("sess.start")).alias("sess_start"),
                    "n_events"))


def dedup_within_watermark(events: DataFrame,
                           watermark: str = "2 hours") -> DataFrame:
    """st3 twin: keep one event per (user_id, event_type); duplicates
    arriving within the watermark horizon are dropped with bounded state —
    the streaming form of the crawl's idempotent URL re-discovery handling."""
    return (_ts(events).withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(["user_id", "event_type"]))
