"""Event-time streaming operators: tumbling windows, session windows,
watermark-bounded dedup (SURVEY.md §2.9).

Each takes an event-time streaming DataFrame (schema of the driver `events`
table: event_id, user_id, event_type, ts, value) and is the streaming twin of
a batch query in crawler_spark/queries.py (st1/st2/st3). The twins are
equality-tested: running the stream with trigger=availableNow over the same
parquet produces the same rows as the batch query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


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


def late_data_flags(events: DataFrame, ts_col: str = "ts",
                    order_col: str = "event_id",
                    delay_sec: int = 600,
                    n_blocks: int = 32) -> DataFrame:
    """Batch twin of the WATERMARK admission rule itself (st1-st4 use
    watermarks; this op makes the drop decision inspectable): replay
    events in arrival order (`order_col`) and flag each one late iff its
    event time has fallen more than `delay_sec` behind the maximum event
    time already seen — exactly the row set a `withWatermark(ts,
    delay)` stream would silently drop, surfaced as a column for
    monitoring and replay-vs-stream reconciliation.

    Adds: t (epoch seconds), wm (the exclusive running max event time at
    arrival, = own t for the first arrival), late (boolean).

    Scale shape: the exclusive running maximum over arrival order is the
    same global sequential dependency as sequence packing, and gets the
    same cure — a distributed prefix MAX, not one global window task:
    block-local exclusive cummax over monotone arrival blocks, plus an
    n_blocks-row broadcast table of exclusive block prefix maxima.
    Identical output for any monotone blocking. The block id is a PURE
    map-side expression against driver-frozen boundary literals
    (`_det_block_expr`) — NOT repartitionByRange+spark_partition_id,
    whose runtime-sampled boundaries are not stable across the two plan
    branches below (local cummax vs block offsets); a lazily-checkpointed
    barrier narrows but does not close that race (the st7-class bug)."""
    from pyspark.sql import Window

    from crawler_spark.operators.sampling import _det_block_expr

    t = F.unix_timestamp(F.col(ts_col)).cast("long")
    base = events.withColumn("_t", t)
    blocked = base.withColumn(
        "_blk", _det_block_expr(base, [F.col(order_col)], n_blocks))
    w_loc = (Window.partitionBy("_blk").orderBy(order_col)
             .rowsBetween(Window.unboundedPreceding, -1))
    local = blocked.withColumn("_lmax", F.max("_t").over(w_loc))
    w_blk = (Window.orderBy("_blk")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = (blocked.groupBy("_blk")
               .agg(F.max("_t").alias("_bmax"))
               .withColumn("_boff", F.max("_bmax").over(w_blk))
               .select("_blk", "_boff"))
    # greatest() skips NULLs, so this is NULL only for the global first
    # arrival (both _lmax and _boff NULL) — which falls through to own t.
    out = (local.join(F.broadcast(offsets), "_blk")
           .withColumn("wm", F.coalesce(F.greatest("_lmax", "_boff"),
                                        F.col("_t")).cast("long"))
           .drop("_blk", "_lmax", "_boff"))
    return (out.withColumn("late", F.col("_t") < F.col("wm") - delay_sec)
            .withColumnRenamed("_t", "t"))


def event_sequences(events: DataFrame, pattern: list[str],
                    key_col: str = "user_id", type_col: str = "event_type",
                    ts_col: str = "ts", tie_col: str = "event_id",
                    within_sec: int = 3600) -> DataFrame:
    """Complex-event-processing sequence detection (the MATCH_RECOGNIZE /
    Flink CEP primitive Spark lacks): per key, count occurrences of the
    event-type pattern appearing as STRICTLY CONSECUTIVE events (no
    interleaving — Flink's `next()` contiguity) whose total span fits in
    `within_sec`. The crawl-side use: fetch→parse→commit funnels per
    host, or error→retry→error escalation runs in the scheduler's event
    log.

    Algorithm: order each key's stream once; |p|-1 lead() columns over
    that single Exchange+Sort turn every event into the candidate START
    of a match, so matching is a per-row predicate — no self-joins, no
    per-key iteration, and overlapping matches count (a,b,a,b,a has two
    a,b,a matches). Output (key, n_matches > 0).

    Scale shape: ONE shuffle on the key; all lead windows share the
    sort; state per row is |pattern| columns. A 10^10-row event log
    pays exactly one wide exchange — the same bound as st2's
    sessionization.
    """
    n = len(pattern)
    d = events.select(
        F.col(key_col).alias("key"), F.col(type_col).alias("t0"),
        F.col(ts_col).alias("_ts"), F.col(tie_col).alias("_tie"))
    w = Window.partitionBy("key").orderBy("_ts", "_tie")
    for i in range(1, n):
        d = d.withColumn(f"t{i}", F.lead("t0", i).over(w))
    d = d.withColumn("_span",
                     F.unix_timestamp(F.lead("_ts", n - 1).over(w))
                     - F.unix_timestamp("_ts"))
    cond = F.lit(True)
    for i, p in enumerate(pattern):
        cond = cond & (F.col(f"t{i}") == p)
    cond = cond & (F.col("_span") <= within_sec)
    return (d.select("key", cond.cast("long").alias("_m"))
            .groupBy("key").agg(F.sum("_m").cast("long")
                                .alias("n_matches"))
            .where(F.col("n_matches") > 0)
            .select(F.col("key"), "n_matches"))
