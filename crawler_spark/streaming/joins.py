"""Stream-stream interval join (SURVEY.md §2.9): the Structured-Streaming
form of operators/joins.time_window_join.

Semantics twin: an INNER join of two watermarked streams on an equality
key plus a time-range condition — "right events that preceded this left
event by less than `lag_max`". Spark keeps both sides in keyed state and
uses the watermark + range bound to EXPIRE state: a right row older than
(left watermark - lag_max) can never match a future left row, so the
state store stays bounded at (arrival-rate x lag_max) regardless of
stream length — this is the property that makes the join runnable
forever at 10^10 events, and it is exactly the bucketization argument
time_window_join makes in batch (bucket width = lag width = state
horizon).

Inner-join results emit as soon as both rows arrive (the watermark only
bounds state retention, not result latency), which also makes the
stream==batch equality test exact under trigger=availableNow: no
final-watermark flush hazard, unlike outer joins / post-join
aggregations whose tail groups only finalize when a LATER batch advances
the watermark past them (the batch twin keeps the zero-count left rows;
streaming callers needing them run the left-outer form and accept
watermark-delayed emission).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join_streams(left: DataFrame, right: DataFrame, on: str,
                          left_ts: str, right_ts: str,
                          lag_max_sec: int,
                          delay: str = "10 minutes") -> DataFrame:
    """Watermarked stream-stream inner join: pairs where
    right_ts <= left_ts AND left_ts - right_ts < lag_max_sec, matching
    time_window_join's half-open window over epoch seconds. Both inputs
    are streaming DataFrames carrying TIMESTAMP columns `left_ts` /
    `right_ts` (the range condition must be on event-time columns for
    state expiry to apply). Output: left columns + the right timestamp."""
    l = left.withWatermark(left_ts, delay).alias("l")
    r = right.withWatermark(right_ts, delay).alias("r")
    lt, rt = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    cond = ((F.col(f"l.{on}") == F.col(f"r.{on}"))
            & (rt <= lt)
            & (rt > lt - F.expr(f"INTERVAL {int(lag_max_sec)} SECONDS")))
    return l.join(r, cond, "inner")


def enrich_stream(stream: DataFrame, dim: DataFrame,
                  on: str | list[str]) -> DataFrame:
    """Stream-static enrichment join (SURVEY.md §2.9): each micro-batch
    of the stream left-joins the STATIC dim — the lookup a crawl stream
    runs against robots/token/config tables (J2/J3's streaming form).

    STATELESS by construction: Spark keeps no join state because the
    static side is re-evaluated per micro-batch — which is also the
    refresh semantics (a dim table updated between batches lands
    without restarting the query; exactly how the per-wave robots cache
    behaves in the batch loop). The dim is explicitly broadcast so the
    stream side never shuffles — at 10^10 events the stream stays
    partition-local while the host-cardinality dim rides the broadcast,
    the same plan the batch gate_frontier pins."""
    return stream.join(F.broadcast(dim), on, "left")
