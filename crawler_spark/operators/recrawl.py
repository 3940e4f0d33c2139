"""Recrawl scheduling — freshness TTL over the fetched URL set.

The reference crawls once per ScanRequest (proto/crawler.proto:17; the
`Website` visited-set lives only for the request). A production frontier at
the 10^10-URL design point is a *recrawl* system: every URL carries the wave
it was last fetched, and URLs older than a TTL re-enter the pending frontier.
This module is the operator the cuckoo prefilter's deletion path exists for
(operators/cuckoo.py): expiry deletes the URL's fingerprint so the seen-probe
stops reporting it as a duplicate, and re-admission then flows through the
normal admission pipeline (_admit) like any other candidate.

Dataflow (all built-ins — one hash aggregate, one anti-join):

    fetch_log ── groupBy(url).max(wave) ── age >= ttl ──> due
    seen      ── anti-join(due)  ──> retained seen (expired rows dropped)
    due       ── staleness-ranked frontier rows ──> run_crawl(initial_frontier)

The recrawl job itself is a frontier DRAIN — the exact shape of the
north-rule benchmark (bench.py --drain): every due URL pending at once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from crawler_spark.operators.dedup import url_hash_col
from crawler_spark.spec import CrawlJobSpec


def due_for_recrawl(fetch_log: DataFrame, current_wave: int,
                    ttl_waves: int) -> DataFrame:
    """URLs whose latest *successful* fetch is >= ttl_waves old at
    `current_wave` -> (url_canon, host, last_fetch_wave, age).

    One partial+final hash aggregate (map-side combine is free from
    Catalyst); no window needed. Failed fetches (status != 200) don't count
    as freshness — a URL whose only fetches failed is not 'fresh'.
    """
    last = (fetch_log.where(F.col("status") == 200)
            .groupBy("url_canon", "host")
            .agg(F.max("wave").alias("last_fetch_wave")))
    return (last
            .withColumn("age", F.lit(current_wave) - F.col("last_fetch_wave"))
            .where(F.col("age") >= ttl_waves))


def recrawl_frontier(due: DataFrame) -> DataFrame:
    """Due URLs -> admission candidates (url_canon, depth, priority).

    Staleness-first ordering: priority = -age, so the longest-unfetched URLs
    are selected first under the W1/W2 windows (more negative = earlier,
    consistent with the in-degree -n_refs convention in _admit).
    """
    return due.select("url_canon", F.lit(0).alias("depth"),
                      (-F.col("age").cast("double")).alias("priority"))


def expire_seen(seen: DataFrame, due: DataFrame) -> DataFrame:
    """Drop expired URLs from `seen` so re-admission is not deduped away.

    Anti-join on the casefold hash key (the seen key, SURVEY.md §5.3) —
    AQE plans broadcast/shuffled-hash by size, as with J1.
    """
    keys = due.select(url_hash_col(F.col("url_canon")).alias("url_hash"))
    return seen.join(keys, "url_hash", "left_anti")


def expire_from_cuckoo(cuckoo, due: DataFrame) -> int:
    """Delete expired keys from a SeenCuckoo prefilter; returns #deleted.

    The cuckoo filter is the deletable seen-sketch (Bloom bitsets cannot
    unset bits). Driver-held state => a collect of the due keys; at cluster
    scale the same deletion runs as one job over the per-part key groups
    (the filter is partitioned by pmod(url_hash, n_parts) already).
    Only keys that were inserted may be deleted (standard cuckoo caveat —
    guaranteed here because `due` ⊆ fetched ⊆ seen).
    """
    import numpy as np
    keys = np.array(
        [r["url_hash"] for r in
         due.select(url_hash_col(F.col("url_canon")).alias("url_hash"))
         .collect()], dtype=np.int64)
    if len(keys) == 0:
        return 0
    return int(cuckoo.delete_keys(keys).sum())


def run_recrawl(spark: SparkSession, spec: CrawlJobSpec, fetcher, store,
                ttl_waves: int, robots_src: DataFrame | None = None,
                sink=None, robots_fetcher=None):
    """Recrawl a COMPLETED checkpointed crawl: re-fetch every URL whose last
    fetch is >= ttl_waves older than the job's final wave.

    Reads the finished store's fetch_log, computes the due set, and runs a
    fresh drain over it (run_crawl with initial_frontier). Returns
    (due_df, CrawlRun). The recrawl's own snapshots go to
    `spec.checkpoint_dir` if set (use a new directory — it is a new job).
    """
    from crawler_spark.plans.frontier import run_crawl

    last = store.latest_wave()
    if last is None or last < 0:
        raise ValueError("run_recrawl needs a store with at least one "
                         "committed crawl wave")
    # Enforce the COMPLETED precondition: a store killed mid-crawl still has
    # pending frontier rows; those URLs have no fetch_log rows, so they would
    # be neither due nor crawled — a silently incomplete refresh. Resume the
    # crawl to completion first.
    n_pending = store.read_full("frontier", last).count()
    if n_pending:
        raise ValueError(
            f"store at wave {last} is not a completed crawl: {n_pending} "
            "frontier URL(s) still pending — resume the crawl to completion "
            "before recrawling")
    log = store.read_delta_union("fetch_log", last)
    if log is None:
        raise ValueError("store has no fetch_log deltas to age")
    due = due_for_recrawl(log, last + 1, ttl_waves).localCheckpoint(eager=True)
    run = run_crawl(spark, spec, fetcher, robots_src=robots_src, sink=sink,
                    robots_fetcher=robots_fetcher,
                    initial_frontier=recrawl_frontier(due))
    return due, run
