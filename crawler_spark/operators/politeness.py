"""Per-host politeness token buckets (SURVEY.md §2.6 W2, north_rule O1).

The reference throttles via `delay` ms between same-host requests
(proto/crawler.proto:26; enforced inside spider's crawl loop). In the wave
model each wave is a nominal `spec.wave_ms` time slice; a host accrues
``spec.tokens_for(crawl_delay)`` tokens per wave (capped) and spends one per
fetch. Token state lives in the `hosts` table, so it survives checkpoints.

Selection runs as ``groupBy(host).applyInPandas`` (grouped-map, per north_rule)
— per host: sort pending by (priority, depth, url_canon), flag the first
``floor(tokens)``. Token *spend* is applied afterwards from the final
selection counts, because the global page budget (W3) may truncate after
per-host selection; the oracle (tests/oracle.py) spends identically.

Skew note: groupBy(host) shuffles on the raw host key. Zipf-headed hosts make
a hot partition; selection cost is O(pending-per-host log) inside one group,
so the wave loop pre-salts ONLY the shuffle placement via
``spark.sql.adaptive`` + `shuffle.partitions`; the group itself must stay
whole (a bucket is per-host state). The cap on damage is that a host's
pending set is bounded by its discovered URLs — at cluster scale a hot host's
group is still one task; if that ever dominates, split selection into
(window rank <= tokens) which needs no grouped UDF — kept here as
`select_by_window` and used when spec.per_host_tokens is whole-numbered and
state-free selection suffices.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import StructField, StructType, BooleanType


def refill_tokens(pending: DataFrame, hosts: DataFrame | None,
                  robots: DataFrame | None, spec) -> DataFrame:
    """hosts with pending URLs this wave -> (host, tokens) after refill.

    refill = tokens_for(crawl_delay) — see CrawlJobSpec.tokens_for; all
    arithmetic native (codegen), tiny output (one row per active host).
    """
    active = pending.select("host").distinct()
    if hosts is not None:
        active = active.join(hosts.select("host", "tokens"), "host", "left_outer")
    else:
        active = active.withColumn("tokens", F.lit(None).cast("double"))
    if robots is not None and spec.respect_robots_txt:
        active = active.join(
            F.broadcast(robots.select("host", "crawl_delay_ms")), "host", "left_outer")
    else:
        active = active.withColumn("crawl_delay_ms", F.lit(0).cast("long"))
    delay = F.greatest(F.lit(int(spec.delay_ms)).cast("long"),
                       F.coalesce(F.col("crawl_delay_ms"), F.lit(0)).cast("long"))
    refill = F.when(delay <= 0, F.lit(float(spec.per_host_tokens))).otherwise(
        F.greatest(F.lit(1.0), F.least(
            F.lit(float(spec.per_host_tokens)),
            F.floor(F.lit(float(spec.wave_ms)) / delay).cast("double"))))
    return active.select(
        "host",
        F.least(F.lit(float(spec.token_cap)),
                F.coalesce(F.col("tokens"), F.lit(0.0)) + refill).alias("tokens"),
    )


def select_batch(pending: DataFrame, tokens: DataFrame) -> DataFrame:
    """Flag the per-host batch: groupBy(host).applyInPandas token bucket.

    Input: pending ⨝ tokens on host. Output: pending columns + `selected`.
    Deterministic: stable sort on (priority, depth, url_canon).
    """
    joined = pending.join(F.broadcast(tokens), "host", "left_outer")
    out_schema = StructType(
        [f for f in joined.schema.fields if f.name != "tokens"]
        + [StructField("selected", BooleanType(), False)])
    cols = [f.name for f in out_schema.fields if f.name != "selected"]

    def _select(pdf: pd.DataFrame) -> pd.DataFrame:
        take = int(pdf["tokens"].iloc[0]) if pd.notna(pdf["tokens"].iloc[0]) else 0
        pdf = pdf.sort_values(["priority", "depth", "url_canon"],
                              kind="mergesort").reset_index(drop=True)
        pdf["selected"] = pdf.index < take
        return pdf[cols + ["selected"]]

    return joined.groupBy("host").applyInPandas(_select, out_schema)


def select_by_window(pending: DataFrame, tokens: DataFrame) -> DataFrame:
    """UDF-free equivalent of select_batch for the pure-rank case: a window
    row_number per host vs floor(tokens). Same output contract. Kept as the
    no-Python hot path; property-tested equal to select_batch."""
    w = Window.partitionBy("host").orderBy("priority", "depth", "url_canon")
    return (pending.join(F.broadcast(tokens), "host", "left_outer")
            .withColumn("_rn", F.row_number().over(w))
            .withColumn("selected",
                        F.col("_rn") <= F.floor(F.coalesce(F.col("tokens"), F.lit(0.0))))
            .drop("_rn", "tokens"))


def spend_tokens(tokens: DataFrame, final_selected: DataFrame) -> DataFrame:
    """tokens -= count(finally selected per host) — after budget truncation."""
    spent = final_selected.groupBy("host").agg(F.count("*").alias("_n"))
    return (tokens.join(spent, "host", "left_outer")
            .select("host", (F.col("tokens")
                             - F.coalesce(F.col("_n"), F.lit(0)).cast("double")
                             ).alias("tokens")))


def prune_salted(pending: DataFrame, tokens: DataFrame, n_salt: int = 16) -> DataFrame:
    """Skew guard (north_rule J5): per-(host, salt) top-`tokens` pre-prune.

    The (host, salt) window shuffles on a uniform composite key, so a Zipf
    host's pending set splits across n_salt groups; any row in the host's
    GLOBAL top-k is necessarily in its salt-group's top-k, so downstream
    selection over the pruned set equals selection over the full set
    (tests/test_skew.py). Bounds the hot host's group to n_salt * tokens
    rows before any per-host shuffle."""
    w = Window.partitionBy("host", "_salt").orderBy("priority", "depth", "url_canon")
    return (pending
            .withColumn("_salt", F.pmod(F.xxhash64("url_canon"), F.lit(n_salt)))
            .join(F.broadcast(tokens), "host", "left_outer")
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= F.floor(F.coalesce(F.col("tokens"), F.lit(0.0))))
            .drop("_rn", "_salt", "tokens"))


def select_batch_salted(pending: DataFrame, tokens: DataFrame,
                        n_salt: int = 16, use_pandas: bool = False) -> DataFrame:
    """Skew-hardened selection with the same output contract as select_batch
    (every pending row + `selected` flag).

    Pipeline: salted pre-prune (uniform shuffle) -> per-host top-k over the
    BOUNDED pruned set (window rank by default; the grouped-map token bucket
    when use_pandas) -> broadcast the small selected-key set back onto
    pending (map-side join, no shuffle of the full frontier)."""
    pruned = prune_salted(pending, tokens, n_salt)
    flagged = (select_batch if use_pandas else select_by_window)(pruned, tokens)
    sel = (flagged.where(F.col("selected"))
           .select("url_hash").withColumn("_sel", F.lit(True)))
    out = (pending.join(F.broadcast(sel), "url_hash", "left_outer")
           .withColumn("selected", F.coalesce(F.col("_sel"), F.lit(False)))
           .drop("_sel"))
    return out.select(*flagged.columns)


def merge_host_state(old: DataFrame | None, updated: DataFrame) -> DataFrame:
    """Carry forward token state for hosts that were NOT active this wave."""
    if old is None:
        return updated
    carried = old.join(updated.select("host"), "host", "left_anti")
    return updated.unionByName(carried)
