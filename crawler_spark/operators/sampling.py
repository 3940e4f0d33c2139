"""Corpus sampling for training-data mixtures.

Two deterministic selection operators a pre-training pipeline runs after
filtering/dedup:

* `token_budget_select` — per-stratum (usually per-language) quality-ranked
  selection up to a token budget: the data-mixing step that turns "all
  surviving documents" into "the corpus with the target language/domain
  token proportions".
* `hash_split` — deterministic train/validation assignment by content-stable
  hash, so the split is reproducible across runs and engines and never
  depends on row order or partitioning.

Both are pure column algebra with exact ANSI-SQL twins (queries.py tx8/tx9).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def token_budget_select(df: DataFrame, strata_col: str, tokens_col: str,
                        frac: float, order_cols: list[Column]) -> DataFrame:
    """Keep the best rows of each stratum until the stratum's running token
    total reaches `frac` of its full token mass.

    Rows are ranked by `order_cols` (make the last key unique — ties in a
    running-sum cutoff are engine-order-dependent otherwise). Adds
    `cum_tokens` (running total including the current row, in rank order).

    Scale shape: the running sum and the stratum total are two window
    functions over the SAME partition key, so Catalyst plans ONE exchange;
    within-stratum sort is the cost driver. At 100 TB with few large strata,
    replace the full sort with a two-pass threshold: percentile_approx over
    the order key to find the quality cutoff whose expected token mass hits
    the budget, then filter map-side — same selection up to boundary ties,
    no global sort. This exact-window formulation is the oracle-checkable
    reference semantics.
    """
    w_cum = (Window.partitionBy(strata_col).orderBy(*order_cols)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_tot = Window.partitionBy(strata_col)
    out = (df.withColumn("cum_tokens", F.sum(tokens_col).over(w_cum))
           .withColumn("_tot", F.sum(tokens_col).over(w_tot)))
    return (out.where(F.col("cum_tokens")
                      <= F.floor(F.lit(frac) * F.col("_tot")).cast("long"))
            .drop("_tot"))


def hash_split(key: Column, val_permille: int) -> Column:
    """'val' for keys whose md5-derived permille < `val_permille`, else
    'train'. Content-stable: the same key lands in the same split in every
    run, engine, and partitioning (md5 first 8 hex chars -> int, mod 1000 —
    bit-identical in Spark and DuckDB). Map-side, zero shuffle."""
    bucket = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % 1000
    return F.when(bucket < val_permille, F.lit("val")).otherwise(F.lit("train"))
