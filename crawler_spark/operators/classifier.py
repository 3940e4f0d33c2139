"""Learned quality filtering: a distributed batch perceptron trained
under the cross-engine hash gate.

The modern pre-training data pipeline replaces hand-tuned heuristic gates
with a LEARNED quality classifier distilled from a teacher signal
(FineWeb-Edu's educational-value classifier, DCLM's fastText filter are
the published instances). This module implements the distributed training
loop itself in pure DataFrame algebra — the part of that recipe a Spark
engine must own:

- one job per epoch: broadcast the (tiny) weight vector into the plan as
  literals, aggregate the full-batch perceptron update as ONE map-side
  partial aggregate over the corpus (`SUM(y*x_j) FILTER (margin <= 0)`),
  collect exactly ONE row of F+1 integers back to the driver. That is the
  canonical data-parallel gradient-descent shape at 100 TB: model state
  driver-held and O(features), data never moves, no shuffle at all beyond
  the final partial-agg merge.
- ALL integers: features are integer text statistics, labels are ±1, so
  weights, margins and scores stay exact BIGINTs — the same
  integer-lattice trick km1 used to put iterative k-means under the
  bit-exact DuckDB gate (float GD could never cross-engine hash).

Classic perceptron (Rosenblatt 1958; full-batch variant): per epoch,
w += Σ_{i: y_i(w·x_i+b) <= 0} y_i x_i  and  b += Σ y_i over the same
misclassified set. Deterministic for a fixed epoch count regardless of
separability.

Reference tie-in: the reference crawler has no quality layer at all
(spider's `crawl()` keeps every fetched page); this is part of the
training-data surface the brief adds on top of SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def perceptron_train(feats: DataFrame, feature_cols: list[str],
                     label_col: str = "y",
                     epochs: int = 3) -> tuple[list[int], int]:
    """Full-batch integer perceptron: returns (weights, bias) after
    `epochs` passes. `feats` must carry BIGINT feature columns and a ±1
    BIGINT label. One aggregate job per epoch; driver state is F+1 ints.

    The margin predicate re-derives from the CURRENT weights as literals,
    so every epoch is a fresh one-stage scan→partial-agg→merge plan over
    an unchanged input — cache `feats` (or localCheckpoint) upstream when
    the feature projection is expensive.
    """
    w = [0] * len(feature_cols)
    b = 0
    y = F.col(label_col)
    for _ in range(epochs):
        score: Column = F.lit(b).cast("long")
        for wj, c in zip(w, feature_cols):
            score = score + F.lit(wj).cast("long") * F.col(c)
        mis = y * score <= 0
        aggs = [F.sum(F.when(mis, y * F.col(c)).otherwise(F.lit(0)))
                .alias(f"d{j}") for j, c in enumerate(feature_cols)]
        aggs.append(F.sum(F.when(mis, y).otherwise(F.lit(0))).alias("db"))
        row = feats.agg(*aggs).collect()[0]
        w = [wj + int(row[f"d{j}"] or 0) for j, wj in enumerate(w)]
        b += int(row["db"] or 0)
    return w, b


def perceptron_score(feats: DataFrame, feature_cols: list[str],
                     w: list[int], b: int) -> DataFrame:
    """Apply trained weights map-side: + score (BIGINT), pred (±1)."""
    score: Column = F.lit(b).cast("long")
    for wj, c in zip(w, feature_cols):
        score = score + F.lit(wj).cast("long") * F.col(c)
    out = feats.withColumn("score", score)
    return out.withColumn(
        "pred",
        F.when(F.col("score") > 0, F.lit(1)).otherwise(F.lit(-1))
         .cast("long"))


def perceptron_oracle_sql(feats_cte: str, feature_cols: list[str],
                          label_col: str = "y",
                          epochs: int = 3,
                          out_cols: str = "doc_id") -> str:
    """DuckDB twin: epochs unrolled as chained 1-row weight CTEs, the
    update aggregate spelled with the same misclassified-set predicate,
    final scoring as a cross join against the last weight row."""
    f = len(feature_cols)
    ctes = [f"f AS ({feats_cte})",
            "w0 AS (SELECT "
            + ", ".join(f"0::BIGINT AS w{j}" for j in range(f))
            + ", 0::BIGINT AS b)"]
    for k in range(1, epochs + 1):
        margin = (f"f.{label_col} * (w{k-1}.b + "
                  + " + ".join(f"w{k-1}.w{j} * f.{c}"
                               for j, c in enumerate(feature_cols))
                  + ")")
        ctes.append(
            f"u{k} AS (SELECT "
            + ", ".join(
                f"COALESCE(SUM(CASE WHEN {margin} <= 0 THEN "
                f"f.{label_col} * f.{c} ELSE 0 END), 0) AS d{j}"
                for j, c in enumerate(feature_cols))
            + f", COALESCE(SUM(CASE WHEN {margin} <= 0 THEN f.{label_col} "
            f"ELSE 0 END), 0) AS db FROM f, w{k-1})")
        ctes.append(
            f"w{k} AS (SELECT "
            + ", ".join(f"w{k-1}.w{j} + u{k}.d{j} AS w{j}" for j in range(f))
            + f", w{k-1}.b + u{k}.db AS b FROM w{k-1}, u{k})")
    score = ("w.b + "
             + " + ".join(f"w.w{j} * f.{c}"
                          for j, c in enumerate(feature_cols)))
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT {out_cols}, f.{label_col} AS {label_col}, "
            f"CAST({score} AS BIGINT) AS score, "
            f"CAST(CASE WHEN {score} > 0 THEN 1 ELSE -1 END AS BIGINT) "
            f"AS pred FROM f, w{epochs} w")
