"""Distributed integer perceptron (operators/classifier.py): exact
equality with a sequential full-batch reference, convergence on a
linearly separable integer set, and scoring consistency."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark.operators.classifier import (
    perceptron_score, perceptron_train,
)

# (x1, x2, y): y = sign(x1 - x2) — linearly separable with margin
_SEP = [(10, 1, 1), (8, 2, 1), (7, 3, 1), (9, 1, 1),
        (1, 10, -1), (2, 8, -1), (3, 7, -1), (1, 9, -1)]


def _pure_train(rows, f, epochs):
    """Sequential mirror of the full-batch update (sum over the
    misclassified set, applied once per epoch)."""
    w, b = [0] * f, 0
    for _ in range(epochs):
        dw, db = [0] * f, 0
        for *x, y in rows:
            if y * (sum(wj * xj for wj, xj in zip(w, x)) + b) <= 0:
                for j in range(f):
                    dw[j] += y * x[j]
                db += y
        w = [wj + dj for wj, dj in zip(w, dw)]
        b += db
    return w, b


def test_perceptron_matches_sequential_reference(spark):
    """The engine's per-epoch aggregate must equal the sequential sum —
    integer arithmetic makes this EXACT equality, not approximate."""
    df = spark.createDataFrame(_SEP, "x1 long, x2 long, y long")
    for epochs in (1, 2, 5):
        got = perceptron_train(df, ["x1", "x2"], epochs=epochs)
        want = _pure_train(_SEP, 2, epochs)
        assert got == want, epochs


def test_perceptron_separates_separable_data(spark):
    """On a margin-separable set the trained weights must reach zero
    training error within a few full-batch epochs."""
    df = spark.createDataFrame(_SEP, "x1 long, x2 long, y long")
    w, b = perceptron_train(df, ["x1", "x2"], epochs=10)
    scored = perceptron_score(df, ["x1", "x2"], w, b)
    errs = scored.where(F.col("pred") != F.col("y")).count()
    assert errs == 0


def test_perceptron_update_is_partition_invariant(spark):
    """The gradient aggregate is a commutative integer sum, so the
    learned weights cannot depend on partitioning."""
    df1 = spark.createDataFrame(_SEP, "x1 long, x2 long, y long") \
        .repartition(1)
    df8 = spark.createDataFrame(_SEP, "x1 long, x2 long, y long") \
        .repartition(8)
    assert perceptron_train(df1, ["x1", "x2"], epochs=3) \
        == perceptron_train(df8, ["x1", "x2"], epochs=3)


def test_perceptron_score_sign_convention(spark):
    """pred is +1 strictly above 0, -1 at or below — the same boundary
    the training-time misclassification test uses (y*score <= 0)."""
    df = spark.createDataFrame([(1, 1)], "x1 long, y long")
    rows = perceptron_score(df, ["x1"], [0], 0).collect()
    assert rows[0]["score"] == 0 and rows[0]["pred"] == -1
