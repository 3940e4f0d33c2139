"""KMV distinct sketch (operators/sketches.py, ks1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark.operators.sketches import kmv_distinct


def test_kmv_exact_below_k_and_estimates_above(spark):
    rows = [(g, i % n) for g, n in (("small", 40), ("big", 5000))
            for i in range(3 * n)]
    df = spark.createDataFrame(rows, "g string, key long")
    got = {r.g: r for r in
           kmv_distinct(df, ["g"], F.col("key"), k=64).collect()}
    assert got["small"].n_exact == 40
    assert got["small"].kmv_est == 40.0          # exact below k
    assert got["big"].n_exact == 5000
    # KMV relative error ~ 1/sqrt(k-2) ≈ 13%; allow 4 sigma
    assert abs(got["big"].kmv_est - 5000) / 5000 < 0.52
    assert got["big"].kmv_est != 5000.0          # actually estimating


def test_kmv_partition_invariant(spark):
    rows = [("g", i * 31 % 977) for i in range(4000)]
    df = spark.createDataFrame(rows, "g string, key long")
    a = kmv_distinct(df, ["g"], F.col("key")).first()
    b = kmv_distinct(df.repartition(17), ["g"], F.col("key")).first()
    assert (a.n_exact, a.kmv_est) == (b.n_exact, b.kmv_est)
