"""Bucketed seen-table anti-join (plans/bucketio.py): correctness vs the
plain anti-join AND the plan property that justifies the layout — the
bucketed side contributes NO Exchange and NO Sort; only the wave's
candidate side shuffles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark.plans.bucketio import bucketed_anti_join, write_bucketed_seen

TABLE = "seen_bucketed_test"


@pytest.fixture()
def bucketed_seen(spark, tmp_path):
    seen = spark.range(0, 5000).select(
        (F.xxhash64(F.col("id").cast("string"))).alias("url_hash"),
        F.concat(F.lit("https://h"), (F.col("id") % 37).cast("string"),
                 F.lit(".ex/p"), F.col("id").cast("string"))
        .alias("url_canon"))
    write_bucketed_seen(seen, TABLE, str(tmp_path / "seen_bkt"),
                        n_buckets=8)
    yield seen
    spark.sql(f"DROP TABLE IF EXISTS {TABLE}")


def test_bucketed_anti_join_matches_plain(spark, bucketed_seen):
    # candidates overlap half the seen set plus 1000 novel hashes
    cand = spark.range(2500, 6000).select(
        (F.xxhash64(F.col("id").cast("string"))).alias("url_hash"))
    got = bucketed_anti_join(spark, cand, TABLE)
    want = cand.join(bucketed_seen.select("url_hash"),
                     "url_hash", "left_anti")
    assert sorted(r["url_hash"] for r in got.collect()) \
        == sorted(r["url_hash"] for r in want.collect())
    assert got.count() == 3500 - 2500  # ids 5000..5999 are novel


def test_bucketed_side_plans_without_exchange_or_sort(spark, bucketed_seen):
    cand = spark.range(0, 100).select(
        (F.xxhash64(F.col("id").cast("string"))).alias("url_hash"))
    plan = bucketed_anti_join(spark, cand, TABLE) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan
    # THE property that justifies the layout: exactly ONE exchange — the
    # candidate side repartitioning to the bucket layout. The 10^10-row
    # seen side moves nothing. (Bucket-sort order is not propagated by
    # default since Spark 3 — SPARK-24528 — so a Sort on the seen branch
    # is expected and cheap: per-bucket, not per-table.)
    assert plan.count("Exchange hashpartitioning(url_hash") == 1, plan
    assert "Bucketed: true" in plan, plan
