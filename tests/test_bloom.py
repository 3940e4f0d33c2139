"""A5/F1 Bloom prefilter properties: no false negatives; anti-join equality
with and without the bloom (SURVEY.md §5.2.3)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.dedup import (
    BloomFilter, SeenBloom, anti_join_seen, build_bloom_parts, url_hash_col,
)


def test_bloom_filter_no_false_negatives():
    rng = np.random.default_rng(42)
    keys = rng.integers(0, 2**63, size=20_000, dtype=np.int64).view(np.uint64)
    bf = BloomFilter(len(keys), fpp=0.01)
    bf.add(keys)
    assert bool(bf.contains(keys).all())


def test_bloom_filter_fpp_reasonable():
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 2**63, size=50_000, dtype=np.int64).view(np.uint64)
    other = rng.integers(0, 2**63, size=50_000, dtype=np.int64).view(np.uint64)
    bf = BloomFilter(len(keys), fpp=0.01)
    bf.add(keys)
    fp = bf.contains(other).mean()
    assert fp < 0.05, fp


@pytest.fixture(scope="module")
def seen_and_cands(spark):
    seen = (spark.range(0, 5000)
            .select(F.concat(F.lit("http://h/p"), F.col("id")).alias("url_canon"))
            .withColumn("url_hash", url_hash_col(F.col("url_canon"))))
    cands = (spark.range(2500, 9000)
             .select(F.concat(F.lit("http://h/p"), F.col("id")).alias("url_canon"))
             .withColumn("url_hash", url_hash_col(F.col("url_canon"))))
    return seen.localCheckpoint(eager=True), cands.localCheckpoint(eager=True)


def test_anti_join_with_bloom_equals_exact(spark, seen_and_cands):
    seen, cands = seen_and_cands
    bloom = SeenBloom(n_parts=8, keys_per_part=2048, fpp=0.01)
    bloom.merge_from(build_bloom_parts(seen, 8, 2048, 0.01).collect())
    with_bloom = {r["url_canon"] for r in
                  anti_join_seen(cands, seen, bloom, spark).collect()}
    exact = {r["url_canon"] for r in
             anti_join_seen(cands, seen, None, spark).collect()}
    assert with_bloom == exact
    assert exact == {f"http://h/p{i}" for i in range(5000, 9000)}


def test_incremental_merge(spark, seen_and_cands):
    seen, _ = seen_and_cands
    half1 = seen.where(F.col("url_hash") % 2 == 0)
    half2 = seen.where(F.col("url_hash") % 2 != 0)
    bloom = SeenBloom(n_parts=8, keys_per_part=2048, fpp=0.01)
    bloom.merge_from(build_bloom_parts(half1, 8, 2048, 0.01).collect())
    bloom.merge_from(build_bloom_parts(half2, 8, 2048, 0.01).collect())
    probe = bloom.probe_udf(spark)
    misses = seen.withColumn("m", probe("url_hash")).where(~F.col("m")).count()
    assert misses == 0  # no false negatives after incremental OR-merge
