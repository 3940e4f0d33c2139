"""Unit/property tests for the text-dedup primitives (the oracle-gate
queries check cross-engine value equality; these pin the *semantic*
properties the operators are chosen for)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.textdedup import (
    rolling_hashes_col, shingles_col, word_hashes_col,
)


def _rolls(spark, texts, k=4):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "id long, text string")
    h = df.select("id", word_hashes_col(F.col("text")).alias("h"))
    out = h.select("id", rolling_hashes_col(F.col("h"), k).alias("r")).collect()
    return {r["id"]: list(r["r"]) for r in out}


def test_rolling_hash_shift_robustness(spark):
    """The winnowing property: prepending words only ADDS windows — every
    window of the original text survives verbatim (contrast a whole-doc
    hash, which changes completely). This is what makes rolling fingerprints
    usable for near-dup detection under insertions."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    shifted = "breaking news today " + base
    r = _rolls(spark, [base, shifted])
    assert set(r[0]) <= set(r[1])
    assert len(set(r[1]) - set(r[0])) <= 4      # only windows crossing the seam


def test_rolling_hash_short_doc_single_window(spark):
    r = _rolls(spark, ["one two three"], k=4)   # < k words
    assert len(r[0]) == 1


def test_shingles_contract(spark):
    df = spark.createDataFrame([(0, "a b c d"), (1, "a b")],
                               "id long, text string")
    got = {r["id"]: list(r["s"]) for r in
           df.select("id", shingles_col(F.col("text"), 3).alias("s")).collect()}
    assert got[0] == ["a b c", "b c d"]
    assert got[1] == ["a b"]                    # short doc: whole-text shingle
