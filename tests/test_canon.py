"""P1 canonicalization golden cases + UDF/pure-fn agreement (SURVEY.md §7.3)."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from crawler_spark.functions.canon import canonicalize, host_of

CASES = json.loads((Path(__file__).parent / "golden" / "canon_cases.json").read_text())


@pytest.mark.parametrize("case", CASES, ids=[c["href"] or c["base"] for c in CASES])
def test_golden(case):
    assert canonicalize(case["base"], case["href"]) == case["want"]


def test_idempotent():
    for c in CASES:
        out = canonicalize(c["base"], c["href"])
        if out:
            assert canonicalize(out, "") == out


def test_host_of():
    assert host_of("http://a.b.c/x/y") == "a.b.c"
    assert host_of("https://a.b.c:8443/x") == "a.b.c"
    assert host_of("http://a.b.c") == "a.b.c"


def test_udf_matches_pure_fn(spark):
    from pyspark.sql import functions as F
    from crawler_spark.functions.canon import canonicalize_udf, host_col
    rows = [(c["base"], c["href"]) for c in CASES]
    df = spark.createDataFrame(rows, "base string, href string")
    got = [r["c"] for r in
           df.select(canonicalize_udf("base", "href").alias("c")).collect()]
    assert got == [c["want"] for c in CASES]
    # host_col (native) == host_of (pure) on canonical urls
    urls = [(c["want"],) for c in CASES if c["want"]]
    df2 = spark.createDataFrame(urls, "u string")
    got2 = [r["h"] for r in df2.select(host_col(F.col("u")).alias("h")).collect()]
    assert got2 == [host_of(u[0]) for u in urls]
