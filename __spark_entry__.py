"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)      — flagship interleaved-span pipeline on sf0.001.
queries()         — one entry per implemented operator (SURVEY.md §2 +
                    training-data ops), from crawler_spark.queries.
oracle_sql()      — DuckDB twins for every SQL-expressible query; rows-only
                    ops (crawl_bfs, mm1/mm2/mm3 multimodal) are omitted by
                    design (iterative / Python-kernel semantics).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from crawler_spark import queries as _registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on /root/testdata/sf0.001: derive the interleaved text+media
    span payload (input_hint shape), explode media outlinks, and fuse the
    training-data signals (lang-id, quality, token count, fingerprint) into
    one per-document profile."""
    from pyspark.sql import functions as F
    from crawler_spark.functions.text import (
        lang_id_col, quality_score_col, token_count_col,
    )
    from crawler_spark.operators.textdedup import fingerprint_col
    from crawler_spark.queries import _spans_df

    sf_dir = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    spans = _spans_df(spark, sf_dir)
    media = (spans.select("doc_id", F.explode("spans").alias("s"))
             .where(F.col("s.kind") == "media")
             .groupBy("doc_id").agg(F.count("*").alias("n_media")))
    profile = (docs
               .withColumn("lang_pred", lang_id_col(F.col("text")))
               .withColumn("quality", quality_score_col(F.col("text")))
               .withColumn("n_tokens", token_count_col(F.col("text")))
               .withColumn("fp", fingerprint_col(F.col("text")))
               .join(spans.select("doc_id", F.size("spans").alias("n_spans")),
                     "doc_id")
               .join(F.broadcast(media), "doc_id", "left_outer")
               .select("doc_id", "source", "lang", "lang_pred", "quality",
                       "n_tokens", "n_spans",
                       F.coalesce("n_media", F.lit(0)).alias("n_media"), "fp"))
    return profile


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
