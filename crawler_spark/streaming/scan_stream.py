"""Scan-mode document stream (SURVEY.md §2.1 S7, §2.9).

The reference streams every fetched page to the API server as it arrives
(ScanStream, src/scanner/scan.rs:50-64, via a subscribe channel of capacity
888). The Spark analog: the crawl's per-wave sink appends `documents` rows to
a parquet directory (crawler_spark/cli.py --stream), and consumers tail that
directory as a Structured Streaming file source — each wave's commit becomes
a micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType, IntegerType, LongType, StringType, StructField, StructType,
)

DOC_STREAM_SCHEMA = StructType([
    StructField("doc_id", StringType(), True),
    StructField("spans", ArrayType(StructType([
        StructField("kind", StringType(), True),
        StructField("text", StringType(), True),
        StructField("media_ref", StringType(), True),
        StructField("offset", IntegerType(), True),
    ]), True), True),
    StructField("wave", IntegerType(), True),
])


def stream_documents(spark: SparkSession, docs_dir: str,
                     max_files_per_trigger: int | None = None) -> DataFrame:
    """Tail a crawl's --stream output directory as a streaming DataFrame."""
    r = spark.readStream.schema(DOC_STREAM_SCHEMA)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(docs_dir)


def wave_doc_counts(docs: DataFrame) -> DataFrame:
    """Per-wave document/span counters over the stream — the consumer-side
    mirror of the engine's metrics table."""
    return (docs.groupBy("wave")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.size("spans")).alias("n_spans"),
                 F.sum(F.size(F.filter("spans", lambda s: s["kind"] == "media")))
                 .alias("n_media")))
