"""Custom stateful streaming operator: per-host crawl accounting with
`applyInPandasWithState` (SURVEY.md §2.9 — the Structured-Streaming form of
the engine's per-host token/budget state, which the batch wave loop keeps in
the `hosts` table).

As the per-wave document stream flows (one micro-batch per wave commit when
tailed with maxFilesPerTrigger=1), each host's GroupState accumulates
(docs_total, spans_total, waves_seen); every micro-batch emits the host's
refreshed running totals. This is exactly the shape a streaming politeness
governor or per-host quota enforcer takes at 10^10 scale — bounded keyed
state, incremental updates, no full recomputation.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
)

HOST_TOTALS_SCHEMA = StructType([
    StructField("host", StringType(), True),
    StructField("docs_total", LongType(), True),
    StructField("spans_total", LongType(), True),
    StructField("waves_seen", IntegerType(), True),
])

_STATE_SCHEMA = StructType([
    StructField("docs_total", LongType(), True),
    StructField("spans_total", LongType(), True),
    StructField("waves_seen", IntegerType(), True),
])


def _update(key: tuple, pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterable[pd.DataFrame]:
    docs, spans, waves = state.get if state.exists else (0, 0, 0)
    batch_waves: set[int] = set()
    for pdf in pdfs:
        docs += len(pdf)
        spans += int(pdf["n_spans"].sum())
        batch_waves.update(int(w) for w in pdf["wave"].unique())
    waves += len(batch_waves)
    state.update((int(docs), int(spans), int(waves)))
    yield pd.DataFrame({"host": [key[0]], "docs_total": [int(docs)],
                        "spans_total": [int(spans)], "waves_seen": [int(waves)]})


def host_running_totals(doc_stream: DataFrame) -> DataFrame:
    """Streaming per-host running totals over the crawl's document stream.

    Input: the `stream_documents` tail (doc_id, spans, wave). The host key is
    derived from doc_id (a canonical URL). Output: one row per (host,
    micro-batch) with totals-so-far — the incremental mirror of
    `fetch_log.groupBy(host)` in batch mode.
    """
    keyed = doc_stream.select(
        F.regexp_extract("doc_id", r"^[a-z]+://([^/:?#]+)", 1).alias("host"),
        F.size("spans").alias("n_spans"),
        F.col("wave"))
    return (keyed.groupBy("host")
            .applyInPandasWithState(_update, HOST_TOTALS_SCHEMA, _STATE_SCHEMA,
                                    "update", GroupStateTimeout.NoTimeout))
