"""Structured Streaming surface (SURVEY.md §2.9).

The engine's wave loop is an explicit driver-side micro-batcher (deterministic
and resumable — preferred for the crawl itself). This package provides the
Structured Streaming faces of the same semantics:

  * scan_stream — tail the per-wave `documents` output as a file stream
    (the reference's per-page ScanStream / subscribe channel, scan.rs:50-64);
  * windows — event-time tumbling/session aggregations and
    watermark-bounded dedup over an event stream, the streaming twins of the
    st1/st2/st3 batch queries (equality-tested in tests/test_streaming.py).
"""

from crawler_spark.streaming.scan_stream import stream_documents, wave_doc_counts
from crawler_spark.streaming.windows import (
    dedup_within_watermark, session_counts, tumbling_counts,
)

__all__ = [
    "stream_documents", "wave_doc_counts",
    "tumbling_counts", "session_counts", "dedup_within_watermark",
]
