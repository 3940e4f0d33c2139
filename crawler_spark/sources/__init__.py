from crawler_spark.sources.parse import extract_spans, SPAN_STRUCT, SPANS_TYPE

__all__ = ["extract_spans", "SPAN_STRUCT", "SPANS_TYPE"]
