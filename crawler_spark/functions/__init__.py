from crawler_spark.functions.canon import canonicalize, canonicalize_udf, host_of

__all__ = ["canonicalize", "canonicalize_udf", "host_of"]
