"""WARC 1.0 render/parse (sources/warc.py, driver query wc1).

The parser must be driven by Content-Length framing alone: the adversarial
payloads below embed record markers, header blocks, and blank lines inside
payload bytes, which a split-on-"WARC/1.0" parser mangles.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from crawler_spark.sources.warc import (
    parse_warc, parse_warc_bytes, warc_file_blobs, warc_record_col,
)

ADVERSARIAL = [
    "plain text body",
    "",                                        # empty payload
    "embedded marker\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\ngotcha",
    "blank\r\n\r\nlines\r\n\r\n",              # header-terminator bytes
    "trailing crlf\r\n",
    "unicode: héllo wörld — 日本語テキスト",      # multi-byte UTF-8
    "Content-Length: 99999\r\nliar",           # header-shaped payload
]


def _spark_roundtrip(spark, payloads):
    rows = [(i, p) for i, p in enumerate(payloads)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uri = F.concat(F.lit("https://t.example/doc/"),
                   F.col("doc_id").cast("string"))
    files = warc_file_blobs(
        df.withColumn("file_id", (F.col("doc_id") % 2).cast("long")),
        "file_id", "doc_id", warc_record_col(uri, F.col("text")))
    out = parse_warc(files, "blob").collect()
    return {int(r.target_uri.rsplit("/", 1)[1]): (r.payload, r.n_bytes)
            for r in out}


def test_roundtrip_identity_adversarial(spark):
    got = _spark_roundtrip(spark, ADVERSARIAL)
    assert set(got) == set(range(len(ADVERSARIAL)))
    for i, want in enumerate(ADVERSARIAL):
        payload, n_bytes = got[i]
        assert payload == want, f"doc {i} mangled"
        assert n_bytes == len(want.encode("utf-8"))


def test_content_length_is_bytes_not_chars(spark):
    """Multi-byte payloads: Content-Length must count UTF-8 bytes."""
    s = "é" * 10  # 10 chars, 20 bytes
    got = _spark_roundtrip(spark, [s])
    assert got[0] == (s, 20)


def test_parser_rejects_malformed():
    with pytest.raises(ValueError, match="version"):
        parse_warc_bytes(b"HTTP/1.1 200 OK\r\n\r\nbody")
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc_bytes(b"WARC/1.0\r\nWARC-Type: response\r\n\r\nbody")
    # truncated payload: header claims more bytes than remain
    rec = (b"WARC/1.0\r\nWARC-Target-URI: u\r\nContent-Length: 100\r\n"
           b"\r\nshort")
    with pytest.raises(ValueError, match="truncated"):
        parse_warc_bytes(rec)
    with pytest.raises(ValueError, match="unterminated"):
        parse_warc_bytes(b"WARC/1.0\r\nContent-Length: 3")


def test_render_is_order_deterministic(spark):
    """Blob bytes are identical regardless of input row order/partitioning."""
    rows = [(i, f"payload {i}") for i in range(20)]
    out = []
    for data in (rows, rows[::-1]):
        df = spark.createDataFrame(data, "doc_id long, text string") \
                  .repartition(7)
        uri = F.concat(F.lit("u/"), F.col("doc_id").cast("string"))
        blobs = warc_file_blobs(
            df.withColumn("f", F.lit(0)), "f", "doc_id",
            warc_record_col(uri, F.col("text"))).collect()
        out.append(hashlib.md5(blobs[0].blob.encode()).hexdigest())
    assert out[0] == out[1]
