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


def test_cdx_offsets_slice_real_blobs(spark):
    """wc2's algebra pinned to bytes: slicing the rendered file blob at
    every (offset, length) must yield exactly one well-formed record whose
    payload digest and SURT urlkey match the index row."""
    import hashlib

    from crawler_spark.sources.warc import (
        cdx_index, parse_warc_bytes, warc_file_blobs, warc_record_col,
    )
    rows = [(i, i % 3, f"http://h{i % 5}.example.com:80/p/{i}?x={i}",
             f"payload {i} " + "y" * (i % 7))
            for i in range(24)]
    df = spark.createDataFrame(
        rows, "doc_id long, file_id long, uri string, payload string")
    blobs = {r.file_id: r.blob for r in warc_file_blobs(
        df, "file_id", "doc_id",
        warc_record_col(F.col("uri"), F.col("payload"))).collect()}
    idx = cdx_index(df, "file_id", "doc_id",
                    F.col("uri"), F.col("payload")).collect()
    assert len(idx) == 24
    for r in idx:
        raw = blobs[r.file_id].encode("utf-8")
        sl = raw[r.offset:r.offset + r.length]
        assert sl.startswith(b"WARC/1.0\r\n")
        recs = parse_warc_bytes(sl)
        assert len(recs) == 1
        uri, _, payload = recs[0]
        assert hashlib.md5(payload).hexdigest() == r.digest
        host = uri.split("://", 1)[1].split("/", 1)[0].split(":")[0]
        rest = uri.split("://", 1)[1]
        want_key = (",".join(reversed(host.split("."))) + ")"
                    + rest[len(uri.split("://", 1)[1].split("/", 1)[0]):])
        assert r.urlkey == want_key.lower()


def test_delta_records_roundtrip(spark):
    """wc3: an incremental archive mixes headers-only revisit records
    (unchanged payload digest) with full response records (new/changed);
    the Content-Length framing must walk both, unchanged captures carry
    zero payload bytes, and the revisit headers must point back at the
    original response record's id and digest."""
    from crawler_spark.sources.warc import (
        parse_warc_bytes, warc_delta_record_col, warc_file_blobs,
    )
    docs = [
        (0, "unchanged body zero", "same"),     # prior == current digest
        (1, "changed body one", "changed"),     # prior digest differs
        (2, "brand new two", None),             # no prior capture
        (3, "unchanged body three", "same"),
    ]
    rows = []
    for i, text, kind in docs:
        if kind == "same":
            prior = hashlib.md5(text.encode()).hexdigest()
        elif kind == "changed":
            prior = hashlib.md5(b"something else").hexdigest()
        else:
            prior = None
        rows.append((i, f"https://t.example/doc/{i}", text, prior))
    df = spark.createDataFrame(
        rows, "doc_id long, uri string, text string, prior string")
    blobs = warc_file_blobs(
        df.withColumn("file_id", F.lit(0).cast("long")),
        "file_id", "doc_id",
        warc_delta_record_col(F.col("uri"), F.col("text"),
                              F.col("prior"))).collect()
    assert len(blobs) == 1
    raw = blobs[0].blob.encode("utf-8")
    recs = parse_warc_bytes(raw)
    assert [u for u, _, _ in recs] == \
        [f"https://t.example/doc/{i}" for i in range(4)]
    by_id = {int(u.rsplit("/", 1)[1]): (n, p) for u, n, p in recs}
    # unchanged -> revisit: zero payload bytes
    assert by_id[0] == (0, b"") and by_id[3] == (0, b"")
    # changed / new -> full response round-trip
    assert by_id[1] == (len(b"changed body one"), b"changed body one")
    assert by_id[2] == (len(b"brand new two"), b"brand new two")
    # revisit headers: Refers-To = original response id, digest = shared
    blob_txt = blobs[0].blob
    rec0 = blob_txt[:blob_txt.index("\r\n\r\n") + 4]
    assert "WARC-Type: revisit" in rec0
    assert ("WARC-Refers-To: <urn:md5:"
            + hashlib.md5(b"https://t.example/doc/0").hexdigest()
            + ">") in rec0
    assert ("WARC-Payload-Digest: md5:"
            + hashlib.md5(b"unchanged body zero").hexdigest()) in rec0
    assert "Content-Length: 0" in rec0
    # response records keep their own type line
    assert "WARC-Type: response" in blob_txt


def test_conversion_record_roundtrip_and_refers_to(spark):
    """WET conversion records (wc4): the Content-Length framing must
    survive the parser byte-exactly, and WARC-Refers-To must equal the
    response record id `warc_record_col` would stamp for the same URI
    (md5 of the URI) while the conversion's own id differs."""
    import hashlib

    from pyspark.sql import functions as F

    from crawler_spark.sources.warc import (
        parse_warc, warc_conversion_record_col, warc_file_blobs,
    )
    rows = [(1, "https://x.example/a", "extracted text one"),
            (2, "https://x.example/b", "WARC/1.0\r\n\r\nlooks like a record"),
            (3, "https://x.example/c", "")]
    df = spark.createDataFrame(rows, "doc_id long, uri string, body string")
    files = warc_file_blobs(
        df.withColumn("f", F.lit(0).cast("long")), "f", "doc_id",
        warc_conversion_record_col(F.col("uri"), F.col("body")))
    blob = files.collect()[0]["blob"]
    got = parse_warc(files, "blob").orderBy("target_uri").collect()
    assert [r["payload"] for r in got] == [
        "extracted text one", "WARC/1.0\r\n\r\nlooks like a record", ""]
    text = blob
    for _, uri, _ in rows:
        want = hashlib.md5(uri.encode()).hexdigest()
        assert f"WARC-Refers-To: <urn:md5:{want}>" in text
        conv_id = hashlib.md5(f"conv:{uri}".encode()).hexdigest()
        assert f"WARC-Record-ID: <urn:md5:{conv_id}>" in text
        assert conv_id != want


def test_metadata_record_roundtrip_and_ids(spark):
    """WAT metadata records (wc5): byte-exact payload through the
    parser; WARC-Refers-To equals the response id (md5 of URI) while
    the metadata record's own id is the 'meta:'-salted md5 and all
    three record types (response/conversion/metadata) get distinct
    ids for one capture."""
    import hashlib

    from pyspark.sql import functions as F

    from crawler_spark.sources.warc import (
        parse_warc, warc_file_blobs, warc_metadata_record_col,
    )
    rows = [(1, "https://x.example/a", '{"words":3}'),
            (2, "https://x.example/b", '{"words":0}')]
    df = spark.createDataFrame(rows, "doc_id long, uri string, body string")
    files = warc_file_blobs(
        df.withColumn("f", F.lit(0).cast("long")), "f", "doc_id",
        warc_metadata_record_col(F.col("uri"), F.col("body")))
    blob = files.collect()[0]["blob"]
    got = parse_warc(files, "blob").orderBy("target_uri").collect()
    assert [r["payload"] for r in got] == ['{"words":3}', '{"words":0}']
    for _, uri, _ in rows:
        resp = hashlib.md5(uri.encode()).hexdigest()
        meta = hashlib.md5(f"meta:{uri}".encode()).hexdigest()
        conv = hashlib.md5(f"conv:{uri}".encode()).hexdigest()
        assert f"WARC-Refers-To: <urn:md5:{resp}>" in blob
        assert f"WARC-Record-ID: <urn:md5:{meta}>" in blob
        assert len({resp, meta, conv}) == 3
    assert "WARC-Type: metadata" in blob
    assert "Content-Type: application/json" in blob
