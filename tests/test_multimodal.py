"""Multimodal plumbing: binary payload columns, decode/feature UDFs, resize,
1->N frame sampling. The codec kernels are deterministic stand-ins (no
image/audio libs in the sandbox); what these tests pin down is the SPARK
side — schemas, Arrow batch shapes, pass-through rules, fan-out counts —
which is exactly what survives a codec swap.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.multimodal import (
    FEATURE_DIM, attach_payload, decode_features, resize_images, sample_frames,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def media_df(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
             .select("doc_id", "text").limit(60)
    return attach_payload(d)


def test_decode_features_schema_and_determinism(spark, media_df):
    out = decode_features(media_df)
    assert [f.name for f in out.schema.fields] == \
        ["doc_id", "media_type", "n_bytes", "features"]
    rows = {r["doc_id"]: r for r in out.collect()}
    again = {r["doc_id"]: r for r in decode_features(media_df).collect()}
    assert rows.keys() == again.keys()
    for k in rows:
        assert rows[k]["features"] == again[k]["features"]
        assert len(rows[k]["features"]) == FEATURE_DIM
        assert rows[k]["n_bytes"] > 0


def test_resize_images_only_touches_images(spark, media_df):
    out = resize_images(media_df, width=4, height=3)
    rows = out.collect()
    assert len(rows) == media_df.count()
    by_type = {r["doc_id"]: r for r in rows}
    src = {r["doc_id"]: r["media_type"] for r in media_df.collect()}
    for doc_id, r in by_type.items():
        if src[doc_id] == "image":
            assert (r["width"], r["height"]) == (4, 3)
            assert len(r["payload_bin"].encode("latin-1")) == 12
        else:
            assert r["width"] is None and r["height"] is None


def test_sample_frames_fan_out(spark, media_df):
    every_n, n_frames = 4, 16
    out = sample_frames(media_df, every_n=every_n, n_frames=n_frames)
    n_videos = media_df.where(F.col("media_type") == "video").count()
    assert n_videos > 0
    rows = out.collect()
    # 1 -> N fan-out: exactly n_frames/every_n rows per video, none for others
    assert len(rows) == n_videos * (n_frames // every_n)
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
        assert len(r["features"]) == FEATURE_DIM
    for idxs in per_doc.values():
        assert sorted(idxs) == [0, 4, 8, 12]


def test_decode_sums_twin_matches_feature_means(spark, media_df):
    """The oracle-checkable sums twin (decode_byte_sums, mm5) and the float
    feature kernel (_fake_decode) share the chunking rule: for every doc,
    features[c] == s_c / z_c (empty chunk -> 0), and sizes partition
    n_bytes per the np.array_split rule. This is the bridge that puts the
    production decode algebra under the driver's hash gate."""
    from crawler_spark.operators.multimodal import decode_byte_sums

    feats = {r["doc_id"]: r for r in decode_features(media_df).collect()}
    sums = {r["doc_id"]: r for r in decode_byte_sums(media_df).collect()}
    assert set(feats) == set(sums) and len(feats) > 0
    for doc_id, s in sums.items():
        f = feats[doc_id]
        assert s["n_bytes"] == f["n_bytes"]
        n = s["n_bytes"]
        for c in range(FEATURE_DIM):
            zc, sc = s[f"z{c}"], s[f"s{c}"]
            assert zc == n // FEATURE_DIM + (1 if c < n % FEATURE_DIM else 0)
            want = sc / zc if zc else 0.0
            assert abs(f["features"][c] - want) < 1e-3
        assert sum(s[f"z{c}"] for c in range(FEATURE_DIM)) == n


def test_frame_sums_twin_matches_sample_frames(spark, media_df):
    """The oracle-checkable frame twin (frame_byte_sums, mm8) and the
    feature sampler (sample_frames) share the np.array_split framing and
    the every_n stride: for every VIDEO row both emit the same
    (doc_id, frame_idx) fan-out with the same frame byte sizes, and the
    twin's sizes partition n_bytes over the sampled+skipped frames."""
    from crawler_spark.operators.multimodal import frame_byte_sums

    vids = media_df.where(F.col("media_type") == "video")
    frames = {(r["doc_id"], r["frame_idx"]): r["frame_bytes"]
              for r in sample_frames(vids, every_n=2, n_frames=8).collect()}
    sums = {(r["doc_id"], r["frame_idx"]): r
            for r in frame_byte_sums(vids, every_n=2, n_frames=8).collect()}
    assert set(frames) == set(sums) and len(frames) > 0
    for k, nb in frames.items():
        assert sums[k]["frame_bytes"] == nb
    # per-doc: sampled frame indices are exactly 0,2,4,6 and each size
    # follows the array_split rule against the doc's total byte count
    n_bytes = {r["doc_id"]: r["n_bytes"]
               for r in vids.select(
                   "doc_id",
                   F.length(F.col("payload_bin")).alias("n_bytes")).collect()}
    docs = {d for d, _ in sums}
    for d in docs:
        idxs = sorted(fi for dd, fi in sums if dd == d)
        assert idxs == [0, 2, 4, 6]
        n = n_bytes[d]
        for fi in idxs:
            want = n // 8 + (1 if fi < n % 8 else 0)
            assert sums[(d, fi)]["frame_bytes"] == want


def test_mime_sniff_matches_magic_assignment(spark):
    """mm10: the sniffed type must equal the type implied by the magic
    prefix injected by doc_id%6, and ext_mismatch must be consistent
    with (ext, mime)."""
    from crawler_spark.queries import mm10_mime_sniff
    rows = mm10_mime_sniff(spark, SF_DIR).collect()
    want = {0: "image/png", 1: "image/jpeg", 2: "image/gif",
            3: "application/pdf", 4: "application/zip", 5: "text/plain"}
    assert len(rows) == 500
    for r in rows:
        assert r["mime"] == want[r["doc_id"] % 6], r
        assert r["ext_mismatch"] == int(
            (r["ext"] == ".png") != (r["mime"] == "image/png"))
        assert r["n_bytes"] > 0


def test_dhash_bits_match_chunk_mean_comparisons(spark):
    """mm13's dhash equals the bit vector computed from the decode
    twin's own chunk sums — and identical payloads share a bucket."""
    from crawler_spark.operators.multimodal import (
        attach_payload, decode_byte_sums,
    )
    rows = [(1, "abcdefgh" * 4), (2, "abcdefgh" * 4), (3, "zzzzaaaa" * 4)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    sums = {r["doc_id"]: r for r in
            decode_byte_sums(attach_payload(d.select("doc_id", "text")))
            .collect()}
    def dhash(r):
        h = 0
        for c in range(7):
            if r[f"s{c}"] * r[f"z{c+1}"] > r[f"s{c+1}"] * r[f"z{c}"]:
                h |= 1 << c
        return h
    assert dhash(sums[1]) == dhash(sums[2])
    # identical payloads share a dhash; this differing pair separates
    assert dhash(sums[1]) != dhash(sums[3])


def test_aspect_bucket_nearest_and_ties(spark):
    from crawler_spark.operators.multimodal import (
        ASPECT_BUCKETS, _ASPECT_LCM, aspect_bucket_col,
    )
    dims = [(100, 100), (400, 300), (1600, 900), (899, 1600),
            (720, 480), (333, 500), (7, 5)]
    d = spark.createDataFrame([(w, h) for w, h in dims],
                              "width long, height long")
    got = {(r["width"], r["height"]): r["b"] for r in
           d.select("width", "height",
                    aspect_bucket_col(F.col("width"),
                                      F.col("height")).alias("b"))
            .collect()}

    def expect(w, h):
        errs = [(abs(w * bh - h * bw) * (_ASPECT_LCM // bh), name)
                for name, bw, bh in ASPECT_BUCKETS]
        m = min(e for e, _ in errs)
        return next(name for e, name in errs if e == m)

    for w, h in dims:
        assert got[(w, h)] == expect(w, h), (w, h)
    assert got[(100, 100)] == "1:1"
    assert got[(400, 300)] == "4:3"
    assert got[(1600, 900)] == "16:9"
    assert got[(899, 1600)] == "9:16"


def test_scene_cut_algebra_via_query(spark, tmp_path):
    """Two-level payload: constant-'a' half then constant-'!' half ->
    exactly one cut at the frame boundary, longest scene 4."""
    import pandas as pd
    d = pd.DataFrame({"doc_id": [1, 2],
                      "text": ["a" * 8 + "!" * 8, "m" * 16],
                      "lang": ["en", "en"], "source": ["s", "s"],
                      "n_chars": [16, 16]})
    sf = str(tmp_path)
    spark.createDataFrame(d).write.mode("overwrite") \
        .parquet(f"{sf}/documents.parquet")
    from crawler_spark.queries import queries
    out = {r["doc_id"]: r for r in
           queries()["mm15_scene_cuts"](spark, sf).collect()}
    assert (out[1]["n_cuts"], out[1]["n_scenes"],
            out[1]["longest_scene"]) == (1, 2, 4)
    assert (out[2]["n_cuts"], out[2]["n_scenes"],
            out[2]["longest_scene"]) == (0, 1, 8)


def test_ivf_inertia_consistency(spark):
    """an14's rollup re-derives exactly from the km1 assignment."""
    import numpy as np
    from crawler_spark.operators.similarity import kmeans_assign
    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    asg = kmeans_assign(emb, k=3, iters=2).collect()
    agg = (kmeans_assign(emb, k=3, iters=2)
           .groupBy("cluster").agg(F.count(F.lit(1)).alias("n"),
                                   F.sum("d2").alias("s")).collect())
    got = {r["cluster"]: (r["n"], r["s"]) for r in agg}
    want = {}
    for r in asg:
        n, s = want.get(r["cluster"], (0, 0))
        want[r["cluster"]] = (n + 1, s + r["d2"])
    assert got == want and sum(n for n, _ in got.values()) == 40
