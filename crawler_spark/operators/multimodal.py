"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Media in the span model (kind='media') references external payloads; a
training pipeline carries them as `binary` columns with a metadata struct
and runs decode / feature-extract / resize / frame-sample as Arrow-batched
Pandas UDFs over mapInPandas.

The image/audio libraries are NOT in this container, so the decode kernels
are STUBS behind `_HAS_CODECS` (deterministic fake features keep the
Spark-side plumbing — schema, batch shape, partitioning — real and tested).
Swap `_fake_decode` for PIL/av calls in production; nothing else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, FloatType, IntegerType, LongType, StringType, StructField,
    StructType,
)

try:  # pragma: no cover - not present in sandbox
    import PIL.Image  # noqa: F401
    _HAS_CODECS = True
except Exception:
    _HAS_CODECS = False

MEDIA_SCHEMA = StructType([
    StructField("media_ref", StringType(), False),
    StructField("media_type", StringType(), False),   # image|audio|video
    StructField("payload", ArrayType(FloatType(), False), True),  # decoded
    StructField("n_bytes", LongType(), False),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
])

FEATURE_DIM = 8


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Test harness: fabricate a deterministic binary payload column (in
    production this is the fetched media body)."""
    return df.withColumn("payload_bin", F.encode(F.col(text_col), "UTF-8")) \
             .withColumn("media_type",
                         F.element_at(F.array(F.lit("image"), F.lit("audio"),
                                              F.lit("video")),
                                      (F.pmod(F.xxhash64(text_col), F.lit(3)) + 1
                                       ).cast("int")))


def _chunk_bytes(buf: bytes) -> list[np.ndarray]:
    """The decode algebra's chunking rule, shared by the feature kernel and
    its oracle-checkable sums twin (np.array_split: the first n%k chunks get
    n//k+1 bytes, the rest n//k)."""
    return np.array_split(np.frombuffer(buf, dtype=np.uint8), FEATURE_DIM)


def _fake_decode(buf: bytes, media_type: str) -> np.ndarray:
    """Deterministic stand-in for a real decoder: feature = byte histogram
    moments (per-chunk byte means, accumulated in float64 so the float32
    feature is the correctly-rounded mean). Replace with PIL/torchaudio/av
    decode when codecs exist."""
    if not buf:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    chunks = _chunk_bytes(buf)
    return np.array([float(c.astype(np.float64).mean()) if len(c) else 0.0
                     for c in chunks], dtype=np.float32)


def decode_features(df: DataFrame, id_col: str = "doc_id",
                    bin_col: str = "payload_bin") -> DataFrame:
    """mapInPandas decode/feature-extract: (id, payload_bin, media_type) ->
    (id, media_type, n_bytes, features[FEATURE_DIM]). Arrow batches in/out;
    the partitioning of `df` is preserved (narrow op, no shuffle)."""
    out_schema = StructType([
        StructField(id_col, LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("features", ArrayType(FloatType(), False), False),
    ])

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if _HAS_CODECS:  # pragma: no cover
            raise NotImplementedError("real codec path not wired in sandbox")
        for pdf in batches:
            feats = [_fake_decode(b, t).tolist()
                     for b, t in zip(pdf[bin_col], pdf["media_type"])]
            yield pd.DataFrame({
                id_col: pdf[id_col].astype("int64"),
                "media_type": pdf["media_type"],
                "n_bytes": [len(b) if b is not None else 0 for b in pdf[bin_col]],
                "features": feats,
            })

    return df.mapInPandas(_decode, out_schema)


def decode_byte_sums(df: DataFrame, id_col: str = "doc_id",
                     bin_col: str = "payload_bin") -> DataFrame:
    """The decode kernel's ORACLE-CHECKABLE twin (VERDICT round-2 #4): the
    same mapInPandas shape and the same `_chunk_bytes` chunking as
    `_fake_decode`, but emitting each chunk's exact integer byte SUM and
    SIZE instead of the float32 mean (feature = s_c / z_c). Integer output
    makes the cross-engine hash float-hazard-free; a pytest ties the float
    feature path to these sums. Narrow op — partitioning preserved."""
    fields = [StructField(id_col, LongType(), False),
              StructField("n_bytes", LongType(), False)]
    fields += [StructField(f"s{c}", LongType(), False)
               for c in range(FEATURE_DIM)]
    fields += [StructField(f"z{c}", LongType(), False)
               for c in range(FEATURE_DIM)]
    out_schema = StructType(fields)

    def _sums(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict[str, list] = {id_col: [], "n_bytes": []}
            for c in range(FEATURE_DIM):
                cols[f"s{c}"] = []
                cols[f"z{c}"] = []
            for i, b in zip(pdf[id_col], pdf[bin_col]):
                raw = bytes(b) if b is not None else b""
                chunks = _chunk_bytes(raw)
                cols[id_col].append(int(i))
                cols["n_bytes"].append(len(raw))
                for c in range(FEATURE_DIM):
                    cols[f"s{c}"].append(int(chunks[c].sum()))
                    cols[f"z{c}"].append(int(len(chunks[c])))
            yield pd.DataFrame({k: pd.Series(v, dtype="int64")
                                for k, v in cols.items()})

    return df.withColumn(bin_col, F.col(bin_col).cast("binary")) \
             .mapInPandas(_sums, out_schema)


def _fake_resize(buf: bytes, width: int, height: int) -> bytes:
    """Codec stand-in: 'resample' the byte buffer to width*height bytes by
    even-strided selection (deterministic). Production: PIL Image.resize."""
    if _HAS_CODECS:  # pragma: no cover
        raise NotImplementedError("real codec path not wired in sandbox")
    n = max(1, width * height)
    if not buf:
        return b"\x00" * n
    a = np.frombuffer(buf, dtype=np.uint8)
    idx = (np.arange(n) * len(a)) // n
    return a[idx].tobytes()


def resize_images(df: DataFrame, width: int, height: int,
                  id_col: str = "doc_id",
                  bin_col: str = "payload_bin") -> DataFrame:
    """Image resize over Arrow batches (narrow mapInPandas, partitioning
    preserved): (id, payload_bin, media_type) -> (id, payload_bin resized,
    width, height). Non-image rows pass through untouched with null dims."""
    out_schema = StructType([
        StructField(id_col, LongType(), False),
        StructField(bin_col, StringType(), False),   # latin-1 carrier, see below
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ])

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs, ws, hs = [], [], []
            for b, t in zip(pdf[bin_col], pdf["media_type"]):
                raw = bytes(b) if b is not None else b""
                if t == "image":
                    outs.append(_fake_resize(raw, width, height).decode("latin-1"))
                    ws.append(width)
                    hs.append(height)
                else:
                    outs.append(raw.decode("latin-1"))
                    ws.append(None)
                    hs.append(None)
            yield pd.DataFrame({id_col: pdf[id_col].astype("int64"),
                                bin_col: outs, "width": ws, "height": hs})

    # NB: pandas->Arrow BinaryType round-trips via object arrays; a latin-1
    # string carrier keeps the bytes intact and lets the test re-encode.
    src = df.withColumn(bin_col, F.col(bin_col).cast("binary"))
    return src.mapInPandas(_resize, out_schema)


def sample_frames(df: DataFrame, every_n: int, n_frames: int = 16,
                  id_col: str = "doc_id",
                  bin_col: str = "payload_bin") -> DataFrame:
    """Video frame sampling: one input row -> one row per sampled frame
    (the 1->N UDTF shape). The stand-in 'decoder' splits the payload into
    n_frames equal byte slices and keeps every `every_n`-th; production
    swaps the slicer for av/ffmpeg keyframe decode — schema, batch shape,
    and fan-out stay identical."""
    out_schema = StructType([
        StructField(id_col, LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_bytes", LongType(), False),
        StructField("features", ArrayType(FloatType(), False), False),
    ])

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if _HAS_CODECS:  # pragma: no cover
            raise NotImplementedError("real codec path not wired in sandbox")
        for pdf in batches:
            ids, idxs, sizes, feats = [], [], [], []
            for i, b, t in zip(pdf[id_col], pdf[bin_col], pdf["media_type"]):
                if t != "video":
                    continue
                raw = bytes(b) if b is not None else b""
                frames = np.array_split(
                    np.frombuffer(raw, dtype=np.uint8), n_frames)
                for fi in range(0, n_frames, every_n):
                    ids.append(int(i))
                    idxs.append(fi)
                    sizes.append(int(len(frames[fi])))
                    feats.append(_fake_decode(frames[fi].tobytes(), t).tolist())
            yield pd.DataFrame({id_col: pd.Series(ids, dtype="int64"),
                                "frame_idx": pd.Series(idxs, dtype="int32"),
                                "frame_bytes": pd.Series(sizes, dtype="int64"),
                                "features": feats})

    src = df.withColumn(bin_col, F.col(bin_col).cast("binary"))
    return src.mapInPandas(_sample, out_schema)


def frame_byte_sums(df: DataFrame, every_n: int = 2, n_frames: int = 8,
                    id_col: str = "doc_id",
                    bin_col: str = "payload_bin") -> DataFrame:
    """The frame sampler's ORACLE-CHECKABLE twin (mm5's pattern applied to
    the 1->N shape): the same mapInPandas fan-out and the same
    np.array_split framing as `sample_frames`, but emitting each sampled
    frame's exact integer byte SUM and SIZE instead of float features —
    cross-engine hashable, so the UDTF fan-out semantics (which rows,
    which frame indices, which byte ranges) sit under the hash gate while
    the codec stub stays swappable. Narrow op, partitioning preserved."""
    out_schema = StructType([
        StructField(id_col, LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_bytes", LongType(), False),
        StructField("frame_sum", LongType(), False),
    ])

    def _sums(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sizes, sums = [], [], [], []
            for i, b in zip(pdf[id_col], pdf[bin_col]):
                raw = bytes(b) if b is not None else b""
                frames = np.array_split(
                    np.frombuffer(raw, dtype=np.uint8), n_frames)
                for fi in range(0, n_frames, every_n):
                    ids.append(int(i))
                    idxs.append(fi)
                    sizes.append(int(len(frames[fi])))
                    sums.append(int(frames[fi].sum()))
            yield pd.DataFrame({id_col: pd.Series(ids, dtype="int64"),
                                "frame_idx": pd.Series(idxs, dtype="int32"),
                                "frame_bytes": pd.Series(sizes, dtype="int64"),
                                "frame_sum": pd.Series(sums, dtype="int64")})

    return df.withColumn(bin_col, F.col(bin_col).cast("binary")) \
             .mapInPandas(_sums, out_schema)


# Standard training aspect-ratio buckets (NovelAI/SDXL-style bucketed
# batching): (name, bw, bh). _ASPECT_LCM is the lcm of the bh values so
# the nearest-ratio test stays in EXACT integer arithmetic: for a given
# (w, h), err(bucket) = |w*bh - h*bw| * (LCM/bh) is proportional to
# |w/h - bw/bh| with a bucket-independent factor (h * LCM) — so argmin
# over buckets is the true nearest ratio, no float division anywhere.
ASPECT_BUCKETS: list[tuple[str, int, int]] = [
    ("1:1", 1, 1), ("4:3", 4, 3), ("3:2", 3, 2), ("16:9", 16, 9),
    ("9:16", 9, 16), ("3:4", 3, 4), ("2:3", 2, 3),
]
_ASPECT_LCM = 144


def _aspect_errs(w, h, mk):
    """Shared err-term builder: mk(bw, bh) -> engine/SQL term."""
    return [(name, mk(bw, bh)) for name, bw, bh in ASPECT_BUCKETS]


def aspect_bucket_col(w: F.Column, h: F.Column) -> F.Column:
    """Nearest standard aspect bucket for integer (w, h) — ties go to
    the earliest bucket in ASPECT_BUCKETS order. Exact integer algebra,
    map-side.

    Shape note: the previous CASE-over-least form inlined the `least` of
    all err terms into every branch — O(buckets²) expression size — and
    consumers that re-inline the bucket column (the mm14 boundary
    comparator holds ~30 copies) pushed codegen past its limits into the
    interpreter. Here (w, h) are LET-BOUND once via the single-element
    transform trick (shingles_col discipline), the err terms build one
    array, and `array_position(errs, array_min(errs))` is O(buckets) —
    returning the FIRST index at the minimum, which is exactly the
    original first-match-wins tie-break."""
    names = F.array(*[F.lit(name) for name, _, _ in ASPECT_BUCKETS])
    pair = F.array(F.struct(w.cast("long").alias("w"),
                            h.cast("long").alias("h")))

    def _pick(s):
        errs = F.array(*[
            F.abs(s.w * F.lit(bh) - s.h * F.lit(bw))
            * F.lit(_ASPECT_LCM // bh)
            for _, bw, bh in ASPECT_BUCKETS])
        return F.element_at(
            names, F.array_position(errs, F.array_min(errs)).cast("int"))

    return F.element_at(F.transform(pair, _pick), 1)


def aspect_bucket_sql(w: str, h: str) -> str:
    """DuckDB twin of `aspect_bucket_col` (same err terms, same
    first-match tie-break via an ordered CASE over err = min)."""
    errs = _aspect_errs(
        w, h, lambda bw, bh: f"abs(({w})*{bh} - ({h})*{bw})"
        f"*{_ASPECT_LCM // bh}")
    least = "least(" + ", ".join(e for _, e in errs) + ")"
    cases = " ".join(f"WHEN {e} = {least} THEN '{name}'"
                     for name, e in errs)
    return f"CASE {cases} END"
