"""Multimodal column handling (SURVEY.md §2 C-llm-multimodal;
BASELINE.json extension surface).

Images/audio/video ride the pipeline as opaque ``binary`` columns with a
typed metadata struct. Cheap inspection (sizes, magic bytes, header
fields) is JVM-side; decode / feature-extraction / frame-sampling are
Arrow-batched ``mapInPandas`` operators.

The codecs in THIS module are stubbed (the container has no PIL/
ffmpeg): ``decode_payload`` parses this module's own deterministic
synthetic header format, and a real deployment swaps in PIL/ffmpeg
inside the same mapInPandas functions — the Spark-side contract
(schemas, batch iteration, partitioning) is identical and is what's
tested here. The formats the container CAN decode have REAL codecs in
``llm/codecs.py`` (round 4): genuine RIFF/WAVE PCM16 (stdlib wave) and
uncompressed 24-bit BMP (struct+numpy), exercised end-to-end by the
oracle-paired ``mm_wav_energy`` / ``mm_bmp_stats`` entries whose parity
proves the round-trips lossless.

Synthetic payload layout (big-endian):
  bytes 0-3   magic  b"IMG0" | b"AUD0" | b"VID0"
  bytes 4-5   width / sample-rate-khz / frame-count (uint16)
  bytes 6-7   height / channels / fps (uint16)
  bytes 8+    body (utf-8 of the source text — deterministic filler)
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGICS = {"image": b"IMG0", "audio": b"AUD0", "video": b"VID0"}

METADATA_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("dim_a", T.IntegerType()),
        T.StructField("dim_b", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def synthesize_payload(text_col: Column | str, media_type_col: Column | str) -> Column:
    """Deterministic fake media payload: magic + header + utf-8 body.

    dim_a/dim_b derive from the text length so every doc gets a unique,
    reproducible "resolution". Pure JVM expression (no UDF): binary
    concat of magic lookup, two big-endian uint16s, and the encoded body.
    """
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    m = F.col(media_type_col) if isinstance(media_type_col, str) else media_type_col
    magic = (
        F.when(m == "image", F.lit(MAGICS["image"]))
        .when(m == "audio", F.lit(MAGICS["audio"]))
        .otherwise(F.lit(MAGICS["video"]))
    )
    dim_a = (F.length(t) % 640) + 16          # 16..655
    dim_b = (F.length(t) % 480) + 16          # 16..495
    # big-endian uint16 as 2 bytes: unhex(lpad(hex(x), 4, '0'))
    dim_a_b = F.unhex(F.lpad(F.hex(dim_a.cast("int")), 4, "0"))
    dim_b_b = F.unhex(F.lpad(F.hex(dim_b.cast("int")), 4, "0"))
    return F.concat(magic, dim_a_b, dim_b_b, F.encode(t, "UTF-8"))


def extract_metadata(payload: Column | str) -> Column:
    """Header inspection WITHOUT decoding: magic → media type, header
    uint16s, total size. JVM-side substring/conv on binary — at 100 TB
    this runs in the scan, no Python round trip."""
    p = F.col(payload) if isinstance(payload, str) else payload
    magic = F.decode(F.substring(p, 1, 4), "UTF-8")
    media_type = (
        F.when(magic == "IMG0", F.lit("image"))
        .when(magic == "AUD0", F.lit("audio"))
        .when(magic == "VID0", F.lit("video"))
        .otherwise(F.lit("unknown"))
    )
    dim_a = F.conv(F.hex(F.substring(p, 5, 2)), 16, 10).cast("int")
    dim_b = F.conv(F.hex(F.substring(p, 7, 2)), 16, 10).cast("int")
    return F.struct(
        media_type.alias("media_type"),
        dim_a.alias("dim_a"),
        dim_b.alias("dim_b"),
        F.length(p).cast("long").alias("n_bytes"),
    )


def decode_payload(raw: bytes) -> tuple[str, int, int, bytes]:
    """STUB decoder for the synthetic format. A real deployment replaces
    this body with e.g. ``PIL.Image.open(io.BytesIO(raw))``; everything
    around it (batching, schemas) is production-shaped."""
    magic = raw[:4].decode("utf-8", errors="replace")
    media = {v.decode(): k for k, v in MAGICS.items()}.get(magic, "unknown")
    dim_a, dim_b = struct.unpack(">HH", raw[4:8])
    return media, dim_a, dim_b, raw[8:]


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_body_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def extract_features(df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction: decode each payload, emit a
    16-bin normalized byte histogram of the body (the deterministic
    stand-in for a CNN embedding). ``mapInPandas`` streams record
    batches — constant memory per task, no per-row Python overhead."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, raw in zip(pdf[id_col], pdf[payload_col]):
                media, _, _, body = decode_payload(bytes(raw))
                arr = np.frombuffer(body, dtype=np.uint8)
                hist = np.bincount(arr >> 4, minlength=16).astype(float)
                total = hist.sum()
                feats = (hist / total if total else hist).round(6).tolist()
                out.append((int(doc_id), media, len(body), feats))
            yield pd.DataFrame(out, columns=[f.name for f in FEATURE_SCHEMA.fields])

    # Python decode is CPU-bound: spread rows over all cores (a small
    # binary corpus otherwise arrives as one scan partition -> one
    # Python worker).
    par = df.sparkSession.sparkContext.defaultParallelism
    return df.select(id_col, payload_col).repartition(par).mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id",
                  every_k: int = 4, frame_bytes: int = 64) -> DataFrame:
    """Frame sampling for "video" payloads: the body is treated as
    fixed-size frames; keep every k-th frame index. JVM-side (sequence +
    explode) — sampling never leaves the executor, only sampled frame
    offsets + sizes flow on."""
    p = F.col(payload_col)
    body_len = F.length(p) - 8
    n_frames = F.ceil(body_len / frame_bytes).cast("int")
    idx = F.explode(
        F.filter(
            F.sequence(F.lit(0), n_frames - 1),
            lambda i: i % every_k == 0,
        )
    ).alias("frame_idx")
    return (
        df.filter(F.substring(p, 1, 4) == F.lit(b"VID0"))
        .select(F.col(id_col), n_frames.alias("n_frames"), idx)
        .withColumn("frame_offset", F.lit(8) + F.col("frame_idx") * frame_bytes)
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("dim_a", T.IntegerType()),
        T.StructField("dim_b", T.IntegerType()),
    ]
)


def resize_images(
    df: DataFrame,
    target_a: int,
    target_b: int,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Resize "image" payloads to (target_a, target_b): decode, rescale,
    re-encode — Arrow-batched per partition like every decode-path op.

    THE RESAMPLER IS STUBBED (no PIL in this container): the body is
    deterministically resampled by byte-striding to the target pixel
    budget and the header rewritten with the new dims; a real deployment
    replaces the three marked lines with ``PIL.Image.resize``. Non-image
    payloads pass through unchanged (dims from their header) — the
    mixed-corpus behavior a real pipeline needs.
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, raw in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(raw)
                media, dim_a, dim_b, body = decode_payload(raw)
                if media != "image":
                    out.append((int(doc_id), media, raw, dim_a, dim_b))
                    continue
                # --- stub resampler (real: PIL.Image.open/resize/save) ---
                budget = max(1, target_a * target_b // 256)
                idx = np.linspace(0, max(len(body) - 1, 0), num=budget).astype(int)
                new_body = bytes(np.frombuffer(body, dtype=np.uint8)[idx]) if body else b""
                # ---------------------------------------------------------
                header = MAGICS["image"] + struct.pack(">HH", target_a, target_b)
                out.append((int(doc_id), media, header + new_body, target_a, target_b))
            yield pd.DataFrame(out, columns=[f.name for f in RESIZE_SCHEMA.fields])

    par = df.sparkSession.sparkContext.defaultParallelism
    return df.select(id_col, payload_col).repartition(par).mapInPandas(run, RESIZE_SCHEMA)


AUDIO_ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("window_idx", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def audio_window_energy(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    window_samples: int = 32,
) -> DataFrame:
    """Windowed RMS energy for "audio" payloads: the body bytes stand in
    for PCM samples (real deployment: soundfile/librosa decode to int16
    inside the same mapInPandas), windowed into fixed frames with one
    RMS per window — the VAD/segmentation primitive of audio pipelines.

    Arithmetic is exact-by-construction so SQL oracles can reproduce it:
    the sum of squares accumulates in Python ints, and the only float
    ops are one IEEE division and one correctly-rounded sqrt.
    Non-audio payloads are filtered out before Python sees them.
    """
    import math

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, raw in zip(pdf[id_col], pdf[payload_col]):
                _, _, _, body = decode_payload(bytes(raw))
                for w in range(0, len(body), window_samples):
                    seg = body[w : w + window_samples]
                    sum_sq = sum(b * b for b in seg)
                    rms = round(math.sqrt(sum_sq / len(seg)), 6) if seg else 0.0
                    out.append((int(doc_id), w // window_samples, len(seg), rms))
            yield pd.DataFrame(out, columns=[f.name for f in AUDIO_ENERGY_SCHEMA.fields])

    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.filter(F.substring(F.col(payload_col), 1, 4) == F.lit(MAGICS["audio"]))
        .select(id_col, payload_col)
        .repartition(par)
        .mapInPandas(run, AUDIO_ENERGY_SCHEMA)
    )
