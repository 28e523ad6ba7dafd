"""Multimodal plumbing tests: header round-trip, deterministic stub
decode, Arrow batch shape (SURVEY.md §2 C-llm-multimodal)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_capstone_spark.llm.multimodal import (
    decode_payload,
    extract_features,
    extract_metadata,
    sample_frames,
    synthesize_payload,
)


def _media_df(spark):
    rows = [
        (1, "hello world this is an image document", "image"),
        (2, "short audio", "audio"),
        (3, "a video payload with enough text to span multiple sixty four byte frames " * 3, "video"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, media_type string")
    return df.withColumn("payload", synthesize_payload("text", "media_type"))


def test_header_roundtrip_jvm_and_python(spark):
    """The JVM-side extract_metadata and the Python stub decoder must
    agree on every header field — same wire format."""
    df = _media_df(spark)
    meta = {
        r["doc_id"]: r["m"]
        for r in df.select("doc_id", extract_metadata("payload").alias("m")).collect()
    }
    raw = {r["doc_id"]: bytes(r["payload"]) for r in df.collect()}
    for doc_id, payload in raw.items():
        media, dim_a, dim_b, body = decode_payload(payload)
        m = meta[doc_id]
        assert m["media_type"] == media
        assert m["dim_a"] == dim_a and m["dim_b"] == dim_b
        assert m["n_bytes"] == len(payload) and len(body) == len(payload) - 8


def test_feature_extract_deterministic_and_normalized(spark):
    df = _media_df(spark)
    a = {r["doc_id"]: r["features"] for r in extract_features(df).collect()}
    b = {r["doc_id"]: r["features"] for r in extract_features(df).collect()}
    assert a == b                       # deterministic across runs
    for feats in a.values():
        assert len(feats) == 16
        assert abs(sum(feats) - 1.0) < 1e-4   # normalized histogram


def test_frame_sampling(spark):
    df = _media_df(spark)
    out = sample_frames(df, every_k=2, frame_bytes=64).collect()
    assert all(r["frame_idx"] % 2 == 0 for r in out)
    assert all(r["frame_offset"] == 8 + r["frame_idx"] * 64 for r in out)
    # only the video doc passes the magic filter
    assert {r["doc_id"] for r in out} == {3}


def test_binary_ingest_digests_match_hashlib(spark, sf_dir):
    """binaryFile content must be byte-exact: md5 from Spark equals
    hashlib over the same files."""
    import glob
    import hashlib
    import os

    from data_engineering_capstone_spark.catalog import load_all

    got = {
        r["file_name"]: (r["n_bytes"], r["content_md5"])
        for r in load_all()["mm_binary_ingest"].fn(spark, sf_dir).collect()
    }
    expected = {}
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        data = open(p, "rb").read()
        expected[os.path.basename(p)] = (len(data), hashlib.md5(data).hexdigest())
    assert got == expected and len(got) == 10


def test_resize_images_rewrites_dims_and_passes_through_other_media(spark, sf_dir):
    from data_engineering_capstone_spark.catalog import load_all
    from data_engineering_capstone_spark.llm.multimodal import (
        decode_payload,
        extract_metadata,
        resize_images,
        synthesize_payload,
    )
    from data_engineering_capstone_spark.sources.testdata import load_table
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents").limit(60).select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        "text",
    )
    payloads = d.select(
        "doc_id", "media_type", synthesize_payload("text", "media_type").alias("payload")
    )
    resized = resize_images(payloads, 224, 224)
    rows = resized.collect()
    assert len(rows) == 60
    for r in rows:
        media, dim_a, dim_b, body = decode_payload(bytes(r["payload"]))
        if r["media_type"] == "image":
            # header rewritten, dims updated, body resampled to budget
            assert (r["dim_a"], r["dim_b"]) == (224, 224) == (dim_a, dim_b)
            assert len(body) == max(1, 224 * 224 // 256)
        else:
            # non-image payloads untouched
            assert (dim_a, dim_b) == (r["dim_a"], r["dim_b"]) and media == r["media_type"]
    # deterministic: second run byte-identical
    again = {r["doc_id"]: bytes(r["payload"]) for r in resize_images(payloads, 224, 224).collect()}
    assert all(bytes(r["payload"]) == again[r["doc_id"]] for r in rows)


def test_audio_energy_windows_cover_body(spark):
    from pyspark.sql import functions as F

    from data_engineering_capstone_spark.llm.multimodal import (
        audio_window_energy,
        synthesize_payload,
    )

    rows = [(1, "a" * 70, "audio"), (2, "bc", "audio"), (3, "zzz", "image")]
    df = spark.createDataFrame(rows, "doc_id long, text string, media_type string").withColumn(
        "payload", synthesize_payload("text", "media_type")
    )
    out = audio_window_energy(df, window_samples=32).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 3 not in by_doc                       # non-audio filtered out
    # windows tile the body exactly: 70 bytes -> 32 + 32 + 6
    d1 = sorted(by_doc[1], key=lambda r: r["window_idx"])
    assert [r["n_samples"] for r in d1] == [32, 32, 6]
    # constant signal: rms == sample value exactly
    assert all(abs(r["rms"] - float(ord("a"))) < 1e-9 for r in d1)
    assert by_doc[2][0]["n_samples"] == 2


def test_wav_pcm16_roundtrip_property():
    """Real RIFF/WAVE container: arbitrary int16 sample vectors survive
    encode->decode bit-exactly, and the bytes carry a genuine RIFF
    header."""
    import numpy as np

    from data_engineering_capstone_spark.llm.codecs import (
        read_wav_pcm16,
        write_wav_pcm16,
    )

    rng = np.random.RandomState(11)
    for n in (1, 7, 32, 257):
        v = rng.randint(-32768, 32768, size=n).astype(np.int16)
        raw = write_wav_pcm16(v, sample_rate=8000)
        assert raw[:4] == b"RIFF" and raw[8:12] == b"WAVE"
        back, rate = read_wav_pcm16(raw)
        assert rate == 8000 and (back == v).all()


def test_bmp24_roundtrip_and_layout():
    """Real BMP: encode->decode is pixel-exact across widths that
    exercise every row-padding case (w%4 in 0..3), the header fields
    are spec-correct, and nearest-neighbor resize picks true pixels."""
    import struct

    import numpy as np

    from data_engineering_capstone_spark.llm.codecs import (
        bmp_row_size,
        read_bmp24,
        resize_nearest,
        write_bmp24,
    )

    rng = np.random.RandomState(5)
    for w in (1, 2, 3, 4, 5, 16, 17):
        h = 3
        px = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        raw = write_bmp24(px)
        assert raw[:2] == b"BM"
        assert struct.unpack_from("<I", raw, 2)[0] == len(raw)
        assert len(raw) == 54 + h * bmp_row_size(w)
        back = read_bmp24(raw)
        assert (back == px).all()

    big = rng.randint(0, 256, size=(8, 6, 3)).astype(np.uint8)
    small = resize_nearest(big, 4, 3)
    assert small.shape == (4, 3, 3)
    assert (small[0, 0] == big[0, 0]).all()  # corners are true pixels


def test_phash_near_dup_matches_brute_force(spark):
    """mm_phash_near_dup's banded-LSH pair set must equal exhaustive
    all-pairs Hamming over the same hashes: 8 bands x 8 bits is EXACT
    for threshold 6 by pigeonhole (<=7 differing bits can't occupy all
    8 bands), and exact-hash groups collapse to their min-doc_id rep
    with the group size carried through."""
    from itertools import combinations

    from data_engineering_capstone_spark.catalog import load_all

    sf_dir = "/root/testdata/sf0.001"
    got = [
        (r["id_a"], r["id_b"], r["hamming"], r["n_a"], r["n_b"])
        for r in load_all()["mm_phash_near_dup"].fn(spark, sf_dir).collect()
    ]

    # brute force: same fixture, same dHash, python-side
    import numpy as np

    from data_engineering_capstone_spark.llm.codecs import (
        dhash64,
        read_bmp24,
        write_bmp24,
    )

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    hashes = {}
    for did in range(n_docs):
        if did % 4 != 1:
            continue
        k = did % 50
        x = np.arange(24)[None, :, None]
        y = np.arange(24)[:, None, None]
        base = ((k + 1) * (3 * x + 5 * y) + np.array([0, 85, 170])) % 256
        img = base.copy()
        s = (did // 50) % 6
        img[:, 4 * s : 4 * s + 4, :] = (img[:, 4 * s : 4 * s + 4, :] + 40) % 256
        hashes[did] = dhash64(read_bmp24(write_bmp24(img.astype(np.uint8))))

    groups = {}
    for did, h in sorted(hashes.items()):
        groups.setdefault(h, []).append(did)
    reps = {min(ds): (h, len(ds)) for h, ds in groups.items()}
    want = []
    for a, b in combinations(sorted(reps), 2):
        ham = bin((reps[a][0] ^ reps[b][0]) & ((1 << 64) - 1)).count("1")
        if ham <= 6:
            want.append((a, b, ham, reps[a][1], reps[b][1]))

    assert sorted(got) == sorted(want)
    assert len(want) > 0  # fixture actually produces near-dups


def test_audio_fingerprint_dedup_matches_brute_force(spark):
    """mm_audio_fingerprint_dedup: banded pairs == exhaustive Hamming
    over the same WAV-round-tripped fingerprints (8x8 banding exact
    for threshold 6 by pigeonhole), with exact-fingerprint collapse."""
    from itertools import combinations

    import numpy as np

    from data_engineering_capstone_spark.catalog import load_all
    from data_engineering_capstone_spark.llm.codecs import (
        audio_fp64,
        read_wav_pcm16,
        write_wav_pcm16,
    )

    sf_dir = "/root/testdata/sf0.001"
    got = [
        (r["id_a"], r["id_b"], r["hamming"], r["n_a"], r["n_b"])
        for r in load_all()["mm_audio_fingerprint_dedup"].fn(spark, sf_dir).collect()
    ]

    NW, WIN = 65, 16
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    hashes = {}
    for did in range(n_docs):
        if did % 4 != 2:
            continue
        k = did % 40
        w = np.arange(NW, dtype=np.int64)
        env = ((k + 1) * (7 * w + 3)) % 97 + 8
        j, r = did % NW, 1 + (did // 40) % 14
        idx = (j + 2 * np.arange(r)) % NW
        env[idx] = env[idx] + 60
        t = np.arange(NW * WIN, dtype=np.int64)
        carrier = ((t * 13) % 17) - 8
        v = (env.repeat(WIN) * carrier * 23) % 65536 - 32768
        dec, _ = read_wav_pcm16(write_wav_pcm16(v.astype(np.int64)))
        hashes[did] = audio_fp64(dec.astype(np.int64), NW)

    groups = {}
    for did, h in sorted(hashes.items()):
        groups.setdefault(h, []).append(did)
    reps = {min(ds): (h, len(ds)) for h, ds in groups.items()}
    want = []
    for a, b in combinations(sorted(reps), 2):
        ham = bin((reps[a][0] ^ reps[b][0]) & ((1 << 64) - 1)).count("1")
        if ham <= 6:
            want.append((a, b, ham, reps[a][1], reps[b][1]))

    assert sorted(got) == sorted(want)
    assert len(want) > 0
