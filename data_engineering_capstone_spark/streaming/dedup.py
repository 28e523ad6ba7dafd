"""Streaming near-duplicate detection — MinHash-LSH over a document
STREAM with per-bucket state (`applyInPandasWithState`).

Batch near-dup (llm/dedup.py) answers "which documents in this corpus
are near-duplicates"; continuous ingestion pipelines need the ONLINE
form: as each document arrives, is it a near-duplicate of anything seen
BEFORE it — across micro-batch boundaries? Built-in streaming dedup
(`dropDuplicates[WithinWatermark]`) only handles exact keys; this
operator is the LSH generalization.

Plan shape:

1. per-document signature + band hashes computed in ONE Arrow-batched
   pandas UDF (no shuffle, no aggregation — streaming-safe): md5-based
   shingle hashing (hashlib) with a seeded affine MinHash family, so
   the kernel is deterministic and engine/process-independent,
2. explode to (band_idx, band_hash) rows — the same banding key as the
   batch path,
3. `groupBy(band).applyInPandasWithState`: the state of each bucket is
   the list of (doc_id, signature) members seen so far; each arriving
   document is compared against the stored members (estimated Jaccard
   = fraction of agreeing signature lanes) and candidate pairs above
   the threshold are emitted, then appended to the bucket state.

State is bounded by bucket sizes (banding's guarantee) times signature
width; `max_bucket` caps a pathological bucket FIFO-style — with the
documented recall caveat, and with the honest fix for the usual cause
being the exact-collapse guard (llm/dedup.py: identical docs should be
collapsed BEFORE near-dup, in-stream via dropDuplicates on a content
fingerprint). Cross-band duplicate emissions are possible (a pair
sharing k bands is emitted k times); callers dedupe after the drain —
the streaming operator itself stays append-only.

Rows-only correctness: tests/test_streaming.py replays a multi-batch
corpus and asserts (a) the cross-batch planted pair is found — the
state actually persists, (b) the full drained pair set equals a
sequential pure-Python reference over the same kernel.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SEED = 0xD1CE


def _hash_family(num_hashes: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(_SEED)
    a = rng.randint(1, 2**63, size=num_hashes, dtype=np.int64).astype(
        np.uint64
    ) | np.uint64(1)
    b = rng.randint(0, 2**63, size=num_hashes, dtype=np.int64).astype(np.uint64)
    return a, b


def signature_of(text: str, num_hashes: int = 64, shingle_n: int = 2) -> np.ndarray:
    """Deterministic MinHash signature of one document (int64 lanes).

    Shingle hash = first 8 bytes (little-endian) of md5 of the
    space-joined shingle — hashlib everywhere, so the streaming kernel,
    the batch twin, and the test reference compute identical lanes.
    """
    a, b = _hash_family(num_hashes)
    toks = [t for t in (text or "").strip().split() if t]
    if len(toks) < shingle_n:
        return np.full(num_hashes, np.iinfo(np.int64).max, dtype=np.int64)
    shingles = {
        " ".join(toks[i : i + shingle_n]) for i in range(len(toks) - shingle_n + 1)
    }
    hv = np.array(
        [
            int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")
            for s in shingles
        ],
        dtype=np.uint64,
    )
    return (a[None, :] * hv[:, None] + b[None, :]).min(axis=0).astype(np.int64)


def band_hashes(sig: np.ndarray, num_bands: int) -> list[int]:
    """Deterministic per-band bucket ids (md5 of the band's lane bytes)."""
    rpb = len(sig) // num_bands
    out = []
    for i in range(num_bands):
        band = sig[i * rpb : (i + 1) * rpb].tobytes()
        out.append(
            int.from_bytes(hashlib.md5(band).digest()[:8], "little", signed=False)
            - (1 << 63)
        )
    return out


def est_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float((sig_a == sig_b).mean())


def streaming_minhash_pairs(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.35,
    num_hashes: int = 64,
    num_bands: int = 16,
    max_bucket: int = 1024,
) -> DataFrame:
    """Candidate near-dup pairs over a STREAMING document DataFrame.

    Emits ``(id_a, id_b, est_jaccard)`` with ``id_a < id_b`` as soon as
    the later document of the pair arrives; a pair sharing several
    bands is emitted once per shared band (dedupe after draining).
    Works identically on a batch DataFrame (applyInPandasWithState then
    runs single-pass), which is what the equivalence test exploits.
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    nb = num_bands

    @pandas_udf(
        "array<struct<band_idx:int, band_hash:long, sig:array<long>>>"
    )
    def _banded(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            sig = signature_of(t, num_hashes, 2)
            bh = band_hashes(sig, nb)
            lanes = [int(v) for v in sig]
            out.append(
                [
                    {"band_idx": i, "band_hash": bh[i], "sig": lanes}
                    for i in range(nb)
                ]
            )
        return pd.Series(out)

    banded = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(_banded(F.col(text_col))).alias("b")
    ).select(
        "doc_id",
        F.col("b.band_idx").alias("band_idx"),
        F.col("b.band_hash").alias("band_hash"),
        F.col("b.sig").alias("sig"),
    )

    out_schema = "id_a long, id_b long, est_jaccard double"
    state_schema = "ids array<long>, sigs array<array<long>>"

    def update(key, pdfs, state: GroupState):
        ids, sigs = state.get if state.exists else ([], [])
        ids = list(ids)
        sigs = [np.asarray(s, dtype=np.int64) for s in sigs]
        rows = []
        new = []
        for pdf in pdfs:
            for did, s in zip(pdf["doc_id"], pdf["sig"]):
                new.append((int(did), np.asarray(s, dtype=np.int64)))
        # deterministic arrival order within the batch
        new.sort(key=lambda x: x[0])
        for did, s in new:
            for oid, osig in zip(ids, sigs):
                if oid == did:
                    continue
                e = est_jaccard(s, osig)
                if e >= threshold:
                    rows.append(
                        (min(did, oid), max(did, oid), round(e, 6))
                    )
            ids.append(did)
            sigs.append(s)
        if len(ids) > max_bucket:  # FIFO cap — see module docstring
            ids, sigs = ids[-max_bucket:], sigs[-max_bucket:]
        state.update((ids, [[int(v) for v in s] for s in sigs]))
        if rows:
            yield pd.DataFrame(rows, columns=["id_a", "id_b", "est_jaccard"])

    return (
        banded.groupBy("band_idx", "band_hash")
        .applyInPandasWithState(
            update, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )


def reference_pairs(
    rows: list[tuple[int, str]],
    threshold: float = 0.35,
    num_hashes: int = 64,
    num_bands: int = 16,
) -> set[tuple[int, int]]:
    """Sequential pure-Python reference: the pair set the streaming
    operator must produce over the same corpus (any arrival order)."""
    sigs = {i: signature_of(t, num_hashes) for i, t in rows}
    bands = {i: band_hashes(s, num_bands) for i, s in sigs.items()}
    out = set()
    items = sorted(sigs)
    for x in range(len(items)):
        for y in range(x + 1, len(items)):
            a, b = items[x], items[y]
            if any(ba == bb for ba, bb in zip(bands[a], bands[b])):
                if est_jaccard(sigs[a], sigs[b]) >= threshold:
                    out.add((a, b))
    return out
