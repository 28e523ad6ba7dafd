"""Token-window document chunking (C-llm-text extension surface).

The step between cleaning and tokenization in a training-data pipeline:
split each document into fixed-size token windows with overlap, so
downstream tokenization/packing sees bounded-length pieces and no
context is lost at hard cut points.

Everything is built from JVM-side array expressions — ``split`` →
``sequence`` of window starts → ``posexplode`` → ``slice`` — so the
whole op stays inside whole-stage codegen (no Python in the hot path)
and scales linearly in corpus size: one narrow projection + explode,
zero shuffles. At 100 TB the explode fan-out (~tokens/stride rows per
doc) is the only data growth, and it is partition-local.

Reference parity: the reference's notebook (cell-7) stops at cleaning;
chunking is part of the LLM-pipeline extension tier (BASELINE.json
north star).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.strings import tokens


def chunk_by_tokens(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 20,
    stride: int = 15,
    keep_cols: Sequence[str] = (),
    with_text: bool = False,
) -> DataFrame:
    """Explode each document into overlapping ``size``-token windows.

    Window ``i`` covers tokens ``[i*stride, i*stride + size)`` (0-based);
    the final window may be shorter — every token belongs to at least
    one window for any ``stride <= size``. Output: one row per chunk
    with ``chunk_id`` (window ordinal), ``n_tokens`` (actual window
    length), and ``chunk_md5`` (digest of the space-joined window — the
    compact identity used for chunk-level dedup). Pass ``with_text``
    for the materialized chunk text itself.
    """
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    base = df.withColumn("__tk", tokens(text_col)).filter(F.size("__tk") > 0)
    starts = F.sequence(F.lit(0), F.size(F.col("__tk")) - 1, F.lit(stride))
    ex = base.select(
        id_col, *keep_cols, "__tk", F.posexplode(starts).alias("chunk_id", "__start")
    )
    ct = F.slice(F.col("__tk"), F.col("__start") + 1, size)
    cols = [
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        F.col("chunk_id"),
        F.size(ct).alias("n_tokens"),
        F.md5(F.array_join(ct, " ")).alias("chunk_md5"),
    ]
    if with_text:
        cols.append(F.array_join(ct, " ").alias("chunk_text"))
    return ex.select(*cols)
