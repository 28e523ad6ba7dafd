"""Exact deduplication (SURVEY.md §2 B2, C-llm-dedup exact tier).

The reference's spec: 'duplicate data' cleanup (notebook cell-7) →
``dropDuplicates`` on the record key. At 100 TB prefer the
hash-groupBy form (:func:`dedup_exact`): grouping on a fixed-width
digest of the dedup columns shuffles 16-byte keys instead of full rows
of text, and AQE handles skew on pathological duplicate clusters.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_exact(
    df: DataFrame,
    subset: Sequence[str],
    keep_order_by: Sequence | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Keep one row per distinct ``subset`` value.

    Without ``keep_order_by``: Spark's ``dropDuplicates`` (arbitrary but
    single-pass winner per key — partial dedup map-side, then one
    shuffle). With it: deterministic winner via min-by window (e.g. keep
    the lowest doc_id), needed whenever results must be reproducible.

    ``num_partitions`` pins the dedup exchange's width plan-side
    (round-11 width law, sources/pqmeta.py:scaled_width): on a
    fact-cardinality ``subset`` the session-width window/aggregate holds
    corpus/N rows per task — the q9 2048× OOM class. The repartition
    satisfies the window/aggregate distribution, so no second exchange.
    """
    if num_partitions is not None:
        df = df.repartition(num_partitions, *subset)
    if keep_order_by is None:
        return df.dropDuplicates(list(subset))
    w = Window.partitionBy(*subset).orderBy(*keep_order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def duplicate_groups(df: DataFrame, subset: Sequence[str]) -> DataFrame:
    """Report duplicate-key groups (the quality-check dual of dedup)."""
    return (
        df.groupBy(*subset)
        .agg(F.count(F.lit(1)).alias("n_dups"))
        .filter(F.col("n_dups") > 1)
    )
