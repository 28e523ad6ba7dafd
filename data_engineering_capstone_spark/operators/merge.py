"""Batch merge patterns: upsert and SCD2 (slowly-changing dimension).

The reference's pipeline is overwrite-only (reference:
dags/transform/airport.py:6-7); production star schemas need key-based
merges. Without a transactional table format (Delta/Iceberg) a merge is
a full-outer-join rewrite — still fully distributed, one shuffle on the
key (or zero if both sides are bucketed on it, sources/writers.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(target: DataFrame, updates: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Key-based upsert: update rows present in ``updates``, keep the
    rest, insert new keys. Both sides must share a schema.

    Anti-join + union instead of full-outer + per-column coalesce: moves
    only keys for the probe, never widens the row, and keeps column
    count independent of schema width.
    """
    keep = target.join(updates.select(*keys), list(keys), "left_anti")
    return keep.unionByName(updates)


def scd2_apply(
    current: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    change_ts_col: str,
    effective_from: str = "valid_from",
    effective_to: str = "valid_to",
    current_flag: str = "is_current",
    num_partitions: int | None = None,
) -> DataFrame:
    """Type-2 SCD merge: close out the current version of each changed
    key (set ``valid_to`` / drop the current flag) and append the new
    version as current.

    ``current`` must carry the three bookkeeping columns; ``changes``
    carries the business columns + ``change_ts_col``. One shuffle on the
    key; history rows stream through untouched.

    Multiple changes for one key in a single batch are chained: each
    intermediate version closes at the NEXT change's timestamp and only
    the latest change stays current (ties on ``change_ts_col`` within a
    key are broken arbitrarily — pre-dedup if that matters).
    """
    from pyspark.sql import Window

    klist = list(keys)
    # round-11 width law: one explicit key-hash exchange per side feeds
    # the change window, the first-change groupBy (single-stage on the
    # same distribution) AND the close-out join — a session-width
    # exchange on a fact key is the q9 2048× OOM class
    if num_partitions is not None:
        changes = changes.repartition(num_partitions, *klist)
        current = current.repartition(num_partitions, *klist)
    w = Window.partitionBy(*klist).orderBy(F.col(change_ts_col).asc())
    nxt = F.lead(change_ts_col).over(w)
    new_versions = (
        changes.withColumn(effective_from, F.col(change_ts_col))
        .withColumn("__next_ts", nxt)
        .withColumn(
            effective_to, F.col("__next_ts").cast(current.schema[effective_to].dataType)
        )
        .withColumn(current_flag, F.col("__next_ts").isNull())
        .drop(change_ts_col, "__next_ts")
    )
    first_change = changes.groupBy(*klist).agg(F.min(change_ts_col).alias("__chg_ts"))
    closed = (
        current.join(first_change, klist, "left")
        .withColumn(
            effective_to,
            F.when(
                F.col(current_flag) & F.col("__chg_ts").isNotNull(), F.col("__chg_ts")
            ).otherwise(F.col(effective_to)),
        )
        .withColumn(
            current_flag,
            F.when(F.col("__chg_ts").isNotNull(), F.lit(False)).otherwise(F.col(current_flag)),
        )
        .drop("__chg_ts")
    )
    return closed.unionByName(new_versions.select(*closed.columns))
