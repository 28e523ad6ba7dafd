"""Change-data-capture extraction: diff two table snapshots into
insert / update / delete rows (SURVEY.md §2 extension surface — the
inverse of operators/merge.py, which APPLIES a changeset; this one
PRODUCES it).

Scale notes (100 TB): one full outer join on the key — co-partition or
bucket both snapshots on the key (sources/writers.write_bucketed_table)
and the join is shuffle-free; unchanged rows (the overwhelming majority
between daily snapshots) are dropped before anything is materialized,
so the output is proportional to the churn, not the table.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Changeset between snapshots: rows only in ``new`` → 'I', only in
    ``old`` → 'D', in both with any ``compare_cols`` difference → 'U'
    (null-safe comparison: NULL → value and value → NULL are updates).
    Unchanged rows are filtered out. Output: op, keys, and
    old_/new_-prefixed compare columns.

    ``num_partitions`` pins the full-outer join's exchange width
    plan-side (round-11 width law): both snapshots are fact-scale, so a
    session-width SMJ sorter here is the q9 2048× OOM class.
    """
    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in keys],
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    if num_partitions is not None:
        # repartition on the NULL-SAFE key normal form — EnsureRequirements
        # plans an eqNullSafe join's distribution as (coalesce(k, 0),
        # isnull(k)), so a raw-column repartition would not satisfy it
        # and the join would re-exchange at session width (found by the
        # round-11 explain audit)
        def _nsafe(prefix):
            out = []
            for k in keys:
                col = F.col(f"{prefix}{k}")
                zero = F.lit(0).cast(old.schema[k].dataType)
                out.extend([F.coalesce(col, zero), F.isnull(col)])
            return out

        o = o.repartition(num_partitions, *_nsafe("__ok_"))
        n = n.repartition(num_partitions, *_nsafe("__nk_"))
    cond = reduce(
        Column.__and__,
        [F.col(f"__ok_{k}").eqNullSafe(F.col(f"__nk_{k}")) for k in keys],
    )
    joined = o.join(n, cond, "full_outer")

    in_old = F.col(f"__ok_{keys[0]}").isNotNull()
    in_new = F.col(f"__nk_{keys[0]}").isNotNull()
    changed = ~reduce(
        Column.__and__,
        [F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}")) for c in compare_cols],
    )
    op = (
        F.when(~in_new, F.lit("D"))
        .when(~in_old, F.lit("I"))
        .when(changed, F.lit("U"))
        .otherwise(F.lit(None).cast("string"))
    )
    return (
        joined.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(
            "op",
            *[
                F.coalesce(F.col(f"__nk_{k}"), F.col(f"__ok_{k}")).alias(k)
                for k in keys
            ],
            *[F.col(f"old_{c}") for c in compare_cols],
            *[F.col(f"new_{c}") for c in compare_cols],
        )
    )
