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

    NULL keys are first-class: the join runs on the MATERIALIZED
    null-safe normal form (``coalesce(k, type-default)`` + ``isnull(k)``
    real columns, plain equality — functions/nullkeys.py explains why a
    hand-written form or an eqNullSafe join both silently discard the
    explicit width for non-numeric keys) and presence is detected by
    dedicated marker columns, not key NULL-ness (a NULL-key row present
    only in ``new`` used to classify as 'D').
    """
    from ..functions.nullkeys import null_default

    def _norm(df: DataFrame, side: str) -> DataFrame:
        # the raw key value is NOT carried through the shuffle: it is
        # reconstructed exactly from (__jk, __jn) after the join, which
        # keeps the full-outer exchange rows as narrow as the raw-key
        # form (measured: carrying duplicate value columns cost +44%
        # wall at the 2048x octave)
        cols = [F.lit(True).alias(f"__{side}_m")]
        for i, k in enumerate(keys):
            dflt = null_default(df.schema[k].dataType)
            cols.append(F.coalesce(F.col(k), dflt).alias(f"__jk{i}"))
            cols.append(F.isnull(F.col(k)).alias(f"__jn{i}"))
        return df.select(
            *cols,
            *[F.col(c).alias(f"{'old' if side == 'o' else 'new'}_{c}") for c in compare_cols],
        )

    jk = [c for i in range(len(keys)) for c in (f"__jk{i}", f"__jn{i}")]
    o = _norm(old, "o")
    n = _norm(new, "n")
    if num_partitions is not None:
        # the normal-form columns are plain non-null columns, so this
        # explicit width is exactly what the equi-join requires — no
        # planner-internal rewrite can re-derive a different form
        o = o.repartition(num_partitions, *jk)
        n = n.repartition(num_partitions, *jk)
    joined = o.join(n, jk, "full_outer")

    in_old = F.col("__o_m").isNotNull()
    in_new = F.col("__n_m").isNotNull()
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
                F.when(F.col(f"__jn{i}"), F.lit(None))
                .otherwise(F.col(f"__jk{i}"))
                .alias(k)
                for i, k in enumerate(keys)
            ],
            *[F.col(f"old_{c}") for c in compare_cols],
            *[F.col(f"new_{c}") for c in compare_cols],
        )
    )
