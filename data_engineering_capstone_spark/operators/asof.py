"""As-of join (SURVEY.md §2 C-join: range/as-of).

Spark has no native as-of join. Two implementations:

* :func:`asof_join` — the scale path: union both sides tagged, one
  window over (key, time) carrying the last right-side row forward
  (``last(..., ignorenulls=True)``). Exactly ONE shuffle on the key, no
  cross product, no per-group memory blowup — survives 100 TB where the
  naive join-then-rank (left⋈right on key + range, then row_number)
  explodes on hot keys.
* :func:`asof_join_merge` — ``applyInPandas`` + ``pd.merge_asof`` per
  key group; simpler semantics, used as a cross-check in tests.

Semantics match DuckDB's ``ASOF JOIN``: for each left row, the single
right row with the greatest ``right_ts <= left_ts`` for the same key;
left rows with no prior right row get nulls (left outer). Where this
repo is STRICTER: multiple right rows tied on (key, right_ts) are
resolved to the greatest right-column tuple — a total order, so the
result is identical on any partitioning/deployment (DuckDB leaves the
tie arbitrary).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str] | None = None,
    suffix: str = "_right",
    num_partitions: int | None = None,
) -> DataFrame:
    """Backward as-of join via tagged union + forward-fill window.

    ``num_partitions`` pins the tagged-union exchange's width plan-side
    (round-11 width law, sources/pqmeta.py:scaled_width): the window
    sorts BOTH sides' rows per task, so a session-width exchange holds
    (|left|+|right|)/N rows per sorter — the q9 2048× OOM class on any
    fact-cardinality key. The repartition satisfies the window's
    distribution, so no second exchange.
    """
    keys = [on] if isinstance(on, str) else list(on)
    right_cols = list(right_cols) if right_cols is not None else [
        c for c in right.columns if c not in keys and c != right_ts
    ]

    out_map = {c: (c + suffix if c in left.columns or c == right_ts else c) for c in right_cols}
    # Pack all right columns into ONE struct and forward-fill the struct,
    # not each column independently: per-column fill would let a NULL field
    # in the matched right row be replaced by an older row's value, mixing
    # fields from different right rows (DuckDB ASOF JOIN returns the single
    # matched row including its NULLs).
    r_struct_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in right_cols]
    )
    lhs = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__is_left"),
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    rhs = right.select(
        *[F.col(k) for k in keys],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in keys],
        F.lit(0).alias("__is_left"),
        F.col(right_ts).alias("__ts"),
        F.struct(*[F.col(c) for c in right_cols]).alias("__r"),
    ).select(*lhs.columns)  # align column order

    # Right rows sort before left rows at equal __ts (__is_left asc) so a
    # right row with right_ts == left_ts IS visible to that left row.
    # __r as the FINAL sort key makes the order total over right rows
    # tied on (key, ts): without it their relative order is partition-
    # layout-dependent and the forward-fill winner changes between
    # deployments (caught by tools/multi_executor_probe.py — local[32]
    # and local-cluster[4,8] returned different matches on a corpus
    # with same-ts ties; DuckDB's ASOF JOIN leaves ties arbitrary too).
    # Ascending + last() = the greatest right-column tuple wins —
    # documented, engine-independent. Requires orderable right_cols
    # (no maps), which as-of payloads satisfy in practice.
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc(), F.col("__r").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = lhs.unionByName(rhs)
    if num_partitions is not None:
        tagged = tagged.repartition(num_partitions, *keys)
    filled = tagged.withColumn(
        "__r_filled", F.last(F.col("__r"), ignorenulls=True).over(w)
    )
    return filled.filter(F.col("__is_left") == 1).select(
        *[F.col(c) for c in left.columns],
        *[F.col("__r_filled").getField(c).alias(out_map[c]) for c in right_cols],
    )


def asof_join_merge(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    suffix: str = "_right",
) -> DataFrame:
    """Reference implementation via pd.merge_asof inside applyInPandas."""
    import pandas as pd

    out_map = {c: (c + suffix if c in left.columns else c) for c in right_cols}
    out_schema_df = left
    for c in right_cols:
        out_schema_df = out_schema_df.withColumn(
            out_map[c], F.lit(None).cast(right.schema[c].dataType)
        )
    out_schema = out_schema_df.schema

    lcols, rsel = list(left.columns), [on, right_ts, *right_cols]

    def merge(lpdf, rpdf):
        lpdf = lpdf[lcols].sort_values(left_ts)
        rpdf = rpdf[rsel].sort_values(right_ts).rename(
            columns={**out_map, right_ts: "__rts"}
        )
        merged = pd.merge_asof(
            lpdf, rpdf.drop(columns=[on]), left_on=left_ts, right_on="__rts",
            direction="backward",
        )
        return merged[[f.name for f in out_schema.fields]]

    return left.groupBy(on).cogroup(right.groupBy(on)).applyInPandas(merge, out_schema)
