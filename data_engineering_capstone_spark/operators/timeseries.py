"""Time-series operators over event tables (SURVEY.md §2 extension
surface; the hypertable-style bucket/rollup/gap-fill family): time
bucketing, dense-grid gap filling, forward fill, and hierarchical
rollup reaggregation.

Scale notes (100 TB):
* bucketing is a projection — it rides the scan, no extra pass;
* the gap-fill grid is (entities × buckets), built from a tiny exploded
  sequence cross-joined with the entity dimension — never materialize a
  grid wider than the slice you serve;
* forward fill is one window per entity (parallel across entities) —
  partition-local, no global sort;
* hierarchical rollups reaggregate the NEXT-coarser level's partials
  (day from hour, month from day), touching rows proportional to the
  finer rollup, not the raw events — the continuous-aggregate pattern.

Money-typed measures are summed as DECIMAL and cast to double only at
the output boundary (SCALE.md: float sums are order-dependent; decimal
sums are exact and engine-portable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def time_bucket(ts_col: Column | str, width: str) -> Column:
    """Tumbling time bucket start (timestamp), e.g. width='1 hour'."""
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return F.window(c, width).getField("start")


def forward_fill(
    df: DataFrame, part_col: str, order_col: str, cols: list[str], suffix: str = "_ffill"
) -> DataFrame:
    """Per-partition forward fill: carry the last non-null value of each
    column down the ``order_col`` order. One shared window spec — one
    sort per partition regardless of how many columns are filled.
    """
    w = Window.partitionBy(part_col).orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    out = df
    for c in cols:
        out = out.withColumn(c + suffix, F.last(c, ignorenulls=True).over(w))
    return out


def sessionize(
    df: DataFrame,
    part_col: str,
    ts_col: str,
    gap_seconds: int,
    order_cols: list[str] | None = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Gap-based batch sessionization: a new session starts when the time
    since the previous event in the partition exceeds ``gap_seconds``.

    Two window functions over ONE (part, ts, tiebreak) sort — Catalyst
    reuses the sort for both the lag and the running sum, so the whole
    operator is a single shuffle on ``part_col`` plus a partition-local
    sort. At 100 TB this parallelizes across entities; no global sort.

    The gap test compares microsecond epochs (``unix_micros``) — casting
    to seconds would truncate sub-second gaps and drift from engines that
    compare full-precision intervals.
    """
    order = [ts_col] + list(order_cols or [])
    w = Window.partitionBy(part_col).orderBy(*order)
    prev_us = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    is_new = F.when(
        prev_us.isNull()
        | (F.unix_micros(F.col(ts_col)) - prev_us > gap_seconds * 1_000_000),
        F.lit(1),
    ).otherwise(F.lit(0))
    running = Window.partitionBy(part_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn(session_col, F.sum(is_new).over(running))


def dense_grid(
    entities: DataFrame,
    spark: SparkSession,
    start: str,
    end_exclusive: str,
    step: str,
    bucket_col: str = "bucket_ts",
) -> DataFrame:
    """(entity × bucket) dense grid: every entity gets every bucket in
    [start, end). The bucket sequence is one exploded row; the cross
    join is tiny-by-construction (dims × grid slice) and intentional.
    """
    buckets = spark.range(1).select(
        F.explode(
            F.sequence(
                F.to_timestamp(F.lit(start)),
                F.to_timestamp(F.lit(end_exclusive)) - F.expr(f"INTERVAL {step}"),
                F.expr(f"INTERVAL {step}"),
            )
        ).alias(bucket_col)
    )
    return entities.crossJoin(buckets)
