"""Scalable global prefix sums (running totals over a total order).

A plain ``SUM(x) OVER (ORDER BY k)`` with no PARTITION BY forces Spark to
sort-collapse the whole table into ONE task — fine at sf0.1, fatal at
100 TB. The two-phase form here keeps every stage distributed:

1. assign each row a coarse *bucket* along the order key (any
   monotone-in-key expression works; dense integer ids use
   ``floor(key / bucket_size)``),
2. aggregate per-bucket sums (map-side partial combine, tiny result),
3. run the cumulative sum over the bucket sums only — thousands of rows,
   not billions, so the single-partition window is safe,
4. broadcast-join the per-bucket *offsets* back and add an intra-bucket
   running sum (windows partitioned by bucket → parallel).

Same output as the single-partition window, verified in tests and by the
DuckDB oracle of ``llm_pack_sequences``.

(reference scope: the capstone spec's summary statistics are plain
aggregations — running totals enter via the extension surface,
/root/repo/BASELINE.json:6; SURVEY.md §2 C-window.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_running_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "running_sum",
    bucket: Column | None = None,
    bucket_size: int = 1024,
) -> DataFrame:
    """Add ``out_col`` = inclusive running sum of ``value_col`` over the
    total order of ``order_col``, without a single-partition window over
    the data.

    ``bucket`` must be monotone non-decreasing in ``order_col``; default
    ``floor(order_col / bucket_size)`` suits dense integer keys. For
    arbitrary keys pass e.g. a range-partitioner boundary expression.
    """
    b = bucket if bucket is not None else F.floor(F.col(order_col) / F.lit(bucket_size))
    withb = df.withColumn("__bkt", b.cast("long"))

    # Phase 1: per-bucket totals — one tiny row per bucket.
    bucket_sums = withb.groupBy("__bkt").agg(F.sum(value_col).alias("__bkt_sum"))

    # Phase 2: exclusive running offset across buckets. The window runs
    # over #buckets rows (data_size / bucket_size), not data rows.
    w_b = Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = bucket_sums.select(
        "__bkt", F.coalesce(F.sum("__bkt_sum").over(w_b), F.lit(0)).alias("__offset")
    )

    # Phase 3: intra-bucket running sum (parallel across buckets) + offset.
    w_in = Window.partitionBy("__bkt").orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        withb.join(F.broadcast(offsets), "__bkt")
        .withColumn(out_col, F.sum(value_col).over(w_in) + F.col("__offset"))
        .drop("__bkt", "__offset")
    )
