"""Exact money arithmetic on the integer fast path.

Spark's DECIMAL aggregation leaves whole-stage codegen's primitive path
as soon as the sum type exceeds 18 digits: ``sum(decimal(12,2))``
promotes to ``decimal(22,2)``, which is backed by per-row
``java.math.BigDecimal`` — measured ~3x slower than a ``bigint`` sum on
the same column. Engines with 128-bit accumulators (DuckDB sums
decimals into ``int128``) never pay this. The equivalent trick in
Spark: represent money as integer cents (``bigint``), sum on the long
fast path, and merge per-partition partials in DECIMAL so the global
total cannot overflow at any scale.

Exactness: money columns hold 2-decimal values stored as doubles, so
``x*100`` is within 1 ulp of an integer — ``floor(x*100 + 0.5)``
recovers it exactly, with no round-to-nearest ties possible (ties would
need a true .005, which a 2-decimal value never is). The same
expression is engine-portable (``FLOOR`` + ``CAST`` in ANSI SQL), so
DuckDB oracles compute bit-identical values. NOTE: this fast path is
for 2-decimal money ONLY — a derived quotient or a value with more
fractional digits must stay in DECIMAL (see SCALE.md on rounding).

Overflow budget: per-partition int64 partials are safe up to ~9.2e18
in the sum's smallest unit. A 128 MB partition holds ~5M rows; at
1e-6-dollar units (a cents x pct x pct triple product, ~1e9/row) a
partial reaches ~5e15 — three orders of magnitude of headroom. It is
the GLOBAL merge that overflows first at 100 TB, which is exactly the
step :func:`sum_cents_exact` performs in DECIMAL(38,0).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def to_cents(col: Column | str, scale: int = 100) -> Column:
    """Exact integer units of a non-negative 2-decimal money double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * scale + F.lit(0.5)).cast("bigint")


def sum_cents_exact(
    df: DataFrame,
    group_cols: list[str],
    int_sums: dict[str, Column],
    final_exprs: dict[str, Column],
    order_by: list[str] | None = None,
) -> DataFrame:
    """Two-level exact aggregation: int64 partials, DECIMAL merge.

    Level 1 groups by ``group_cols + spark_partition_id()`` so every
    partial sum combines rows from a single input partition (bounded
    magnitude, stays on the codegen long path; the map-side combine does
    all the real work and the shuffle carries ~|groups| rows per
    partition). Level 2 merges the few partials per group in
    DECIMAL(38,0) — exact at any scale. ``final_exprs`` then maps the
    merged sums (columns named per ``int_sums``) to output columns;
    convert to double/divide by the unit scale once, at this boundary.
    """
    partial = df.groupBy(
        *group_cols, F.spark_partition_id().alias("__pid")
    ).agg(*[expr.alias(name) for name, expr in int_sums.items()])
    merged = partial.groupBy(*group_cols).agg(
        *[
            F.sum(F.col(name).cast("decimal(38,0)")).alias(name)
            for name in int_sums
        ]
    )
    out = merged.select(
        *group_cols, *[expr.alias(name) for name, expr in final_exprs.items()]
    )
    return out.orderBy(*order_by) if order_by else out
