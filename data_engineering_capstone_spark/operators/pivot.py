"""Long→wide pivot (SURVEY.md §2 B9).

The reference's demographics table is long-format — one row per
(city, race) (reference: us-cities-demographics.csv:1) — and the star
schema needs one row per city. ``pivot`` with an *explicit* value list:
without it Spark runs an extra collect-distinct job and the output column
order becomes data-dependent, which breaks schema-stable oracles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pivot_wide(
    df: DataFrame,
    group_by: Sequence[str],
    pivot_col: str,
    pivot_values: Sequence[str],
    agg_col: str,
    agg: str = "sum",
) -> DataFrame:
    """Pivot with a pinned value list (deterministic schema, single pass)."""
    agg_fn = getattr(F, agg)
    return df.groupBy(*group_by).pivot(pivot_col, list(pivot_values)).agg(agg_fn(agg_col))
