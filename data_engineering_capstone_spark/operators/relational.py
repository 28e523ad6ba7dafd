"""Relational-core join helpers (SURVEY.md §2 B3, B4, C-join).

The reference's star-schema spec (notebook cells 9-10) joins a 3.1M-row
fact against code→name dims of 3..660 rows (reference:
I94_SAS_Labels_Descriptions.SAS:9-1036). At 100 TB the fact side is
thousands of parquet files; the dims still fit in memory — so every dim
join is a broadcast hash join (zero shuffle of the fact), which is what
:func:`broadcast_dim_join` pins explicitly rather than trusting
``autoBroadcastJoinThreshold`` to notice.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def broadcast_dim_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str] | None = None,
    how: str = "left",
    condition=None,
) -> DataFrame:
    """Join a large fact to a small dimension with an explicit broadcast.

    Broadcast keeps the fact's partitioning intact: no shuffle, no skew
    exposure on hot keys (the reference's NYC/LOS ports), and the join
    runs map-side inside whole-stage codegen.
    """
    key = condition if condition is not None else on
    return fact.join(F.broadcast(dim), key, how)


def semi_join(left: DataFrame, right: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """EXISTS — e.g. keep fact rows whose code appears in a valid-code dim
    (reference: I94_SAS_Labels_Descriptions.SAS:8 'valid and invalid codes')."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """NOT EXISTS — the complement filter (invalid codes, orphan keys)."""
    return left.join(right, on, "left_anti")


def code_to_name(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    dim_value: str,
    out_col: str,
    default: str | None = None,
) -> DataFrame:
    """Code→name lookup with an optional default for unmatched codes.

    Implements the reference's i94addr rule: 'everything not in the list
    → other' (reference: I94_SAS_Labels_Descriptions.SAS:979-980) as a
    broadcast left join + coalesce, not a filter.
    """
    joined = fact.join(
        F.broadcast(dim.select(F.col(dim_key), F.col(dim_value).alias(out_col))),
        fact[fact_key] == dim[dim_key],
        "left",
    ).drop(dim_key)
    if default is not None:
        joined = joined.withColumn(out_col, F.coalesce(F.col(out_col), F.lit(default)))
    return joined
