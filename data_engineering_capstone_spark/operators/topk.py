"""Top-K operators (SURVEY.md §2 C-sort, C-window).

Global top-k via ``orderBy().limit(k)`` compiles to Spark's
``TakeOrderedAndProject`` — each partition keeps a k-row heap and only k
rows per partition reach the driver, so it scales to any input size.
Per-group top-k is the window-rank pattern; the shuffle is on the group
key only.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def top_k(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    return df.orderBy(*order_by).limit(k)


def top_k_per_group(
    df: DataFrame,
    group_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rk",
    method: str = "row_number",
) -> DataFrame:
    """Top-k rows per group via a ranking window function.

    ``method`` picks the tie semantics: ``row_number`` (exactly k),
    ``rank``/``dense_rank`` (ties kept). Always pass a deterministic
    tiebreaker in ``order_by`` when using row_number.
    """
    w = Window.partitionBy(*group_by).orderBy(*order_by)
    ranker = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank}[method]
    return df.withColumn(rank_col, ranker().over(w)).filter(F.col(rank_col) <= k)
