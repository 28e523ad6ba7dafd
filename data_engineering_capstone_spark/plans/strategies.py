"""Physical join-strategy control and plan assertions (SURVEY.md §4).

Catalyst picks join strategies from statistics; at 100 TB the cost of a
wrong pick (a sort-merge against a dimension, a broadcast of a fact) is
hours, so production plans pin the strategy where it matters and ASSERT
it in tests — a plan regression then fails CI instead of the cluster.

* ``broadcast`` — hash join with the small side replicated to every
  executor: no shuffle of the big side. Right for dimensions under
  ~an executor's memory headroom.
* ``merge`` (sort-merge) — both sides shuffled + sorted on the key:
  right for fact⋈fact with unsorted inputs; pairs with bucketing to
  delete the shuffle (sources/writers.write_bucketed_table).
* ``shuffle_hash`` — both sides shuffled, smaller side hashed in
  memory per partition: beats merge when one side is much smaller than
  the other but too big to broadcast, and avoids the sort.

These wrap Spark's join hints — Catalyst still owns correctness; the
hint only pins the physical pick.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def broadcast_join(left: DataFrame, right: DataFrame, on, how: str = "inner") -> DataFrame:
    from pyspark.sql.functions import broadcast

    return left.join(broadcast(right), on, how)


def merge_join(left: DataFrame, right: DataFrame, on, how: str = "inner") -> DataFrame:
    return left.join(right.hint("merge"), on, how)


def shuffle_hash_join(
    left: DataFrame, right: DataFrame, on, how: str = "inner"
) -> DataFrame:
    return left.join(right.hint("shuffle_hash"), on, how)


def physical_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


_STRATEGY_NODES = {
    "broadcast": "BroadcastHashJoin",
    "merge": "SortMergeJoin",
    "shuffle_hash": "ShuffledHashJoin",
}


def assert_join_strategy(df: DataFrame, strategy: str) -> None:
    """Raise if the physical plan does not contain the expected join
    node (and, for broadcast, if any SortMergeJoin sneaked in)."""
    node = _STRATEGY_NODES[strategy]
    plan = physical_plan(df)
    if node not in plan:
        raise AssertionError(f"expected {node} in plan:\n{plan}")
    if strategy == "broadcast" and "SortMergeJoin" in plan:
        raise AssertionError(f"unexpected SortMergeJoin alongside broadcast:\n{plan}")
