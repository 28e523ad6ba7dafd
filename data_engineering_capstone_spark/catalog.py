"""Query catalog — the single registry behind ``__spark_entry__.py``.

Each entry pairs a PySpark query function ``(spark, sf_dir) -> DataFrame``
with an equivalent ANSI-SQL oracle string (run by DuckDB over the same
parquet tables) where the operator is SQL-expressible. Names, aliases and
rounding are kept identical on both sides because the driver compares
row-count + schema + an order-insensitive value hash (BASELINE.md).

Approximate / stateful operators (MinHash-LSH, SimHash, structured
streaming) register with ``oracle=None`` → driver records a rows-only
check; their exact-semantics cousins and unit tests carry correctness.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None):
    """Register a catalog query (decorator)."""

    def deco(fn):
        QUERIES[name] = QuerySpec(fn=fn, oracle=oracle, doc=(fn.__doc__ or "").strip())
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every domain module (registration side effects) and return
    the full catalog."""
    from . import (  # noqa: F401
        queries_relational,
        queries_tpch2,
        queries_functions,
        queries_etl,
        queries_llm,
        queries_streaming,
        queries_timeseries,
        queries_udf,
        queries_sources,
        queries_sql,
        queries_refdata,
    )

    return QUERIES
