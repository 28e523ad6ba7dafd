"""Data-quality checks (SURVEY.md §2 B11-B13, replacing stub A8).

The reference ships an Airflow ``DataQualityOperator`` whose ``evaluate``
is literally ``pass`` (reference: plugins/operators/data_quality.py:5-13)
while the capstone template specifies the checks: unique key, data type,
and source/count completeness (notebook cell-12). Here each check is a
composable function returning a :class:`CheckResult`; ``run_checks``
collects them and ``assert_checks`` gives the fail-fast behavior the
reference's Livy error path models (reference: dags/libs/lib.py:194-199).

Every check is a distributed aggregation — nothing collects more than a
scalar to the driver, so the suite runs unchanged at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass(frozen=True)
class CheckResult:
    check: str
    passed: bool
    observed: str
    expected: str


def check_nonempty(df: DataFrame, name: str = "nonempty") -> CheckResult:
    """B11: the sink has rows at all."""
    n = df.limit(1).count()
    return CheckResult(name, n > 0, f"{n}+ rows", "> 0 rows")


def check_completeness(source_count: int, sink_count: int, name: str = "completeness") -> CheckResult:
    """B11: source/count check — no rows lost between source and sink."""
    return CheckResult(name, source_count == sink_count, str(sink_count), str(source_count))


def check_unique_key(df: DataFrame, keys: Sequence[str], name: str | None = None) -> CheckResult:
    """B12: key uniqueness via one distributed agg (no full dedup pass)."""
    name = name or f"unique({','.join(keys)})"
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(*[F.col(k) for k in keys]).alias("nd"),
    ).collect()[0]
    return CheckResult(name, row["n"] == row["nd"], f"{row['nd']} distinct / {row['n']} rows", "all distinct")


def check_no_nulls(df: DataFrame, cols: Sequence[str], name: str | None = None) -> CheckResult:
    """B1-adjacent: key columns carry no nulls (one pass over all cols)."""
    name = name or f"no_nulls({','.join(cols)})"
    row = df.agg(
        *[F.sum(F.col(c).isNull().cast("long")).alias(c) for c in cols]
    ).collect()[0]
    bad = {c: row[c] for c in cols if row[c]}
    return CheckResult(name, not bad, str(bad or "0 nulls"), "0 nulls")


def check_schema(df: DataFrame, expected: T.StructType, name: str = "schema") -> CheckResult:
    """B13: exact schema conformance (names, types, order)."""
    ok = df.schema == expected
    return CheckResult(name, ok, df.schema.simpleString(), expected.simpleString())


def run_checks(*results: CheckResult) -> list[CheckResult]:
    return list(results)


def assert_checks(*results: CheckResult) -> None:
    """Fail-fast: raise on the first failed check, like the reference's
    Livy statement error propagation."""
    failed = [r for r in results if not r.passed]
    if failed:
        lines = "; ".join(f"{r.check}: observed {r.observed}, expected {r.expected}" for r in failed)
        raise AssertionError(f"quality checks failed: {lines}")


def results_df(spark, results: Sequence[CheckResult]) -> DataFrame:
    """Materialize check results as a DataFrame (for reporting sinks)."""
    schema = T.StructType(
        [
            T.StructField("check", T.StringType(), False),
            T.StructField("passed", T.BooleanType(), False),
            T.StructField("observed", T.StringType(), False),
            T.StructField("expected", T.StringType(), False),
        ]
    )
    return spark.createDataFrame([(r.check, r.passed, r.observed, r.expected) for r in results], schema)
