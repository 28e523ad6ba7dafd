"""Driver-contract shape tests (SURVEY.md §5)."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_queries_oracle_keys_consistent():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert qs, "catalog is empty"
    assert set(oracles) <= set(qs)
    for name, fn in qs.items():
        assert callable(fn), name


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["nation", "region", "revenue", "n_orders"]


def test_all_queries_execute(spark, sf_dir):
    """Every catalog query builds a plan and returns rows at smoke scale.

    Value correctness is the oracle-parity gate (tools/parity.py); this
    guards against import-time or analysis-time breakage.
    """
    import data_engineering_capstone_spark.catalog as cat

    for name, spec in cat.load_all().items():
        df = spec.fn(spark, sf_dir)
        n = df.count()
        assert n >= 0, name


def test_parity_typeclass_gate_flags_engine_level_skews(spark):
    """Regression for the round-7 double red row: tools/parity.py must
    flag int-vs-float ENGINE type skews (Spark lazy schema vs DuckDB
    prepared types) before value coercion — sign_v shipped DOUBLE vs
    TINYINT green through two committed sweeps because the comparator
    coerced both to float. Also pins the two adjudicated allowances:
    HUGEINT-vs-long is int-class both sides (the driver collects Python
    values, so it never sees pandas' HUGEINT->float64 artifact), and
    DECIMAL(x,0)-vs-int is allowed."""
    import importlib.util
    import os

    import duckdb

    spec = importlib.util.spec_from_file_location(
        "parity_mod",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools", "parity.py"),
    )
    parity = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(parity)

    con = duckdb.connect()
    sdf = spark.sql(
        "SELECT CAST(1.0 AS DOUBLE) AS sign_v, CAST(5 AS BIGINT) AS big_sum, "
        "CAST(7 AS DECIMAL(10,0)) AS dec0, CAST(2 AS INT) AS ok_int"
    )
    rel = con.sql(
        "SELECT CAST(1 AS TINYINT) AS sign_v, "          # real skew: int vs float
        "CAST(5 AS HUGEINT) AS big_sum, "                 # allowed: int-class both
        "CAST(7 AS BIGINT) AS dec0, "                     # allowed: DECIMAL(x,0) ~ int
        "CAST(2.5 AS DOUBLE) AS ok_int"                   # real skew: float vs int
    )
    problems = parity.typeclass_problems(sdf.schema, rel)
    flagged = {p.split(":")[0].replace("col ", "") for p in problems}
    assert flagged == {"sign_v", "ok_int"}, problems
