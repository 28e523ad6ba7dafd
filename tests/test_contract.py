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
