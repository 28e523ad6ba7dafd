"""Parquet-footer metadata probes (sources/pqmeta.py) — the inputs to
the round-10 width/gate laws must be exact, not estimates."""

from __future__ import annotations

import os

from data_engineering_capstone_spark.sources.pqmeta import (
    parquet_row_count,
    parquet_total_bytes,
    scaled_width,
)


def test_row_count_single_file(sf_dir):
    # driver-generated testdata is one file per table with known shape
    assert parquet_row_count(f"{sf_dir}/nation.parquet") == 25
    assert parquet_row_count(f"{sf_dir}/region.parquet") == 5


def test_row_count_matches_spark(spark, sf_dir):
    for t in ("customer", "orders"):
        path = f"{sf_dir}/{t}.parquet"
        assert parquet_row_count(path) == spark.read.parquet(path).count()


def test_row_count_spark_written_directory(spark, sf_dir, tmp_path):
    out = str(tmp_path / "multi")
    spark.read.parquet(f"{sf_dir}/nation.parquet").repartition(4).write.parquet(out)
    assert parquet_row_count(out) == 25
    assert parquet_total_bytes(out) == sum(
        os.path.getsize(os.path.join(r, f))
        for r, _d, fs in os.walk(out)
        for f in fs
        if f.endswith(".parquet")
    )


def test_scaled_width_floors_at_parallelism(sf_dir):
    # 25-row nation: width must floor at the cluster parallelism
    assert scaled_width(f"{sf_dir}/nation.parquet", 32) == 32
    # and grow once rows exceed rows_per_task
    assert scaled_width(f"{sf_dir}/nation.parquet", 2, rows_per_task=10) == 3


def test_missing_path_raises(tmp_path):
    import pytest

    with pytest.raises(FileNotFoundError):
        parquet_row_count(str(tmp_path / "nope"))
