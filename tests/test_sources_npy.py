"""NumPy .npy Python DataSource: spec round-trips, error paths, and the
distributed range-read contract (sources/npy.py)."""

from __future__ import annotations

import numpy as np
import pytest

from data_engineering_capstone_spark.sources.npy import (
    NpyDataSource,
    NpyReader,
    parse_npy_header,
    write_npy,
)


def test_header_roundtrip_matches_numpy_loader(tmp_path):
    """Our writer's files load with np.load, and our parser reads files
    np.save wrote — both directions of the public spec."""
    p1 = str(tmp_path / "ours.npy")
    mat = np.arange(24, dtype=np.float32).reshape(6, 4) / 7
    write_npy(p1, mat)
    assert np.array_equal(np.load(p1), mat)

    p2 = str(tmp_path / "theirs.npy")
    mat8 = np.arange(15, dtype=np.float64).reshape(5, 3) * 1.5
    np.save(p2, mat8)
    descr, n, d, start, rb = parse_npy_header(p2)
    assert (descr, n, d, rb) == ("<f8", 5, 3, 24)
    with open(p2, "rb") as f:
        f.seek(start)
        back = np.frombuffer(f.read(), dtype="<f8").reshape(5, 3)
    assert np.array_equal(back, mat8)


def test_header_error_paths(tmp_path):
    bad = str(tmp_path / "bad.npy")
    open(bad, "wb").write(b"not numpy at all")
    with pytest.raises(ValueError, match="magic"):
        parse_npy_header(bad)

    f_order = str(tmp_path / "fortran.npy")
    np.save(f_order, np.asfortranarray(np.ones((3, 3), dtype=np.float32)))
    with pytest.raises(ValueError, match="fortran"):
        parse_npy_header(f_order)

    one_d = str(tmp_path / "oned.npy")
    np.save(one_d, np.ones(5, dtype=np.float32))
    with pytest.raises(ValueError, match="2-D"):
        parse_npy_header(one_d)

    ints = str(tmp_path / "ints.npy")
    np.save(ints, np.ones((2, 2), dtype=np.int32))
    with pytest.raises(ValueError, match="dtype"):
        parse_npy_header(ints)


def test_partition_ranges_cover_exactly_once(tmp_path):
    p = str(tmp_path / "m.npy")
    write_npy(p, np.zeros((103, 2), dtype=np.float32))
    r = NpyReader({"path": p, "rowsPerPartition": "25"})
    parts = r.partitions()
    assert [(x.start_row, x.end_row) for x in parts] == [
        (0, 25), (25, 50), (50, 75), (75, 100), (100, 103),
    ]


def test_distributed_scan_matches_matrix(spark, tmp_path):
    rng = np.random.RandomState(3)
    mat = rng.randn(50, 8).astype(np.float32)
    p = str(tmp_path / "emb.npy")
    write_npy(p, mat)
    try:
        spark.dataSource.register(NpyDataSource)
    except Exception:
        pass
    df = (
        spark.read.format("npy")
        .option("path", p)
        .option("rowsPerPartition", 16)
        .load()
    )
    assert df.rdd.getNumPartitions() == 4  # 16*3 + 2: genuinely split
    got = {r["row_idx"]: r["value"] for r in df.collect()}
    assert len(got) == 50
    for i in (0, 15, 16, 49):
        assert np.allclose(got[i], mat[i], atol=0)
