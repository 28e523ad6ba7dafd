"""XPORT writer ↔ pandas reader differential tests (A2 SAS scan)."""

from __future__ import annotations

import math

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_engineering_capstone_spark.sources.xport import (
    ibm_to_ieee,
    ieee_to_ibm,
    write_xport,
)


@given(
    st.floats(
        allow_nan=False,
        allow_infinity=False,
        min_value=-1e60,
        max_value=1e60,
    )
)
@settings(max_examples=300)
def test_ibm_float_codec_exact_roundtrip(x):
    # subnormal-small magnitudes fall below IBM's 16^-64 floor; skip
    if x != 0.0 and abs(x) < 1e-70:
        return
    assert ibm_to_ieee(ieee_to_ibm(x)) == x


def test_ibm_float_rejects_nonfinite():
    for bad in (math.inf, -math.inf, math.nan):
        with pytest.raises(ValueError):
            ieee_to_ibm(bad)


def test_xport_pandas_differential(tmp_path):
    """Our writer, pandas' independent reader — including the zero whose
    all-zero IBM encoding pandas mis-decodes (shimmed in read_sas)."""
    cols = [("ID", "num", 8), ("VAL", "num", 8), ("TAG", "char", 72)]
    rows = [
        (1.0, 0.0, "zero"),
        (2.0, -123.456, "neg"),
        (3.0, 3.141592653589793, "pi"),
        (4.0, 2.0**-30, "tiny"),
    ]
    fp = str(tmp_path / "t.xpt")
    write_xport(fp, cols, rows, dsname="T")
    pdf = pd.read_sas(fp)
    assert len(pdf) == 4
    assert list(pdf["ID"]) == [1.0, 2.0, 3.0, 4.0]
    got = list(pdf["VAL"])
    # pandas' zero-decode quirk: exactly ±2^-260
    assert got[0] == 2.0**-260
    assert got[1:] == [-123.456, 3.141592653589793, 2.0**-30]
    assert [t.decode().strip() for t in pdf["TAG"]] == ["zero", "neg", "pi", "tiny"]


def test_read_sas_snaps_zero_quirk(spark, tmp_path):
    from data_engineering_capstone_spark.sources.readers import read_sas

    cols = [("K", "num", 8), ("V", "num", 8), ("PAD", "char", 72)]
    rows = [(1.0, 0.0, "a"), (2.0, 5.5, "b")]
    fp = str(tmp_path / "z.xpt")
    write_xport(fp, cols, rows, dsname="Z")
    got = {int(r["K"]): r["V"] for r in read_sas(spark, fp).collect()}
    assert got == {1: 0.0, 2: 5.5}


def test_pyds_distributed_read_matches_writer(spark, tmp_path):
    """Custom DataSource: multiple record-aligned partitions, zero
    handled by OUR codec (no pandas quirk), exact values."""
    from data_engineering_capstone_spark.sources.pyds import XportDataSource

    cols = [("ID", "num", 8), ("VAL", "num", 8), ("TAG", "char", 72)]
    rows = [(float(i), (0.0 if i == 0 else i * 0.25), f"t{i}") for i in range(500)]
    fp = str(tmp_path / "d.xpt")
    write_xport(fp, cols, rows, dsname="D")
    try:
        spark.dataSource.register(XportDataSource)
    except Exception:
        pass
    df = (
        spark.read.format("xport")
        .option("path", fp)
        .option("rowsPerPartition", "100")
        .load()
    )
    assert df.rdd.getNumPartitions() == 5
    got = {int(r["ID"]): (r["VAL"], r["TAG"]) for r in df.collect()}
    assert len(got) == 500
    assert got[0] == (0.0, "t0")
    assert got[7] == (1.75, "t7")


def test_csv_failfast_raises_on_malformed(spark, tmp_path):
    import pytest

    p = tmp_path / "bad.csv"
    p.write_text("k,price\n1,2.5\n2,GARBAGE\n")
    df = (
        spark.read.schema("k bigint, price double")
        .option("header", "true")
        .option("mode", "FAILFAST")
        .csv(str(p))
    )
    with pytest.raises(Exception) as ei:
        # force a full parse of the fragile column
        df.select("price").collect()
    assert "Malformed" in str(ei.value) or "FAILFAST" in str(ei.value)


def test_parquet_codec_sizes(spark, tmp_path):
    """zstd should compress no worse than snappy on repetitive columns;
    all three codecs must round-trip identically."""
    import glob
    import os

    df = spark.range(50_000).selectExpr(
        "id", "concat('prefix_', CAST(id % 50 AS STRING)) AS tag", "id * 1.5 AS v"
    )
    sizes = {}
    for codec in ["snappy", "zstd", "lz4"]:
        p = str(tmp_path / codec)
        df.coalesce(1).write.option("compression", codec).parquet(p)
        sizes[codec] = sum(
            os.path.getsize(f) for f in glob.glob(p + "/part-*.parquet")
        )
        assert spark.read.parquet(p).count() == 50_000
    assert sizes["zstd"] <= sizes["snappy"]


def test_xport_header_narrow_records_no_phantom_rows(tmp_path):
    """reclen < 80: trailing card padding can hold whole record widths;
    parse_xport_header must not decode them as phantom blank rows."""
    from data_engineering_capstone_spark.sources.xport import parse_xport_header

    # reclen = 16 → 3 rows occupy 48 bytes; padding to the 80-byte card
    # boundary is 32 bytes = 2 whole phantom records if uncorrected
    cols = [("A", "num", 8), ("B", "num", 8)]
    rows = [(1.0, 2.0), (3.0, 4.0), (5.0, 6.0)]
    fp = str(tmp_path / "narrow.xpt")
    write_xport(fp, cols, rows, dsname="N")
    _, _, reclen, nobs = parse_xport_header(fp)
    assert reclen == 16
    assert nobs == 3


def test_xport_narrow_blank_data_record_kept(tmp_path):
    """A genuinely all-blank CHAR record inside the data (not in the
    final card's padding zone) must survive the phantom-row trim."""
    from data_engineering_capstone_spark.sources.xport import parse_xport_header

    # reclen = 20, 9 rows = 180 bytes → rows 0-7 end before the final
    # card (offset 160); row 4 is all-blank but lies in a full card
    cols = [("S", "char", 20)]
    rows = [("" if i == 4 else f"row{i}",) for i in range(9)]
    fp = str(tmp_path / "blank.xpt")
    write_xport(fp, cols, rows, dsname="B")
    _, _, reclen, nobs = parse_xport_header(fp)
    assert reclen == 20
    assert nobs == 9
