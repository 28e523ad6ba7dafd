"""SAS7BDAT writer tests: pandas reads our files back value-exact, the
repo read_sas fallback lifts them into Spark, multi-page layouts work,
and outputs are byte-deterministic."""

from __future__ import annotations

import math

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_engineering_capstone_spark.sources.sas7bdat_writer import write_sas7bdat

COLS = [("ID", "num", 8), ("NAME", "char", 16), ("BAL", "num", 8)]


def test_pandas_reads_generated_file(tmp_path):
    p = str(tmp_path / "t.sas7bdat")
    rows = [(1.0, "alice", 10.5), (2.0, "bob", None), (None, "", -3.25)]
    write_sas7bdat(p, COLS, rows, dataset="TESTDS")
    df = pd.read_sas(p, encoding="utf-8")
    assert list(df.columns) == ["ID", "NAME", "BAL"]
    assert df["ID"].tolist()[:2] == [1.0, 2.0] and math.isnan(df["ID"].iloc[2])
    assert df["NAME"].tolist()[:2] == ["alice", "bob"]
    assert df["BAL"].iloc[0] == 10.5 and math.isnan(df["BAL"].iloc[1])


def test_multi_page_row_exact(tmp_path):
    # page_size 1024 → (1024-24)//32 = 31 rows/page → 100 rows = 4 pages
    p = str(tmp_path / "big.sas7bdat")
    rows = [(float(i), f"n{i}", i * 0.5) for i in range(100)]
    write_sas7bdat(p, COLS, rows, page_size=1024)
    df = pd.read_sas(p, encoding="utf-8")
    assert len(df) == 100
    assert df["ID"].tolist() == [float(i) for i in range(100)]
    assert df["NAME"].tolist() == [f"n{i}" for i in range(100)]
    assert df["BAL"].tolist() == [i * 0.5 for i in range(100)]


def test_read_sas_fallback_into_spark(spark, tmp_path):
    from data_engineering_capstone_spark.sources.readers import read_sas

    p = str(tmp_path / "s.sas7bdat")
    rows = [(float(i), f"u{i}", float(i) * 2) for i in range(10)]
    write_sas7bdat(p, COLS, rows)
    df = read_sas(spark, p)
    got = sorted((r.ID, r.NAME, r.BAL) for r in df.collect())
    assert got == [(float(i), f"u{i}", float(i) * 2) for i in range(10)]


def test_byte_deterministic(tmp_path):
    rows = [(1.0, "x", 2.0)]
    p1, p2 = str(tmp_path / "a.sas7bdat"), str(tmp_path / "b.sas7bdat")
    write_sas7bdat(p1, COLS, rows)
    write_sas7bdat(p2, COLS, rows)
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_row_too_wide_rejected(tmp_path):
    with pytest.raises(ValueError, match="row does not fit"):
        write_sas7bdat(
            str(tmp_path / "w.sas7bdat"),
            [("BIG", "char", 9000)],
            [("x",)],
            page_size=4096,
        )


num_st = st.one_of(
    st.none(), st.floats(allow_nan=False, allow_infinity=False, width=64)
)
txt_st = st.one_of(
    st.none(),
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=16
    ).map(lambda s: s.rstrip()),  # trailing blanks are not round-trippable
)


@given(st.lists(st.tuples(num_st, txt_st, num_st), max_size=40))
@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
def test_sas7bdat_roundtrip_property(tmp_path_factory, rows):
    p = str(tmp_path_factory.mktemp("sas") / "h.sas7bdat")
    write_sas7bdat(p, COLS, rows, page_size=2048)
    df = pd.read_sas(p, encoding="utf-8")
    assert len(df) == len(rows)
    for i, (a, b, c) in enumerate(rows):
        for col, want in (("ID", a), ("BAL", c)):
            got = df[col].iloc[i]
            if want is None:
                assert math.isnan(got)
            else:
                assert got == want
        want_s = "" if b is None else b
        got_s = df["NAME"].iloc[i]
        if want_s == "":
            assert (isinstance(got_s, float) and math.isnan(got_s)) or got_s == ""
        else:
            assert got_s == want_s


def test_multibyte_truncation_respects_char_boundary(tmp_path):
    """A byte-width cut landing inside a multibyte UTF-8 sequence must
    back off to the character boundary (round-3 advice): pandas
    read_sas(..., encoding='utf-8') rejects split sequences outright."""
    import pandas as pd

    cols = [("K", "num", 8), ("S", "char", 5)]
    # 'abécd' encodes to 6 bytes; slicing at 5 would split the 'é'
    rows = [(1.0, "abécd"), (2.0, "ééé")]
    fp = str(tmp_path / "mb.sas7bdat")
    write_sas7bdat(fp, cols, rows, dataset="MB")
    df = pd.read_sas(fp, encoding="utf-8")
    assert list(df["S"]) == ["abéc", "éé"]
