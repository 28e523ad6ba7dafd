"""Unit tests for date/string column functions (SURVEY.md §7 hard parts:
SAS epoch, dtaddto sentinels)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_engineering_capstone_spark.functions.dates import (
    date_parts,
    date_to_sas_day,
    parse_char_date,
    sas_date_to_date,
)
from data_engineering_capstone_spark.functions.strings import ngrams, token_count, tokens


def test_sas_epoch_conversion(spark):
    df = spark.createDataFrame([(0.0,), (20566.0,), (None,)], "arrdate double")
    out = df.select(sas_date_to_date("arrdate").alias("d")).collect()
    # 20566 days after 1960-01-01 = 2016-04-22 (reference: SAS labels :966-968)
    assert [r["d"] for r in out] == [dt.date(1960, 1, 1), dt.date(2016, 4, 22), None]


def test_sas_day_round_trip(spark):
    df = spark.createDataFrame([(123.0,), (20566.0,)], "n double")
    out = df.select(date_to_sas_day(sas_date_to_date("n")).alias("rt")).collect()
    assert [r["rt"] for r in out] == [123, 20566]


def test_char_date_sentinels(spark):
    df = spark.createDataFrame(
        [("20160401", "04012016"), ("20160432", "D/S"), (None, "")],
        "dtadfile string, dtaddto string",
    )
    out = df.select(
        parse_char_date("dtadfile", "yyyyMMdd").alias("a"),
        parse_char_date("dtaddto", "MMddyyyy").alias("b"),
    ).collect()
    assert [r["a"] for r in out] == [dt.date(2016, 4, 1), None, None]
    assert [r["b"] for r in out] == [dt.date(2016, 4, 1), None, None]


def test_date_parts_iso_dow(spark):
    # 2016-04-04 is a Monday -> dow 1; 2016-04-10 is a Sunday -> dow 7
    df = spark.createDataFrame([("2016-04-04",), ("2016-04-10",)], "d string")
    parts = date_parts(F.col("d").cast("date"))
    out = df.select(*[v.alias(k) for k, v in parts.items()]).collect()
    assert [r["dow"] for r in out] == [1, 7]
    assert [r["year"] for r in out] == [2016, 2016]


def test_tokens_and_ngrams(spark):
    df = spark.createDataFrame([("  the quick  brown fox ",), ("", ), (None,)], "t string")
    out = df.select(
        tokens("t").alias("tok"), token_count("t").alias("n"), ngrams("t", 2).alias("bi")
    ).collect()
    assert out[0]["tok"] == ["the", "quick", "brown", "fox"]
    assert out[0]["n"] == 4
    assert out[0]["bi"] == ["the quick", "quick brown", "brown fox"]
    assert out[1]["tok"] == [] and out[1]["n"] == 0 and out[1]["bi"] == []
    assert out[2]["tok"] is None


def test_ngrams_zipwith_fold_matches_reference(spark):
    """Property check for the round-4 zip_with ngrams rewrite (it is
    load-bearing for the whole dedup/curation family): for random token
    lists and n in 1..6, the Column expression must equal the obvious
    Python reference, including short-doc/empty/null edges."""
    import random

    from data_engineering_capstone_spark.functions.strings import ngrams

    rng = random.Random(42)
    vocab = ["a", "bb", "ccc", "droid", "x9", "ému"]
    cases = [None, "", "   ", "solo"]
    for _ in range(60):
        k = rng.randint(0, 12)
        cases.append(" ".join(rng.choice(vocab) for _ in range(k)))
    df = spark.createDataFrame([(i, t) for i, t in enumerate(cases)], "i int, t string")
    for n in (1, 2, 3, 5, 6):
        got = {r["i"]: r["g"] for r in df.select("i", ngrams("t", n).alias("g")).collect()}
        for i, t in enumerate(cases):
            if t is None:
                assert got[i] is None
                continue
            toks = [x for x in t.strip().split() if x]
            want = [" ".join(toks[j:j + n]) for j in range(len(toks) - n + 1)] if len(toks) >= n else []
            assert got[i] == want, (n, t, got[i], want)
