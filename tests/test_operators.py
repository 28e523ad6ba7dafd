"""Unit tests for custom operators (SURVEY.md §5 strategy)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_engineering_capstone_spark.operators.asof import asof_join, asof_join_merge
from data_engineering_capstone_spark.operators.dedup import dedup_exact, duplicate_groups
from data_engineering_capstone_spark.operators.pivot import pivot_wide
from data_engineering_capstone_spark.operators.topk import top_k, top_k_per_group


def _asof_fixture(spark):
    left = spark.createDataFrame(
        [("u1", 10, "p1"), ("u1", 20, "p2"), ("u2", 5, "p3"), ("u3", 7, "p4")],
        "key string, ts long, pid string",
    )
    right = spark.createDataFrame(
        [("u1", 8, 1.0), ("u1", 15, 2.0), ("u1", 20, 3.0), ("u2", 9, 4.0)],
        "key string, rts long, val double",
    )
    return left, right


def test_asof_backward_semantics(spark):
    left, right = _asof_fixture(spark)
    out = asof_join(left, right, on="key", left_ts="ts", right_ts="rts", right_cols=["val"])
    got = {r["pid"]: r["val"] for r in out.collect()}
    # u1@10 -> rts 8; u1@20 -> rts 20 (equal ts matches); u2@5 -> none; u3 -> no right rows
    assert got == {"p1": 1.0, "p2": 3.0, "p3": None, "p4": None}


def test_asof_null_right_field_not_backfilled(spark):
    """A matched right row's NULL field must stay NULL — per-column
    forward-fill would pull that field from an OLDER right row, mixing
    fields from different rows (DuckDB ASOF returns the matched row
    including its NULLs)."""
    left = spark.createDataFrame([("u1", 20, "p1")], "key string, ts long, pid string")
    right = spark.createDataFrame(
        [("u1", 8, 1.0, "old"), ("u1", 15, None, "new")],
        "key string, rts long, val double, tag string",
    )
    out = asof_join(
        left, right, on="key", left_ts="ts", right_ts="rts", right_cols=["val", "tag"]
    ).collect()
    assert len(out) == 1
    # matched row is rts=15: tag comes from it AND its NULL val survives
    assert out[0]["tag"] == "new" and out[0]["val"] is None


def test_asof_matches_pandas_merge_asof(spark, sf_dir):
    from data_engineering_capstone_spark.sources.testdata import load_table

    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), F.col("event_id").alias("click_event_id")
    )
    a = asof_join(purchases, clicks, on="user_id", left_ts="ts", right_ts="c_ts",
                  right_cols=["click_event_id"])
    b = asof_join_merge(purchases, clicks, on="user_id", left_ts="ts", right_ts="c_ts",
                        right_cols=["click_event_id"])
    pa = {r["event_id"]: r["click_event_id"] for r in a.collect()}
    pb = {r["event_id"]: r["click_event_id"] for r in b.collect()}
    assert pa == pb and len(pa) > 0


def test_dedup_deterministic_winner(spark):
    df = spark.createDataFrame(
        [("a", 3), ("a", 1), ("a", 2), ("b", 9)], "k string, v int"
    )
    out = dedup_exact(df, ["k"], keep_order_by=[F.col("v")])
    assert {(r["k"], r["v"]) for r in out.collect()} == {("a", 1), ("b", 9)}
    dups = duplicate_groups(df, ["k"]).collect()
    assert [(r["k"], r["n_dups"]) for r in dups] == [("a", 3)]


def test_topk_global_and_per_group(spark):
    df = spark.createDataFrame(
        [("g1", i) for i in range(10)] + [("g2", i * 2) for i in range(5)],
        "g string, v int",
    )
    top = top_k(df, [F.col("v").desc()], 3).collect()
    assert [r["v"] for r in top] == [9, 8, 8]
    per = top_k_per_group(df, ["g"], [F.col("v").desc()], 2)
    got = sorted((r["g"], r["v"]) for r in per.collect())
    assert got == [("g1", 8), ("g1", 9), ("g2", 6), ("g2", 8)]


def test_pivot_pinned_values(spark):
    df = spark.createDataFrame(
        [("c1", "A", 1), ("c1", "B", 2), ("c2", "A", 3)], "city string, race string, n int"
    )
    wide = pivot_wide(df, ["city"], "race", ["A", "B", "C"], "n", agg="sum")
    assert wide.columns == ["city", "A", "B", "C"]
    row = {r["city"]: (r["A"], r["B"], r["C"]) for r in wide.collect()}
    assert row == {"c1": (1, 2, None), "c2": (3, None, None)}
