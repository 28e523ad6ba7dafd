"""Measured skew demonstration: hot-key aggregation and join, salted vs
un-salted, on a deliberately skewed dataset (AQE off so the raw shuffle
shape is what's timed; AQE's skew-join splitter is the runtime safety
net on top, not a reason to ship skew-oblivious plans).

Builds an events-shaped table of N rows where ``hot_frac`` of all rows
carry ONE key and the rest are uniform — the template-spam / null-key /
celebrity-user shape every 100 TB pipeline eventually meets. Times:

* window-per-key analytic (rank within key): the un-salted form puts
  the hot key's entire partition in ONE task.
* the same via salted two-phase aggregate (operators/skew.py).

Usage: python tools/skew_probe.py [--rows=8000000] [--hot=0.5]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_engineering_capstone_spark.operators.skew import salted_aggregate
from data_engineering_capstone_spark.session import get_spark


def time_best(df, reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best


def main() -> int:
    rows, hot = 8_000_000, 0.5
    for a in sys.argv[1:]:
        if a.startswith("--rows"):
            rows = int(a.split("=", 1)[1])
        elif a.startswith("--hot"):
            hot = float(a.split("=", 1)[1])

    spark = get_spark("skew_probe")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    n_hot = int(rows * hot)
    df = (
        spark.range(rows)
        .select(
            F.when(F.col("id") < n_hot, F.lit(0))
            .otherwise(F.pmod(F.col("id"), F.lit(100_000)))
            .alias("k"),
            (F.col("id") % 1000).cast("double").alias("v"),
            # a real payload: skew cost is bytes-per-reducer, not row count
            F.repeat(F.lit("x"), 120).alias("pay"),
        )
        .repartition(32)
        .localCheckpoint()
    )

    plain_agg = df.groupBy("k").agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
    salted = salted_aggregate(df, ["k"], {"s": ("sum", "v"), "n": ("count", "v")}, buckets=32)

    # the shape skew actually breaks: a per-key sort (window rank).
    from pyspark.sql import Window

    win = Window.partitionBy("k").orderBy("v")
    plain_window = df.withColumn("r", F.row_number().over(win)).where(F.col("r") <= 3)
    # skew-safe top-k per key: partial per-partition prune isn't built in;
    # two-phase alternative = salt, rank within (k, salt), keep <=3, re-rank
    from data_engineering_capstone_spark.operators.skew import SALT_COL, with_salt

    w1 = Window.partitionBy("k", SALT_COL).orderBy("v")
    w2 = Window.partitionBy("k").orderBy("v")
    salted_window = (
        with_salt(df, 32)
        .withColumn("r1", F.row_number().over(w1))
        .where(F.col("r1") <= 3)
        .withColumn("r", F.row_number().over(w2))
        .where(F.col("r") <= 3)
        .drop(SALT_COL, "r1")
    )

    # the shape salting CANNOT rescue: an order-dependent running sum.
    # plain: the hot key's whole history sorts in one task; chunked
    # (operators/prefix.py:keyed_running_sum): order-aligned chunks fan
    # it out, per-key offsets window sees <= chunks rows per key.
    from data_engineering_capstone_spark.operators.prefix import keyed_running_sum

    w_run = Window.partitionBy("k").orderBy("v", "id2").rowsBetween(
        Window.unboundedPreceding, 0
    )
    dfi = df.withColumn("id2", F.monotonically_increasing_id()).localCheckpoint()
    plain_running = dfi.select(
        "k", "id2", F.sum("v").over(w_run).alias("run"), F.count(F.lit(1)).over(w_run).alias("n")
    )
    chunked_running = keyed_running_sum(
        dfi,
        key_cols=["k"],
        order_cols=["v", "id2"],
        value_col="v",
        chunk_expr=F.floor(F.col("v") / 16),  # v in [0,1000) -> 63 chunks
        out_col="run",
        n_col="n",
    ).select("k", "id2", "run", "n")

    # join skew: every probe row must meet its dim row — the hot key's
    # entire probe mass lands on ONE reducer in the shuffle join
    from data_engineering_capstone_spark.operators.skew import salted_join

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    dim = spark.range(100_000).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("dv")
    ).localCheckpoint()
    plain_join = df.join(dim, "k").select("k", "v", "pay", "dv")
    sj = salted_join(df, dim, "k", buckets=32).select("k", "v", "pay", "dv")

    out = {
        "rows": rows,
        "hot_frac": hot,
        "agg_plain_sec": round(time_best(plain_agg), 2),
        "agg_salted_sec": round(time_best(salted), 2),
        "window_plain_sec": round(time_best(plain_window), 2),
        "window_salted_sec": round(time_best(salted_window), 2),
        "running_plain_sec": round(time_best(plain_running), 2),
        "running_chunked_sec": round(time_best(chunked_running), 2),
        "join_plain_sec": round(time_best(plain_join), 2),
        "join_salted_sec": round(time_best(sj), 2),
    }
    # correctness cross-checks
    assert sorted(plain_agg.collect()) == sorted(salted.collect())
    assert plain_window.count() == salted_window.count()
    mism = (
        plain_running.withColumnRenamed("run", "p_run").withColumnRenamed("n", "p_n")
        .join(chunked_running, ["k", "id2"])
        .where(
            (F.abs(F.col("p_run") - F.col("run")) > F.lit(1e-9) * (F.abs(F.col("p_run")) + 1))
            | (F.col("p_n") != F.col("n"))
        )
        .count()
    )
    assert mism == 0, f"{mism} running-sum mismatches"
    assert plain_join.count() == sj.count()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
