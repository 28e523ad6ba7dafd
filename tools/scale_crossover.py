"""Scale-crossover probe: Spark vs DuckDB on the same query as data grows.

The sf0.1 headline timings (BENCH_r*.json) sit at Spark's per-query task
scheduling floor (~0.3-0.5 s at local[32]) — DuckDB finishes sub-100 ms
there, so per-query ratios at tiny scale measure the floor, not the
plans. This script replicates lineitem N× (key-shifted, written once to
parquet) and times the Q1 pricing-summary aggregation on BOTH engines at
each size, printing one JSON line per size so the crossover is measured,
not asserted.

Usage: python tools/scale_crossover.py [--sizes 1,4,16,64]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineering_capstone_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = os.environ.get("SPARK_GRAFT_XOVER_DIR", "/tmp/dec_spark_xover")

# Integer-cents money aggregation — the same exact-arithmetic form the
# catalog's q1 uses (queries_relational.py): decimal sums are exact but
# ~17x slower in Spark's hash aggregate (measured at 38M rows: 9.2s
# decimal vs 0.59s long-cents vs 0.54s double).
Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS DOUBLE) / 100
         AS sum_base,
       CAST(COUNT(*) AS BIGINT) AS n
FROM {table}
GROUP BY l_returnflag, l_linestatus
"""


def build_replica(spark, mult: int) -> str:
    out = os.path.join(WORK, f"lineitem_x{mult}")
    if os.path.isdir(out):
        return out
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    from pyspark.sql import functions as F

    parts = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * 100_000_000))
        for i in range(mult)
    ]
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.repartition(32).write.mode("overwrite").parquet(out)
    return out


def time_best(fn, reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main() -> int:
    sizes = [1, 4, 16, 64]
    for a in sys.argv[1:]:
        if a.startswith("--sizes"):
            sizes = [int(x) for x in a.split("=", 1)[1].split(",")]
    spark = get_spark("scale_crossover")
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for mult in sizes:
        path = build_replica(spark, mult)
        sdf = spark.read.parquet(path)
        sdf.createOrReplaceTempView("li_x")
        s_t = time_best(
            lambda: spark.sql(Q1_SQL.format(table="li_x"))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        d_t = time_best(
            lambda: con.execute(
                Q1_SQL.format(table=f"'{path}/*.parquet'")
            ).fetchall()
        )
        rows = mult * sdf.count() // mult  # replica rows
        print(
            json.dumps(
                {
                    "mult": mult,
                    "rows": sdf.count(),
                    "spark_sec": round(s_t, 3),
                    "duckdb_sec": round(d_t, 3),
                    "ratio_spark_over_duckdb": round(s_t / d_t, 2),
                }
            )
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
