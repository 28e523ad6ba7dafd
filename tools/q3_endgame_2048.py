"""q3_top_orders endgame: one 2048× row (round-7 verdict task 6).

The generic `build_replica_dir(mult=2048)` unions 2048 single-copy
DataFrames per table and stalls in single-threaded Catalyst planning
(plan size is superlinear; 1024× was already minutes of planning). q3
touches only lineitem/orders/customer, and the v4 replica's key layout
is LINEAR in the copy index — so the canonical 2048× fact tables are
exactly a 4-way union of the existing 512× replica with whole-block key
shifts of b*512*OFFSET (b = 0..3):

    x512 copy i has keys base + i*OFFSET (i = 0..511)
    block b shift adds 512*b*OFFSET  →  base + (i + 512b)*OFFSET,
    i + 512b ranging over 0..2047 — the same keys build_replica_dir
    would emit, without the 2048-way plan.

customer is in the replica's COPIED set (dims don't multiply), so it is
copied through unchanged. Text mutation is irrelevant here (q3 reads no
documents). Measurement protocol matches tools/scale_crossover.py:
warm noop write, best-of-3 per engine.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_crossover import OFFSET, time_best  # noqa: E402

X512 = "/tmp/dec_spark_xover/sf_x512"
OUT = "/tmp/dec_spark_xover/sf_x2048_q3"
BLOCKS = 4  # 4 x 512 = 2048


def build(spark) -> None:
    from pyspark.sql import functions as F

    done = os.path.join(OUT, "_Q3_REPLICA_DONE")
    if os.path.isfile(done):
        return
    os.makedirs(OUT, exist_ok=True)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    for t, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        src = spark.read.parquet(f"{X512}/{t}.parquet")
        parts = [
            src.withColumn(key, F.col(key) + F.lit(b * 512 * OFFSET))
            for b in range(BLOCKS)
        ]
        df = parts[0]
        for p in parts[1:]:
            df = df.union(p)
        df.write.mode("overwrite").parquet(f"{OUT}/{t}.parquet")
    spark.read.parquet(f"{X512}/customer.parquet").write.mode(
        "overwrite"
    ).parquet(f"{OUT}/customer.parquet")
    with open(done, "w") as f:
        f.write("4-way union of v4 x512 blocks\n")


def main() -> int:
    from data_engineering_capstone_spark.catalog import load_all
    from data_engineering_capstone_spark.session import get_spark

    spark = get_spark("q3_endgame")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark)
    spec = load_all()["q3_top_orders"]

    rows = spark.read.parquet(f"{OUT}/lineitem.parquet").count()

    def spark_run():
        spec.fn(spark, OUT).write.format("noop").mode("overwrite").save()

    spark_run()  # warm
    s_t = time_best(spark_run)

    import duckdb

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    # only the three tables q3 touches exist in this trimmed replica
    # (duck_con binds every catalog table eagerly and would fail)
    for t in ("lineitem", "orders", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{OUT}/{t}.parquet/*.parquet')"
        )
    d_t = time_best(lambda: con.execute(spec.oracle).fetchall())

    print(json.dumps({
        "query": "q3_top_orders", "mult": 2048, "lineitem_rows": rows,
        "spark_sec": round(s_t, 3), "duckdb_sec": round(d_t, 3),
        "ratio": round(s_t / d_t, 2),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
