"""Round-11 q4 4096× point (round-10 verdict task 5).

A materialized 4096× replica needs ~50 GB the sandbox doesn't have
(2048× lineitem alone is 21 GB with 28 GB free), so the octave is a
VIEW-DOUBLED read: 4096× = the 2048× replica UNION ALL a key-shifted
copy of itself, on BOTH engines — each engine decodes the same parquet
bytes twice, so the decode economics are symmetric and the cross-engine
ratio stays meaningful (documented as view-doubled in BASELINE.md; the
page cache favors both sides equally).

Also the adjudication point for q4's round-11 width thread: the width
form lost 20% at 256× (4.52 vs 3.75 s — AQE's coalesce does good work
at octaves where memory is comfortable), so this tool races BOTH forms
at the top octave where the width law is supposed to earn its keep.

Usage: python tools/r11_q4_4096.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

REPLICA = "/tmp/dec_spark_xover/sf_x2048_r10"
SHIFT = 4096 * 1_000_000_000  # clear of the 2048 copies' 0..2047e9 shifts

from pyspark.sql import functions as F  # noqa: E402

from data_engineering_capstone_spark.session import get_spark  # noqa: E402
from data_engineering_capstone_spark.sources.pqmeta import (  # noqa: E402
    parquet_row_count,
    scaled_width,
)
from data_engineering_capstone_spark.queries_tpch2 import q4_plan  # noqa: E402
from tools.scale_crossover import time_best  # noqa: E402


def doubled(spark):
    o1 = spark.read.parquet(f"{REPLICA}/orders.parquet")
    l1 = spark.read.parquet(f"{REPLICA}/lineitem.parquet")
    o = o1.unionByName(o1.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(SHIFT)))
    l = l1.unionByName(l1.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(SHIFT)))
    return o, l


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = get_spark("r11_q4_4096")
    spark.sparkContext.setLogLevel("ERROR")

    rows = 2 * parquet_row_count(f"{REPLICA}/lineitem.parquet")
    # the entry derives width from footers; the doubled view doubles the
    # rows, so the tool doubles the footer-derived width the same way
    width = max(
        spark.sparkContext.defaultParallelism,
        rows // 4_000_000 + 1,
    )
    print(json.dumps({"probe": "q4_4096_setup", "lineitem_rows": rows, "width": width}))

    results = {}
    for label, w in [("width_law", width), ("session_width", None)]:
        def run():
            o, l = doubled(spark)
            q4_plan(o, l, width=w).write.format("noop").mode("overwrite").save()

        try:
            run()  # warm
            t = time_best(run, reps)
        except Exception as e:  # noqa: BLE001 — an OOM IS the data point
            results[label] = f"DIED: {type(e).__name__}: {str(e)[:200]}"
            print(json.dumps({"form": label, "result": results[label]}))
            continue
        results[label] = round(t, 2)
        print(json.dumps({"form": label, "best_s": results[label]}))

    # output equivalence (and the doubling invariant: every count is
    # exactly 2x the 2048x count). A form that DIED above is skipped —
    # its death IS the data point (first run: session_width
    # SparkOutOfMemory'd here too before this guard existed).
    o, l = doubled(spark)
    a = sorted(map(tuple, q4_plan(o, l, width=width).collect()))
    if not isinstance(results.get("session_width"), str):
        b = sorted(map(tuple, q4_plan(o, l).collect()))
        print(json.dumps({"identical_forms": a == b}))
    o1 = spark.read.parquet(f"{REPLICA}/orders.parquet")
    l1 = spark.read.parquet(f"{REPLICA}/lineitem.parquet")
    half = {r[0]: r[1] for r in q4_plan(o1, l1, width=width // 2).collect()}
    doubling_ok = all(cnt == 2 * half[p] for p, cnt in a)
    print(json.dumps({"doubling_invariant": doubling_ok}))

    # DuckDB oracle on the same doubled view, warm best-of-reps
    import duckdb

    con = duckdb.connect()
    con.execute(f"""
        CREATE VIEW orders AS
        SELECT * FROM read_parquet('{REPLICA}/orders.parquet/*.parquet')
        UNION ALL
        SELECT * REPLACE (o_orderkey + {SHIFT} AS o_orderkey)
        FROM read_parquet('{REPLICA}/orders.parquet/*.parquet')
    """)
    con.execute(f"""
        CREATE VIEW lineitem AS
        SELECT * FROM read_parquet('{REPLICA}/lineitem.parquet/*.parquet')
        UNION ALL
        SELECT * REPLACE (l_orderkey + {SHIFT} AS l_orderkey)
        FROM read_parquet('{REPLICA}/lineitem.parquet/*.parquet')
    """)
    from data_engineering_capstone_spark.catalog import load_all

    oracle = load_all()["q4_priority_late_ship"].oracle
    try:
        con.execute(oracle).fetchall()  # warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            duck_rows = con.execute(oracle).fetchall()
            best = min(best, time.time() - t0)
        duck_match = sorted(map(tuple, duck_rows)) == a
        print(json.dumps({"duckdb_s": round(best, 2), "duck_match": duck_match}))
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"duckdb": f"DIED: {type(e).__name__}: {str(e)[:200]}"}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
