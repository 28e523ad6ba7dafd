"""q9_product_profit + etl_quality_report at 2048× (round-9 verdict
task 7): both curves were falling (q9 3.94→3.11×, quality 2.97→2.81×);
one more octave either crosses them under the 2× gate or locks the
exchange-constant adjudication at the q3 standard (q3 closed at 2048×).

Replica construction follows tools/q3_endgame_2048.py: the generic
build_replica_dir(2048) stalls in superlinear Catalyst planning, but the
v6 key layout is linear in the copy index, so canonical 2048× facts are
a 2-way union of the existing v6 x1024 replica with a whole-block shift
of 1024*OFFSET. Only the tables these two queries touch are built:
lineitem + orders (shifted), part/supplier/nation/customer/region
(dims, copied through — dims don't multiply). ~26 GB on disk.

Measurement protocol matches tools/scale_crossover.py: warm noop write,
best-of-N per engine, DuckDB on the same parquet.

Usage: python tools/r10_endgame_2048.py [reps]
"""

from __future__ import annotations

import glob as _glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

from tools.scale_crossover import OFFSET, time_best  # noqa: E402

X1024 = "/tmp/dec_spark_xover/sf_x1024"
OUT = "/tmp/dec_spark_xover/sf_x2048_r10"
BLOCKS = 2  # 2 x 1024 = 2048
TABLES = ("lineitem", "orders", "part", "supplier", "nation", "customer", "region")


def build(spark) -> None:
    from pyspark.sql import functions as F

    done = os.path.join(OUT, "_R10_REPLICA_DONE")
    if os.path.isfile(done):
        return
    os.makedirs(OUT, exist_ok=True)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    for t, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        src = spark.read.parquet(f"{X1024}/{t}.parquet")
        parts = [
            src.withColumn(key, F.col(key) + F.lit(b * 1024 * OFFSET))
            for b in range(BLOCKS)
        ]
        df = parts[0]
        for p in parts[1:]:
            df = df.union(p)
        df.write.mode("overwrite").parquet(f"{OUT}/{t}.parquet")
    for t in ("part", "supplier", "nation", "customer", "region"):
        dst = f"{OUT}/{t}.parquet"
        shutil.rmtree(dst, ignore_errors=True)
        if os.path.isfile(f"{X1024}/{t}.parquet"):
            shutil.copy(f"{X1024}/{t}.parquet", dst)
        else:
            shutil.copytree(f"{X1024}/{t}.parquet", dst)
    with open(done, "w") as f:
        f.write("2-way union of v6 x1024 blocks\n")


def duck_con():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        path = f"{OUT}/{t}.parquet"
        glob = f"{path}/*.parquet" if os.path.isdir(path) else path
        if _glob.glob(glob):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{glob}')")
    return con


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    from data_engineering_capstone_spark.catalog import load_all
    from data_engineering_capstone_spark.session import get_spark

    # 2048× needs the SCALE.md §20 heap law applied the other way too:
    # at 1.23B lineitem rows, 32 shuffle partitions put ~10M+ wide rows
    # in each SMJ sorter — the second timed q9 run died
    # UNABLE_TO_ACQUIRE_MEMORY even at 48g. 128 partitions bound the
    # per-task sort at this octave (AQE still coalesces the small side).
    spark = get_spark("r10_endgame_2048", shuffle_partitions=128)
    spark.sparkContext.setLogLevel("ERROR")
    build(spark)
    catalog = load_all()
    rows = spark.read.parquet(f"{OUT}/lineitem.parquet").count()
    entries = ("q9_product_profit", "etl_quality_report")
    spark_secs = {}
    for name in entries:
        spec = catalog[name]

        def run():
            spec.fn(spark, OUT).write.format("noop").mode("overwrite").save()

        run()  # warm
        spark_secs[name] = time_best(run, reps)
        print(json.dumps({"entry": name, "spark_sec": round(spark_secs[name], 3)}),
              flush=True)
    # release the 48g JVM before the baseline runs: at this octave the
    # DuckDB COUNT(DISTINCT) wants tens of GB and the first attempt
    # spilled to a disk the live JVM + replica had already squeezed
    spark.stop()
    con = duck_con()
    for name in entries:
        spec = catalog[name]
        d_t, err = None, None
        try:
            for _ in range(reps):
                t0 = time.time()
                con.execute(spec.oracle).fetchall()
                d_t = min(d_t or 1e9, time.time() - t0)
        except Exception as exc:  # noqa: BLE001 — record baseline deaths
            err = f"{type(exc).__name__}: {str(exc)[:160]}"
        s_t = spark_secs[name]
        print(json.dumps({
            "entry": name,
            "mult": 2048,
            "lineitem_rows": rows,
            "spark_sec": round(s_t, 3),
            "duckdb_sec": round(d_t, 3) if d_t else None,
            "ratio": round(s_t / d_t, 2) if d_t else None,
            "oracle_error": err,
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
