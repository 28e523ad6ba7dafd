"""Scale-prove the REFERENCE-SHAPED workload (round-5 verdict task 5).

The 16-64x crossover (tools/scale_crossover.py) covers synthetic
TPC-H-shaped and LLM tables; this probe scales the query that IS the
reference's actual job — `ref_i94_star_rollup` (notebook cells 9-12:
clean -> SAS dates -> five label-file dim joins -> star rollup) — by
replicating the real 3,096,313-row I94 fact N times (cicid key-shifted
per copy, admnum mutated) and racing the catalog's Spark pipeline
against the catalog's own DuckDB oracle SQL on the same files. Also
times the B11-B13 quality checks (non-empty, unique key, no-null
required cols) at the replicated size, and asserts the plan shape that
makes the pipeline scale: all five dim joins BROADCAST (no fact-side
shuffle for dimension lookup) and the rollup a two-phase (partial +
final) hash aggregate.

Usage:
  python tools/i94_scale_probe.py           # 16x = 49.5M rows
  python tools/i94_scale_probe.py --mult=64 # 198M rows
"""

from __future__ import annotations

import io
import json
import os
import re
import sys
import time
from contextlib import redirect_stdout

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

from data_engineering_capstone_spark.session import get_spark

WORK = "/tmp/dec_spark_i94"
OFFSET = 10_000_000  # real cicid max is 6.1M; copies never collide


def build_replica(spark, mult: int) -> str:
    from pyspark.sql import functions as F

    from data_engineering_capstone_spark.queries_refdata import _SAS_DATA

    out = os.path.join(WORK, f"x{mult}")
    done = os.path.join(out, "_REPLICA_DONE")
    if os.path.exists(done):
        return out
    fact = spark.read.parquet(_SAS_DATA)
    rep = (
        fact.crossJoin(F.broadcast(spark.range(mult).select(F.col("id").alias("__i"))))
        .withColumn("cicid", F.col("cicid") + F.col("__i") * OFFSET)
        .withColumn("admnum", F.col("admnum") + F.col("__i"))
        .drop("__i")
    )
    rep.repartition(64).write.mode("overwrite").parquet(out)
    with open(done, "w") as f:
        f.write("ok")
    return out


def rollup_df(spark, fact_dir: str):
    from pyspark.sql import functions as F

    from data_engineering_capstone_spark.etl import pipeline
    from data_engineering_capstone_spark.queries_refdata import _real_dims, prep

    prep(spark)
    # same explicit pre-dedup projection as the catalog entry
    # (queries_refdata.ref_i94_star_rollup): Catalyst can't prune
    # columns through dropDuplicates
    fact = spark.read.parquet(fact_dir).select(
        "cicid", "i94yr", "i94mon", "i94cit", "i94mode", "i94addr",
        "i94visa", "i94port", "arrdate", "count",
    )
    cleaned = pipeline.clean(fact, key="cicid", required=("cicid", "i94yr", "i94mon"))
    dated = pipeline.convert_dates(cleaned)
    staged = pipeline.join_dims(dated, _real_dims(spark))
    return (
        staged.groupBy("origin_country", "travel_mode", "state_name", "visa_category")
        .agg(
            F.sum("count").alias("arrivals"),
            F.count(F.lit(1)).alias("n_records"),
            F.min("arrival_date").alias("first_arrival"),
            F.max("arrival_date").alias("last_arrival"),
        )
        .orderBy("origin_country", "travel_mode", "state_name", "visa_category")
    )


def assert_plan_shape(df) -> dict:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    n_bhj = len(re.findall(r"BroadcastHashJoin", plan))
    n_smj = len(re.findall(r"SortMergeJoin", plan))
    # two-phase rollup: a partial HashAggregate below the exchange and a
    # final one above it (formatted plan names both HashAggregate)
    n_agg = len(re.findall(r"\bHashAggregate\b", plan))
    assert n_bhj >= 5, f"expected all 5 dim joins broadcast, saw {n_bhj}:\n{plan[:4000]}"
    assert n_smj == 0, f"fact-side sort-merge join crept in:\n{plan[:4000]}"
    assert n_agg >= 2, f"rollup is not two-phase:\n{plan[:4000]}"
    return {"broadcast_joins": n_bhj, "sort_merge_joins": n_smj, "hash_aggregates": n_agg}


def quality_checks(spark, fact_dir: str) -> dict:
    from data_engineering_capstone_spark.etl.quality import (
        check_no_nulls,
        check_nonempty,
        check_suite_single_pass,
        check_unique_key,
    )

    fact = spark.read.parquet(fact_dir)
    # separate checks: three scans of the fact
    t0 = time.time()
    r1 = check_nonempty(fact)
    r2 = check_unique_key(fact, ["cicid"])
    r3 = check_no_nulls(fact.dropna(subset=["cicid", "i94yr", "i94mon"]),
                        ["cicid", "i94yr", "i94mon"])
    el = time.time() - t0
    assert r1.passed and r2.passed and r3.passed, (r1, r2, r3)
    # fused suite: the same scan-level checks in ONE aggregation job
    t0 = time.time()
    fused = check_suite_single_pass(fact, ["cicid"])
    el_fused = time.time() - t0
    assert all(r.passed for r in fused), fused
    return {"quality_sec": round(el, 3), "quality_fused_sec": round(el_fused, 3)}


def run_sink(spark, mult: int) -> int:
    """The reference's ACTUAL job ending, at scale: clean -> SAS dates ->
    five broadcast dim joins -> partitionBy(i94yr, i94mon) parquet write
    (reference: dags/transform/airport.py:6-7 overwrite parquet; notebook
    cell-15's '100x data' scenario). The rollup probe (main) measures the
    aggregate; this measures the ENRICHED-FACT WRITE — the pipeline's
    true output — with the small-file policy engaged, and asserts the
    layout: hive dirs, exactly ceil(n/target) evenly-sized files, every
    file under the row cap. Also times the naive partitionBy write (one
    file per task x value) for the file-count contrast.
    """
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from data_engineering_capstone_spark.etl import pipeline
    from data_engineering_capstone_spark.queries_refdata import _real_dims, prep
    from data_engineering_capstone_spark.sources.writers import (
        write_partitioned_sized,
    )

    fact_dir = build_replica(spark, mult)
    prep(spark)

    def staged():
        fact = spark.read.parquet(fact_dir).select(
            "cicid", "i94yr", "i94mon", "i94cit", "i94mode", "i94addr",
            "i94visa", "i94port", "arrdate", "count",
        )
        cleaned = pipeline.clean(fact, key="cicid", required=("cicid", "i94yr", "i94mon"))
        dated = pipeline.convert_dates(cleaned)
        return pipeline.join_dims(dated, _real_dims(spark))

    # n_rows shortcut: write_partitioned_sized requires the POST-clean
    # count (see its docstring). The pre-clean count is valid here only
    # because clean() drops nothing on this fact — cicid/i94yr/i94mon
    # are never null and the key-shift replication keeps cicid unique —
    # and the footer assert below (sum(rows) == n_rows) would catch any
    # drift in that invariant.
    n_rows = 3_096_313 * mult
    target = 8_000_000  # ~15 B/row snappy -> ~120 MB files
    out_sized = os.path.join(WORK, f"sink_sized_x{mult}")
    out_naive = os.path.join(WORK, f"sink_naive_x{mult}")

    t0 = time.time()
    n_files = write_partitioned_sized(
        staged(), out_sized, ["i94yr", "i94mon"], target, n_rows=n_rows
    )
    sized_sec = round(time.time() - t0, 3)

    t0 = time.time()
    staged().write.mode("overwrite").partitionBy("i94yr", "i94mon").parquet(out_naive)
    naive_sec = round(time.time() - t0, 3)

    import math

    assert n_files == math.ceil(n_rows / target), n_files
    files = glob.glob(os.path.join(out_sized, "i94yr=*", "i94mon=*", "*.parquet"))
    assert len(files) == n_files, (len(files), n_files)
    rows = [pq.ParquetFile(f).metadata.num_rows for f in files]
    assert sum(rows) == n_rows and max(rows) <= target, (sum(rows), max(rows))
    sizes = [os.path.getsize(f) for f in files]
    assert max(sizes) <= 2 * min(sizes), (min(sizes), max(sizes))
    naive_files = glob.glob(os.path.join(out_naive, "i94yr=*", "i94mon=*", "*.parquet"))
    naive_sizes = [os.path.getsize(f) for f in naive_files]
    back = spark.read.parquet(out_sized)
    assert back.count() == n_rows
    assert back.filter(
        (F.col("i94yr") == 2016) & (F.col("i94mon") == 4)
    ).count() == n_rows  # the real fact is one month: April 2016

    print(json.dumps({
        "probe": "i94_partitioned_sink", "mult": mult, "fact_rows": n_rows,
        "sized_write_sec": sized_sec, "sized_files": n_files,
        "sized_mb_min": round(min(sizes) / 1e6, 1),
        "sized_mb_max": round(max(sizes) / 1e6, 1),
        "naive_write_sec": naive_sec, "naive_files": len(naive_files),
        "naive_mb_min": round(min(naive_sizes) / 1e6, 1),
        "naive_mb_max": round(max(naive_sizes) / 1e6, 1),
        "target_rows_per_file": target,
    }))
    import shutil

    shutil.rmtree(out_naive, ignore_errors=True)
    shutil.rmtree(out_sized, ignore_errors=True)
    return 0


def main() -> int:
    mult = 16
    sink = False
    for a in sys.argv[1:]:
        if a.startswith("--mult"):
            mult = int(a.split("=", 1)[1])
        elif a == "--sink":
            sink = True
    if sink:
        spark = get_spark("i94_sink_probe")
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
        return run_sink(spark, mult)
    spark = get_spark("i94_scale_probe")
    # the replicated fact is ~46 MB x mult of snappy parquet; at the
    # default 128 MB maxPartitionBytes the scan packs into ~mult/2.5
    # input partitions — 6-way parallelism on a 32-core box at 16x,
    # throttling every downstream stage (measured: scan-only 6.4 s ->
    # 1.1 s). Size input splits to the cluster, the standing SCALE.md
    # lever for small-file fact tables.
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
    from data_engineering_capstone_spark.catalog import load_all
    from data_engineering_capstone_spark.queries_refdata import _SAS_DATA

    fact_dir = build_replica(spark, mult)

    df = rollup_df(spark, fact_dir)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    shape = assert_plan_shape(df)
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    # same timing discipline as tools/scale_crossover.py: one warm run
    # (footers, codegen, broadcasts), then best-of-k on both engines
    from scale_crossover import time_best

    def spark_run():
        df.write.format("noop").mode("overwrite").save()

    spark_run()
    spark_sec = round(time_best(spark_run), 3)

    q = quality_checks(spark, fact_dir)

    oracle = load_all()["ref_i94_star_rollup"].oracle.replace(_SAS_DATA, fact_dir)
    con = duckdb.connect()
    duck_rows = []

    def duck_run():
        nonlocal_rows = con.execute(oracle).fetchall()
        duck_rows.clear()
        duck_rows.extend(nonlocal_rows)

    duck_sec = round(time_best(duck_run), 3)

    # the parity oracle skips the pipeline's B2 key-dedup stage (the
    # real fact is unique on cicid, so values match either way) — but
    # the Spark side PAYS for that integrity guard with a full-width
    # exchange. Time a dedup-mirrored DuckDB variant too, so the
    # published ratio compares equal work (Spark's number always
    # includes the dedup).
    ded_oracle = oracle.replace(
        "WHERE cicid IS NOT NULL AND i94yr IS NOT NULL AND i94mon IS NOT NULL",
        "WHERE cicid IS NOT NULL AND i94yr IS NOT NULL AND i94mon IS NOT NULL "
        "QUALIFY row_number() OVER (PARTITION BY cicid) = 1",
    )
    duck_dedup_sec = round(time_best(lambda: con.execute(ded_oracle).fetchall()), 3)

    n_rows = 3_096_313 * mult
    # cheap cross-engine sanity at the replicated size: same group count
    # and same total arrivals as DuckDB computes
    import pyspark.sql.functions as F

    agg = df.agg(F.count(F.lit(1)).alias("g"), F.sum("arrivals").alias("a")).collect()[0]
    duck_total = sum(r[4] for r in duck_rows)
    assert agg["g"] == len(duck_rows), (agg["g"], len(duck_rows))
    assert int(agg["a"]) == int(duck_total), (agg["a"], duck_total)

    print(json.dumps({
        "probe": "i94_star_rollup", "mult": mult, "fact_rows": n_rows,
        "spark_sec": spark_sec, "duckdb_sec": duck_sec,
        "duckdb_dedup_sec": duck_dedup_sec,
        "ratio_vs_plain": round(spark_sec / duck_sec, 2) if duck_sec else None,
        "ratio_equal_work": (
            round(spark_sec / duck_dedup_sec, 2) if duck_dedup_sec else None
        ),
        "groups": len(duck_rows), **shape, **q,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
