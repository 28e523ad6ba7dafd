"""Round-12 measurement races (same-session, interleaved, best-of-N).

Sub-commands (one per verdict item, all noop-sink timed per guide §1.4):

  streaming   — ABA: r11 memory-sink+localCheckpoint drain vs the r12
                foreachBatch executor-side snapshot on
                stream_tumbling_counts (verdict item 2).
  sortsweep   — 64× quantification of the r11 final-sort sweep (verdict
                item 5): 3 representatives timed WITH the old display
                sort re-added vs the shipped sort-free form.
  bloom       — 64× runtime-bloom-filter pre-filtering (§3.2) ABA on
                q3/q5 (verdict item 3): thresholds forced so the
                injection fires, plans dumped, rows compared.

Usage: python tools/r12_races.py <streaming|sortsweep|bloom> [--mult=64]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

from data_engineering_capstone_spark.session import get_spark  # noqa: E402


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def time_once(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


def race(arms: dict, reps: int = 3, warm: bool = True) -> dict:
    """Interleaved best-of-N: arm order rotates per rep so an ambient
    load wave cannot poison one arm's whole sample."""
    names = list(arms)
    if warm:
        for n in names:
            arms[n]()
    best = {n: float("inf") for n in names}
    for r in range(reps):
        order = names[r % len(names):] + names[: r % len(names)]
        for n in order:
            best[n] = min(best[n], time_once(arms[n]))
    return {n: round(v, 3) for n, v in best.items()}


# ---------------------------------------------------------------- streaming

def run_streaming(sf_dir: str) -> int:
    """Old drain (memory sink + localCheckpoint, the r11 form) vs new
    (foreachBatch parquet snapshot) — full stream_tumbling_counts shape
    end-to-end including the final orderBy + noop."""
    import itertools

    from pyspark.sql import functions as F

    from data_engineering_capstone_spark.streaming.windows import (
        run_available_now,
        stream_events,
        tumbling_counts,
    )

    spark = get_spark("r12-streaming-race")
    ctr = itertools.count()

    def old_drain():
        stream_df = tumbling_counts(stream_events(spark, sf_dir))
        old_parts = spark.conf.get("spark.sql.shuffle.partitions")
        old_nodata = spark.conf.get(
            "spark.sql.streaming.noDataMicroBatches.enabled", "true"
        )
        spark.conf.set("spark.sql.shuffle.partitions", str(min(int(old_parts), 8)))
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
        name = f"r12_old_drain_{next(ctr)}"
        try:
            q = (
                stream_df.writeStream.format("memory")
                .queryName(name)
                .outputMode("complete")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old_parts)
            spark.conf.set(
                "spark.sql.streaming.noDataMicroBatches.enabled", old_nodata
            )
        out = spark.table(name).localCheckpoint(eager=True)
        noop(out.orderBy("window_start", "event_type"))

    def new_drain():
        out = run_available_now(
            tumbling_counts(stream_events(spark, sf_dir)), "complete"
        )
        noop(out.orderBy("window_start", "event_type"))

    res = race({"old_memory_sink": old_drain, "new_foreachbatch": new_drain}, reps=4)
    # row-set equality of the two forms (the correctness half of the ABA)
    old_rows = None
    stream_df = tumbling_counts(stream_events(spark, sf_dir))
    name = f"r12_old_drain_{next(ctr)}"
    q = (
        stream_df.writeStream.format("memory").queryName(name)
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    old_rows = {tuple(r) for r in spark.table(name).collect()}
    new_rows = {
        tuple(r)
        for r in run_available_now(
            tumbling_counts(stream_events(spark, sf_dir)), "complete"
        ).collect()
    }
    print(json.dumps({
        "race": "streaming_snapshot", "sf_dir": sf_dir, **res,
        "rows_equal": old_rows == new_rows, "n_rows": len(new_rows),
    }))
    return 0


# ---------------------------------------------------------------- sortsweep

SORT_KEYS = {
    "mm_feature_extract": ["doc_id"],
    "udf_pandas_scalar": ["o_orderkey"],
    "llm_minhash_near_dup": ["id_a", "id_b"],
}


def run_sortsweep(mult: int) -> int:
    from data_engineering_capstone_spark.catalog import load_all

    spec_mod = _xover()
    spark = get_spark("r12-sortsweep")
    replica = spec_mod.build_replica_dir(spark, mult)
    catalog = load_all()
    out = {}
    for name, keys in SORT_KEYS.items():
        fn = catalog[name].fn

        def swept():
            noop(fn(spark, replica))

        def sorted_form():
            noop(fn(spark, replica).orderBy(*keys))

        res = race({"shipped_no_sort": swept, "old_display_sort": sorted_form},
                   reps=3)
        res["tax"] = round(res["old_display_sort"] / res["shipped_no_sort"], 2)
        out[name] = res
        print(json.dumps({"race": "sortsweep", "mult": mult, "query": name, **res}),
              flush=True)
    print(json.dumps({"summary": "sortsweep", "mult": mult, "results": out}))
    return 0


# ------------------------------------------------------------------- bloom

BLOOM_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "1GB",
}


def run_bloom(mult: int, dump_dir: str | None) -> int:
    from data_engineering_capstone_spark.catalog import load_all

    spec_mod = _xover()
    spark = get_spark("r12-bloom")
    replica = spec_mod.build_replica_dir(spark, mult)
    catalog = load_all()
    saved = {k: spark.conf.get(k, None) for k in BLOOM_CONFS}

    def set_bloom(on: bool):
        for k, v in BLOOM_CONFS.items():
            if on:
                spark.conf.set(k, v)
            else:
                if saved[k] is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, saved[k])

    out = {}
    for name in ("q3_top_orders", "q5_revenue_by_nation"):
        fn = catalog[name].fn

        def base():
            set_bloom(False)
            noop(fn(spark, replica))

        def bloomed():
            set_bloom(True)
            noop(fn(spark, replica))

        res = race({"base": base, "bloom_forced": bloomed}, reps=3)
        # plan + row evidence
        set_bloom(True)
        df_b = fn(spark, replica)
        plan_b = df_b._jdf.queryExecution().executedPlan().toString()
        rows_b = {tuple(r) for r in df_b.collect()}
        set_bloom(False)
        df_0 = fn(spark, replica)
        rows_0 = {tuple(r) for r in df_0.collect()}
        res["might_contain_in_plan"] = "might_contain" in plan_b.lower()
        res["rows_equal"] = rows_b == rows_0
        if dump_dir:
            os.makedirs(dump_dir, exist_ok=True)
            with open(os.path.join(dump_dir, f"{name}_bloom_forced.txt"), "w") as f:
                f.write(plan_b)
        out[name] = res
        print(json.dumps({"race": "bloom", "mult": mult, "query": name, **res}),
              flush=True)
    print(json.dumps({"summary": "bloom", "mult": mult, "results": out}))
    return 0


def run_streaming64(mult: int) -> int:
    """Row-count-regime ABA at replica scale: the new parquet-append
    snapshot writes every emitted pair to disk, where the old memory
    sink collected them to the driver — the one streaming shape where
    the rework plausibly costs at scale. Races the full
    stream_stream_join drain+aggregate both ways on the N× replica."""
    import itertools

    from pyspark.sql import functions as F

    from data_engineering_capstone_spark.streaming.windows import (
        interval_join_clicks_purchases,
        run_available_now,
        stream_events,
    )

    spec_mod = _xover()
    spark = get_spark("r12-streaming64")
    replica = spec_mod.build_replica_dir(spark, mult)
    ctr = itertools.count()

    def downstream(out):
        return (
            out.groupBy(F.date_trunc("hour", "purchase_ts").alias("window_start"))
            .agg(
                F.count(F.lit(1)).alias("n_pairs"),
                F.countDistinct("user_id").alias("n_users"),
            )
        )

    def old_drain():
        joined = interval_join_clicks_purchases(
            stream_events(spark, replica), stream_events(spark, replica)
        )
        old_parts = spark.conf.get("spark.sql.shuffle.partitions")
        old_nodata = spark.conf.get(
            "spark.sql.streaming.noDataMicroBatches.enabled", "true"
        )
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
        name = f"r12_old64_{next(ctr)}"
        try:
            q = (
                joined.writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old_parts)
            spark.conf.set(
                "spark.sql.streaming.noDataMicroBatches.enabled", old_nodata
            )
        out = spark.table(name).localCheckpoint(eager=True)
        noop(downstream(out))

    def new_drain():
        joined = interval_join_clicks_purchases(
            stream_events(spark, replica), stream_events(spark, replica)
        )
        out = run_available_now(
            joined, "append",
            partitions=int(spark.conf.get("spark.sql.shuffle.partitions")),
        )
        noop(downstream(out))

    res = race({"old_memory_sink": old_drain, "new_foreachbatch": new_drain},
               reps=2, warm=False)
    print(json.dumps({"race": "streaming64_rowheavy", "mult": mult, **res}))
    return 0


def run_bloom_q3(mult: int, dump_dir: str | None) -> int:
    """The shipped q3 shape (explicit width repartition + SHUFFLE_HASH)
    structurally blocks InjectRuntimeFilter — the bloom filter can only
    fire on the unhinted AQE form (the r5 test shape). Race all three:
    shipped vs plain-AQE vs AQE+bloom-forced, and dump the bloom plan
    so the might_contain injection below the lineitem exchange is on
    record."""
    from pyspark.sql import functions as F

    from data_engineering_capstone_spark.operators.topk import top_k
    from data_engineering_capstone_spark.catalog import load_all
    from data_engineering_capstone_spark.sources.testdata import load_table
    from data_engineering_capstone_spark.functions.money import to_cents

    spec_mod = _xover()
    spark = get_spark("r12-bloom-q3")
    replica = spec_mod.build_replica_dir(spark, mult)
    catalog = load_all()
    shipped_fn = catalog["q3_top_orders"].fn
    saved = {k: spark.conf.get(k, None) for k in BLOOM_CONFS}

    def set_bloom(on: bool):
        for k, v in BLOOM_CONFS.items():
            if on:
                spark.conf.set(k, v)
            else:
                if saved[k] is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, saved[k])

    def q3_aqe():
        cutoff = F.lit("1998-06-01").cast("timestamp")
        c = load_table(spark, replica, "customer").filter(
            F.col("c_mktsegment") == "BUILDING"
        )
        o = load_table(spark, replica, "orders").filter(F.col("o_orderdate") < cutoff)
        l = load_table(spark, replica, "lineitem").filter(F.col("l_shipdate") > cutoff)
        rev = to_cents("l_extendedprice") * (100 - to_cents("l_discount"))
        agg = (
            c.join(o, c.c_custkey == o.o_custkey)
            .join(l, l.l_orderkey == o.o_orderkey)
            .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
            .agg((F.sum(rev).cast("double") / 10000).alias("revenue"))
            .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        )
        return top_k(agg, [F.col("revenue").desc(), F.col("o_orderkey")], 10)

    def shipped():
        set_bloom(False)
        noop(shipped_fn(spark, replica))

    def aqe_plain():
        set_bloom(False)
        noop(q3_aqe())

    def aqe_bloom():
        set_bloom(True)
        noop(q3_aqe())

    res = race(
        {"shipped": shipped, "aqe_plain": aqe_plain, "aqe_bloom": aqe_bloom},
        reps=4,
    )
    set_bloom(True)
    df_b = q3_aqe()
    plan_b = df_b._jdf.queryExecution().executedPlan().toString()
    res["might_contain_in_plan"] = "might_contain" in plan_b.lower()
    rows_b = {tuple(r) for r in df_b.collect()}
    set_bloom(False)
    rows_s = {tuple(r) for r in shipped_fn(spark, replica).collect()}
    res["rows_equal"] = rows_b == rows_s
    if dump_dir:
        os.makedirs(dump_dir, exist_ok=True)
        with open(os.path.join(dump_dir, "q3_top_orders_bloom_aqe.txt"), "w") as f:
            f.write(plan_b)
    print(json.dumps({"race": "bloom_q3_forms", "mult": mult, **res}))
    return 0


def _xover():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "xover",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "scale_crossover.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> int:
    cmd = sys.argv[1] if len(sys.argv) > 1 else "streaming"
    mult = 64
    dump_dir = None
    for a in sys.argv[2:]:
        if a.startswith("--mult="):
            mult = int(a.split("=", 1)[1])
        elif a.startswith("--dump-dir="):
            dump_dir = a.split("=", 1)[1]
    if cmd == "streaming":
        return run_streaming(os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    if cmd == "sortsweep":
        return run_sortsweep(mult)
    if cmd == "bloom":
        return run_bloom(mult, dump_dir)
    if cmd == "bloom-q3":
        return run_bloom_q3(mult, dump_dir)
    if cmd == "streaming64":
        return run_streaming64(mult)
    print(f"unknown sub-command {cmd}", file=sys.stderr)
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
