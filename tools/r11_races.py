"""Round-11 variant races (round-10 verdict task 2: close the
`llm_source_cap` watch row — the catalog's only `weak` perf mark).

  source_cap   classic = the round-10 shipped form: 16^4-bucket md5
                         histogram + full/boundary union (3 corpus
                         passes; fine for proportional quotas, pure
                         overhead when the cap is a constant 30)
               shipped = round-11 adaptive tiny-quota arm
                         (llm/curation.py:_tiny_quota_select): per-group
                         counts (20-row agg state) + ONE map-only
                         broadcast-filtered corpus pass to the 8×-margin
                         hash-prefix cutoff + exact rank over the ~8·30
                         survivors per source, verified with histogram
                         fallback

Protocol identical to tools/r10_races.py: noop-sink runs, warm first,
best-of-N, DuckDB oracle timed warm at the same replica, and a
bit-identity check of the two Spark forms' collected outputs (the
device guarantees the SAME selected rows, so the report must be equal
row for row).

Usage: python tools/r11_races.py <replica_dir> [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

from pyspark.sql import functions as F

from data_engineering_capstone_spark.session import get_spark
from data_engineering_capstone_spark.sources.testdata import load_table
from tools.scale_crossover import time_best  # one timing protocol for all races


def source_cap_classic(spark, sf_dir):
    """The round-10 shipped llm_source_cap: histogram-device selection."""
    from data_engineering_capstone_spark.llm.curation import (
        group_counts,
        hash_bucket_histogram,
        hash_quota_select,
    )

    d = load_table(spark, sf_dir, "documents").select("source", "doc_id")
    hist = hash_bucket_histogram(d, "source", "doc_id")
    counts = group_counts(hist, "source")
    quotas = counts.select("source", F.lit(30).cast("long").alias("__quota"))
    kept = hash_quota_select(d, "source", "doc_id", quotas, histogram=hist)
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("doc_id").alias("kept_id_sum"),
        )
        .join(F.broadcast(counts), "source")
        .select("source", "n_total", "n_kept", "kept_id_sum")
        .orderBy("source")
    )


def main() -> int:
    if len(sys.argv) < 2 or (sys.argv[1] == "--width" and len(sys.argv) < 3):
        print("usage: r11_races.py REPLICA_DIR [reps] | --width REPLICA_DIR [reps]")
        return 2
    if sys.argv[1] == "--width":
        width_races(sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 3)
        return 0
    replica = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("r11_races")
    spark.sparkContext.setLogLevel("ERROR")
    from data_engineering_capstone_spark.catalog import load_all
    from tools.scale_crossover import duck_con

    catalog = load_all()
    con = duck_con(replica)

    # the adaptive arm must actually ARM at this replica (trigger
    # honesty: a race where the shipped form silently fell back to the
    # classic path would measure nothing)
    from data_engineering_capstone_spark.llm.curation import _tiny_quota_select

    d = load_table(spark, replica, "documents").select("source", "doc_id")
    totals = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_total")).localCheckpoint()
    quotas = totals.select("source", F.lit(30).cast("long").alias("__quota"))
    armed = _tiny_quota_select(d, "source", "doc_id", quotas, 4, totals)
    print(json.dumps({"race": "source_cap_trigger", "armed": armed is not None}))

    races = [
        ("source_cap_adaptive_vs_classic", "llm_source_cap", source_cap_classic),
    ]
    out = []
    for label, entry, other_fn in races:
        spec = catalog[entry]

        def run(fn):
            fn(spark, replica).write.format("noop").mode("overwrite").save()

        run(other_fn)  # warm footers/codegen/broadcast
        t_other = time_best(lambda: run(other_fn), reps)
        run(spec.fn)
        t_ship = time_best(lambda: run(spec.fn), reps)
        t_duck = None
        if spec.oracle is not None:
            con.execute(spec.oracle).fetchall()  # warm
            best = float("inf")
            for _ in range(reps):
                t0 = time.time()
                con.execute(spec.oracle).fetchall()
                best = min(best, time.time() - t0)
            t_duck = best
        ship_rows = sorted(map(tuple, spec.fn(spark, replica).collect()))
        other_rows = sorted(map(tuple, other_fn(spark, replica).collect()))
        rec = {
            "race": label,
            "replica": replica,
            "t_shipped_s": round(t_ship, 2),
            "t_other_s": round(t_other, 2),
            "t_duckdb_s": round(t_duck, 2) if t_duck is not None else None,
            "identical_output": ship_rows == other_rows,
            "ratio_vs_duckdb": round(t_ship / t_duck, 2) if t_duck else None,
        }
        out.append(rec)
        print(json.dumps(rec))
    return 0




# --- width-law regression races (round-11 task 1) ---------------------
# The width threads must not cost anything at the octaves where the
# session width was fine; each shipped form races its r10 predecessor.

def q5_r10(spark, sf_dir):
    """Pre-round-11 q5: partial-agg pre-reduce at session width."""
    from pyspark.sql import functions as F
    from data_engineering_capstone_spark.queries_relational import _revenue_units

    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    per_order = l.groupBy("l_orderkey").agg(F.sum(_revenue_units()).alias("__order_units"))
    joined = (
        per_order.join(o.hint("SHUFFLE_HASH"), per_order.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        joined.groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            (F.sum(F.col("__order_units").cast("decimal(38,0)")).cast("double") / 10000).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.col("revenue").desc(), "nation")
    )


def q4_r10(spark, sf_dir):
    """Pre-round-11 q4: same plan, no plan-encoded width."""
    from data_engineering_capstone_spark.queries_tpch2 import q4_plan

    return q4_plan(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )


def width_races(replica: str, reps: int = 3) -> None:
    spark = get_spark("r11_width_races")
    spark.sparkContext.setLogLevel("ERROR")
    from data_engineering_capstone_spark.catalog import load_all

    catalog = load_all()
    for label, entry, other_fn in [
        ("q5_width_vs_r10", "q5_revenue_by_nation", q5_r10),
        ("q4_width_vs_r10", "q4_priority_late_ship", q4_r10),
    ]:
        spec = catalog[entry]

        def run(fn):
            fn(spark, replica).write.format("noop").mode("overwrite").save()

        run(other_fn)
        t_other = time_best(lambda: run(other_fn), reps)
        run(spec.fn)
        t_ship = time_best(lambda: run(spec.fn), reps)
        same = sorted(map(tuple, spec.fn(spark, replica).collect())) == sorted(
            map(tuple, other_fn(spark, replica).collect())
        )
        print(json.dumps({
            "race": label, "replica": replica,
            "t_shipped_s": round(t_ship, 2), "t_other_s": round(t_other, 2),
            "identical_output": same,
        }))


if __name__ == "__main__":
    raise SystemExit(main())
