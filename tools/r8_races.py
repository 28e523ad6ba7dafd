"""Round-8 variant races: old vs new plans for the two rewrites.

Verdict tasks 5/6 call for races-of-record, not just the new form's
number: each rewritten entry is timed against the exact plan it
replaced, on the same replica dir, same noop-sink protocol as
tools/scale_crossover.py.

  q2_min_cost_supplier   old = min-per-part aggregate + join-back
                         new = min() window over the (pk,sk) aggregate
  set_ops_multiset       old = DataFrame intersectAll/exceptAll
                               (count-and-replicate physical plan)
                         new = per-key conditional counts + sum(min)/
                               sum(max(m-n,0))  [the multiset definition]

Usage: python tools/r8_races.py <replica_dir> [reps]
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


def time_best(fn, reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def q2_old(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    cost_dec = F.col("l_extendedprice").cast("decimal(12,2)")
    per_supp = l.groupBy("l_partkey", "l_suppkey").agg(F.min(cost_dec).alias("cost"))
    min_per_part = per_supp.groupBy("l_partkey").agg(F.min("cost").alias("min_cost"))
    winners = per_supp.join(min_per_part, "l_partkey").filter(
        F.col("cost") == F.col("min_cost")
    )
    return (
        winners.join(p, winners.l_partkey == p.p_partkey)
        .join(s, winners.l_suppkey == s.s_suppkey)
        .select("p_partkey", "s_name", F.col("cost").cast("double").alias("cost"))
        .orderBy("p_partkey", "s_name")
    )


def q2_decimal_window(spark, sf_dir):
    """The OLD side of the cents-vs-decimal race (round-9 fix: the
    previous q2_cents here was a copy of the shipped catalog plan, so
    the race compared the new plan to itself). This is the decimal
    (12,2) twin of the shipped form — IDENTICAL window-over-aggregated-
    grain topology, only the min() runs on decimal instead of integer
    cents — so the race isolates exactly the numeric-path swap the
    docstring claims."""
    from pyspark.sql import Window

    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    cost_dec = F.col("l_extendedprice").cast("decimal(12,2)")
    per_supp = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(cost_dec).alias("cost")
    )
    w_part = Window.partitionBy("l_partkey")
    winners = per_supp.withColumn(
        "min_cost", F.min("cost").over(w_part)
    ).filter(F.col("cost") == F.col("min_cost"))
    return (
        winners.join(p, winners.l_partkey == p.p_partkey)
        .join(s, winners.l_suppkey == s.s_suppkey)
        .select("p_partkey", "s_name", F.col("cost").cast("double").alias("cost"))
        .orderBy("p_partkey", "s_name")
    )


def set_ops_old(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    a = l.filter(F.col("l_returnflag") == "A").select("l_suppkey")
    r = l.filter(F.col("l_returnflag") == "R").select("l_suppkey")
    both = a.intersectAll(r).select(F.lit("intersect_all").alias("flag"))
    only_a = a.exceptAll(r).select(F.lit("except_all").alias("flag"))
    return (
        both.unionByName(only_a)
        .groupBy("flag")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("flag")
    )


def main() -> int:
    replica = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("r8_races")
    from data_engineering_capstone_spark.catalog import load_all

    catalog = load_all()
    races = {
        "q2_min_cost_supplier": q2_old,
        "q2_cents_vs_decimal": q2_decimal_window,  # old = decimal twin of the shipped window plan
        "set_ops_multiset": set_ops_old,
    }
    for name, old_fn in races.items():
        new_fn = catalog[name.replace("q2_cents_vs_decimal",
                                      "q2_min_cost_supplier")].fn

        def run(fn):
            fn(spark, replica).write.format("noop").mode("overwrite").save()

        run(old_fn)  # warm footers/codegen
        t_old = time_best(lambda: run(old_fn), reps)
        run(new_fn)
        t_new = time_best(lambda: run(new_fn), reps)
        # equivalence check of record: both variants, same replica
        old_rows = sorted(map(tuple, old_fn(spark, replica).collect()))
        new_rows = sorted(map(tuple, new_fn(spark, replica).collect()))
        print(json.dumps({
            "race": name,
            "replica": replica,
            "old_sec": round(t_old, 3),
            "new_sec": round(t_new, 3),
            "speedup": round(t_old / t_new, 2),
            "results_identical": old_rows == new_rows,
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
