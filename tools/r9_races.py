"""Round-9 variant races: the three unadjudicated >2× rows get their
races of record (round-8 verdict, What's-wrong #1-#3 / Next-round #2).

  cube_status_priority  old = cube() straight on the orders fact
                              (Expand replicates every fact row 4×)
                        new = two-phase partial cube (aggregate to the
                              (status,priority) grain, cube the ~15-row
                              aggregate) — the shipped round-9 form
  q9_product_profit     old = shipped round-8 form (broadcast dims +
                              sort-merge lineitem⋈orders)
                        v_hash = same plan, SHUFFLE_HASH hint on the
                              orders join (no sort phase)
                        v_partial = lineitem side pre-aggregated to
                              (l_orderkey, nation) partial profit before
                              the orders join — the exchange carries one
                              narrow row per (order, nation) instead of
                              every widget lineitem

Same protocol as tools/r8_races.py: same replica dir, warm noop-sink
runs, best-of-N, and a collected bit-identical equivalence check.

Usage: python tools/r9_races.py <replica_dir> [reps]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

from pyspark.sql import functions as F

from data_engineering_capstone_spark.session import get_spark
from data_engineering_capstone_spark.sources.testdata import load_table
from tools.scale_crossover import time_best  # one timing protocol for all races


def cube_old(spark, sf_dir):
    """The replaced round-1..8 form: CUBE directly over the fact —
    Expand emits 4 copies of every orders row before the hash agg."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double").alias("total"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n", "total")
        .orderBy(F.col("gid"), F.col("o_orderstatus").asc_nulls_first(),
                 F.col("o_orderpriority").asc_nulls_first())
    )


def _q9_parts(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    rev = (
        F.col("l_extendedprice").cast("decimal(12,2)")
        * (F.lit("1").cast("decimal(12,2)") - F.col("l_discount").cast("decimal(12,2)"))
    )
    cost = (
        F.col("p_retailprice").cast("decimal(12,2)")
        * F.lit("0.01").cast("decimal(4,2)")
        * F.col("l_quantity").cast("decimal(12,2)")
    )
    return l, p, s, n, o, rev, cost


def q9_hash(spark, sf_dir):
    """Variant: identical topology, SHUFFLE_HASH hint on the fact-fact
    join (sort-merge pays two sorts the hash join doesn't need)."""
    l, p, s, n, o, rev, cost = _q9_parts(spark, sf_dir)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o.hint("SHUFFLE_HASH"), l.l_orderkey == o.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(rev - cost).cast("double").alias("sum_profit"))
        .orderBy("nation", "o_year")
    )


def q9_partial(spark, sf_dir):
    """Variant: pre-aggregate the widget lineitems to (l_orderkey,
    nation) partial profit BEFORE the orders join — the only thing
    orders contributes is the year, so the fact-fact exchange only
    needs one narrow decimal row per (order, nation)."""
    l, p, s, n, o, rev, cost = _q9_parts(spark, sf_dir)
    partial = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_orderkey", F.col("n_name").alias("nation"))
        .agg(F.sum(rev - cost).alias("profit_p"))
    )
    return (
        partial.join(o.hint("SHUFFLE_HASH"),
                     partial.l_orderkey == o.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.sum("profit_p").cast("double").alias("sum_profit"))
        .orderBy("nation", "o_year")
    )


def main() -> int:
    replica = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("r9_races")
    spark.sparkContext.setLogLevel("ERROR")
    from data_engineering_capstone_spark.catalog import load_all

    catalog = load_all()
    races = [
        # (label, catalog entry = the shipped form, challenger fn)
        ("cube_two_phase_vs_expand", "cube_status_priority", cube_old),
        ("q9_shuffle_hash_vs_smj", "q9_product_profit", q9_hash),
        ("q9_partial_agg_vs_smj", "q9_product_profit", q9_partial),
    ]
    for label, entry, other_fn in races:
        ship_fn = catalog[entry].fn

        def run(fn):
            fn(spark, replica).write.format("noop").mode("overwrite").save()

        run(other_fn)  # warm footers/codegen/broadcast
        t_other = time_best(lambda: run(other_fn), reps)
        run(ship_fn)
        t_ship = time_best(lambda: run(ship_fn), reps)
        from collections import Counter

        # multiset compare (cube rows contain NULL group markers, which
        # Python tuple sort chokes on)
        other_rows = Counter(map(tuple, other_fn(spark, replica).collect()))
        ship_rows = Counter(map(tuple, ship_fn(spark, replica).collect()))
        print(json.dumps({
            "race": label,
            "replica": replica,
            "shipped_sec": round(t_ship, 3),
            "variant_sec": round(t_other, 3),
            "shipped_speedup_vs_variant": round(t_other / t_ship, 2),
            "results_identical": other_rows == ship_rows,
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
