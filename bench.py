"""Benchmark runner — the driver's per-round perf probe.

Runs the headline catalog queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: ``{"metric", "value", "unit", "queries", "sf"}``.

Each query executes to completion through the ``noop`` sink — full plan
runs on executors, nothing is shipped to the driver, so the timing
measures scan+shuffle+compute, not result serialization.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_engineering_capstone_spark.catalog import load_all
from data_engineering_capstone_spark.session import get_spark

# Headline set: one per operator family, heaviest shapes first.
HEADLINE = [
    "q1_pricing_summary",
    "q5_revenue_by_nation",
    "q3_top_orders",
    "agg_distinct_by_priority",
    "window_running_orders",
    "asof_purchase_click",
    "scalar_math_funcs",
    "json_props_agg",
    "skew_salted_agg",
    "llm_minhash_near_dup",
    "llm_cosine_topk",
    "llm_text_stats",
    "mm_feature_extract",
    "stream_tumbling_counts",
]

# Everything runs best-of-3: external load outside this VM produces
# 2-7x transient spikes across EVERY query (observed loadavg ~12 with
# no local process running), and warm repeats are cheap — without this,
# one unlucky query (observed: the streaming drain at 71s vs 7s
# isolated) dominates the recorded total.
SINGLE_RUN: set[str] = set()
REPS = 3


def run_one(fn, spark, sf_dir: str) -> float:
    t0 = time.time()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("bench")
    catalog = load_all()
    names = [n for n in HEADLINE if n in catalog]

    # Warm the JVM + parquet footer caches so timings measure the plans.
    run_one(catalog[names[0]].fn, spark, sf_dir)

    timings: dict[str, float] = {}
    for name in names:
        best = run_one(catalog[name].fn, spark, sf_dir)
        if name not in SINGLE_RUN:
            for _ in range(REPS - 1):
                best = min(best, run_one(catalog[name].fn, spark, sf_dir))
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
