"""Round-10 re-measurements at 1024×.

1. Regression guard: `agg_corr_covar` (sxy hi/lo lane split adds two
   partial aggregates) and `q7_bilateral_volume` (broadcast hint now
   size-gated via parquet footers) were both UNDER the 2× gate at 1024×
   in round 9 — re-measure post-change.
2. The partition-scaling lever (SCALE.md §20 corollary, proved at the
   2048× endgame): `q9_product_profit` and `window_ratio_to_report`
   are the standing exchange-constant rows; both are sort/exchange
   bound, so re-measure at 1024× with shuffle_partitions=128 vs the
   32-partition rows of record.

Usage: python tools/r10_recheck_1024.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

from data_engineering_capstone_spark.session import get_spark
from tools.scale_crossover import duck_con, time_best

REPLICA = "/tmp/dec_spark_xover/sf_x1024"


def measure(spark, con, catalog, name, reps):
    spec = catalog[name]

    def run():
        spec.fn(spark, REPLICA).write.format("noop").mode("overwrite").save()

    run()
    s_t = time_best(run, reps)
    d_t = None
    for _ in range(reps):
        t0 = time.time()
        con.execute(spec.oracle).fetchall()
        d_t = min(d_t or 1e9, time.time() - t0)
    return s_t, d_t


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    from data_engineering_capstone_spark.catalog import load_all

    catalog = load_all()
    con = duck_con(REPLICA)

    spark32 = get_spark("r10_recheck_32")
    spark32.sparkContext.setLogLevel("ERROR")
    for name in ("agg_corr_covar", "q7_bilateral_volume"):
        s, d = measure(spark32, con, catalog, name, reps)
        print(json.dumps({"entry": name, "partitions": 32, "mult": 1024,
                          "spark_sec": round(s, 3), "duckdb_sec": round(d, 3),
                          "ratio": round(s / d, 2)}), flush=True)
    spark32.stop()

    spark128 = get_spark("r10_recheck_128", shuffle_partitions=128)
    spark128.sparkContext.setLogLevel("ERROR")
    for name in ("q9_product_profit", "window_ratio_to_report"):
        s, d = measure(spark128, con, catalog, name, reps)
        print(json.dumps({"entry": name, "partitions": 128, "mult": 1024,
                          "spark_sec": round(s, 3), "duckdb_sec": round(d, 3),
                          "ratio": round(s / d, 2)}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
