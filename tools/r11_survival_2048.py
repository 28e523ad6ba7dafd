"""Round-11 width-law survival probe: run newly-widthed catalog plans at
the 2048x octave under the EXACT session that OOM'd q9 pre-width-law
(local[32], shuffle.partitions=32, 24g driver).

The round-10 adjudication (SCALE.md section 26) made exchange width a
plan property via sources/pqmeta.fact_width; round 11 threaded it
through every fact-fact exchange in the catalog.  This probe is the
evidence that the property holds where it matters: each entry runs
against the 2048x replica (/tmp/dec_spark_xover/sf_x2048_r10, built by
tools/r10_endgame_2048.py — 1.23B lineitem rows) with a noop sink, and
either survives (wall-clock printed) or dies in the q9
UNABLE_TO_ACQUIRE_MEMORY class.

Only entries whose tables exist in the replica (TPC-H facts + dims) are
eligible; events/documents-based widthed entries (asof, dedup_first)
are covered by the 256x/1024x races instead.

Usage: python tools/r11_survival_2048.py NAME [NAME ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPLICA = "/tmp/dec_spark_xover/sf_x2048_r10"


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.local.dir", "/tmp/dec_spark_local")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from data_engineering_capstone_spark.catalog import load_all

    cat = load_all()
    for name in sys.argv[1:]:
        fn = cat[name].fn
        t0 = time.time()
        try:
            fn(spark, REPLICA).write.format("noop").mode("overwrite").save()
            print(f"SURVIVED {name}: {time.time() - t0:.2f}s", flush=True)
        except Exception as e:  # noqa: BLE001 — record the death class
            print(f"DIED {name}: {type(e).__name__} {str(e)[:200]}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
