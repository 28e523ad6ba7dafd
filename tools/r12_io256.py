"""Round-12 second-octave I/O measurements (verdict item 6, guide §2.3/§6):
`spark.io.compression.codec` (lz4 vs zstd) and
`spark.sql.files.maxPartitionBytes` at 256× on the two shuffle-heaviest
headline entries (llm_minhash_near_dup, q5_revenue_by_nation).

The shuffle codec is a JVM-start core conf (not runtime-settable), so
each arm runs in its OWN process/session:

  python tools/r12_io256.py --mult=256 --codec=zstd --mpb=128m
  python tools/r12_io256.py --mult=256 --codec=lz4  --mpb=1g

Prints one JSON line per query (best-of-3 noop-sink, warm excluded) plus
an arm summary; the ABA table is assembled in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

from data_engineering_capstone_spark.session import get_spark  # noqa: E402

QUERIES = ["llm_minhash_near_dup", "q5_revenue_by_nation"]


def main() -> int:
    mult = 256
    codec = "lz4"
    mpb = None
    only = QUERIES
    for a in sys.argv[1:]:
        if a.startswith("--mult="):
            mult = int(a.split("=", 1)[1])
        elif a.startswith("--codec="):
            codec = a.split("=", 1)[1]
        elif a.startswith("--mpb="):
            mpb = a.split("=", 1)[1]
        elif a.startswith("--only="):
            only = a.split("=", 1)[1].split(",")

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "xover",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "scale_crossover.py"),
    )
    xover = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(xover)

    extra = {"spark.io.compression.codec": codec}
    if mpb:
        extra["spark.sql.files.maxPartitionBytes"] = mpb
    spark = get_spark(f"r12-io256-{codec}-{mpb or 'default'}", extra_conf=extra)
    assert spark.sparkContext.getConf().get("spark.io.compression.codec") == codec, (
        "codec conf did not take — a pre-existing session was reused; "
        "run this arm in a fresh process"
    )
    replica = xover.build_replica_dir(spark, mult)

    from data_engineering_capstone_spark.catalog import load_all

    catalog = load_all()
    total = 0.0
    for name in only:
        fn = catalog[name].fn

        def run():
            fn(spark, replica).write.format("noop").mode("overwrite").save()

        run()  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            run()
            best = min(best, time.time() - t0)
        total += best
        print(json.dumps({
            "query": name, "mult": mult, "codec": codec,
            "maxPartitionBytes": mpb or "128m(default)",
            "best_sec": round(best, 3),
        }), flush=True)
    print(json.dumps({
        "summary": "io256_arm", "mult": mult, "codec": codec,
        "maxPartitionBytes": mpb or "128m(default)",
        "total_sec": round(total, 3),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
