"""Spark-side 64× timing sweep of every ROWS-ONLY batch catalog entry.

The oracle-paired entries are raced against DuckDB by
tools/scale_crossover.py and gated at 2×; rows-only entries (sketches,
ANN, BPE, hash families, multimodal) have no oracle to race — but they
can still hide superlinear plans, which is exactly the class of defect
that hid in llm_fuzzy_prefix_pairs for three rounds because it was in
no measurement preset. This sweep closes the hole for the rest of the
catalog: run every rows-only non-streaming entry against the replicated
64× directory (built by scale_crossover) and print one JSON line each.
Streaming entries are excluded (their cost is micro-batch drain
machinery, measured separately in SCALE.md §13).

Usage: python tools/rows_only_scale.py [mult] [--only=a,b]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

PER_QUERY_TIMEOUT_NOTE = (
    "no in-process timeout: a hung entry is itself the finding — kill and record"
)


def main() -> None:
    mult = 64
    only: list[str] | None = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = a.split("=", 1)[1].split(",")
        else:
            mult = int(a)

    from data_engineering_capstone_spark.session import get_spark
    from tools.scale_crossover import build_replica_dir

    import __spark_entry__ as mod

    spark = get_spark("rows_only_scale")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = build_replica_dir(spark, mult)

    qs = mod.queries()
    oracles = mod.oracle_sql()
    names = [
        n
        for n in sorted(qs)
        if n not in oracles and not n.startswith("stream_")
    ]
    if only:
        names = [n for n in names if n in only]
    print(json.dumps({"mult": mult, "rows_only_batch_entries": len(names)}))
    for name in names:
        t0 = time.time()
        try:
            df = qs[name](spark, sf_dir)
            n = df.count()
            err = None
        except Exception as e:  # noqa: BLE001 - record and continue
            n, err = None, f"{type(e).__name__}: {e}"[:200]
        print(
            json.dumps(
                {
                    "query": name,
                    "mult": mult,
                    "spark_sec": round(time.time() - t0, 2),
                    "rows": n,
                    "err": err,
                    "load1": round(os.getloadavg()[0], 1),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
