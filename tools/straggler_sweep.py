"""Straggler triage: time EVERY oracle-paired entry at a replica scale.

The round-7 changed-entry race exposed q14 at 10× and unigram at 3.08× —
both had simply never been raced (RATIO_SET + the LLM family cover ~40
of 214 oracle-paired entries). This sweep times a single warm Spark run
of every oracle-paired entry at the given replica scale and prints the
slowest ones; anything over the threshold gets a DuckDB race so the
ratio is known, not assumed. Entries whose inputs don't scale with the
replica (dims-only, event_id<2000 families, fixture roundtrips) show up
as sub-second floors and are skipped by the threshold automatically.

Usage:
  python tools/straggler_sweep.py [--mult=64] [--race-over=3.0]
  python tools/straggler_sweep.py --rows-only   # time the 29 estimator/
        # stateful entries too (no oracle to race — absolute curve only)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_crossover import build_replica_dir, duck_con, time_best  # noqa: E402


def main() -> int:
    mult, race_over, rows_only = 64, 3.0, False
    for a in sys.argv[1:]:
        if a.startswith("--mult"):
            mult = int(a.split("=", 1)[1])
        elif a.startswith("--race-over"):
            race_over = float(a.split("=", 1)[1])
        elif a == "--rows-only":
            rows_only = True

    from data_engineering_capstone_spark.catalog import load_all
    from data_engineering_capstone_spark.session import get_spark

    spark = get_spark("straggler_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    replica = build_replica_dir(spark, mult)
    catalog = load_all()

    timed: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, spec in catalog.items():
        if (spec.oracle is None) != rows_only:
            continue
        try:
            def run():
                spec.fn(spark, replica).write.format("noop").mode("overwrite").save()

            run()  # warm: footers, codegen, broadcast
            t0 = time.time()
            run()
            timed[name] = round(time.time() - t0, 3)
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {str(exc)[:100]}"
        print(json.dumps({"q": name, "spark_sec": timed.get(name),
                          "err": errors.get(name)}), flush=True)

    slow = {} if rows_only else {
        n: t for n, t in sorted(timed.items(), key=lambda kv: -kv[1])
        if t >= race_over
    }
    raced = {}
    if slow:
        con = duck_con(replica)
        for name in slow:
            try:
                d_t = time_best(lambda: con.execute(catalog[name].oracle).fetchall(),
                                reps=2)
                raced[name] = {"spark_sec": slow[name], "duckdb_sec": round(d_t, 3),
                               "ratio": round(slow[name] / d_t, 2)}
            except Exception as exc:  # noqa: BLE001
                raced[name] = {"spark_sec": slow[name], "duckdb_sec": None,
                               "duckdb_error": f"{type(exc).__name__}: {str(exc)[:80]}"}
                # an OOM'd duckdb connection keeps its buffers until
                # closed and poisons every later query (first seen at
                # 256x, round 6; re-hit by THIS tool's first run) —
                # close and reopen before the next entry
                import gc

                try:
                    con.close()
                except Exception:
                    pass
                gc.collect()
                con = duck_con(replica)
            print(json.dumps({"raced": name, **raced[name]}), flush=True)

    print(json.dumps({
        "summary": "straggler_sweep", "mult": mult, "entries_timed": len(timed),
        "errors": errors,
        "over_threshold": raced,
        "over_2x": sorted(n for n, r in raced.items()
                          if r.get("ratio") and r["ratio"] > 2),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
