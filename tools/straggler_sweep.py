"""Straggler triage: time EVERY oracle-paired entry at a replica scale.

The round-7 changed-entry race exposed q14 at 10× and unigram at 3.08× —
both had simply never been raced (RATIO_SET + the LLM family cover ~40
of 214 oracle-paired entries). This sweep times a single warm Spark run
of every oracle-paired entry at the given replica scale and prints the
slowest ones; anything over the threshold gets a DuckDB race so the
ratio is known, not assumed. Entries whose inputs don't scale with the
replica (dims-only, event_id<2000 families, fixture roundtrips) show up
as sub-second floors and are skipped by the threshold automatically.

Round-9 hardening (round-8 verdict What's-wrong #4): each DuckDB oracle
race runs in a CHILD subprocess. A baseline OOM previously killed the
whole sweep (three OOMs ended the round-8 race phase at 193/214 timed);
the baseline failing at scale is itself a result to record, so a child
death now lands as an ``oracle_oom``/``oracle_error`` row and the sweep
continues. The Spark side stays in-process (it shares the warm session).

Usage:
  python tools/straggler_sweep.py [--mult=64] [--race-over=3.0]
  python tools/straggler_sweep.py --rows-only   # time the 29 estimator/
        # stateful entries too (no oracle to race — absolute curve only)
  python tools/straggler_sweep.py --race-one=<entry> --replica=<dir>
        # internal child mode: race one oracle, print one JSON line
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_crossover import build_replica_dir, duck_con, time_best  # noqa: E402

ORACLE_CHILD_TIMEOUT = int(os.environ.get("SWEEP_ORACLE_TIMEOUT", "1800"))


def race_one_child(name: str, replica: str) -> int:
    """Child mode: time one entry's DuckDB oracle and print one JSON
    line. Runs isolated so an allocator death here can't take the sweep
    down with it."""
    from data_engineering_capstone_spark.catalog import load_all

    spec = load_all()[name]
    con = duck_con(replica)
    d_t = time_best(lambda: con.execute(spec.oracle).fetchall(), reps=2)
    # full precision: the parent computes the ratio from this value, and
    # a sub-millisecond oracle rounded to 0.0 would silently drop the
    # highest-ratio stragglers (round-9 review finding)
    print(json.dumps({"duckdb_sec": d_t}), flush=True)
    return 0


def race_in_subprocess(name: str, replica: str) -> dict:
    """Parent side: run the oracle race in a child; map death→oom row."""
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             f"--race-one={name}", f"--replica={replica}"],
            capture_output=True, text=True, timeout=ORACLE_CHILD_TIMEOUT,
        )
    except subprocess.TimeoutExpired:
        return {"duckdb_sec": None,
                "oracle_error": f"timeout>{ORACLE_CHILD_TIMEOUT}s"}
    if proc.returncode == 0:
        try:
            last = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
            return json.loads(last)
        except (IndexError, ValueError):
            return {"duckdb_sec": None,
                    "oracle_error": f"child output unparseable: {proc.stdout[-120:]!r}"}
    blob = (proc.stderr or "") + (proc.stdout or "")
    oomish = any(s in blob for s in
                 ("OutOfMemory", "out of memory", "std::bad_alloc", "Cannot allocate"))
    # ONLY an allocator-death message counts as OOM evidence (round-9
    # ADVICE): a bare -9 can be an operator/cgroup SIGKILL and a bare
    # -11/-6 a non-memory segfault/abort — recording those as
    # oracle_oom would overstate the baseline's memory failures in the
    # round record. Bare signal deaths go in as oracle_error with the
    # signal name.
    if oomish:
        return {"duckdb_sec": None, "oracle_oom": True,
                "oracle_error": f"exit={proc.returncode}: {blob.strip()[-160:]}"}
    if proc.returncode < 0:
        import signal as _signal

        try:
            signame = _signal.Signals(-proc.returncode).name
        except ValueError:
            signame = f"signal {-proc.returncode}"
        # NOTE: a kernel/cgroup oom-killer death is a silent SIGKILL —
        # it lands here, not in oracle_oom, because there is no way to
        # distinguish it from an operator kill without /var/log access;
        # the signal name in the record lets the round reviewer decide.
        return {"duckdb_sec": None,
                "oracle_error": f"died on {signame} (no allocator message; "
                                f"a cgroup oom-kill also looks like this): "
                                f"{blob.strip()[-120:]}"}
    return {"duckdb_sec": None,
            "oracle_error": f"exit={proc.returncode}: {blob.strip()[-160:]}"}


def main() -> int:
    mult, race_over, rows_only = 64, 3.0, False
    race_one, replica_arg = None, None
    for a in sys.argv[1:]:
        if a.startswith("--mult"):
            mult = int(a.split("=", 1)[1])
        elif a.startswith("--race-over"):
            race_over = float(a.split("=", 1)[1])
        elif a == "--rows-only":
            rows_only = True
        elif a.startswith("--race-one"):
            race_one = a.split("=", 1)[1]
        elif a.startswith("--replica"):
            replica_arg = a.split("=", 1)[1]

    if race_one is not None:
        return race_one_child(race_one, replica_arg)

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
    for name in slow:
        child = race_in_subprocess(name, replica)
        row = {"spark_sec": slow[name], **child}
        d_t = child.get("duckdb_sec")
        if d_t is not None:
            row["duckdb_sec"] = round(d_t, 4)
            row["ratio"] = round(slow[name] / d_t, 2) if d_t > 0 else float("inf")
        raced[name] = row
        print(json.dumps({"raced": name, **row}), flush=True)

    print(json.dumps({
        "summary": "straggler_sweep", "mult": mult, "entries_timed": len(timed),
        "errors": errors,
        "over_threshold": raced,
        "over_2x": sorted(n for n, r in raced.items()
                          if r.get("ratio") and r["ratio"] > 2),
        "oracle_ooms": sorted(n for n, r in raced.items() if r.get("oracle_oom")),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
