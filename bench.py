"""Benchmark runner — the driver's per-round perf probe.

Runs the headline catalog queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: ``{"metric", "value", "unit", "queries", "sf", ...}``.

Each query executes to completion through the ``noop`` sink — full plan
runs on executors, nothing is shipped to the driver, so the timing
measures scan+shuffle+compute, not result serialization.

Credibility protocol (round 3 — VERDICT r2 flagged a contaminated
BENCH_r02 recorded under external sandbox load):

* **subprocess-per-query isolation**: every headline query runs in its
  OWN fresh process + SparkSession, so a pathological query (or GC
  debt, or streaming state) cannot bleed into its neighbors' timings.
  JVM startup happens before the child's clock starts.
* **best-of-3 inside the child** (first warm run excluded): absorbs
  footer-cache warmup and transient scheduler noise.
* **loadavg recorded per query** (1-min, sampled in the child right
  before timing): an artifact recorded under load is visibly
  contaminated — ``max_load1`` in the summary plus per-query values in
  ``loadavg`` let any reader re-run and compare like for like.

Round-11 hardening (verdict task 3 — BENCH_r10's +8.8% took a judge
adjudication to dismiss as ambient load):

* **load gate in the child**: if load1 > ``LOAD_GATE`` right before
  timing, the child waits up to 3×15 s for the machine to drain (JVM
  startup already absorbed the previous child's 1-min-average decay);
  the final load and wait count are recorded either way.
* **adaptive children per query, min wins**: each query starts with TWO
  independent fresh processes; children are added (to at most 5) until
  the two best agree within 5 % — measured on an IDLE box, single-JVM
  bests of one sub-second query span ~24 % (codegen/JIT luck), so the
  min over enough JVMs, not more reps inside one JVM, is what
  stabilizes. The recorded value is the min; per-query ``spread``
  (relative gap of the two best) is in the artifact, so a reader can
  see measurement stability without a rerun.
* **interleaved passes** (round-11 follow-up, measured 21.7 % worst
  cross-run spread with consecutive children): the two children of a
  query run ~7 min apart (pass 1 over all queries, then pass 2), so a
  multi-minute ambient-load window can poison at most ONE of them —
  min-wins then recovers the clean window. Consecutive children shared
  the same window and drifted together, which no rep count fixes.

Round-12 hardening (verdict item 1 — r11's three ">10% regressions"
were all load-wave samples the gate-at-start could not see):

* **window load re-check**: the child records load1 at timing start AND
  end (``load1_max`` = the worse of the two); the parent re-runs (fresh
  subprocess, same adaptive cap) any query whose WINNING child's window
  saw load1 > ``0.5 × cpus`` — a wave that arrives mid-window now
  triggers a re-measure instead of silently inflating the artifact.
  The recorded value stays the min over children (load only ever
  inflates a timing, so min-wins is already wave-robust — the re-check
  guarantees the min itself came from a clean window whenever one was
  obtainable within the cap). ``window_load`` per query in the artifact
  is the winning child's load1_max.

Set ``SPARK_GRAFT_BENCH_INPROC=1`` for the fast shared-session mode
(iteration convenience; not for recorded artifacts).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

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

REPS = 3
# pre-timing ambient-load gate: 32 cores idle-but-for-us should sit well
# under 10 even while a previous child's burst decays out of the 1-min
# average (JVM startup buys ~10 s of decay for free)
LOAD_GATE = 10.0
SPREAD_GATE = 0.05


def run_one(fn, spark, sf_dir: str) -> float:
    t0 = time.time()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def bench_query(name: str, sf_dir: str) -> dict:
    """Fresh-session timing of one query: warm run, then best-of-REPS."""
    from data_engineering_capstone_spark.catalog import load_all
    from data_engineering_capstone_spark.session import get_spark

    spark = get_spark(f"bench-{name}")
    fn = load_all()[name].fn
    waits = 0
    load1 = os.getloadavg()[0]
    while load1 > LOAD_GATE and waits < 3:
        time.sleep(15)
        waits += 1
        load1 = os.getloadavg()[0]
    run_one(fn, spark, sf_dir)  # warm: JIT, footer cache, codegen
    best = min(run_one(fn, spark, sf_dir) for _ in range(REPS))
    if best < 2.0:
        # sub-2s plans are scheduler-jitter-bound: two more reps cost
        # ~2 s and shave the intra-window tail
        best = min(best, *(run_one(fn, spark, sf_dir) for _ in range(2)))
    load1_end = os.getloadavg()[0]
    return {
        "name": name,
        "best": round(best, 3),
        "load1": round(load1, 2),
        "load1_max": round(max(load1, load1_end), 2),
        "gate_waits": waits,
    }


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        print("CHILD_RESULT " + json.dumps(bench_query(sys.argv[2], sf_dir)))
        return 0

    from data_engineering_capstone_spark.catalog import load_all

    names = [n for n in HEADLINE if n in load_all()]
    timings: dict[str, float] = {}
    loads: dict[str, float] = {}

    if os.environ.get("SPARK_GRAFT_BENCH_INPROC"):
        from data_engineering_capstone_spark.catalog import load_all as _la
        from data_engineering_capstone_spark.session import get_spark

        spark = get_spark("bench")
        catalog = _la()
        run_one(catalog[names[0]].fn, spark, sf_dir)
        for name in names:
            loads[name] = round(os.getloadavg()[0], 2)
            timings[name] = round(
                min(run_one(catalog[name].fn, spark, sf_dir) for _ in range(REPS)), 3
            )
    else:
        def run_child(name: str) -> dict | None:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", name],
                capture_output=True,
                text=True,
                env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir},
            )
            line = next(
                (l for l in proc.stdout.splitlines() if l.startswith("CHILD_RESULT ")),
                None,
            )
            if proc.returncode != 0 or line is None:
                print(
                    f"bench child failed for {name}:\n{proc.stdout[-2000:]}\n"
                    f"{proc.stderr[-2000:]}",
                    file=sys.stderr,
                )
                return None
            return json.loads(line[len("CHILD_RESULT "):])

        cpus = int(os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 4)
        # verdict r11 item 1: ~0.5×cpus — floored at the pre-timing
        # LOAD_GATE so a small-core box under ambient load the child gate
        # already tolerates can't make the re-check loop unsatisfiable
        # (it would burn the 5-child cap on every query and still record
        # a dirty window)
        window_gate = max(0.5 * cpus, LOAD_GATE)
        spreads: dict[str, float] = {}
        window_loads: dict[str, float] = {}
        by_name: dict[str, list[dict]] = {n: [] for n in names}
        for _pass in range(2):  # interleave: decorrelate a query's two windows
            for name in names:
                r = run_child(name)
                if r is None:
                    return 1
                by_name[name].append(r)
        for name in names:
            results = by_name[name]

            def winner() -> dict:
                return min(results, key=lambda r: r["best"])

            vals = sorted(r["best"] for r in results)
            # Cross-JVM variance dominates (measured: idle-box children of
            # one sub-second query span 24% — codegen/JIT luck, not load).
            # Add children until the two best agree within SPREAD_GATE AND
            # the winning child's timing window was load-clean: a wave
            # arriving mid-window (invisible to the start-of-child gate)
            # now triggers a fresh subprocess instead of a dirty artifact.
            while (
                vals[0] > 0
                and (
                    (vals[1] - vals[0]) / vals[0] > SPREAD_GATE
                    or winner().get("load1_max", 0.0) > window_gate
                )
                and len(results) < 5
            ):
                extra = run_child(name)
                if extra is None:
                    return 1
                results.append(extra)
                vals = sorted(r["best"] for r in results)
            timings[name] = vals[0]
            spreads[name] = round((vals[1] - vals[0]) / vals[0], 3) if vals[0] else 0.0
            loads[name] = max(r["load1"] for r in results)
            window_loads[name] = winner().get("load1_max", winner()["load1"])

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "loadavg": loads,
        "max_load1": max(loads.values()) if loads else None,
        "isolation": "inproc" if os.environ.get("SPARK_GRAFT_BENCH_INPROC") else "subprocess",
    }
    if not os.environ.get("SPARK_GRAFT_BENCH_INPROC"):
        out["spread"] = spreads
        out["max_spread"] = max(spreads.values()) if spreads else None
        out["window_load"] = window_loads
        out["window_gate"] = window_gate
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
