"""Physical-plan audit — the scale-hygiene gate (SURVEY.md §7 P7).

For every catalog query, renders the formatted physical plan and flags
antipatterns that would hurt at 100 TB:

* parquet scans with no pushed filters while the query filters that table
* CartesianProduct / BroadcastNestedLoopJoin (unless the query is an
  intentional small-side cross join, e.g. brute-force similarity)
* SortMergeJoin against a dimension-sized side (should be broadcast)
* row-at-a-time Python UDF markers (BatchEvalPython) — pandas/Arrow only

Usage: python tools/explain_audit.py [sf_dir] [query ...] [--dump-dir D]
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineering_capstone_spark.catalog import load_all
from data_engineering_capstone_spark.session import get_spark

# Queries where a nested-loop/cross shape is the algorithm, not a bug.
INTENTIONAL_CROSS = {
    "llm_cosine_topk",      # broadcast query set x corpus scan
    "llm_embedding_near_dup",  # exact all-pairs verify stage (documented)
    "llm_ann_lsh",          # bucket-join candidates, rerank
    "cross_join_nation_region",  # explicit dim x dim Cartesian (documented)
    "q11_important_parts",  # 1-row broadcast scalar threshold; inequality
                            # compare can't become an equi-join
    "llm_ann_ivf",  # query-set x tiny centroid table broadcast (nearest-
                    # cell assignment); candidate join itself is equi
    "llm_semantic_dedup",  # corpus x 8-row broadcast centroid table for
                           # multi-probe cell ranking; pair join is equi
    "ts_gapfill_ffill",  # entity-dim x exploded bucket sequence: the
                         # dense grid is tiny-by-construction (documented)
    "interval_overlap_join",  # fact x 4-row broadcast promo calendar;
                              # overlap predicate can't equi-join (documented)
    "ts_rolling_active_users",  # fact x 30-row broadcast day grid range
                                # join (windowed COUNT DISTINCT; documented)
    "ts_rolling_active_users_hll",  # sketch-rows x day-grid range join
    "ts_rolling_median_kll",  # same shape: ~30 daily KLL sketch rows x
                              # 30-row day grid trailing-window range
                              # join; both sides dimension-scale
    "llm_unigram_logprob",  # vocab x 1-row broadcast total (documented)
    "llm_bm25_search",  # tf table x 1-row broadcast (N, avgdl) corpus
                        # stats — same tiny-broadcast shape (documented)
    "llm_perplexity_filter",  # token stream x 1-row broadcast (t, v) LM
                              # stats for the OOV floor — same tiny-
                              # broadcast shape as llm_unigram_logprob
    "llm_dsir_weights",  # 64-row bucket table x 1-row broadcast (sr, st)
                         # totals, and doc scores x 1-row broadcast
                         # median threshold — same tiny-broadcast shape
    "llm_kl_drift",  # (source, term) counts x 1-row broadcast corpus
                     # total — same tiny-broadcast shape
    "agg_equidepth_histogram",  # ranked fact x 1-row broadcast n_tot
                                # (ntile remainder arithmetic) — same
                                # tiny-broadcast shape (round-7 rewrite;
                                # the no-partition window it also plans
                                # runs over ~50k BUCKET rows, not the
                                # fact — the prefix.py phase-2 pattern)
    "llm_hybrid_rrf_search",  # corpus scan x 1-row broadcast query
                              # vector (dense stage), plus the inherited
                              # bm25 1-row stats broadcast
    "etl_psi_drift",  # fact scan x 1-row broadcast decile-boundary
                      # array, and 10-row bucket table x 1-row totals
    "etl_benford_report",  # 9-row digit table x 1-row broadcast total
    "etl_psi_drift_kll",  # same shape as etl_psi_drift with KLL-sketch
                          # boundaries (1-row broadcasts)
}

# Entries allowed to run a grouped-agg pandas UDF WITHOUT the
# (key, spark_partition_id()) partial-grain device because their
# grouping key is high-cardinality (slices stay bounded and the
# reducer width tracks the key, not |groups|≈constant). Currently none
# — every catalog UDAF goes through the device.
UDAF_HIGH_CARDINALITY_OK: set[str] = set()

# Streaming queries execute through the streaming runner; the batch
# explain below would re-trigger the stream. Audited via their batch
# twins instead.
SKIP = {
    "stream_tumbling_counts",
    "stream_sliding_avg",
    "stream_session_windows",
    "stream_dedup_watermark",
    "stream_foreach_batch_sink",
    # sink round-trips write on plan construction; plans are trivial scans
    "etl_partitioned_sink_roundtrip",
    "scan_csv_roundtrip",
    "scan_semicolon_csv_roundtrip",
    "scan_json_roundtrip",
    "scan_orc_roundtrip",
    "stream_foreach_batch_sink",
    # these also write on plan construction (sinks, Derby, XPT, versions)
    "scan_xml_roundtrip",
    "scan_jdbc_roundtrip",
    "scan_sas_roundtrip",
    "scan_xport_distributed",
    "scan_parquet_codecs",
    "scan_csv_malformed",
    "etl_zorder_roundtrip",
    "etl_time_travel_diff",
    "stream_custom_source_replay",
    "stream_stream_join",
    "stream_static_join_segments",
    "stream_stateful_user_stats",
    "stream_psi_drift",
}


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
        df.explain()  # simple mode carries the *(N) codegen-span markers
    return buf.getvalue()


def udaf_grain_flags(plan: str) -> list[str]:
    """pandas-UDAF partial-grain law (SCALE.md §22), anchored PER NODE.

    PythonUDAF has no partial aggregation, so a grouped-agg pandas UDF
    keyed only on a low-cardinality column shuffles every raw row to
    |groups| reducers and holds each whole group in one Python worker —
    a scale bug by construction (udf_grouped_agg measured 52 s / 169×
    at 256× in the single-phase form). Every ArrowAggregatePython node
    must therefore aggregate at a grain that includes
    SPARK_PARTITION_ID() (the explicit partial-grain device;
    queries_udf.py:udf_grouped_agg is the template).

    Round-10 fix (round-9 ADVICE): the check reads EACH node's OWN
    grouping keys (the first bracket of its Arguments line) and demands
    one of them be the partition id — either literally or via a
    ``SPARK_PARTITION_ID() AS <key>`` alias elsewhere in the plan. The
    old plan-wide substring check passed any grain-less UDAF co-planned
    with an unrelated partition-id expression.
    """
    flags: list[str] = []
    for m in re.finditer(r"\(\d+\) ArrowAggregatePython[^\n]*\n((?:[^\n]*\n){1,4})", plan):
        am = re.search(r"Arguments: \[([^\]]*)\]", m.group(1))
        keys = am.group(1) if am else ""
        grain_ok = "SPARK_PARTITION_ID()" in keys
        for key in re.findall(r"\w+#\d+", keys):
            if grain_ok:
                break
            if re.search(r"SPARK_PARTITION_ID\(\)[^\n]*AS " + re.escape(key), plan):
                grain_ok = True
        if not grain_ok:
            flags.append(
                "grouped-agg pandas UDF without the partition-grain device "
                "(PythonUDAF cannot partial-aggregate; see SCALE.md §22)"
            )
            break
    return flags


def audit_one(name: str, plan: str) -> list[str]:
    flags: list[str] = []
    if name not in INTENTIONAL_CROSS:
        if "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan:
            flags.append("nested-loop/cartesian join")
    if "BatchEvalPython" in plan:
        flags.append("row-at-a-time Python UDF (use pandas_udf)")
    if name not in UDAF_HIGH_CARDINALITY_OK:
        flags.extend(udaf_grain_flags(plan))
    # SortMergeJoin whose JOIN KEYS are a tiny dim's (nation/region) —
    # checked against the SMJ node's own "Left/Right keys" detail lines,
    # not the whole subtree (round-9 fix: the old DOTALL regex flagged
    # any plan where a broadcast dim join merely appeared BELOW an
    # unrelated fact-fact SMJ, e.g. q7 after its join reorder)
    for m in re.finditer(r"\(\d+\) SortMergeJoin[^\n]*\n((?:[^\n]*\n){1,4})", plan):
        detail = m.group(1)
        keys = "\n".join(ln for ln in detail.splitlines() if "keys" in ln)
        if re.search(r"n_nationkey|r_regionkey", keys):
            flags.append("sort-merge join against a broadcastable dim")
            break
    return flags


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    dump_dir = None
    for i, a in enumerate(sys.argv[1:]):
        if a == "--dump-dir":
            dump_dir = sys.argv[1:][i + 1]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.001"
    if args and os.path.isdir(args[0]):
        args = args[1:]
    names = args or [n for n in load_all() if n not in SKIP]
    spark = get_spark("explain_audit")
    # AQE prints "AdaptiveSparkPlan isFinalPlan=false" shells before
    # execution, hiding the *(N) whole-stage-codegen markers; audit the
    # static plan instead (strategy/pushdown/UDF checks are identical).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    catalog = load_all()
    bad = 0
    for name in names:
        df = catalog[name].fn(spark, sf_dir)
        plan = plan_text(df)
        if dump_dir:
            os.makedirs(dump_dir, exist_ok=True)
            with open(os.path.join(dump_dir, f"{name}.txt"), "w") as f:
                f.write(plan)
        flags = audit_one(name, plan)
        pushed = len(re.findall(r"PushedFilters: \[[^\]]", plan))
        codegen = len(set(re.findall(r"\*\((\d+)\)", plan)))
        if flags:
            bad += 1
            print(f"FLAG  {name}: {'; '.join(flags)}")
        else:
            print(f"ok    {name} (pushed-filter scans={pushed}, codegen spans={codegen})")
    print(f"\n{len(names) - bad}/{len(names)} plans clean")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
