"""Scale-crossover probe: Spark vs DuckDB on the SAME queries as data grows.

The sf0.1 headline timings (BENCH_r*.json) sit at Spark's per-query task
scheduling floor (~0.3-0.5 s at local[32]) — DuckDB finishes sub-100 ms
there, so per-query ratios at tiny scale measure the floor, not the
plans. This probe replicates the testdata N× (key-shifted so per-copy
join semantics hold, written once to parquet) and times EVERY
oracle-paired headline query on BOTH engines at the replicated size:
the Spark side runs the actual catalog plan via the noop sink, the
DuckDB side runs the actual oracle SQL over the same files — the exact
pair the driver compares, now at a size where the floor is amortized.

Replication scheme: fact-ish tables (lineitem, orders, events,
documents, embeddings) get N key-shifted copies; dimension-ish tables
(region, nation, customer, supplier, part) stay single-copy — which is
precisely the 100 TB shape (facts grow, dims don't), and keeps every
headline join's semantics intact (shifted orderkeys join within their
copy; unshifted custkeys/partkeys fan out across copies).

Usage:
  python tools/scale_crossover.py               # full headline @ 64x
  python tools/scale_crossover.py --mult=16
  python tools/scale_crossover.py --q1-curve --sizes=1,4,16,64
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineering_capstone_spark.session import get_spark

# replicated-scale runs (16-64x sf0.1) need more than the 8g test
# default: local[32] concentrates a whole cluster's execution memory in
# one JVM (llm_span_dedup_clean at 64x = 320k docs of positioned
# 5-grams OOMs at 8g). Overridable via SPARK_DRIVER_MEM.
os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = os.environ.get("SPARK_GRAFT_XOVER_DIR", "/tmp/dec_spark_xover")

# fact tables and the key column shifted per copy (join keys that pair
# fact-to-fact shift together; keys into single-copy dims stay put).
# v5: events.user_id ALSO shifts — leaving it fixed pinned the user
# population at 1,500 while event density grew with the multiplier, so
# every per-user self-join workload (the stream-stream interval join
# above all) had QUADRATIC output: measured 749,568 pairs at 64× →
# 11,993,088 at 256× (exactly 16× for 4× data) — the fourth
# replica-mutation artifact found by a scale sweep (SCALE.md §12/§15/
# §19, §22).
# v6: the v5 shift was i*OFFSET, which BROKE the events.user_id →
# customer.c_custkey FK (stream_static_join_segments joins it against
# the COPIED, unshifted customer dim — at N× only copy 0 matched, so
# that entry's replica join output stayed constant). user_id now
# shifts MODULO the customer key range (handled specially in
# build_replica_dir, not via this table): the FK survives every copy
# while the user population still grows linearly up to the dim's
# cardinality (15,000 at sf0.1 = 10× the base 1,500). Past that
# saturation point per-user event density grows as mult/10, so
# user-self-join output inflates by the same factor on BOTH engines —
# bounded by the dim, not quadratic in the corpus; recorded with the
# stream_stream_join scale rows.
SHIFTED = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPIED = ["region", "nation", "customer", "supplier", "part"]
OFFSET = 1_000_000_000

# the oracle-paired headline queries (bench.py HEADLINE minus rows-only)
RATIO_SET = [
    "q1_pricing_summary",
    "q5_revenue_by_nation",
    "q3_top_orders",
    "agg_distinct_by_priority",
    "window_running_orders",
    "asof_purchase_click",
    "scalar_math_funcs",
    "json_props_agg",
    "skew_salted_agg",
    "llm_cosine_topk",
    "llm_text_stats",
    "stream_tumbling_counts",
    # round-5 fourth session, in a preset from birth: the whole-schema
    # FK report includes the fact-fact (lineitem->orders) orphan join;
    # lttb reduces to a ~30-row daily series at any scale (its ratio
    # measures the Spark scheduling floor, recorded as such)
    "etl_fk_integrity",
    "ts_downsample_lttb",
    # IQR fences are a grouped exact-percentile + broadcast-back pass
    # over the orders fact; ewma reduces to the ~30-row daily series
    # (scheduling-floor class, like lttb)
    "etl_outlier_iqr",
    "ts_ewma_trailing",
    # round-5 fifth session, in a preset from birth: PSI is the
    # exact-percentile + broadcast-bucket scan over the orders fact;
    # benford is a single lineitem scan into a 9-group aggregate;
    # cusum reduces to the daily series (floor class, like ewma)
    "etl_psi_drift",
    "etl_benford_report",
    "ts_cusum_changepoint",
    # applyInArrow group-map: the Arrow serialization boundary IS the
    # thing to watch at scale — raced like the rest
    "udf_apply_in_arrow",
]

# the LLM/dedup-family scale set (round-3 verdict task 2): the slowest
# catalog entries at sf0.1, now raced at replicated scale. minhash is
# rows-only (no oracle) — Spark-side time is published alone.
LLM_SET = [
    "llm_ngram_jaccard",
    "llm_dedup_triangles",
    "llm_span_dedup_clean",
    "llm_minhash_near_dup",
    "llm_prep_pipeline_e2e",
    "llm_ngram_containment",
    "llm_span_decontamination",
    # round-5 verdict task 2: this entry hid a quadratic blocking key
    # for three rounds because it was in no measurement preset
    "llm_fuzzy_prefix_pairs",
    # round-5 additions, in a preset from birth (the guard's lesson):
    # perplexity gate is token-heavy (two explodes + LM join);
    # novelty is the postings join-back; url dedup is the narrow-
    # exchange canonicalization pass; phash is rows-only (Spark time
    # published alone, like minhash)
    "llm_perplexity_filter",
    "llm_ngram_novelty",
    "llm_url_dedup_canonical",
    "mm_phash_near_dup",
    "mm_audio_fingerprint_dedup",
    # round-5 second session, in a preset from birth: gopher is a
    # shuffle-free structural-rule scan; nfc is the Arrow NFC kernel +
    # digest (the one justified Python hop in the dedup path)
    "llm_gopher_rules",
    "llm_unicode_nfc",
    "llm_dedup_rate_report",
    "llm_html_strip",
    # rows-only members (Spark time published alone, like minhash):
    # the three entries the rows-only audit rewrote — keep them raced
    "llm_semantic_dedup",
    "llm_embedding_near_dup",
    "llm_simhash_near_dup",
    # round-5 third session, in a preset from birth: boilerplate is the
    # digest-keyed window keeper pass; dsir is the hashed-bucket
    # importance-weight scan
    "llm_boilerplate_lines",
    "llm_dsir_weights",
    # round-5 fourth session, in a preset from birth: kl_drift is the
    # (source, term) aggregate + vocab-keyed join shape; hybrid fuses
    # the bm25 explode with the dense broadcast-cosine scan
    "llm_kl_drift",
    "llm_hybrid_rrf_search",
    # semantic decontamination: broadcast-BLAS linear scan (the cosine
    # family's scale shape), in a preset from birth
    "llm_semantic_decontamination",
    # round-7 straggler-sweep graduates (the fuzzy lesson again: both
    # hid outside every preset — unigram measured 3.08x before its
    # hashed-token-exchange rewrite): unigram is the vocab-LM scoring
    # scan, tfidf the rank-on-rounded vocabulary extraction
    "llm_unigram_logprob",
    "llm_tfidf_top_terms",
    # round-5 fifth session, in a preset from birth: zipf is the token
    # explode + term aggregate shape with a bounded top-1000 cut;
    # embedding_drift is the vector posexplode into bounded-key
    # (label, pos) decimal partials
    "llm_zipf_fit",
    "llm_embedding_drift",
]

# Q1 integer-cents form for the legacy fine-grained curve (--q1-curve)
Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS DOUBLE) / 100
         AS sum_base,
       CAST(COUNT(*) AS BIGINT) AS n
FROM {table}
GROUP BY l_returnflag, l_linestatus
"""


def _copy_text_mutation(i: int):
    """Injective per-copy token renaming for the documents table.

    Key-shift replication alone duplicates every document's TEXT
    byte-identically N times — which turns every doc into an N-copy
    template: near-dup pair outputs grow quadratically in N and the
    probe would measure output blowup (the template-spam scenario,
    SCALE.md §12), not scan/join scaling. A per-copy seeded PERMUTATION
    of the letter (and digit) alphabets renames every token injectively:
    WITHIN-copy Jaccard/span/minhash/simhash structure is exactly the
    base corpus's, while cross-copy token collisions become
    statistically negligible (not strictly zero: two independent
    26-letter permutations agree on ~1 letter in expectation, so a
    token composed entirely of agreeing letters — e.g. a single-letter
    repeat like 'aa' — can still collide across a copy pair; the
    probability any given multi-letter token survives is ~26^-k and
    the round-6 sweep measured 0 cross-copy pairs). Copy 0 is the
    identity.

    v4 — replaces the v3 alphabet ROTATION (letters by i%26, digits by
    i//26%10): the synthetic documents contain no digits, so the digit
    half of the rotation never disambiguated and copies i and i+26k
    were BYTE-IDENTICAL — every doc gained ceil(N/26)-1 exact clones at
    N>26, and the round-6 256x rows-only sweep measured the resulting
    quadratic pair clusters (simhash 667k/3.2M/13.3M at 64/128/256x,
    74% of pairs cross-copy within a rotation class; the
    collapse_exact-guarded entry stayed CONSTANT at 136,061 — the
    template-spam guard collapsing exactly this artifact). Third
    replica-mutation defect found by a scale sweep (after the unmutated
    embeddings and the fixed-cardinality buckets, SCALE.md §15) — the
    probes' linear-output assertions are doing their job.
    """
    import string

    import numpy as _np

    lo = string.ascii_lowercase
    up = string.ascii_uppercase
    dg = string.digits
    src = lo + up + dg
    if i == 0:
        return src, src
    rs = _np.random.RandomState(7_000_000 + i)
    pl = "".join(rs.permutation(list(lo)))
    pd = "".join(rs.permutation(list(dg)))
    return src, pl + pl.upper() + pd


def build_replica_dir(spark, mult: int) -> str:
    """Materialize the key-shifted N× testdata once; idempotent."""
    from pyspark.sql import functions as F

    out_dir = os.path.join(WORK, f"sf_x{mult}")
    done = os.path.join(out_dir, "_REPLICA_DONE_v6")
    if os.path.isfile(done):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    # v6 user_id wrap parameters, derived from the data: user_id must
    # remain a valid customer.c_custkey in every copy (see SHIFTED note)
    cust_min, cust_max = spark.read.parquet(f"{SF_DIR}/customer.parquet").agg(
        F.min("c_custkey"), F.max("c_custkey")
    ).first()
    user_min, user_max = spark.read.parquet(f"{SF_DIR}/events.parquet").agg(
        F.min("user_id"), F.max("user_id")
    ).first()
    n_cust = int(cust_max) - int(cust_min) + 1
    user_stride = int(user_max) - int(user_min) + 1
    for t, keys in SHIFTED.items():
        src = spark.read.parquet(f"{SF_DIR}/{t}.parquet")
        parts = []
        for i in range(mult):
            p = src
            for k in keys:
                p = p.withColumn(k, F.col(k) + F.lit(i * OFFSET))
            if t == "events":
                # FK-preserving population growth: copy i's users band
                # into [cust_min, cust_max], disjoint per copy until the
                # dim saturates at n_cust distinct users
                p = p.withColumn(
                    "user_id",
                    (F.col("user_id") - F.lit(int(cust_min)) + F.lit(i * user_stride))
                    % F.lit(n_cust)
                    + F.lit(int(cust_min)),
                )
            if t == "documents":
                m_src, m_dst = _copy_text_mutation(i)
                p = p.withColumn("text", F.translate("text", m_src, m_dst))
            if t == "embeddings" and i > 0:
                # the embeddings analog of the text alphabet rotation:
                # a per-copy Rademacher sign flip s (seeded by i) maps
                # x -> s*x, which PRESERVES every within-copy cosine
                # exactly (cos(s*x, s*y) = cos(x, y)) while making
                # cross-copy vectors near-orthogonal (E[cos] = 0) —
                # byte-identical copies would otherwise give every
                # vector 63 exact duplicates and any pair-emitting
                # entry would measure template-spam output blowup,
                # not scan/join scaling (found by the rows-only 64x
                # sweep: llm_embedding_near_dup ran 10+ min on the
                # unmutated replica)
                import numpy as _np

                signs = _np.random.RandomState(1000 + i).choice(
                    [-1.0, 1.0], size=64
                )
                sarr = F.array(*[F.lit(float(v)) for v in signs])
                p = p.withColumn(
                    "embedding",
                    F.zip_with(
                        "embedding", sarr, lambda x, sv: (x * sv).cast("float")
                    ),
                )
            parts.append(p)
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df.repartition(32).write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
    for t in COPIED:
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )
    open(done, "w").close()
    return out_dir


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in list(SHIFTED) + COPIED:
        path = f"{sf_dir}/{t}.parquet"
        glob = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{glob}')")
    return con


def time_best(fn, reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def run_headline(mult: int, only: list[str] | None = None) -> int:
    from data_engineering_capstone_spark.catalog import load_all

    spark = get_spark("scale_crossover")
    replica = build_replica_dir(spark, mult)
    con = duck_con(replica)
    catalog = load_all()
    rows = spark.read.parquet(f"{replica}/lineitem.parquet").count()
    results = {}
    for name in (only or RATIO_SET):
        spec = catalog[name]

        def spark_run():
            spec.fn(spark, replica).write.format("noop").mode("overwrite").save()

        spark_run()  # warm (footers, codegen)
        s_t = time_best(spark_run)
        if spec.oracle is None:
            # rows-only entry (hash-family/iterative): Spark-side time
            # still published; there is no oracle twin to race
            results[name] = {"spark_sec": round(s_t, 3), "duckdb_sec": None,
                             "ratio": None}
        else:
            def duck_run():
                con.execute(spec.oracle).fetchall()

            # the baseline FAILING at scale is a result to record, not
            # a crash: DuckDB's span-decontamination oracle OOMs at
            # 128x+ (640k docs) while the Spark plan completes —
            # exactly the single-node wall this probe exists to map
            try:
                d_t = time_best(duck_run)
            except Exception as e:  # OOM / spill-disk-full etc.
                results[name] = {
                    "spark_sec": round(s_t, 3), "duckdb_sec": None,
                    "ratio": None,
                    "duckdb_error": f"{type(e).__name__}: {str(e)[:120]}",
                }
                print(json.dumps({"query": name, "mult": mult, **results[name]}), flush=True)
                import gc

                # CLOSE the poisoned connection before replacing it: an
                # OOM'd duckdb connection keeps its buffers until closed,
                # and successive failures otherwise accumulate until even
                # an 8-byte allocation dies (observed at 256x, round 6)
                try:
                    con.close()
                except Exception:
                    pass
                gc.collect()
                con = duck_con(replica)  # fresh connection post-failure
                continue
            results[name] = {
                "spark_sec": round(s_t, 3),
                "duckdb_sec": round(d_t, 3),
                "ratio": round(s_t / d_t, 2),
            }
        print(json.dumps({"query": name, "mult": mult, **results[name]}), flush=True)
    paired = {n: r for n, r in results.items() if r["ratio"] is not None}
    total_s = round(sum(r["spark_sec"] for r in paired.values()), 3)
    total_d = round(sum(r["duckdb_sec"] for r in paired.values()), 3)
    print(json.dumps({
        "summary": "headline_crossover",
        "mult": mult,
        "lineitem_rows": rows,
        "spark_total_sec": total_s,
        "duckdb_total_sec": total_d,
        "ratio_total": round(total_s / total_d, 2) if total_d else None,
        "queries_over_2x": sorted(
            n for n, r in paired.items() if r["ratio"] > 2
        ),
    }))
    return 0


def run_q1_curve(sizes: list[int]) -> int:
    spark = get_spark("scale_crossover")
    for mult in sizes:
        replica = build_replica_dir(spark, mult)
        con = duck_con(replica)
        sdf = spark.read.parquet(f"{replica}/lineitem.parquet")
        sdf.createOrReplaceTempView("li_x")
        s_t = time_best(
            lambda: spark.sql(Q1_SQL.format(table="li_x"))
            .write.format("noop").mode("overwrite").save()
        )
        glob = f"{replica}/lineitem.parquet/*.parquet"
        d_t = time_best(lambda: con.execute(Q1_SQL.format(table=f"read_parquet('{glob}')")).fetchall())
        print(json.dumps({
            "mult": mult,
            "rows": sdf.count(),
            "spark_sec": round(s_t, 3),
            "duckdb_sec": round(d_t, 3),
            "ratio_spark_over_duckdb": round(s_t / d_t, 2),
        }), flush=True)
    return 0


def main() -> int:
    mult = 64
    sizes = [1, 4, 16, 64]
    q1_curve = False
    only: list[str] | None = None
    for a in sys.argv[1:]:
        if a.startswith("--mult"):
            mult = int(a.split("=", 1)[1])
        elif a.startswith("--sizes"):
            sizes = [int(x) for x in a.split("=", 1)[1].split(",")]
        elif a.startswith("--only"):
            only = a.split("=", 1)[1].split(",")
        elif a == "--llm":
            only = LLM_SET
        elif a == "--q1-curve":
            q1_curve = True
    return run_q1_curve(sizes) if q1_curve else run_headline(mult, only)


if __name__ == "__main__":
    raise SystemExit(main())
