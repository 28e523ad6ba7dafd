"""Tests for corpus-curation operators: two-phase prefix sum vs the
naive window, packing invariants, repetition gating, decontamination,
and deterministic mix rebalancing (BASELINE.json extension surface)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from data_engineering_capstone_spark.llm.curation import (
    decontaminate,
    pack_sequences,
    rebalance_mix,
    repetition_gate,
    repetition_metrics,
)
from data_engineering_capstone_spark.operators.prefix import global_running_sum


@pytest.fixture(scope="module")
def sized_docs(spark):
    # 40 docs, ids with gaps, varying token counts 1..12
    rows = [(i * 3 + (i % 2), (i % 12) + 1) for i in range(40)]
    return spark.createDataFrame(rows, "doc_id long, n_tok long")


def test_prefix_sum_matches_naive_window(spark, sized_docs):
    two_phase = global_running_sum(
        sized_docs.repartition(7), "doc_id", "n_tok", out_col="rs", bucket_size=16
    )
    naive = sized_docs.withColumn(
        "rs",
        F.sum("n_tok").over(
            Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    a = {r["doc_id"]: r["rs"] for r in two_phase.collect()}
    b = {r["doc_id"]: r["rs"] for r in naive.collect()}
    assert a == b


def test_pack_sequences_invariants(spark, sized_docs):
    packed = pack_sequences(sized_docs, "doc_id", "n_tok", seq_len=10, bucket_size=16)
    rows = sorted(packed.collect(), key=lambda r: r["doc_id"])
    # contiguity: each doc starts where the previous ended
    pos = 0
    for r in rows:
        assert r["start_pos"] == pos
        assert r["seq_first"] == pos // 10
        assert r["seq_offset"] == pos % 10
        assert r["seq_last"] == (pos + r["n_tok"] - 1) // 10
        # straddling docs span consecutive sequences
        assert r["seq_last"] >= r["seq_first"]
        pos += r["n_tok"]
    # some doc must straddle a boundary with seq_len=10 and sizes 1..12
    assert any(r["seq_last"] > r["seq_first"] for r in rows)


def test_repetition_gate_planted(spark):
    spam = "buy now " * 25                       # one bigram dominates
    diverse = " ".join(f"tok{i}" for i in range(50))
    df = spark.createDataFrame([(1, spam), (2, diverse)], "doc_id long, text string")
    out = {r["doc_id"]: r for r in repetition_gate(repetition_metrics(df, "text", "doc_id")).collect()}
    assert not out[1]["passes"]
    assert out[2]["passes"]
    assert out[1]["top_bigram_frac"] > 0.4
    assert out[2]["dup_token_frac"] == 0.0


def test_decontaminate_planted(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "prefix words alpha beta gamma delta epsilon suffix"),  # shares 5-gram
            (2, "totally unrelated content with no overlap at all here"),
        ],
        "doc_id long, text string",
    )
    hits = {r["doc_id"]: r for r in decontaminate(corpus, bench, "text", "doc_id", ngram_n=5).collect()}
    assert 1 in hits and 2 not in hits
    assert hits[1]["n_bench_docs"] == 1


def test_hash_quota_select_matches_rank_prefix(spark):
    """The round-10 device must select EXACTLY the per-group row_number
    prefix — including at quota edges: quota 0, quota ≥ n_g, quota
    landing exactly on a bucket boundary, and groups absent from the
    quota table (dropped). Checked against the literal window form."""
    from pyspark.sql import Window

    from data_engineering_capstone_spark.llm.curation import hash_quota_select

    rows = [(i, ["a", "b", "c", "d"][i % 4]) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    # prefix_len=1 → 16 buckets, so quotas regularly cross bucket edges
    quotas = spark.createDataFrame(
        [("a", 0), ("b", 7), ("c", 100), ("d", 1000)],  # d: quota > n_g
        "grp string, __quota long",
    )
    got = hash_quota_select(df, "grp", "doc_id", quotas, prefix_len=1)
    w = Window.partitionBy("grp").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    q = (
        F.when(F.col("grp") == "a", 0)
        .when(F.col("grp") == "b", 7)
        .when(F.col("grp") == "c", 100)
        .when(F.col("grp") == "d", 1000)
    )
    want = (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= q)
        .drop("__rn")
    )
    got_ids = sorted((r["grp"], r["doc_id"]) for r in got.collect())
    want_ids = sorted((r["grp"], r["doc_id"]) for r in want.collect())
    assert got_ids == want_ids
    # layout independence
    got2 = hash_quota_select(df.repartition(13), "grp", "doc_id", quotas, prefix_len=1)
    assert sorted((r["grp"], r["doc_id"]) for r in got2.collect()) == got_ids
    # absent group dropped
    quotas_partial = spark.createDataFrame([("b", 5)], "grp string, __quota long")
    only_b = hash_quota_select(df, "grp", "doc_id", quotas_partial)
    assert {r["grp"] for r in only_b.collect()} == {"b"}
    assert only_b.count() == 5
    # NULL group is a real stratum (round-10 review): the row_number
    # oracle form ranks a NULL partition, so the device's joins must be
    # null-safe or the stratum silently vanishes
    rows_n = [(i, None if i % 5 == 0 else "x") for i in range(100)]
    dfn = spark.createDataFrame(rows_n, "doc_id long, grp string")
    quotas_n = spark.createDataFrame([(None, 7), ("x", 3)], "grp string, __quota long")
    got_n = hash_quota_select(dfn, "grp", "doc_id", quotas_n)
    by_grp = {}
    for r in got_n.collect():
        by_grp.setdefault(r["grp"], []).append(r["doc_id"])
    assert len(by_grp.get(None, [])) == 7
    assert len(by_grp.get("x", [])) == 3
    w_n = Window.partitionBy("grp").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    want_n = (
        dfn.withColumn("__rn", F.row_number().over(w_n))
        .filter(F.col("__rn") <= F.when(F.col("grp").isNull(), 7).otherwise(3))
        .drop("__rn")
    )
    keyf = lambda t: (t[0] is not None, t[0] or "", t[1])  # noqa: E731 — None sorts
    assert sorted(((r["grp"], r["doc_id"]) for r in got_n.collect()), key=keyf) == sorted(
        ((r["grp"], r["doc_id"]) for r in want_n.collect()), key=keyf
    )


def test_rebalance_mix_quota_and_determinism(spark):
    rows = [(i, "en" if i % 3 else "de") for i in range(90)]  # 60 en, 30 de
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = rebalance_mix(df, "lang", "doc_id", {"en": 5000, "de": 1000})
    counts = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"en": 45, "de": 9}  # 90*0.5, 90*0.1
    # deterministic under different layouts
    kept2 = rebalance_mix(df.repartition(13), "lang", "doc_id", {"en": 5000, "de": 1000})
    assert sorted(r["doc_id"] for r in kept.collect()) == sorted(
        r["doc_id"] for r in kept2.collect()
    )
    # group absent from weights is dropped
    assert kept.filter(~F.col("lang").isin("en", "de")).count() == 0


def test_temperature_mix_upsamples_tail(spark):
    from data_engineering_capstone_spark.llm.curation import temperature_mix

    # 900 'big' vs 100 'small': natural share 90/10; sqrt share 75/25
    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    kept = temperature_mix(df, "grp", "doc_id", keep_bp=5000, alpha=0.5)
    by = {r.grp: r.n for r in kept.groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()}
    total_kept = sum(by.values())
    assert total_kept <= 500
    # tail share must exceed its natural 10% by the sqrt rule (~25%)
    assert by["small"] / total_kept > 0.2
    # deterministic membership
    ids1 = sorted(r.doc_id for r in kept.collect())
    ids2 = sorted(r.doc_id for r in
                  temperature_mix(df, "grp", "doc_id", keep_bp=5000, alpha=0.5).collect())
    assert ids1 == ids2


def test_tiny_quota_adaptive_path_exact(spark):
    """Round-11 adaptive arm: when every quota is ≤ 1/64 of its group,
    _tiny_quota_select must (a) actually arm, and (b) select EXACTLY the
    per-group row_number prefix — including a NULL stratum — and the
    public entry point must agree under any layout."""
    from pyspark.sql import Window

    from data_engineering_capstone_spark.llm.curation import (
        _tiny_quota_select,
        hash_quota_select,
    )

    rows = [(i, [None, "a", "b", "c"][i % 4]) for i in range(8000)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    totals = df.groupBy("grp").agg(F.count(F.lit(1)).alias("n_total"))
    quotas = spark.createDataFrame(
        [(None, 11), ("a", 7), ("b", 31), ("c", 1)], "grp string, __quota long"
    )
    armed = _tiny_quota_select(df, "grp", "doc_id", quotas, 4, totals)
    assert armed is not None, "trigger must arm at quota ≤ n_g/64"
    w = Window.partitionBy("grp").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    q = (
        F.when(F.col("grp").isNull(), 11)
        .when(F.col("grp") == "a", 7)
        .when(F.col("grp") == "b", 31)
        .otherwise(1)
    )
    want = (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= q)
        .drop("__rn")
    )
    keyf = lambda t: (t[0] is not None, t[0] or "", t[1])  # noqa: E731
    want_ids = sorted(((r["grp"], r["doc_id"]) for r in want.collect()), key=keyf)
    assert sorted(((r["grp"], r["doc_id"]) for r in armed.collect()), key=keyf) == want_ids
    # public entry point, different layout, same membership
    got = hash_quota_select(
        df.repartition(17), "grp", "doc_id", quotas, group_totals=totals
    )
    assert sorted(((r["grp"], r["doc_id"]) for r in got.collect()), key=keyf) == want_ids


def test_tiny_quota_trigger_and_fallback(spark):
    """The adaptive arm declines (returns None) when a quota exceeds
    1/64 of its group, and when overstated group_totals shrink the
    cutoff below the verified need — and the public entry point stays
    exact through the fallback in both cases."""
    from data_engineering_capstone_spark.llm.curation import (
        _tiny_quota_select,
        hash_quota_select,
    )

    rows = [(i, "a" if i % 2 else "b") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    totals = df.groupBy("grp").agg(F.count(F.lit(1)).alias("n_total"))
    # quota 100 of 1000 rows: ratio 1/10 > 1/64 → decline
    fat = spark.createDataFrame([("a", 100), ("b", 5)], "grp string, __quota long")
    assert _tiny_quota_select(df, "grp", "doc_id", fat, 4, totals) is None
    # overstated totals (1000×) → cutoff ~0 rows → verified shortfall → decline
    lying = totals.withColumn("n_total", F.col("n_total") * 1000000)
    tiny = spark.createDataFrame([("a", 5), ("b", 5)], "grp string, __quota long")
    assert _tiny_quota_select(df, "grp", "doc_id", tiny, 4, lying) is None
    # the public form still selects the exact prefix through the fallback
    got = hash_quota_select(df, "grp", "doc_id", tiny, group_totals=lying)
    honest = hash_quota_select(df, "grp", "doc_id", tiny)
    assert sorted((r["grp"], r["doc_id"]) for r in got.collect()) == sorted(
        (r["grp"], r["doc_id"]) for r in honest.collect()
    )
    # all-zero quotas with totals armed → empty, preserving schema
    zero = spark.createDataFrame([("a", 0), ("b", 0)], "grp string, __quota long")
    empty = hash_quota_select(df, "grp", "doc_id", zero, group_totals=totals)
    assert empty.count() == 0 and empty.columns == df.columns
    # a quota'd group MISSING from (or zero in) the caller totals must
    # fall back, not silently drop the group (round-11 self-review):
    # stale totals omit 'b' entirely, and record 0 for 'a' in a second case
    part = spark.createDataFrame([("a", 1000)], "grp string, n_total long")
    assert _tiny_quota_select(df, "grp", "doc_id", tiny, 4, part) is None
    zeroed = spark.createDataFrame(
        [("a", 0), ("b", 1000)], "grp string, n_total long"
    )
    assert _tiny_quota_select(df, "grp", "doc_id", tiny, 4, zeroed) is None
    via_entry = hash_quota_select(df, "grp", "doc_id", tiny, group_totals=part)
    assert sorted((r["grp"], r["doc_id"]) for r in via_entry.collect()) == sorted(
        (r["grp"], r["doc_id"]) for r in honest.collect()
    )


def test_histogram_prefix_len_mismatch_rejected(spark):
    """Round-10 ADVICE: a histogram built at another prefix_len must be
    rejected, not silently joined against recomputed tags — and the mix
    helpers must thread a non-default prefix_len end to end."""
    from data_engineering_capstone_spark.llm.curation import (
        hash_bucket_histogram,
        hash_quota_select,
        temperature_mix,
    )

    rows = [(i, "en" if i % 3 else "de") for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    hist2 = hash_bucket_histogram(df, "lang", "doc_id", prefix_len=2)
    quotas = spark.createDataFrame([("en", 5), ("de", 5)], "lang string, __quota long")
    with pytest.raises(ValueError, match="prefix_len=2"):
        hash_quota_select(df, "lang", "doc_id", quotas, prefix_len=3, histogram=hist2)
    # matching prefix passes and selects the same membership as default
    a = hash_quota_select(df, "lang", "doc_id", quotas, prefix_len=2, histogram=hist2)
    b = hash_quota_select(df, "lang", "doc_id", quotas)
    assert sorted(r["doc_id"] for r in a.collect()) == sorted(
        r["doc_id"] for r in b.collect()
    )
    # rebalance/temperature thread prefix_len (membership is prefix-invariant)
    k3 = rebalance_mix(df, "lang", "doc_id", {"en": 5000, "de": 1000}, prefix_len=3)
    k4 = rebalance_mix(df, "lang", "doc_id", {"en": 5000, "de": 1000})
    assert sorted(r["doc_id"] for r in k3.collect()) == sorted(
        r["doc_id"] for r in k4.collect()
    )
    t3 = temperature_mix(df, "lang", "doc_id", keep_bp=5000, prefix_len=3)
    t4 = temperature_mix(df, "lang", "doc_id", keep_bp=5000)
    assert sorted(r["doc_id"] for r in t3.collect()) == sorted(
        r["doc_id"] for r in t4.collect()
    )


def test_entry_report_joins_keep_null_stratum(spark, tmp_path):
    """Round-10 ADVICE: llm_stratified_sample / llm_source_cap must not
    drop a NULL-group stratum at the final counts join (the row_number
    oracles retain it)."""
    from data_engineering_capstone_spark.catalog import load_all

    rows = [(i, None if i % 10 == 0 else f"s{i % 3}", None if i % 7 == 0 else "en")
            for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string, lang string")
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    cat = load_all()
    cap = cat["llm_source_cap"].fn(spark, str(tmp_path)).collect()
    assert any(r["source"] is None for r in cap), "NULL source stratum dropped"
    strat = cat["llm_stratified_sample"].fn(spark, str(tmp_path)).collect()
    assert any(r["lang"] is None for r in strat), "NULL lang stratum dropped"
