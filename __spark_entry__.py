"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``data_engineering_capstone_spark.catalog`` — the query
registry where every implemented operator from SURVEY.md §2 lives as a
(PySpark function, DuckDB oracle SQL) pair.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_engineering_capstone_spark.catalog import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H Q5 shape: 5-table star join (two broadcast dims) → revenue by
    nation — the Spark-first re-expression of the reference's star-schema
    spec (reference: notebook cells 9-10).
    """
    catalog = load_all()
    return catalog["q5_revenue_by_nation"].fn(spark, "/root/testdata/sf0.001")


def _driver_certified() -> set[str]:
    """Names already green in a prior driver ``CORRECTNESS_r*.json``.

    The driver samples a fixed-size window from the front of ``queries()``
    each round, so with stable registration order the same first entries
    get re-certified forever.  Reading the committed correctness files and
    ordering still-uncertified entries first rotates fresh catalog entries
    into every round's sample window; as the certified set grows, the
    window advances on its own.  Entries that errored or mismatched in a
    prior round stay at the front so they get re-checked.
    """
    import glob
    import json

    here = os.path.dirname(os.path.abspath(__file__))
    done: set[str] = set()
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, rec in data.items():
            if not isinstance(rec, dict):
                continue
            full_green = rec.get("rows_match") and rec.get("schema_match") and rec.get("hash_match")
            rows_only_green = rec.get("err") == "no_oracle" and rec.get("spark_rows") is not None
            if full_green or rows_only_green:
                done.add(name)
    return done


# Entries REWRITTEN after their last driver certification (round-9
# verdict task 5): their green rows in CORRECTNESS_r*.json predate the
# current implementation, so they must re-enter the sample window ahead
# of stably-certified entries.  Maintained by hand per round; remove a
# name once a post-rewrite CORRECTNESS file certifies it.
# Round during which the names below were rewritten.  A CORRECTNESS file
# from round >= _REWRITE_ROUND that certifies a listed name makes the list
# stale (tests/test_contract.py::test_rewritten_list_not_stale fails) —
# the name must then be pruned.
_REWRITE_ROUND = 11

_REWRITTEN_SINCE_CERT: tuple[str, ...] = (
    # (r9/r10 rewrites all re-certified in CORRECTNESS_r10.json — pruned
    # per this list's contract; tests/test_contract.py enforces that any
    # listed name is absent from the latest green CORRECTNESS file.)
    # round 11 rewrites:
    "agg_corr_covar",         # corr → corr_e9 scaled-BIGINT (DuckDB cast hazard)
    "llm_source_cap",         # adaptive tiny-quota path in hash_quota_select
    "llm_stratified_sample",  # null-safe counts join (ADVICE r10)
    "q5_revenue_by_nation",   # footer-derived exchange width (width law)
    "q3_top_orders",          # footer-derived exchange width (width law)
    "asof_purchase_click",    # footer-derived exchange width (width law)
    "q7_bilateral_volume",    # width law
    "q20_promo_part_suppliers",  # width law + inner-join form
    "etl_cdc_snapshot_diff",  # width law (null-safe exprs)
    "etl_dedup_first_event",  # width law via dedup_exact
    "etl_scd2_customer_segment",  # width law via scd2_apply
    "window_running_orders",  # width law (fact window)
    "sql_lateral_topk",       # in-lateral custkey bound
    "q2_min_cost_supplier",   # width law (pair-grain window exchange)
    "q4_priority_late_ship",  # width law (lineitem-side repartition)
    # size-gated broadcasts of SF-proportional builds (q7 standard):
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",     # + gated width form for customer⋈orders
    "q11_important_parts",
    "q14_conditional_ratio",
    "q16_part_supplier_counts",
    "q17_small_quantity_revenue",
    "q19_disjunctive_revenue",
    "q21_sole_supplier_orders",
    # hash_quota_select byte-gate + histogram prefix metadata changed under
    # these two as well (round-11 self-review):
    "llm_temperature_mix",
    "llm_mix_rebalance",
    "etl_time_travel_diff",   # version_diff now widths its snapshot_diff
    # round-11 OPTIMIZATION sweep (final-sort policy + streaming detach):
    # display-only final orderBys removed from fact-grain outputs, and
    # run_available_now's snapshot switched to localCheckpoint — result
    # sets identical (local parity green), plans changed.
    "stream_tumbling_counts", "stream_sliding_avg", "stream_session_windows",
    "stream_dedup_watermark", "stream_static_join_segments",
    "stream_stateful_user_stats", "stream_count_min_top_users",
    "stream_minhash_dedup", "stream_stream_join", "stream_psi_drift",
    "stream_custom_source_replay",
    "udf_pandas_scalar", "udf_apply_in_pandas", "udf_apply_in_arrow",
    "udf_map_in_arrow", "mm_metadata_extract", "mm_feature_extract",
    "mm_audio_energy", "mm_frame_sample", "mm_binary_ingest",
    "mm_resize_pipeline", "mm_wav_energy", "mm_bmp_stats",
    "llm_mojibake_detect", "mm_phash_near_dup", "mm_audio_fingerprint_dedup",
    "map_funcs_props", "window_group_zscore", "scalar_string_funcs2",
    "scalar_bitwise_funcs", "scalar_conditional_funcs", "scalar_date_funcs2",
    "scalar_array_funcs2", "scalar_try_funcs", "scalar_math_funcs2",
    "scalar_map_funcs2", "scalar_binary_funcs",
    "llm_exact_dedup", "llm_minhash_near_dup", "llm_minhash_collapsed",
    "llm_cosine_topk", "llm_embedding_near_dup", "llm_ann_lsh",
    "llm_fingerprint", "llm_dedup_clusters", "llm_ann_ivf",
    "llm_gopher_rules", "llm_html_strip", "llm_ann_ivf_pq",
    "llm_pq_index_delta", "llm_semantic_dedup", "llm_pii_redaction",
    "llm_chunk_documents", "llm_repetition_filter", "llm_decontamination",
    "llm_unigram_logprob", "llm_perplexity_filter", "llm_dedup_canonical",
    "llm_duplicate_spans", "llm_quality_classifier",
    "llm_quality_classifier_trained", "llm_bloom_decontamination",
    "llm_blocklist_filter", "llm_span_dedup_clean",
    "llm_span_decontamination", "llm_bpe_encode", "llm_url_dedup_canonical",
    "llm_ngram_novelty", "llm_pack_sequences",
    # round-11 gated scan fan-out (guide §2.5; pqmeta.fanout_starved_scan):
    "llm_text_stats", "llm_ngram_jaccard", "llm_ngram_containment",
    "filter_predicates_part", "window_rank_customers",
    "window_running_skew_safe", "outer_join_order_counts",
    "skew_salted_agg", "null_handling_family",
    "q18_large_orders", "window_analytic_family", "join_null_safe",
    "window_nth_value_family",
    "ts_gapfill_ffill", "ts_sessionize_batch", "ts_weighted_moving_avg",
    "ts_rolling_anomaly", "ts_rolling_median",
    # (q2_min_cost_supplier, q11_important_parts, etl_cdc_snapshot_diff
    # also in the sweep — already listed above for the width law.)
)


def _ordered() -> list[str]:
    """Catalog names in three tiers: never-driver-certified first, then
    rewritten-since-last-certification, then stably-certified entries
    (registration order preserved within each tier)."""
    catalog = load_all()
    certified = _driver_certified()
    fresh = [n for n in catalog if n not in certified]
    recert = [n for n in catalog
              if n in certified and n in _REWRITTEN_SINCE_CERT]
    seen = [n for n in catalog
            if n in certified and n not in _REWRITTEN_SINCE_CERT]
    return fresh + recert + seen


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    catalog = load_all()
    return {name: catalog[name].fn for name in _ordered()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    catalog = load_all()
    return {name: catalog[name].oracle for name in _ordered() if catalog[name].oracle is not None}
