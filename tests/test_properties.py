"""Property-based tests (hypothesis) — SURVEY.md §5's strategy upgrade
over the reference's absent tests.

Spark-backed properties run few examples (each is a distributed job);
pure-Python properties (the SAS parser) run the full default budget.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_engineering_capstone_spark.etl.sas_labels import parse_sas_value_maps
from data_engineering_capstone_spark.operators.asof import asof_join
from data_engineering_capstone_spark.operators.skew import salted_aggregate

# ---------------------------------------------------------------------------
# SAS proc-format parser: render → parse round trip (pure Python)
# ---------------------------------------------------------------------------

code_st = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Nd")), min_size=1, max_size=8
)
label_st = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"), whitelist_characters=" ,-"),
    min_size=1,
    max_size=30,
).map(str.strip).filter(bool)


@given(
    st.dictionaries(
        st.text(alphabet="abcdefghij", min_size=3, max_size=8),
        st.dictionaries(code_st, label_st, min_size=1, max_size=20),
        min_size=1,
        max_size=5,
    )
)
@settings(max_examples=50)
def test_sas_parser_roundtrip(maps):
    text = ""
    for name, entries in maps.items():
        text += f"value ${name}\n"
        for code, label in entries.items():
            text += f"   '{code}' = '{label}'\n"
        text += ";\n"
    parsed = parse_sas_value_maps(text)
    assert parsed == {k: v for k, v in maps.items()}


# ---------------------------------------------------------------------------
# As-of join ≡ pandas merge_asof on arbitrary event sets (Spark-backed)
# ---------------------------------------------------------------------------

events_st = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),          # key
        st.integers(min_value=0, max_value=100),   # ts
    ),
    min_size=1,
    max_size=25,
)


@pytest.mark.usefixtures("spark")
@given(left_rows=events_st, right_rows=events_st)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_asof_matches_merge_asof_property(spark, left_rows, right_rows):
    # duplicate (key, rts) pairs have an ENGINE-ARBITRARY winner in every
    # as-of implementation (ours, merge_asof, DuckDB) — the property holds
    # on the well-defined domain of unique right timestamps per key
    right_rows = list({(k, t): None for (k, t) in right_rows}.keys())
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left_rows)], "k string, ts long, lid long"
    )
    right = spark.createDataFrame(
        [(k, t, float(i)) for i, (k, t) in enumerate(right_rows)], "k string, rts long, val double"
    )
    got = {
        r["lid"]: r["val"]
        for r in asof_join(left, right, on="k", left_ts="ts", right_ts="rts", right_cols=["val"]).collect()
    }
    lpdf = pd.DataFrame([(k, t, i) for i, (k, t) in enumerate(left_rows)], columns=["k", "ts", "lid"]).sort_values(["ts", "lid"])
    rpdf = pd.DataFrame([(k, t, float(i)) for i, (k, t) in enumerate(right_rows)], columns=["k", "rts", "val"]).sort_values(["rts", "val"])
    want = pd.merge_asof(lpdf, rpdf, left_on="ts", right_on="rts", by="k", direction="backward")
    want_map = {int(r.lid): (None if pd.isna(r.val) else float(r.val)) for r in want.itertuples()}
    assert got == want_map


# ---------------------------------------------------------------------------
# Salted aggregation ≡ plain aggregation for any bucket count
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("spark")
@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["x", "y"]), st.integers(-1000, 1000)),
        min_size=1,
        max_size=30,
    ),
    buckets=st.integers(min_value=1, max_value=7),
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_salted_agg_property(spark, rows, buckets):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "k string, v long")
    plain = {
        r["k"]: (r["n"], r["mn"], r["mx"])
        for r in df.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.min("v").alias("mn"), F.max("v").alias("mx")
        ).collect()
    }
    salted = {
        r["k"]: (r["n"], r["mn"], r["mx"])
        for r in salted_aggregate(
            df, ["k"], {"n": ("count", "v"), "mn": ("min", "v"), "mx": ("max", "v")}, buckets=buckets
        ).collect()
    }
    assert plain == salted


# ---------------------------------------------------------------------------
# SCD2 invariants under arbitrary change batches (Spark-backed)
# ---------------------------------------------------------------------------

changes_st = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),            # key
        st.sampled_from(["s1", "s2", "s3"]),              # new segment
        st.integers(min_value=1, max_value=360),          # change day offset
    ),
    min_size=1,
    max_size=10,
).filter(
    # distinct change_ts per key: ties are documented as arbitrary-order
    lambda rows: all(
        len({t for k2, _, t in rows if k2 == k}) == len([1 for k2, _, _ in rows if k2 == k])
        for k in {k for k, _, _ in rows}
    )
)


@given(changes_st)
@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_scd2_invariants(spark, change_rows):
    """For ANY batch of dated changes: exactly one current row per key,
    closed versions chain contiguously (valid_to == next valid_from),
    and history row count == current + changes."""
    import datetime as dt

    from pyspark.sql import functions as F

    from data_engineering_capstone_spark.operators.merge import scd2_apply

    base = dt.date(2024, 1, 1)
    current = spark.createDataFrame(
        [(k, "orig", dt.date(2020, 1, 1), None, True) for k in (1, 2, 3, 4)],
        "k long, seg string, valid_from date, valid_to date, is_current boolean",
    )
    changes = spark.createDataFrame(
        [(k, s, base + dt.timedelta(days=d)) for k, s, d in change_rows],
        "k long, seg string, chg date",
    )
    out = scd2_apply(current, changes, ["k"], "chg").collect()
    assert len(out) == 4 + len(change_rows)
    by_key: dict[int, list] = {}
    for r in out:
        by_key.setdefault(r["k"], []).append(r)
    changed_keys = {k for k, _, _ in change_rows}
    for k, rows in by_key.items():
        currents = [r for r in rows if r["is_current"]]
        assert len(currents) == 1
        assert (currents[0]["valid_to"] is None)
        if k in changed_keys:
            # versions chain: sort by valid_from; each closes at the next's start
            rows.sort(key=lambda r: r["valid_from"])
            for a, b in zip(rows, rows[1:]):
                assert a["valid_to"] == b["valid_from"]
        else:
            assert currents[0]["seg"] == "orig"


# ---------------------------------------------------------------------------
# Two-phase global prefix sum == sequential cumsum (any sizes, any buckets)
# ---------------------------------------------------------------------------


@given(
    vals=st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=60),
    bucket_size=st.integers(min_value=1, max_value=16),
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_prefix_sum_property(spark, vals, bucket_size):
    from data_engineering_capstone_spark.operators.prefix import global_running_sum

    # non-contiguous keys exercise bucket-boundary alignment
    rows = [(i * 7 + 3, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k long, v long").repartition(5)
    got = {
        r["k"]: r["rs"]
        for r in global_running_sum(df, "k", "v", out_col="rs", bucket_size=bucket_size).collect()
    }
    acc = 0
    for i, v in enumerate(vals):
        acc += v
        assert got[i * 7 + 3] == acc


# ---------------------------------------------------------------------------
# Gap sessionization == sequential per-user scan (any gaps, any ordering)
# ---------------------------------------------------------------------------


@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),       # user
            st.integers(min_value=0, max_value=10_000),  # offset seconds
        ),
        min_size=1,
        max_size=60,
    ),
    gap_s=st.integers(min_value=1, max_value=600),
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_sessionize_matches_sequential_property(spark, evs, gap_s):
    import datetime as dt

    from data_engineering_capstone_spark.operators.timeseries import sessionize

    base = dt.datetime(2024, 1, 1)
    rows = [
        (u, base + dt.timedelta(seconds=off), i)
        for i, (u, off) in enumerate(evs)
    ]
    df = spark.createDataFrame(
        rows, "user_id int, ts timestamp, event_id int"
    ).repartition(4)
    got = {
        r["event_id"]: r["session_id"]
        for r in sessionize(df, "user_id", "ts", gap_s, order_cols=["event_id"]).collect()
    }

    # sequential reference: sort each user's events by (ts, event_id)
    from collections import defaultdict

    by_user = defaultdict(list)
    for u, ts, eid in rows:
        by_user[u].append((ts, eid))
    for u, lst in by_user.items():
        lst.sort()
        sid, prev = 0, None
        for ts, eid in lst:
            if prev is None or (ts - prev).total_seconds() > gap_s:
                sid += 1
            prev = ts
            assert got[eid] == sid, (u, eid, got[eid], sid)


# ---------------------------------------------------------------------------
# Duplicated-span detection vs a sequential brute-force reference
# ---------------------------------------------------------------------------

def _brute_spans(docs: dict[int, list[str]], w: int):
    """All maximal shared runs of >= w tokens between distinct docs:
    per (pair, diagonal), extend greedy matches — O(n^2 * len^2), fine
    for the tiny property inputs."""
    out = set()
    ids = sorted(docs)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = docs[ids[ai]], docs[ids[bi]]
            for diag in range(-(len(b) - 1), len(a)):
                i = max(0, diag)
                j = i - diag
                run = 0
                start = None
                while i <= len(a) and j <= len(b):
                    if i < len(a) and j < len(b) and a[i] == b[j]:
                        if run == 0:
                            start = (i, j)
                        run += 1
                    else:
                        if run >= w:
                            out.add((ids[ai], ids[bi], start[0] + 1, start[1] + 1, run))
                        run = 0
                    i += 1
                    j += 1
    return out


@given(
    st.lists(
        st.lists(st.sampled_from("abcde"), min_size=1, max_size=14),
        min_size=2,
        max_size=4,
    ),
    st.integers(min_value=2, max_value=4),
)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_duplicate_spans_match_bruteforce(spark, token_lists, w):
    from data_engineering_capstone_spark.llm.spans import duplicate_spans

    docs = {i: toks for i, toks in enumerate(token_lists)}
    rows = [(i, " ".join(toks)) for i, toks in docs.items()]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b, r.start_a, r.start_b, r.span_tokens)
        for r in duplicate_spans(df, "text", "doc_id", min_tokens=w).collect()
    }
    assert got == _brute_spans(docs, w)


# -- ngrams (round-5 regex rewrite): property-pinned against the
#    definitional pure-Python form ------------------------------------

texts_st = st.lists(
    st.text(
        alphabet=st.sampled_from("ab \t\né中."),
        max_size=40,
    ),
    min_size=1,
    max_size=8,
)


@given(texts=texts_st, n=st.integers(min_value=1, max_value=4))
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_ngrams_regex_matches_reference(spark, texts, n):
    """ngrams() is one JVM regex pass (round 5); its contract is the
    definitional form: split on whitespace runs, drop empties, join
    every n consecutive tokens with a single space; NULL -> NULL,
    fewer-than-n tokens -> []. Pinned over adversarial inputs
    (unicode, tabs/newlines, leading/trailing runs, empty strings)."""
    from data_engineering_capstone_spark.functions.strings import ngrams

    def ref(t, n):
        if t is None:
            return None
        toks = [x for x in t.split() if x]
        return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]

    rows = [(i, t) for i, t in enumerate(texts)] + [(len(texts), None)]
    df = spark.createDataFrame(rows, "i long, t string")
    got = {
        r["i"]: r["g"]
        for r in df.select("i", ngrams("t", n).alias("g")).collect()
    }
    for i, t in rows:
        assert got[i] == ref(t, n), (t, n, got[i], ref(t, n))


# ---------------------------------------------------------------------------
# Drift family: PSI identity/positivity, CUSUM planted-shift recovery
# ---------------------------------------------------------------------------


def test_psi_identical_distribution_is_zero_and_shift_positive(spark):
    """PSI axioms, independent of any oracle: (a) a slice whose ref and
    cur periods carry the IDENTICAL value multiset scores psi_total ==
    0.0 exactly (every bucket has p_cur == p_ref, each decimal term is
    exactly 0); (b) a shifted current period scores strictly positive
    (PSI is a symmetrized KL — nonnegative, 0 iff identical)."""
    import pyspark.sql.functions as F

    from data_engineering_capstone_spark.queries_etl import _psi_report

    vals = list(range(1, 2001))
    same = spark.createDataFrame(
        [(v, True) for v in vals] + [(v, False) for v in vals], "c long, is_ref boolean"
    )
    bounds = same.where("is_ref").agg(
        F.percentile("c", F.lit([i / 10 for i in range(1, 10)])).alias("bs")
    )
    rows = _psi_report(same, bounds).collect()
    assert all(r["psi_total"] == 0.0 for r in rows)
    assert all(r["psi_term"] == 0.0 for r in rows)
    assert all(r["n_ref"] == r["n_cur"] for r in rows)

    shifted = spark.createDataFrame(
        [(v, True) for v in vals] + [(v + 1500, False) for v in vals],
        "c long, is_ref boolean",
    )
    b2 = shifted.where("is_ref").agg(
        F.percentile("c", F.lit([i / 10 for i in range(1, 10)])).alias("bs")
    )
    rows2 = _psi_report(shifted, b2).collect()
    assert rows2[0]["psi_total"] > 0.25  # well past the drift threshold


def test_cusum_recovers_planted_level_shift(spark):
    """CUSUM semantics pinned on a synthetic series: a flat daily series
    with a single level shift at day k has |n*cumsum_t - t*total|
    maximized exactly at t = k-1 (the last pre-shift day) — the entry's
    top-1 must be that day. Verified against a brute-force numpy argmax
    of the same statistic."""
    import numpy as np

    import pyspark.sql.functions as F
    from pyspark.sql import Window

    # 40 days at 100, then 20 days at 300 — shift after day 40
    xs = [100] * 40 + [300] * 20
    n = len(xs)
    cum = np.cumsum(xs, dtype=np.int64)
    tot = int(cum[-1])
    d_stat = n * cum - np.arange(1, n + 1, dtype=np.int64) * tot
    expect_idx = int(np.abs(d_stat).argmax())  # 0-based day index

    df = spark.createDataFrame(
        [(f"2024-01-{i+1:02d}" if i < 31 else f"2024-02-{i-30:02d}", int(x))
         for i, x in enumerate(xs)],
        "d string, x long",
    ).select(F.to_date("d").alias("d"), "x")
    wo = Window.orderBy("d")
    wall = Window.partitionBy()
    seq = df.select(
        "d", "x",
        F.row_number().over(wo).alias("t"),
        F.sum("x").over(wo.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("x").over(wall).alias("tot"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    dstat = (
        F.col("n").cast("decimal(38,0)") * F.col("cum")
        - F.col("t").cast("decimal(38,0)") * F.col("tot")
    )
    top = (
        seq.select("d", "t", dstat.alias("ds"))
        .orderBy(F.abs(F.col("ds")).desc(), "d")
        .limit(1)
        .collect()[0]
    )
    assert top["t"] - 1 == expect_idx
    assert int(top["ds"]) == int(d_stat[expect_idx])


def test_zipf_fit_recovers_synthetic_power_law(spark, tmp_path):
    """Zipf regression pinned on a synthetic exact power law: a corpus
    whose term frequencies are c_r = round(C / r) must fit slope ~ -1
    with r2 ~ 1. Builds a documents table whose token counts realize
    those frequencies and runs the actual catalog entry against it."""
    import pyspark.sql.functions as F

    from data_engineering_capstone_spark.queries_llm import llm_zipf_fit

    # 200 terms, c_r = round(4000 / r): term t001 appears 4000 times...
    docs = []
    doc_id = 0
    for r in range(1, 201):
        c = round(4000 / r)
        # pack each term's occurrences into docs of <=500 tokens
        while c > 0:
            take = min(c, 500)
            docs.append((doc_id, " ".join([f"t{r:03d}"] * take), "en", "syn", take))
            doc_id += 1
            c -= take
    d = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(d)
    row = llm_zipf_fit(spark, str(tmp_path)).collect()[0]
    assert row["n_terms"] == 200
    assert abs(row["zipf_slope"] + 1.0) < 0.02, row
    assert row["r2"] > 0.999, row


def test_embedding_drift_identity_and_direction(spark, tmp_path):
    """Embedding-drift axioms: when every group's vectors are drawn as
    copies of the same vector, each group's mean IS the corpus mean —
    cos_to_corpus == 1.0 and norm_ratio == 1.0 exactly; a group pointing
    elsewhere scores strictly lower cosine."""
    from data_engineering_capstone_spark.queries_llm import llm_embedding_drift

    base = [1.0, 2.0, 3.0, 4.0]
    rows = [(i, base, i % 3) for i in range(30)]
    p = str(tmp_path / "embeddings.parquet")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(p)
    out = {r["label"]: r for r in llm_embedding_drift(spark, str(tmp_path)).collect()}
    assert set(out) == {0, 1, 2}
    for r in out.values():
        assert r["cos_to_corpus"] == 1.0 and r["norm_ratio"] == 1.0, r

    rows2 = [(i, base, 0) for i in range(20)] + [
        (100 + i, [4.0, -3.0, 2.0, -1.0], 1) for i in range(10)
    ]
    p2 = tmp_path / "two"
    p2.mkdir()
    spark.createDataFrame(
        rows2, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(str(p2 / "embeddings.parquet"))
    out2 = {r["label"]: r for r in llm_embedding_drift(spark, str(p2)).collect()}
    assert out2[1]["cos_to_corpus"] < out2[0]["cos_to_corpus"]
    assert out2[1]["cos_to_corpus"] < 0.9


# ---------------------------------------------------------------------------
# Retrieval family: oracle-independent axioms (round-5 verdict task 8).
# BM25/RRF/DSIR have oracle parity; these pin the SEMANTICS — monotonicity,
# rank-fusion arithmetic, importance-weight sign — on planted corpora where
# the right answer is derivable by hand, so an oracle that drifted in
# lockstep with the implementation could not hide a scoring inversion.
# ---------------------------------------------------------------------------


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def test_bm25_tf_monotonic_and_idf_direction(spark, tmp_path):
    """BM25 axioms on a fixed-length planted corpus (every doc exactly
    20 tokens, so dl == avgdl and the length normalizer is constant):
    (1) with df fixed, score is strictly increasing in tf — docs with
    1..5 'spark' occurrences must rank in tf order; (2) with tf and dl
    fixed, the rarer term outscores the common one — the single
    'query' doc (df=1) must beat every 'batch' doc (df=8) and, with
    these counts, top the whole ranking."""
    from data_engineering_capstone_spark.queries_llm import llm_bm25_search

    def doc(i, toks):
        text = " ".join(toks)
        return (i, text, "en", "src0", len(text))

    rows = []
    for i in range(1, 6):  # tf ladder: i of 'spark', padded to 20 tokens
        rows.append(doc(i, ["spark"] * i + ["xx"] * (20 - i)))
    rows.append(doc(10, ["query"] + ["xx"] * 19))  # rare term, df=1
    for i in range(11, 19):  # common term, df=8
        rows.append(doc(i, ["batch"] + ["xx"] * 19))
    for i in range(20, 25):  # no query terms: shape n_docs/avgdl only
        rows.append(doc(i, ["xx"] * 20))
    _write_docs(spark, tmp_path, rows)

    out = llm_bm25_search(spark, str(tmp_path)).collect()
    score = {r["doc_id"]: r["bm25"] for r in out}
    # (1) tf monotonicity at fixed df/dl
    assert score[1] < score[2] < score[3] < score[4] < score[5], score
    # (2) IDF direction: rare 'query' doc beats every 'batch' doc and
    # is the global top-1 (idf ratio dominates the tf=5 saturation)
    assert out[0]["doc_id"] == 10, out
    batch_scores = [v for k, v in score.items() if 11 <= k <= 18]
    assert batch_scores and max(batch_scores) < score[10]
    # saturation sanity: tf=5 gains less over tf=4 than tf=2 over tf=1
    assert (score[5] - score[4]) < (score[2] - score[1])


def test_hybrid_rrf_fusion_arithmetic(spark, tmp_path):
    """RRF invariants on a planted corpus where doc 7 is rank-1 in BOTH
    rankers (highest 'spark' tf lexically; embedding colinear with the
    query vector densely): it must be the fused top-1 with exactly
    rrf = round(2/61, 6); every returned row's rrf must equal the
    1/(60+r) formula recomputed from its own returned ranks; and the
    output must be sorted by (rrf desc, doc_id)."""
    from data_engineering_capstone_spark.queries_llm import llm_hybrid_rrf_search

    rows = []
    for i in range(1, 21):
        tf = 10 if i == 7 else (i % 3)  # doc 7 clear lexical winner
        toks = ["spark"] * tf + ["xx"] * (20 - tf)
        text = " ".join(toks)
        rows.append((i, text, "en", "src0", len(text)))
    _write_docs(spark, tmp_path, rows)

    # vec 0 is the query; vec 7 colinear (cos=1); others strictly lower
    emb = [(0, [1.0, 0.0, 0.0, 0.0], 0)]
    for i in range(1, 21):
        if i == 7:
            v = [2.0, 0.0, 0.0, 0.0]
        else:
            v = [1.0, 0.5 + 0.02 * i, 0.0, 0.0]
        emb.append((i, v, 0))
    spark.createDataFrame(
        emb, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    out = llm_hybrid_rrf_search(spark, str(tmp_path)).collect()
    assert out, "no fused results"
    top = out[0]
    assert top["doc_id"] == 7 and top["r_bm25"] == 1 and top["r_dense"] == 1, top
    assert top["rrf"] == round(2.0 / 61.0, 6)
    for r in out:
        expect = round(
            (1.0 / (60 + r["r_bm25"]) if r["r_bm25"] is not None else 0.0)
            + (1.0 / (60 + r["r_dense"]) if r["r_dense"] is not None else 0.0),
            6,
        )
        assert r["rrf"] == expect, r
    keys = [(-r["rrf"], r["doc_id"]) for r in out]
    assert keys == sorted(keys), out


def test_dsir_weights_sign_on_planted_split(spark, tmp_path):
    """DSIR sign axiom on a planted target/raw split: target docs
    (source='src0') are pure 'aa' bigrams, raw-only docs pure 'bb'
    bigrams, and the two bigrams hash to distinct buckets (13 vs 39,
    asserted here with the same md5-prefix rule the kernel uses) — so
    target-domain docs must score strictly positive importance weight,
    off-domain docs strictly negative, and every target doc must carry
    the selected=1 flag (they are exactly the top half)."""
    import hashlib

    from data_engineering_capstone_spark.queries_llm import llm_dsir_weights

    bucket = lambda g: int(hashlib.md5(g.encode()).hexdigest()[:4], 16) % 64
    assert bucket("aa aa") != bucket("bb bb")  # pre-condition of the plant

    rows = []
    for i in range(5):  # target: 10 'aa' tokens -> 9 'aa aa' bigrams
        text = " ".join(["aa"] * 10)
        rows.append((i, text, "en", "src0", len(text)))
    for i in range(5, 10):  # raw-only: distinct lengths, disjoint bigrams
        text = " ".join(["bb"] * (6 + 2 * (i - 5)))
        rows.append((i, text, "en", "src1", len(text)))
    _write_docs(spark, tmp_path, rows)

    out = {r["doc_id"]: r for r in llm_dsir_weights(spark, str(tmp_path)).collect()}
    assert set(out) == set(range(10))
    target_w = [out[i]["w"] for i in range(5)]
    raw_w = [out[i]["w"] for i in range(5, 10)]
    assert min(target_w) > 0 > max(raw_w), (target_w, raw_w)
    assert all(out[i]["selected"] == 1 for i in range(5)), out
