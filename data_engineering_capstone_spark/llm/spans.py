"""Duplicated-span detection — exact substring dedup at token level.

The "exact substring deduplication" pass of training-data pipelines
(Lee et al. 2022, *Deduplicating Training Data Makes Language Models
Better*) finds verbatim runs of >= W tokens shared between documents.
The published single-node method builds a suffix array; the
distributable equivalent used here is W-gram seed matching + diagonal
merge, which finds exactly the same maximal duplicated spans:

1. every positioned W-token gram is hashed (two independent xxhash64
   longs of the space-joined gram, 128 bits total — the shuffle key
   never carries text),
2. an inverted-index self-join on the gram hash yields seed matches
   ``(id_a, id_b, pos_a, pos_b)``,
3. seed matches that continue each other lie on the same *diagonal*
   ``pos_a - pos_b``; a gaps-and-islands pass per (pair, diagonal)
   merges runs of consecutive seeds into maximal spans of length
   ``island_size + W - 1`` tokens.

Scale: the only shuffles are the gram-hash exchange and the per-pair
islands window — both partition on high-cardinality keys. Boilerplate
grams (site headers, license blocks) would quadratically inflate the
seed join, so grams seen in more than ``max_doc_freq`` documents are
dropped on both sides of the join — same hot-key guard as
``ngram_jaccard_pairs`` (reference surface: SURVEY.md §2 C-llm-dedup;
the reference itself has no span-level dedup — this is part of the
training-data extension tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.strings import tokens


def positioned_grams(
    df: DataFrame, text_col: str, id_col: str, w: int
) -> DataFrame:
    """(id, pos, h1, h2) for every positioned W-token gram.

    ``pos`` is 1-based token position of the gram start; the gram key
    is a PAIR of independent xxhash64 values of the space-joined gram
    (distinct literal folded FIRST so each lane has a distinct seed →
    128 independent bits total), so equality is exact gram equality
    at negligible collision probability while the shuffle key is 16
    bytes of longs instead of a 32-char md5 hex string. (Round 4: this
    replaced ``transform(sequence, i -> md5(array_join(slice(t,i,w))))``
    — the per-index slice allocation inside an interpreted lambda was
    the same shape the ngrams rewrite killed, and md5-of-string both
    costs more to compute and doubles the exchange width. Gram strings
    themselves are built by the zip_with fold in
    functions/strings.ngrams; hashing happens AFTER posexplode, on the
    codegen path.)
    """
    from ..functions.strings import ngrams

    g = ngrams(text_col, w)
    return (
        df.select(F.col(id_col).alias("__id"), g.alias("__g"))
        .where(F.size("__g") > 0)
        .select("__id", F.posexplode("__g").alias("__p0", "__gs"))
        # posexplode is 0-based; spans are reported 1-based like SQL arrays
        .select(
            "__id",
            (F.col("__p0") + 1).alias("__pos"),
            # the differentiating literal goes FIRST: xxhash64 folds its
            # arguments sequentially (each column hashed with the running
            # value as seed), so xxh(gram, 0) and xxh(gram, 1) would both
            # be pure functions of the single 64-bit xxh(gram) — two grams
            # colliding on that one value collide on BOTH columns, making
            # the effective key 64 bits. Folding the literal first
            # perturbs the seed BEFORE the gram is mixed in, so the two
            # lanes are genuinely independent 64-bit hashes.
            F.xxhash64(F.lit(0), "__gs").alias("__h1"),
            F.xxhash64(F.lit(1), "__gs").alias("__h2"),
        )
    )


def duplicate_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_tokens: int = 5,
    max_doc_freq: int = 1000,
) -> DataFrame:
    """Maximal duplicated token spans of length >= ``min_tokens`` between
    distinct documents.

    Returns one row per maximal span:
    ``(id_a, id_b, start_a, start_b, span_tokens)`` with ``id_a < id_b``
    and 1-based token start positions. A span is *maximal* on its
    diagonal: it cannot be extended with further matching grams on
    either side.
    """
    w = min_tokens
    # POSTINGS-LIST seed generation (round 4; same fusion as
    # ngram_jaccard_pairs): ONE groupBy on the 128-bit gram key
    # produces each gram's (doc, pos) occurrence list; the hot-gram
    # guard is an array filter on the list's distinct-doc count; seed
    # pairs are generated in-row by a double explode. This replaced a
    # localCheckpoint of the 16M-row gram table + a count_distinct
    # guard aggregate + a guard join + an a⋈b self-join — four extra
    # ~corpus-sized exchanges. Measured at 64× sf0.1 (320k docs, 16M
    # grams): llm_span_dedup_clean 111 s → 26 s Spark-side (with the
    # ngrams/xxhash rewrites above). Skew note: all occurrences of one
    # gram land in a single row here, but the JOIN form put them in a
    # single join partition anyway — the cap bounds both identically.
    g = positioned_grams(df, text_col, id_col, w)
    posts = g.groupBy("__h1", "__h2").agg(
        F.collect_list(F.struct("__id", "__pos")).alias("__ps")
    )
    posts = posts.where(
        F.size(F.array_distinct(F.transform("__ps", lambda x: x["__id"])))
        <= max_doc_freq
    )
    # NOTE (round 5): the post-cap repartition that fixed
    # ngram_jaccard_pairs was tried here and measured NEUTRAL-to-worse
    # (16.0 s vs 14.5 s at 64x): AQE leaves these postings at 8
    # partitions (16M mostly-df=1 gram rows — byte-heavy, unlike the
    # capped shingle index's ~1), so the extra exchange of the full
    # postings table outweighs the 8->32 parallelism gain. Measured,
    # not assumed — kept join-free and unrepartitioned.
    seeds = (
        posts.select(F.explode("__ps").alias("__a"), "__ps")
        .select(
            F.col("__a.__id").alias("id_a"),
            F.col("__a.__pos").alias("pos_a"),
            F.explode("__ps").alias("__b"),
        )
        .where(F.col("id_a") < F.col("__b.__id"))
        .select(
            "id_a",
            "pos_a",
            F.col("__b.__id").alias("id_b"),
            F.col("__b.__pos").alias("pos_b"),
        )
    )

    # diagonal merge: consecutive seeds on one diagonal form an island.
    # (id_a, id_b, diag, pos_a) is unique, so pos_a - row_number() is the
    # standard islands group key.
    diag = (F.col("pos_a") - F.col("pos_b")).alias("__diag")
    win = Window.partitionBy("id_a", "id_b", "__diag").orderBy("pos_a")
    islands = (
        seeds.select("id_a", "id_b", diag, "pos_a", "pos_b")
        .withColumn("__grp", F.col("pos_a") - F.row_number().over(win))
    )
    return (
        islands.groupBy("id_a", "id_b", "__diag", "__grp")
        .agg(
            F.min("pos_a").alias("start_a"),
            F.min("pos_b").alias("start_b"),
            (F.count(F.lit(1)) + F.lit(w - 1)).alias("span_tokens"),
        )
        .select("id_a", "id_b", "start_a", "start_b", "span_tokens")
    )


def duplicate_span_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_tokens: int = 5,
    max_doc_freq: int = 1000,
) -> DataFrame:
    """Per-pair rollup of :func:`duplicate_spans`:
    ``(id_a, id_b, n_spans, max_span_tokens, dup_tokens)`` where
    ``dup_tokens`` sums span lengths over maximal spans (overlapping
    spans on different diagonals each count — it is a *duplication
    mass* measure, not a distinct-token count)."""
    spans = duplicate_spans(df, text_col, id_col, min_tokens, max_doc_freq)
    return spans.groupBy("id_a", "id_b").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.max("span_tokens").alias("max_span_tokens"),
        F.sum("span_tokens").alias("dup_tokens"),
    )


def _cut_spans(
    df: DataFrame,
    per_doc: DataFrame,
    text_col: str,
    id_col: str,
    flag_name: str,
) -> DataFrame:
    """Rebuild each document's text with span-covered tokens removed.

    ``per_doc`` is ``(__sid, __spans: array<struct<s,n>>)`` — one row
    per affected document, spans as 1-based (start, token-count)
    structs. Per-doc span lists are dimension-shaped (bounded by dup
    mass); tokens are dropped via an index-aware higher-order filter —
    the document table itself never shuffles (the only exchanges are
    inside span detection and the per-doc span-list aggregate).
    Returns every document with ``text`` rebuilt from kept tokens
    (whitespace-normalized), ``n_tokens_removed``, and a boolean
    ``flag_name`` marking affected docs.
    """
    t = tokens(text_col)
    joined = df.join(per_doc, F.col(id_col) == F.col("__sid"), "left")
    # keep token at 1-based position p unless a span of this doc covers p
    covered = lambda p: F.exists(  # noqa: E731
        F.col("__spans"), lambda sp: (p >= sp["s"]) & (p < sp["s"] + sp["n"])
    )
    kept = F.filter(
        F.zip_with(t, F.sequence(F.lit(1), F.size(t)), lambda tok, p: F.struct(
            tok.alias("tok"), p.alias("p"))),
        lambda z: ~covered(z["p"]),
    )
    n_toks = F.size(t)
    return joined.select(
        F.col(id_col),
        F.when(F.col("__spans").isNull(), F.array_join(t, " "))
        .otherwise(F.array_join(F.transform(kept, lambda z: z["tok"]), " "))
        .alias("text"),
        F.when(F.col("__spans").isNull(), F.lit(0))
        .otherwise(n_toks - F.size(kept))
        .cast("bigint")
        .alias("n_tokens_removed"),
        F.col("__spans").isNotNull().alias(flag_name),
    )


def remove_duplicate_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_tokens: int = 5,
    max_doc_freq: int = 1000,
) -> DataFrame:
    """Cut duplicated spans out of the corpus (the removal half of
    exact substring dedup, Lee et al. 2022 §4): for every maximal
    shared span the copy in the HIGHER-id document is deleted, keeping
    the first occurrence canonical. See :func:`_cut_spans` for the
    shuffle-free removal plan.
    """
    spans = duplicate_spans(df, text_col, id_col, min_tokens, max_doc_freq)
    per_doc = (
        spans.groupBy("id_b")
        .agg(
            F.collect_list(
                F.struct(F.col("start_b").alias("s"), F.col("span_tokens").alias("n"))
            ).alias("__spans")
        )
        .select(F.col("id_b").alias("__sid"), "__spans")
    )
    return _cut_spans(df, per_doc, text_col, id_col, "was_deduped")


def contamination_spans(
    corpus: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    min_tokens: int = 5,
) -> DataFrame:
    """Maximal corpus spans of >= ``min_tokens`` tokens that appear
    verbatim anywhere in the benchmark set: ``(id, start, span_tokens)``.

    The benchmark side collapses to its DISTINCT gram-hash set, so the
    probe is a bounded semi-join — each corpus gram occurrence matches
    at most one benchmark gram row, the join output is <= the corpus
    gram count, and NO df cap is needed (contrast with the pair-
    generating joins, which are quadratic per hot key). Matched
    positions merge into maximal spans with the per-doc gaps-and-
    islands pass (no diagonal here: coverage is per corpus doc).
    """
    w = min_tokens
    g = positioned_grams(corpus, text_col, id_col, w)
    bg = positioned_grams(bench, text_col, id_col, w).select("__h1", "__h2").distinct()
    hits = g.join(bg, ["__h1", "__h2"]).select("__id", "__pos")
    win = Window.partitionBy("__id").orderBy("__pos")
    isl = hits.withColumn("__grp", F.col("__pos") - F.row_number().over(win))
    return (
        isl.groupBy("__id", "__grp")
        .agg(
            F.min("__pos").alias("start"),
            (F.count(F.lit(1)) + F.lit(w - 1)).alias("span_tokens"),
        )
        .select(F.col("__id").alias(id_col), "start", "span_tokens")
    )


def remove_contamination_spans(
    corpus: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    min_tokens: int = 5,
) -> DataFrame:
    """SURGICAL decontamination: cut benchmark-overlapping spans out of
    corpus documents instead of dropping the whole document (the
    document-drop form is ``llm/curation.decontaminate``). Keeps the
    uncontaminated majority of a page that merely quotes a benchmark
    item — the high-recall/low-collateral variant of test-set scrubbing.
    Returns every corpus document with ``text`` rebuilt,
    ``n_tokens_removed``, and ``was_decontaminated``.
    """
    spans = contamination_spans(corpus, bench, text_col, id_col, min_tokens)
    per_doc = (
        spans.groupBy(id_col)
        .agg(
            F.collect_list(
                F.struct(F.col("start").alias("s"), F.col("span_tokens").alias("n"))
            ).alias("__spans")
        )
        .select(F.col(id_col).alias("__sid"), "__spans")
    )
    return _cut_spans(corpus, per_doc, text_col, id_col, "was_decontaminated")
