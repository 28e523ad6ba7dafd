"""Duplicated-span detection — exact substring dedup at token level.

The "exact substring deduplication" pass of training-data pipelines
(Lee et al. 2022, *Deduplicating Training Data Makes Language Models
Better*) finds verbatim runs of >= W tokens shared between documents.
The published single-node method builds a suffix array; the
distributable equivalent used here is W-gram seed matching + diagonal
merge, which finds exactly the same maximal duplicated spans:

1. every positioned W-token gram is hashed (16-byte md5 of the
   space-joined gram — the shuffle key never carries text),
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
    """(id, pos, gram_hash) for every positioned W-token gram.

    ``pos`` is 1-based token position of the gram start; the gram hash
    is md5 of the space-joined tokens, so equality is exact gram
    equality (collision probability negligible at 128 bits).
    """
    t = tokens(text_col)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(t) - F.lit(w - 1)),
        lambda i: F.md5(F.array_join(F.slice(t, i, w), " ")),
    )
    # guard: sequence(1, size-w+1) DESCENDS for docs shorter than w
    # tokens and slice(t, 0, w) then errors — short docs have no grams
    grams = F.when(F.size(t) >= w, grams).otherwise(
        F.array().cast("array<string>")
    )
    return (
        df.select(F.col(id_col).alias("__id"), grams.alias("__g"))
        .where(F.size("__g") > 0)
        .select("__id", F.posexplode("__g").alias("__p0", "__h"))
        # posexplode is 0-based; spans are reported 1-based like SQL arrays
        .select("__id", (F.col("__p0") + 1).alias("__pos"), "__h")
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
    # Materialize the gram table ONCE and truncate lineage: it feeds the
    # doc-frequency guard AND both sides of the seed self-join — left
    # inline, Catalyst re-executes the tokenize+md5 explode subtree per
    # consumer (measured 22.3 s vs 2.5 s at sf0.1; same discipline as
    # minhash_signatures). One (id, pos, 16-byte hash) row per gram ≈
    # token count of the corpus — the cheapest barrier in the pipeline.
    g = positioned_grams(df, text_col, id_col, w).localCheckpoint()

    # hot-gram guard: drop grams appearing in > max_doc_freq docs
    df_ok = (
        g.groupBy("__h")
        .agg(F.count_distinct("__id").alias("__df"))
        .where(F.col("__df") <= max_doc_freq)
        .select("__h")
    )
    g = g.join(df_ok, "__h")

    a = g.select(
        F.col("__h"),
        F.col("__id").alias("id_a"),
        F.col("__pos").alias("pos_a"),
    )
    b = g.select(
        F.col("__h"),
        F.col("__id").alias("id_b"),
        F.col("__pos").alias("pos_b"),
    )
    seeds = a.join(b, "__h").where(F.col("id_a") < F.col("id_b"))

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
    the first occurrence canonical.

    Per-doc span lists are dimension-shaped (collect_list of (start,
    len) structs, bounded by dup mass); tokens are dropped via an
    index-aware higher-order filter — the document table itself never
    shuffles (the only exchanges are inside span detection and the
    per-doc span-list aggregate). Returns every document with
    ``text`` rebuilt from kept tokens (whitespace-normalized),
    ``n_tokens_removed``, and ``was_deduped``.
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
        F.col("__spans").isNotNull().alias("was_deduped"),
    )
