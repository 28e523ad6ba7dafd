"""Template-spam mega-bucket probe for MinHash-LSH banding (round-3
verdict task 5).

Failure mode under test: k byte-identical copies of one template page
produce IDENTICAL minhash signatures, hence identical band hashes in
every band — all k copies land in the same bucket of ALL num_bands
tables, and the (band_idx, band_hash) self-join emits ~num_bands * k^2/2
candidate rows before `distinct`. Banding bounds bucket sizes only for
DISTINCT texts; exact duplicates defeat it by construction.

Mitigation measured here: collapse exact-fingerprint groups to one
representative BEFORE the signature stage (`minhash_near_dups(...,
collapse_exact=True)`) — identical docs are duplicates by definition,
so no estimate is needed to pair them, and the mega-bucket shrinks to
one row per band. Group sizes ride along so callers can expand
membership.

Usage: python tools/template_spam_probe.py [copies] [sf_dir]
Prints one JSON line with candidate counts and wall times.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_engineering_capstone_spark.llm.dedup import (
    lsh_candidate_pairs,
    minhash_near_dups,
    minhash_signatures,
)
from data_engineering_capstone_spark.session import get_spark
from data_engineering_capstone_spark.sources.testdata import load_table


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    template = "breaking news subscribe to our newsletter for daily updates terms privacy contact copyright"
    spam = (
        spark.range(copies)
        .select(
            (F.col("id") + 10_000_000).alias("doc_id"),
            F.lit(template).alias("text"),
        )
    )
    corpus = base.unionByName(spam).repartition(32).localCheckpoint(eager=True)
    n_docs = corpus.count()

    out: dict = {"copies": copies, "n_docs": n_docs, "sf_dir": sf_dir}

    # uncollapsed candidate volume: count the raw bucket-join output
    # (pre-distinct) — this is the row count the shuffle must carry
    t0 = time.time()
    sigs = minhash_signatures(corpus, "text", "doc_id").localCheckpoint(eager=True)
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(15)),
                lambda b: F.hash(
                    F.slice(
                        F.col("signature"),
                        (b * (F.size("signature") / 16) + 1).cast("int"),
                        (F.size("signature") / 16).cast("int"),
                    )
                ),
            )
        ).alias("band_idx", "band_hash"),
    )
    a = banded.select(F.col("doc_id").alias("id_a"), "band_idx", "band_hash")
    b = banded.select(F.col("doc_id").alias("id_b"), "band_idx", "band_hash")
    raw_cands = (
        a.join(b, ["band_idx", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .count()
    )
    out["raw_candidates_uncollapsed"] = raw_cands
    out["sec_count_uncollapsed_raw"] = round(time.time() - t0, 2)

    t0 = time.time()
    cands_distinct = lsh_candidate_pairs(sigs, "doc_id").count()
    out["distinct_candidates_uncollapsed"] = cands_distinct
    out["sec_count_uncollapsed_distinct"] = round(time.time() - t0, 2)

    # collapsed path end-to-end
    t0 = time.time()
    collapsed = minhash_near_dups(
        corpus, "text", "doc_id", threshold=0.35, collapse_exact=True
    ).localCheckpoint(eager=True)
    out["pairs_collapsed"] = collapsed.count()
    out["sec_collapsed_end_to_end"] = round(time.time() - t0, 2)
    mega = collapsed.filter(F.col("n_a") + F.col("n_b") > copies).count()
    out["pairs_touching_template_group"] = mega

    # candidate volume after collapse (reps only)
    reps = corpus.withColumn(
        "__fp", F.md5(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")))
    )
    winners = reps.groupBy("__fp").agg(F.min("doc_id").alias("doc_id"))
    reps = reps.join(winners, ["doc_id", "__fp"], "left_semi").drop("__fp")
    sigs_r = minhash_signatures(reps, "text", "doc_id").localCheckpoint(eager=True)
    out["distinct_candidates_collapsed"] = lsh_candidate_pairs(sigs_r, "doc_id").count()

    print(json.dumps(out))


if __name__ == "__main__":
    main()
