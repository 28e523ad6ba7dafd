"""Round-10 race #2: llm_quality_classifier scorer variants (round-9
verdict task 6 — "race a codegen scorer against the quality
classifier's kernel; 4.4× at 256×").

  shipped    md5-derived weight inside ONE transform lambda — the
             _token_weight expression references F.md5(tok) four times,
             and interpreted higher-order lambdas do NOT common-
             subexpression-eliminate, so md5 runs 4× per token.
  md5_once   chained transforms: t -> md5 array -> weight array. The
             SAME doubles (oracle-identical), md5 computed once per
             token. If this wins it ships as-is — no contract change.
  xxhash     the verdict's JVM-native challenger: slot =
             pmod(xxhash64(tok), 2001). Different weight table (DuckDB
             has no xxhash64 → would demote the entry to rows-only), so
             it ships only if it beats md5_once by enough to justify
             losing the oracle.

Usage: python tools/r10_races2.py <replica_dir> [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

from pyspark.sql import functions as F

from data_engineering_capstone_spark.functions.strings import tokens
from data_engineering_capstone_spark.session import get_spark
from data_engineering_capstone_spark.sources.testdata import load_table
from tools.scale_crossover import time_best


def _score_from_weights(weights_col, n):
    logit = F.aggregate(weights_col, F.lit(0.0), lambda acc, x: acc + x)
    z = F.when(n > 0, logit / F.sqrt(n.cast("double"))).otherwise(F.lit(0.0))
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def md5_x4(spark, sf_dir):
    """The PRE-round-10 shipped form: weight lambda references
    F.md5(tok) four times (kept here so the race stays reproducible —
    the catalog entry now ships the md5-once form)."""
    d = load_table(spark, sf_dir, "documents")
    t = tokens("text")
    n = F.size(t)

    def w(tok):
        m = F.md5(tok)

        def a(i):
            return F.ascii(F.substring(m, i, 1)).cast("long")

        h = ((a(1) * 31 + a(2)) * 31 + a(3)) * 31 + a(4)
        return (h % 2001 - F.lit(1000)) / F.lit(1000.0)

    weights = F.transform(t, w)
    return d.select(
        "doc_id", F.round(_score_from_weights(weights, n), 6).alias("quality_score")
    ).orderBy("doc_id")


def md5_once(spark, sf_dir):
    """md5 bound once per token via a chained transform."""
    d = load_table(spark, sf_dir, "documents")
    t = tokens("text")
    n = F.size(t)
    hashes = F.transform(t, F.md5)

    def w(m):
        def a(i):
            return F.ascii(F.substring(m, i, 1)).cast("long")

        h = ((a(1) * 31 + a(2)) * 31 + a(3)) * 31 + a(4)
        return (h % 2001 - F.lit(1000)) / F.lit(1000.0)

    weights = F.transform(hashes, w)
    return d.select(
        "doc_id", F.round(_score_from_weights(weights, n), 6).alias("quality_score")
    ).orderBy("doc_id")


def xxhash_form(spark, sf_dir):
    """JVM-native hash: pmod(xxhash64(tok), 2001) — different weight
    table, same workload shape."""
    d = load_table(spark, sf_dir, "documents")
    t = tokens("text")
    n = F.size(t)
    weights = F.transform(
        t, lambda tok: (F.pmod(F.xxhash64(tok), F.lit(2001)) - 1000) / F.lit(1000.0)
    )
    return d.select(
        "doc_id", F.round(_score_from_weights(weights, n), 6).alias("quality_score")
    ).orderBy("doc_id")


def main() -> int:
    replica = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("r10_races2")
    spark.sparkContext.setLogLevel("ERROR")
    from data_engineering_capstone_spark.catalog import load_all
    from tools.scale_crossover import duck_con

    catalog = load_all()
    spec = catalog["llm_quality_classifier"]
    con = duck_con(replica)

    def run(fn):
        fn(spark, replica).write.format("noop").mode("overwrite").save()

    variants = [
        ("shipped", spec.fn),
        ("md5_x4_old", md5_x4),
        ("md5_once", md5_once),
        ("xxhash", xxhash_form),
    ]
    times = {}
    for label, fn in variants:
        run(fn)
        times[label] = round(time_best(lambda: run(fn), reps), 3)
    t0 = time.time()
    con.execute(spec.oracle).fetchall()
    times["duckdb_oracle"] = round(time.time() - t0, 3)
    same = sorted(map(tuple, spec.fn(spark, replica).collect())) == sorted(
        map(tuple, md5_once(spark, replica).collect())
    )
    print(json.dumps({
        "race": "quality_classifier_kernels",
        "replica": replica,
        **times,
        "md5_once_identical_to_shipped": same,
    }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
