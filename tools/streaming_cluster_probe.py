"""Streaming state-store recovery across REAL executor JVMs.

The checkpoint-restart tests in tests/test_streaming.py prove stateful
recovery (applyInPandasWithState bucket state, count-min aggregation
state) on local[*] — one JVM, where the state store provider's files
are written and re-read by the same process. A real cluster breaks the
assumptions that mode can hide: state-store files are created by task
attempts on executor A in run 1 and must be loadable by a DIFFERENT
executor process in run 2 (a brand-new set of JVMs), with nothing in
the recovery path depending on driver-process state, python-worker
globals, or object identity.

This probe re-runs both restart scenarios on `local-cluster[2,4,2048]`
(two genuine executor JVMs, netty shuffle, per-executor python workers;
the master Spark's own streaming suite uses):

1. **applyInPandasWithState (streaming MinHash-LSH)** — run 1 drains
   batch1 through an explicit checkpoint and STOPS; run 2 is a new
   streaming query over newly arrived files resuming from the same
   checkpoint. The planted cross-run near-dup pair (its twin exists
   only in the recovered per-bucket state) must be emitted, and the
   full pair set must equal the uninterrupted sequential reference
   (`streaming/dedup.py:reference_pairs`).
2. **aggregation state (streaming count-min sketch)** — the counter
   table drained across a stop/resume over two file batches must be
   row-identical to the batch sketch over all events, proving the
   additive sketch state merged across the restart (mergeability =
   restartability, `operators/sketches.py`).

Prints one JSON line; exit 1 on any mismatch.

Usage:
  python tools/streaming_cluster_probe.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def probe_minhash_restart(spark, work: str) -> dict:
    from data_engineering_capstone_spark.streaming.dedup import (
        reference_pairs,
        streaming_minhash_pairs,
    )

    base = ("the quick brown fox jumps over the lazy dog while the cat "
            "sleeps on the warm mat near the open door tonight")
    near = base.replace("warm mat", "cold mat")
    batch1 = [(1, base), (2, "completely different text about spark engines")]
    batch2 = [(3, near), (4, "another unrelated page on parquet footers")]

    src, sink, ckpt = (os.path.join(work, d) for d in ("src", "sink", "ckpt"))
    os.makedirs(src)

    def drain():
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            streaming_minhash_pairs(stream, "text", "doc_id", threshold=0.35)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    spark.createDataFrame(batch1, "doc_id long, text string").coalesce(1) \
        .write.mode("append").parquet(src)
    drain()  # run 1: executor set A writes the bucket state, query stops
    spark.createDataFrame(batch2, "doc_id long, text string").coalesce(1) \
        .write.mode("append").parquet(src)
    drain()  # run 2: state recovered by a fresh micro-batch run

    got = {(r["id_a"], r["id_b"]) for r in spark.read.parquet(sink).collect()}
    want = reference_pairs(batch1 + batch2, threshold=0.35)
    assert (1, 3) in want, "fixture must plant a cross-run near-dup"
    return {"pairs_match": got == want, "cross_run_pair_emitted": (1, 3) in got,
            "n_pairs": len(got)}


def probe_count_min_restart(spark, work: str) -> dict:
    from pyspark.sql import functions as F

    from data_engineering_capstone_spark.operators.sketches import count_min_table
    from data_engineering_capstone_spark.sources.testdata import load_table
    from data_engineering_capstone_spark.streaming.windows import streaming_count_min

    events = load_table(spark, SF_DIR, "events").select("user_id")
    half_a = events.filter(F.col("user_id") % 2 == 0)
    half_b = events.filter(F.col("user_id") % 2 == 1)

    src, ckpt = (os.path.join(work, d) for d in ("cm_src", "cm_ckpt"))
    os.makedirs(src)

    collected: dict[int, list] = {}

    def drain(run: int):
        stream = spark.readStream.schema("user_id bigint").parquet(src)

        def grab(batch_df, _bid, _run=run):
            collected[_run] = batch_df.collect()

        q = (
            streaming_count_min(stream)
            .writeStream.foreachBatch(grab)
            .option("checkpointLocation", ckpt)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    half_a.coalesce(1).write.mode("append").parquet(src)
    drain(1)
    half_b.coalesce(1).write.mode("append").parquet(src)
    drain(2)  # resumed aggregation state must cover half_a + half_b

    final = {tuple(r) for r in collected[2]}
    batch = {tuple(r) for r in count_min_table(events, "user_id").collect()}
    return {"sketch_equals_batch": final == batch, "n_counters": len(final)}


def main() -> int:
    from data_engineering_capstone_spark.session import get_spark

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spark = get_spark(
        "stream_cluster_probe", master="local-cluster[2,4,2048]",
        shuffle_partitions=4,
        extra_conf={"spark.executor.memory": "2048m",
                    # state ops size their store partitions from this
                    "spark.sql.shuffle.partitions": "4",
                    # local[*] python workers inherit the repo via the
                    # driver CWD; real executor JVMs start in Spark's
                    # work dir, so the package must ride PYTHONPATH for
                    # by-reference-pickled kernels (streaming/dedup.py)
                    "spark.executorEnv.PYTHONPATH": repo},
    )
    spark.sparkContext.setLogLevel("ERROR")
    n_exec_incl_driver = None
    work = tempfile.mkdtemp(prefix="dec_spark_stream_cluster_")
    try:
        minhash = probe_minhash_restart(spark, work)
        count_min = probe_count_min_restart(spark, work)
        n_exec_incl_driver = (
            spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size()
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()
    ok = minhash["pairs_match"] and minhash["cross_run_pair_emitted"] \
        and count_min["sketch_equals_batch"] and (n_exec_incl_driver or 0) >= 3
    print(json.dumps({
        "probe": "streaming_cluster_restart",
        "master": "local-cluster[2,4,2048]",
        "executors_incl_driver": n_exec_incl_driver,
        "minhash_restart": minhash,
        "count_min_restart": count_min,
        "ok": ok,
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
