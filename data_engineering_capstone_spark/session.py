"""SparkSession factory with scale-aware defaults.

The reference creates its session implicitly through Livy on an ephemeral
EMR cluster (reference: dags/libs/lib.py:135-145, dags/libs/lib.py:52-96).
Here the session is an in-process ``SparkSession`` and every cluster-level
concern becomes a Spark conf:

* AQE on: runtime partition coalescing + skew-join splitting replaces any
  hand-tuned partition counts at 100 TB.
* ``spark.sql.shuffle.partitions`` defaults to the local core count for
  tests; on a real cluster set it ~2-3x total executor cores (or rely on
  AQE's coalescing with a high initial value).
* UTC session timezone so timestamp semantics match ANSI-SQL oracles.
* Arrow enabled so Pandas-UDF operators (LLM tier) use vectorized transfer.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "data_engineering_capstone_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 4)
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Respect advisoryPartitionSizeInBytes when coalescing instead of
        # preserving parallelism — the tuning-guide recommendation: small
        # shuffles collapse to few tasks (measured ~11% off the headline
        # set locally), large ones still split by size.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def prep(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to a session we did not create.

    The verification driver hands us its own SparkSession; pin the
    semantics that affect answer correctness (timezone, ANSI off is
    Spark 4 default-on — keep ANSI on, it matches DuckDB).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark
