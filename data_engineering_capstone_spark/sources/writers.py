"""Sinks (SURVEY.md §2 A4-A5, B14).

The reference writes unpartitioned overwrite-mode parquet (reference:
dags/transform/airport.py:6-7, notebook cell-6). At 100 TB the layout IS
the optimization: partition by the columns every downstream query filters
on (e.g. year/month) so partition pruning skips data before any I/O, and
bucket the join key so repeated large joins skip the shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Parquet sink with optional hive-style partitioning.

    ``max_records_per_file`` caps file size so a skewed partition value
    does not produce one multi-GB file (small-files' evil twin).
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: co-locates later joins/aggs on the bucket
    key with zero shuffle. The scale path for a fact table joined
    repeatedly on the same key."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(name)


def compact_parquet(
    spark,
    src_dir: str,
    dst_dir: str,
    target_rows_per_file: int,
) -> int:
    """Small-file compaction: rewrite a fragmented parquet directory into
    ~``target_rows_per_file``-row files and return the output file count.

    The small-files problem is THE steady-state killer of long-lived
    100 TB tables (every micro-batch/append leaves shards; each file
    costs a scan task + a NameNode/listing entry). Row-count-based
    sizing keeps the op deterministic; production variants target bytes
    via table statistics. ``repartition`` (round-robin) rather than
    ``coalesce`` so output files are even-sized — coalesce would glue
    neighbors and preserve skew.
    """
    import math

    df = spark.read.parquet(src_dir)
    n = df.count()
    n_files = max(1, math.ceil(n / target_rows_per_file))
    df.repartition(n_files).write.mode("overwrite").parquet(dst_dir)
    out = spark.read.parquet(dst_dir)
    assert out.count() == n, "compaction must preserve row count"
    return n_files
