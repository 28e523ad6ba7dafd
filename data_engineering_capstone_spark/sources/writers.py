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


def zorder_value(cols: Sequence, mins: Sequence[int], maxs: Sequence[int], bits: int = 16):
    """Z-order (Morton) curve value for N integer columns as a pure
    Column expression: each column is scaled into ``bits`` buckets over
    its [min, max] range, then the bucket bits are interleaved.

    Rows close on the curve are close in EVERY keyed dimension, so
    sorting by this value gives tight per-file min/max ranges on all the
    z-columns at once — parquet row-group stats then prune multi-column
    predicates, which a plain sort only achieves for its leading column.
    """
    from pyspark.sql import functions as F

    # the interleaved value must fit a signed 64-bit long: bits * n_cols
    # <= 63, else shiftleft pushes the leading column into the sign bit
    bits = min(bits, 63 // max(1, len(cols)))
    scaled = []
    for c, lo, hi in zip(cols, mins, maxs):
        col = F.col(c) if isinstance(c, str) else c
        span = max(1, hi - lo)
        # scale in double space BEFORE casting: (col - lo) * 65535 as a
        # long overflows under ANSI for spans above ~1.4e14 (epoch-micros)
        b = (
            (col - F.lit(lo)).cast("double") / F.lit(float(span)) * F.lit((1 << bits) - 1)
        ).cast("long")
        scaled.append(b)
    z = F.lit(0).cast("long")
    # MSB-first interleave: bit i of column j lands at position
    # (i * n_cols + j) counted from the top
    n = len(scaled)
    for i in range(bits - 1, -1, -1):
        for j, b in enumerate(scaled):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
            z = F.shiftleft(z, 1).bitwiseOR(bit)
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    zcols: Sequence[str],
    n_files: int,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet sink: range-partition + sort by the
    Morton value of ``zcols`` so every output file covers a small
    rectangle of the key space. One extra stats pass (min/max per
    z-column — a single tiny aggregate) plus one range shuffle; reads
    filtered on ANY z-column then skip most files/row-groups on
    footer stats alone. The scale alternative to hive-partitioning by
    high-cardinality keys (which would explode the file count).
    """
    from pyspark.sql import functions as F

    stats = df.agg(
        *[F.min(c).cast("long").alias(f"lo_{i}") for i, c in enumerate(zcols)],
        *[F.max(c).cast("long").alias(f"hi_{i}") for i, c in enumerate(zcols)],
    ).collect()[0]
    mins = [stats[f"lo_{i}"] for i in range(len(zcols))]
    maxs = [stats[f"hi_{i}"] for i in range(len(zcols))]
    z = zorder_value(list(zcols), mins, maxs, bits=bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def write_partitioned_sized(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str],
    target_rows_per_file: int,
    n_rows: int | None = None,
    mode: str = "overwrite",
) -> int:
    """Partitioned parquet sink with the small-file policy engaged —
    the production form of the reference's job ending (reference:
    dags/transform/airport.py:6-7 writes unpartitioned overwrite
    parquet; notebook cell-15 asks how the pipeline changes at 100x).

    A naive ``partitionBy`` write emits one file per (task x partition
    value): at scale that is EITHER thousands of tiny shards (many
    input tasks) or one multi-GB file (``repartition(partition_by)``
    funnels every row of a value through one task). This helper sizes
    the write instead: round-robin ``repartition(n_files)`` spreads
    rows evenly across exactly ``n_files = ceil(n / target)`` writer
    tasks (even file sizes, full cluster parallelism), and
    ``maxRecordsPerFile`` backstops any residual overfill. Sized for
    the single-partition-value load shape (the reference ingests one
    i94 month per run); multi-value loads should size per value or
    z-order instead (``write_zordered``). Returns ``n_files``.

    ``n_rows`` contract (round-7 ADVICE): when provided it MUST be the
    row count of ``df`` AS WRITTEN — i.e. post-clean/dedup/filter, not
    the source count — it exists only to skip the extra ``count()``
    action when the caller already materialized that number. An
    OVERestimate silently yields undersized files (more writer tasks
    than needed); an UNDERestimate leans on ``maxRecordsPerFile`` to
    split, producing one undersized trailing file per task. Callers
    that only know the pre-transformation count should pass ``None``
    and pay the count.
    """
    import math

    n = df.count() if n_rows is None else n_rows
    n_files = max(1, math.ceil(n / target_rows_per_file))
    (
        df.repartition(n_files)
        .write.mode(mode)
        .partitionBy(*partition_by)
        .option("maxRecordsPerFile", str(target_rows_per_file))
        .parquet(path)
    )
    return n_files
