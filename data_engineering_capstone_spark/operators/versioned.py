"""Versioned parquet tables — snapshot isolation + time travel without a
table-format jar (Delta/Iceberg are unavailable in this container; see
ROADMAP.md). The layout convention is the minimal core of those formats:

    <table_dir>/v=<N>/part-*.parquet    (immutable, append-only versions)

* writes create the NEXT version directory — readers of version N never
  see partial writes (directory rename/commit is the atomicity boundary,
  exactly how Delta's _delta_log insulates readers);
* ``read_version`` pins a snapshot — time travel is just reading an
  older directory;
* ``diff_versions`` recovers the changeset BETWEEN two versions with the
  CDC snapshot-diff operator (operators/cdc.py) — the inverse of MERGE.

At 100 TB: versions share nothing here (full copies), which is the
honest cost of jar-free versioning; real table formats de-duplicate via
file-level manifests. The API surface is what matters for parity — a
user migrating from the reference's overwrite-in-place parquet gets
reproducible reads + rollback with one writer change.

Reference: dags/transform/airport.py:6-7 writes mode("overwrite") in
place — a reader racing the daily DAG sees torn state; versioning is
the fix the capstone spec's "daily 7am dashboard" scenario needs.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

_V_RE = re.compile(r"^v=(\d+)$")


def list_versions(table_dir: str) -> list[int]:
    """Sorted committed versions (directories named ``v=<N>``).

    A version counts as committed only once Spark's ``_SUCCESS`` marker
    exists — the directory itself appears at write *start*, so gating on
    the marker is what makes the "readers of version N never see partial
    writes" contract true for readers (and for ``write_version``'s
    next-version computation) racing an in-flight write.
    """
    if not os.path.isdir(table_dir):
        return []
    out = []
    for name in os.listdir(table_dir):
        m = _V_RE.match(name)
        if (
            m
            and os.path.isdir(os.path.join(table_dir, name))
            and os.path.isfile(os.path.join(table_dir, name, "_SUCCESS"))
        ):
            out.append(int(m.group(1)))
    return sorted(out)


def write_version(df: DataFrame, table_dir: str) -> int:
    """Write ``df`` as the next version of the table; returns its number.

    The version directory is written once and never mutated — concurrent
    readers of earlier versions are untouched (snapshot isolation).
    """
    vs = list_versions(table_dir)
    next_v = (vs[-1] + 1) if vs else 1
    # Skip over directories left by in-flight or crashed writes (present
    # but no _SUCCESS, so not in list_versions): mode("error") would
    # otherwise collide with them forever.
    while os.path.isdir(os.path.join(table_dir, f"v={next_v}")):
        next_v += 1
    df.write.mode("error").parquet(os.path.join(table_dir, f"v={next_v}"))
    return next_v


def read_version(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read a pinned snapshot (time travel); latest when ``version`` is
    None. Raises if the table has no committed versions."""
    vs = list_versions(table_dir)
    if not vs:
        raise FileNotFoundError(f"no committed versions under {table_dir}")
    v = vs[-1] if version is None else version
    if v not in vs:
        raise FileNotFoundError(f"version {v} not in {vs}")
    return spark.read.parquet(os.path.join(table_dir, f"v={v}"))


def diff_versions(
    spark: SparkSession,
    table_dir: str,
    v_old: int,
    v_new: int,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Changeset between two committed versions via the CDC snapshot
    diff — I/U/D rows keyed by ``key_cols`` (operators/cdc.py). Both
    snapshots are whole table versions (fact scale), so the diff's
    full-outer exchange rides the width law from the larger version's
    parquet footers."""
    from ..sources.pqmeta import scaled_width
    from .cdc import snapshot_diff

    old_df = read_version(spark, table_dir, v_old)
    new_df = read_version(spark, table_dir, v_new)
    par = spark.sparkContext.defaultParallelism
    width = max(
        scaled_width(os.path.join(table_dir, f"v={v_old}"), par),
        scaled_width(os.path.join(table_dir, f"v={v_new}"), par),
    )  # unreadable footers degrade to the parallelism floor inside scaled_width
    return snapshot_diff(old_df, new_df, key_cols, compare_cols, num_partitions=width)


def vacuum_versions(table_dir: str, keep_last: int = 2) -> list[int]:
    """Retention: drop all but the newest ``keep_last`` committed
    versions; returns the versions removed. The time-travel window shrinks to
    what retention keeps — same contract as Delta's VACUUM (readers of
    dropped snapshots fail fast via read_version's existence check).
    """
    import shutil

    vs = list_versions(table_dir)
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    drop = vs[:-keep_last] if len(vs) > keep_last else []
    for v in drop:
        shutil.rmtree(os.path.join(table_dir, f"v={v}"))
    return drop
