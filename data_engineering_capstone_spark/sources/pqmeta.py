"""Parquet footer metadata probes — row counts and byte sizes WITHOUT a
Spark job.

Two plan-time decisions in this repo need a cardinality estimate before
any action runs:

* ``bucketed_join_zero_shuffle`` sizes its bucket count at ~4M rows per
  bucket — deriving that from ``df.count()`` adds a full extra fact scan
  per first materialization (round-9 ADVICE);
* ``q7_bilateral_volume`` gates its dim-slice broadcast hint on the
  estimated build size — a forced hint on an SF-proportional slice OOMs
  past the executor broadcast budget instead of degrading (round-9
  ADVICE).

Parquet stores ``num_rows`` in the file footer, so the driver can read
it in O(files) metadata fetches — the same information Spark's own
statistics use. Works for both layouts the repo sees: a single
``.parquet`` file (driver-generated testdata) and a Spark-written
directory of part files (scale replicas, warehouse tables).
"""

from __future__ import annotations

import os


def parquet_row_count(path: str) -> int:
    """Total row count of a parquet file or directory, from footers only."""
    import pyarrow.parquet as pq

    total = 0
    for f in _parquet_files(path):
        total += pq.ParquetFile(f).metadata.num_rows
    return total


def parquet_total_bytes(path: str) -> int:
    """On-disk byte size of a parquet file or directory (no footer read)."""
    return sum(os.path.getsize(f) for f in _parquet_files(path))


def _parquet_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    out = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet") and not f.startswith("."):
                out.append(os.path.join(root, f))
    if not out:
        raise FileNotFoundError(f"no parquet files under {path}")
    return out
