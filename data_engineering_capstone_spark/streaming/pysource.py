"""Custom Python STREAMING data source (Spark 4): deterministic replay
bus.

``readStream.format("events_replay")`` replays a parquet events table in
fixed-size chunks — one chunk per micro-batch — through Spark's
SimpleDataSourceStreamReader contract: ``initialOffset``/``read(start)``
advance a row-offset cursor; ``readBetweenOffsets`` re-serves a range
exactly (replayability = the recovery contract checkpoints rely on).

This is the missing-fixture stand-in for a real bus (sources/kafka.py
documents the Kafka plumbing; no broker exists in this container): the
stream is FINITE and DETERMINISTIC, so a drain with
``processAllAvailable`` reaches a final state a batch SQL oracle can
check — the same differential-testing trick the file-source streaming
queries use, now proving the custom-source path end to end.

Scale notes: the simple reader API serves rows from the DRIVER (fine
for a replay fixture); a production source implements the partitioned
``streamReader`` contract instead, exactly like sources/pyds.py does
for batch. Chunked offsets bound per-batch memory; watermarks
downstream bound state as usual.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)


_COLS = ("event_id", "ts", "user_id", "event_type", "value", "props")


class EventsReplayReader(SimpleDataSourceStreamReader):
    """Driver-resident memory is O(one chunk), not O(table): only a
    (path, row-group ordinal, global start row) index built from parquet
    FOOTER metadata is held for the stream's lifetime; each
    ``read``/``readBetweenOffsets`` materializes just the row groups
    overlapping its [start, end) range via pyarrow
    ``ParquetFile.read_row_group``, opening part-file handles lazily
    through an 8-entry LRU so driver fd usage is O(1) regardless of the
    directory's part count. Re-serving a range after restart re-reads
    the same immutable files — replayability is unchanged."""

    def __init__(self, options):
        self.path = options["path"]
        self.chunk = int(options.get("rowsPerBatch", 5000))
        # flat row-group index across ALL part files (round-7: a real
        # table is a DIRECTORY of part files — the single-file
        # assumption broke on every replica-scale dir; files are taken
        # in sorted name order so the global row index is deterministic)
        self._rg_path = None    # part-file path serving each row group
        self._rg_idx = None     # row-group ordinal within its own file
        self._rg_starts = None  # cumulative first GLOBAL row per group
        self._nrows = None
        # small LRU of open ParquetFile handles: the index above keeps
        # only (path, ordinal) pairs, so a many-part replica directory
        # costs O(8) driver fds, not O(parts) (round-8 ADVICE fix —
        # one handle per part for the stream's lifetime risked driver
        # fd exhaustion)
        self._pf_cache: dict[str, object] = {}
        self._pf_cache_cap = 8

    def _file(self):
        if self._rg_starts is None:
            import os

            import pyarrow.parquet as pq

            if os.path.isdir(self.path):
                paths = [
                    os.path.join(self.path, n)
                    for n in sorted(os.listdir(self.path))
                    if n.endswith(".parquet") and not n.startswith(("_", "."))
                ]
            else:
                paths = [self.path]
            self._rg_path, self._rg_idx, self._rg_starts = [], [], []
            acc = 0
            for p in paths:
                pf = pq.ParquetFile(p)
                try:
                    md = pf.metadata
                    for g in range(md.num_row_groups):
                        self._rg_path.append(p)
                        self._rg_idx.append(g)
                        self._rg_starts.append(acc)
                        acc += md.row_group(g).num_rows
                finally:
                    pf.close()
            self._nrows = acc

    def _open(self, path: str):
        """ParquetFile handle for ``path`` via a tiny LRU cache."""
        import pyarrow.parquet as pq

        pf = self._pf_cache.pop(path, None)
        if pf is None:
            pf = pq.ParquetFile(path)
            while len(self._pf_cache) >= self._pf_cache_cap:
                oldest = next(iter(self._pf_cache))
                self._pf_cache.pop(oldest).close()
        self._pf_cache[path] = pf  # re-insert = move to MRU end
        return pf

    def _slice(self, lo: int, hi: int):
        """Rows [lo, hi) as tuples, reading only the overlapping row groups."""
        self._file()
        hi = min(hi, self._nrows)
        if lo >= hi:
            return []
        import bisect

        g0 = bisect.bisect_right(self._rg_starts, lo) - 1
        out = []
        for g in range(g0, len(self._rg_starts)):
            g_lo = self._rg_starts[g]
            if g_lo >= hi:
                break
            tbl = self._open(self._rg_path[g]).read_row_group(
                self._rg_idx[g], columns=list(_COLS)
            )
            a = max(0, lo - g_lo)
            b = min(tbl.num_rows, hi - g_lo)
            sl = tbl.slice(a, b - a)
            out.extend(zip(*[sl.column(c).to_pylist() for c in _COLS]))
        return out

    def initialOffset(self) -> dict:
        return {"row": 0}

    def read(self, start: dict):
        self._file()
        lo = start["row"]
        hi = max(lo, min(lo + self.chunk, self._nrows))
        return iter(self._slice(lo, hi)), {"row": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._slice(start["row"], end["row"]))


class EventsReplayDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "events_replay"

    def schema(self) -> str:
        return SCHEMA

    def simpleStreamReader(self, schema) -> EventsReplayReader:
        return EventsReplayReader(self.options)
