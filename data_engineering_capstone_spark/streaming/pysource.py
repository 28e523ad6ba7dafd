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
    """Driver-resident memory is O(one chunk), not O(table): only parquet
    FOOTER metadata (row-group row counts) is held for the stream's
    lifetime; each ``read``/``readBetweenOffsets`` materializes just the
    row groups overlapping its [start, end) range via pyarrow
    ``ParquetFile.read_row_group``. Re-serving a range after restart
    re-reads the same immutable file — replayability is unchanged."""

    def __init__(self, options):
        self.path = options["path"]
        self.chunk = int(options.get("rowsPerBatch", 5000))
        # flat row-group index across ALL part files (round-7: a real
        # table is a DIRECTORY of part files — the single-file
        # assumption broke on every replica-scale dir; files are taken
        # in sorted name order so the global row index is deterministic)
        self._rg_pf = None      # ParquetFile serving each row group
        self._rg_idx = None     # row-group ordinal within its own file
        self._rg_starts = None  # cumulative first GLOBAL row per group
        self._nrows = None

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
            self._rg_pf, self._rg_idx, self._rg_starts = [], [], []
            acc = 0
            for p in paths:
                pf = pq.ParquetFile(p)
                md = pf.metadata
                for g in range(md.num_row_groups):
                    self._rg_pf.append(pf)
                    self._rg_idx.append(g)
                    self._rg_starts.append(acc)
                    acc += md.row_group(g).num_rows
            self._nrows = acc

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
            tbl = self._rg_pf[g].read_row_group(self._rg_idx[g], columns=list(_COLS))
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
