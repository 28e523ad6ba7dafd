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


class EventsReplayReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.path = options["path"]
        self.chunk = int(options.get("rowsPerBatch", 5000))
        self._rows = None

    def _load(self):
        if self._rows is None:
            import pyarrow.parquet as pq

            tbl = pq.read_table(self.path)
            cols = [tbl.column(c).to_pylist() for c in (
                "event_id", "ts", "user_id", "event_type", "value", "props"
            )]
            self._rows = list(zip(*cols))
        return self._rows

    def initialOffset(self) -> dict:
        return {"row": 0}

    def read(self, start: dict):
        rows = self._load()
        lo = start["row"]
        hi = min(lo + self.chunk, len(rows))
        return iter(rows[lo:hi]), {"row": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._load()[start["row"] : end["row"]])


class EventsReplayDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "events_replay"

    def schema(self) -> str:
        return SCHEMA

    def simpleStreamReader(self, schema) -> EventsReplayReader:
        return EventsReplayReader(self.options)
