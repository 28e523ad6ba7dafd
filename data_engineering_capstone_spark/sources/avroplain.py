"""Pure-Python Avro Object Container File codec (spec-faithful subset)
+ a Spark 4 Python DataSource for genuinely parallel scans.

The container ships Avro's core jars but NOT the ``spark-avro`` module,
so ``spark.read.format("avro")`` is unavailable (ROADMAP). Instead of
dropping the format, this module implements the public Avro 1.x OCF
spec directly (https://avro.apache.org/docs/current/specification/):

* writer: flat record schemas over ``long`` / ``double`` / ``string`` /
  ``boolean`` and their ``["null", T]`` unions; ``null`` and ``deflate``
  (raw RFC-1951 via zlib) codecs; deterministic sync marker derived
  from the schema so outputs are byte-reproducible.
* reader: block-indexed — the driver seeks through block headers only
  (count + byte-size varints, then skip), executors then decode their
  own block ranges in parallel. Same template as the XPORT source
  (sources/pyds.py): record-aligned partitions over an esoteric format
  as a first-class ``spark.read.format("avroplain")`` citizen.

Scale notes: block offsets are a driver-side metadata pass (bytes
skipped, not read); per-partition work is sequential read + decode.
Files written by ANY compliant Avro writer with this type subset are
readable; files from this writer are readable by any Avro reader
(round-trip against the Java avro jars is the format contract; the
pytest suite pins the binary layout with known-byte vectors instead,
since no second implementation ships in this container).
"""

from __future__ import annotations

import hashlib
import io
import json
import struct
import zlib

MAGIC = b"Obj\x01"

SPARK_TO_AVRO = {"bigint": "long", "int": "long", "double": "double",
                 "string": "string", "boolean": "boolean"}


# ---------------------------------------------------------------- encoding

def zigzag_encode(n: int) -> bytes:
    """Avro long: zigzag (0,-1,1,-2,... → 0,1,2,3,...) then base-128
    varint, low groups first, high bit = continuation."""
    z = (n << 1) if n >= 0 else ((-n << 1) - 1)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def zigzag_decode(buf: io.BufferedIOBase) -> int:
    shift, acc = 0, 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        acc |= (b[0] & 0x7F) << shift
        if not b[0] & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _enc_value(v, typ: str) -> bytes:
    if typ == "long":
        return zigzag_encode(int(v))
    if typ == "double":
        return struct.pack("<d", float(v))
    if typ == "string":
        raw = str(v).encode("utf-8")
        return zigzag_encode(len(raw)) + raw
    if typ == "boolean":
        return b"\x01" if v else b"\x00"
    raise ValueError(f"unsupported avro type {typ}")


def _dec_value(buf: io.BufferedIOBase, typ: str):
    if typ == "long":
        return zigzag_decode(buf)
    if typ == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if typ == "string":
        n = zigzag_decode(buf)
        return buf.read(n).decode("utf-8")
    if typ == "boolean":
        return buf.read(1) == b"\x01"
    raise ValueError(f"unsupported avro type {typ}")


# ---------------------------------------------------------------- container

def _schema_json(fields: list[tuple[str, str]]) -> str:
    return json.dumps({
        "type": "record",
        "name": "Row",
        "fields": [
            {"name": n, "type": ["null", t]} for n, t in fields
        ],
    })


def _sync_for(schema_json: str) -> bytes:
    """Deterministic 16-byte sync marker — byte-reproducible outputs."""
    return hashlib.md5(("sync:" + schema_json).encode()).digest()


def write_avro(
    path: str,
    fields: list[tuple[str, str]],
    rows: list[tuple],
    codec: str = "null",
    block_rows: int = 1000,
) -> None:
    """Write an Avro OCF with nullable flat records.

    ``fields`` is [(name, avro_type)]; every field is ``["null", T]``
    (branch 0 = null, 1 = value) — the shape Spark's own avro writer
    produces for nullable columns.
    """
    schema_json = _schema_json(fields)
    sync = _sync_for(schema_json)
    with open(path, "wb") as f:
        f.write(MAGIC)
        meta = {"avro.schema": schema_json.encode(), "avro.codec": codec.encode()}
        f.write(zigzag_encode(len(meta)))
        for k, v in sorted(meta.items()):
            kk = k.encode()
            f.write(zigzag_encode(len(kk)) + kk)
            f.write(zigzag_encode(len(v)) + v)
        f.write(zigzag_encode(0))
        f.write(sync)
        for lo in range(0, len(rows), block_rows):
            chunk = rows[lo:lo + block_rows]
            body = bytearray()
            for row in chunk:
                for (name, typ), v in zip(fields, row):
                    if v is None:
                        body += zigzag_encode(0)
                    else:
                        body += zigzag_encode(1)
                        body += _enc_value(v, typ)
            payload = bytes(body)
            if codec == "deflate":
                co = zlib.compressobj(9, zlib.DEFLATED, -15)
                payload = co.compress(payload) + co.flush()
            elif codec != "null":
                raise ValueError(f"unsupported codec {codec}")
            f.write(zigzag_encode(len(chunk)))
            f.write(zigzag_encode(len(payload)))
            f.write(payload)
            f.write(sync)


def read_avro_header(path: str):
    """(fields, codec, sync, first_block_offset) from the OCF header."""
    with open(path, "rb") as f:
        if f.read(4) != MAGIC:
            raise ValueError(f"{path}: not an Avro object container file")
        meta: dict[str, bytes] = {}
        while True:
            n = zigzag_decode(f)
            if n == 0:
                break
            if n < 0:  # spec: negative count followed by byte size
                n = -n
                zigzag_decode(f)
            for _ in range(n):
                klen = zigzag_decode(f)
                k = f.read(klen).decode()
                vlen = zigzag_decode(f)
                meta[k] = f.read(vlen)
        sync = f.read(16)
        schema = json.loads(meta["avro.schema"].decode())
        codec = meta.get("avro.codec", b"null").decode()
        fields = []
        for fld in schema["fields"]:
            t = fld["type"]
            if isinstance(t, list):  # ["null", T]
                t = next(x for x in t if x != "null")
            fields.append((fld["name"], t))
        return fields, codec, sync, f.tell()


def index_blocks(path: str) -> list[tuple[int, int, int]]:
    """[(byte_offset, n_rows, payload_size)] — a seek/skip-only pass."""
    _, _, sync, pos = read_avro_header(path)
    out = []
    with open(path, "rb") as f:
        f.seek(0, 2)
        end = f.tell()
        f.seek(pos)
        while f.tell() < end:
            off = f.tell()
            n = zigzag_decode(f)
            size = zigzag_decode(f)
            f.seek(size, 1)
            if f.read(16) != sync:
                raise ValueError(f"{path}: sync marker mismatch at {off}")
            out.append((off, n, size))
    return out


def read_block(path: str, offset: int, fields, codec: str) -> list[tuple]:
    with open(path, "rb") as f:
        f.seek(offset)
        n = zigzag_decode(f)
        size = zigzag_decode(f)
        payload = f.read(size)
    if codec == "deflate":
        payload = zlib.decompress(payload, -15)
    buf = io.BytesIO(payload)
    rows = []
    for _ in range(n):
        row = []
        for _, typ in fields:
            branch = zigzag_decode(buf)
            row.append(None if branch == 0 else _dec_value(buf, typ))
        rows.append(tuple(row))
    return rows


def read_avro(path: str) -> tuple[list[tuple[str, str]], list[tuple]]:
    """Driver-side full read (small files / verification)."""
    fields, codec, _, _ = read_avro_header(path)
    rows: list[tuple] = []
    for off, _, _ in index_blocks(path):
        rows.extend(read_block(path, off, fields, codec))
    return fields, rows


# ------------------------------------------------------- Spark DataSource

import glob as _glob  # noqa: E402
import os as _os  # noqa: E402

from pyspark.sql.datasource import (  # noqa: E402
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)


def _data_files(path: str) -> list[str]:
    """A single .avro file, or a directory of part-*.avro files.

    Raises a clear error for a part-less directory (wrong path, or a
    dir holding only ``_SUCCESS``) instead of letting ``files[0]``
    surface an opaque IndexError downstream — the distributed writer
    emits one part file per task even for empty partitions, so a
    committed avroplain output always has at least one part.
    """
    if _os.path.isdir(path):
        files = sorted(_glob.glob(_os.path.join(path, "part-*.avro")))
        if not files:
            raise FileNotFoundError(
                f"avroplain: no part-*.avro files found at {path!r} — "
                "not an avroplain output directory (or the write never "
                "committed)"
            )
        return files
    if not _os.path.isfile(path):
        raise FileNotFoundError(f"avroplain: no such file {path!r}")
    return [path]


class AvroBlockRange(InputPartition):
    def __init__(self, ranges: list[tuple[str, int]]):
        self.ranges = ranges  # [(file, block_offset)]


class AvroCommit(WriterCommitMessage):
    def __init__(self, file: str):
        self.file = file


class AvroPlainDataSource(DataSource):
    """``spark.read/write.format("avroplain")`` — batch reader over block
    ranges AND a distributed writer (one OCF part file per partition,
    ``_SUCCESS`` on commit, partial files removed on abort)."""

    @classmethod
    def name(cls) -> str:
        return "avroplain"

    def schema(self) -> str:
        first = _data_files(self.options["path"])[0]
        fields, _, _, _ = read_avro_header(first)
        inv = {"long": "bigint", "double": "double", "string": "string",
               "boolean": "boolean"}
        return ", ".join(f"{n} {inv[t]}" for n, t in fields)

    def reader(self, schema) -> "AvroPlainReader":
        return AvroPlainReader(self.options)

    def writer(self, schema, overwrite: bool) -> "AvroPlainWriter":
        return AvroPlainWriter(self.options, schema, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> "AvroPlainStreamWriter":
        return AvroPlainStreamWriter(self.options, schema)


class AvroPlainReader(DataSourceReader):
    def __init__(self, options):
        self.path = options["path"]
        self.blocks_per_partition = int(options.get("blocksPerPartition", 16))
        files = _data_files(self.path)
        self.fields, self.codec, _, _ = read_avro_header(files[0])
        self.block_ranges = [
            (f, off) for f in files for off, _, _ in index_blocks(f)
        ]

    def partitions(self):
        step = self.blocks_per_partition
        rng = self.block_ranges
        return [
            AvroBlockRange(rng[i:i + step]) for i in range(0, len(rng), step)
        ] or [AvroBlockRange([])]

    def read(self, partition: AvroBlockRange):
        for path, off in partition.ranges:
            yield from read_block(path, off, self.fields, self.codec)


class AvroPlainWriter(DataSourceWriter):
    """Distributed OCF sink: each task serializes its partition with the
    pure-Python codec into its own ``part-<uuid>.avro``; the driver
    drops a ``_SUCCESS`` marker only after every task committed (same
    contract readers of the versioned-table operator rely on)."""

    _SPARK_TO_AVRO = {"long": "long", "integer": "long", "double": "double",
                      "string": "string", "boolean": "boolean"}

    def __init__(self, options, schema, overwrite: bool):
        self.path = options["path"]
        self.codec = options.get("codec", "deflate")
        self.block_rows = int(options.get("blockRows", 1000))
        self.fields = []
        for f in schema.fields:
            t = f.dataType.typeName()
            if t not in self._SPARK_TO_AVRO:
                raise ValueError(
                    f"avroplain writer: unsupported column type {t} ({f.name})"
                )
            self.fields.append((f.name, self._SPARK_TO_AVRO[t]))
        _os.makedirs(self.path, exist_ok=True)
        if overwrite:
            for old in _glob.glob(_os.path.join(self.path, "part-*.avro")):
                _os.remove(old)
            marker = _os.path.join(self.path, "_SUCCESS")
            if _os.path.isfile(marker):
                _os.remove(marker)

    def write(self, iterator) -> AvroCommit:
        import uuid

        rows = [
            tuple(None if v is None else (int(v) if t == "long" else v)
                  for (_, t), v in zip(self.fields, row))
            for row in iterator
        ]
        fp = _os.path.join(self.path, f"part-{uuid.uuid4().hex}.avro")
        write_avro(fp, self.fields, rows, codec=self.codec,
                   block_rows=self.block_rows)
        return AvroCommit(fp)

    def commit(self, messages) -> None:
        with open(_os.path.join(self.path, "_SUCCESS"), "w"):
            pass

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and _os.path.isfile(m.file):
                _os.remove(m.file)


class AvroPlainStreamWriter(DataSourceStreamWriter):
    """Streaming OCF sink: each microbatch task writes its partition to
    ``batch=<id>/part-<uuid>.avro``; the driver appends one line to a
    ``_commits`` log only after every task of the batch succeeded and
    deletes the batch's partial files on abort. Exactly-once at the
    reader by construction: consumers list ``_commits`` and read only
    committed batch directories — an uncommitted or aborted batch is
    invisible (same marker discipline as operators/versioned.py).
    Completes the custom-DataSource matrix: batch read, stream read,
    batch write, stream write.
    """

    _SPARK_TO_AVRO = AvroPlainWriter._SPARK_TO_AVRO

    def __init__(self, options, schema):
        self.path = options["path"]
        self.codec = options.get("codec", "deflate")
        self.fields = []
        for f in schema.fields:
            t = f.dataType.typeName()
            if t not in self._SPARK_TO_AVRO:
                raise ValueError(
                    f"avroplain stream writer: unsupported column type {t} ({f.name})"
                )
            self.fields.append((f.name, self._SPARK_TO_AVRO[t]))
        _os.makedirs(self.path, exist_ok=True)

    def write(self, iterator) -> AvroCommit:
        import uuid

        staging = _os.path.join(self.path, "_staging")
        _os.makedirs(staging, exist_ok=True)
        rows = [
            tuple(None if v is None else (int(v) if t == "long" else v)
                  for (_, t), v in zip(self.fields, row))
            for row in iterator
        ]
        fp = _os.path.join(staging, f"part-{uuid.uuid4().hex}.avro")
        write_avro(fp, self.fields, rows, codec=self.codec)
        return AvroCommit(fp)

    def commit(self, messages, batchId: int) -> None:
        # driver-side atomic publish: move staged part files into the
        # batch directory, THEN append to the commit log — a reader
        # either sees the whole batch or none of it.
        #
        # Idempotent under replay: if the batch is already in _commits,
        # a restarted driver re-running it must not publish a second
        # part-file set (duplicate rows); and a crash AFTER the moves
        # but BEFORE the log append leaves half-published files that
        # the retry must REPLACE, not append to — so an uncommitted
        # batch dir is cleared before publishing.
        marker = _os.path.join(self.path, "_commits")
        if _os.path.isfile(marker):
            with open(marker) as f:
                if str(batchId) in f.read().split():
                    for m in messages:  # staged retry output is garbage
                        if m is not None and _os.path.isfile(m.file):
                            _os.remove(m.file)
                    return
        bdir = _os.path.join(self.path, f"batch={batchId}")
        if _os.path.isdir(bdir):
            for stale in _glob.glob(_os.path.join(bdir, "part-*.avro")):
                _os.remove(stale)
        _os.makedirs(bdir, exist_ok=True)
        for m in messages:
            if m is not None:
                _os.replace(
                    m.file, _os.path.join(bdir, _os.path.basename(m.file))
                )
        with open(marker, "a") as f:
            f.write(f"{batchId}\n")

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and _os.path.isfile(m.file):
                _os.remove(m.file)


def committed_stream_batches(path: str) -> list[int]:
    """Batch ids recorded in the sink's ``_commits`` log — the
    metadata-only half of the exactly-once contract (an uncommitted
    ``batch=N`` dir is invisible). Distributed consumers point the
    avroplain BATCH reader at each ``batch=<id>`` dir; the driver never
    touches data bytes."""
    marker = _os.path.join(path, "_commits")
    if not _os.path.isfile(marker):
        return []
    with open(marker) as f:
        return sorted({int(x) for x in f.read().split()})


def read_committed_stream_output(path: str) -> list[tuple]:
    """Driver-side reader over the committed batches — kept for the
    exactly-once contract TESTS (tiny fixtures); query paths read the
    same dirs distributed via the avroplain batch reader instead
    (see queries_streaming.stream_custom_sink_avro)."""
    rows: list[tuple] = []
    for b in committed_stream_batches(path):
        for fp in sorted(_glob.glob(_os.path.join(path, f"batch={b}", "part-*.avro"))):
            _, r = read_avro(fp)
            rows.extend(r)
    return rows
