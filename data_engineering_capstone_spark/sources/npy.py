"""Custom Python Data Source: distributed NumPy ``.npy`` matrix reader.

``.npy`` is the de-facto interchange artifact for embedding matrices
and model activations (one contiguous C-order array after a small
ASCII header — NumPy NEP-1 / `numpy.lib.format` public spec v1.0).
Spark has no built-in source for it, and the naive route (driver
``np.load`` then ``createDataFrame``) funnels the whole matrix through
one process. This source implements the Spark 4 Python
DataSource/DataSourceReader contract over the spec: the driver parses
only the header (magic, version, dict literal) for shape/dtype, then
each executor partition seeks to its own row-aligned byte range and
yields (row_idx, vector) rows — a genuinely parallel scan, the same
pattern as the XPORT source (sources/pyds.py).

Written from the public spec, mirroring the layout
``numpy.lib.format`` documents: 6-byte magic ``\\x93NUMPY``, version
(1, 0), little-endian uint16 header length, ASCII dict
``{'descr': '<f4', 'fortran_order': False, 'shape': (n, d)}`` padded
so data starts 64-aligned, then raw C-order bytes.

Scale notes: partitions are row-aligned ranges, so parallelism is
(rows / rowsPerPartition) regardless of width; per-partition work is
one seek + one sequential read + a zero-copy ``frombuffer`` reshape.
Supported dtypes cover the embedding-matrix cases (<f4, <f8); 2-D
C-order only, which is what the format is used for in ML pipelines.
"""

from __future__ import annotations

import ast
import struct

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_MAGIC = b"\x93NUMPY"
_DTYPES = {"<f4": ("float", 4), "<f8": ("double", 8)}


def parse_npy_header(path: str) -> tuple[str, int, int, int, int]:
    """Parse a v1.0/v2.0 ``.npy`` header without numpy.

    Returns (descr, n_rows, n_cols, data_start, row_bytes).
    """
    with open(path, "rb") as f:
        if f.read(6) != _MAGIC:
            raise ValueError(f"{path}: not a .npy file (bad magic)")
        major, _minor = f.read(1)[0], f.read(1)[0]
        if major == 1:
            (hlen,) = struct.unpack("<H", f.read(2))
        elif major == 2:
            (hlen,) = struct.unpack("<I", f.read(4))
        else:
            raise ValueError(f"{path}: unsupported .npy version {major}")
        header = f.read(hlen).decode("ascii")
        data_start = f.tell()
    meta = ast.literal_eval(header)
    descr, fortran, shape = meta["descr"], meta["fortran_order"], meta["shape"]
    if fortran:
        raise ValueError(f"{path}: fortran_order arrays not supported")
    if len(shape) != 2:
        raise ValueError(f"{path}: only 2-D matrices supported, got shape {shape}")
    if descr not in _DTYPES:
        raise ValueError(f"{path}: dtype {descr!r} not supported ({list(_DTYPES)})")
    n_rows, n_cols = int(shape[0]), int(shape[1])
    return descr, n_rows, n_cols, data_start, n_cols * _DTYPES[descr][1]


def write_npy(path: str, mat) -> None:
    """Spec-faithful v1.0 writer (fixture/round-trip side; small-matrix
    driver write — the distributed story is the READ side, matching how
    the artifact is produced upstream by a trainer)."""
    import numpy as np

    mat = np.ascontiguousarray(mat)
    descr = {"float32": "<f4", "float64": "<f8"}[mat.dtype.name]
    head = repr(
        {"descr": descr, "fortran_order": False, "shape": tuple(mat.shape)}
    ).encode("ascii")
    # pad so data starts on a 64-byte boundary, newline-terminated
    base = len(_MAGIC) + 2 + 2
    pad = 64 - (base + len(head) + 1) % 64
    head = head + b" " * pad + b"\n"
    with open(path, "wb") as f:
        f.write(_MAGIC + bytes([1, 0]) + struct.pack("<H", len(head)) + head)
        f.write(mat.tobytes("C"))


class NpyRange(InputPartition):
    def __init__(self, start_row: int, end_row: int):
        self.start_row = start_row
        self.end_row = end_row


class NpyDataSource(DataSource):
    """``spark.read.format("npy").option("path", f).load()`` →
    (row_idx bigint, value array<float|double>)."""

    @classmethod
    def name(cls) -> str:
        return "npy"

    def schema(self) -> str:
        descr, *_ = parse_npy_header(self.options["path"])
        return f"row_idx bigint, value array<{_DTYPES[descr][0]}>"

    def reader(self, schema) -> "NpyReader":
        return NpyReader(self.options)


class NpyReader(DataSourceReader):
    def __init__(self, options):
        self.path = options["path"]
        self.rows_per_partition = int(options.get("rowsPerPartition", 100_000))
        (self.descr, self.n_rows, self.n_cols, self.data_start, self.row_bytes) = (
            parse_npy_header(self.path)
        )

    def partitions(self):
        step = self.rows_per_partition
        return [
            NpyRange(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ] or [NpyRange(0, 0)]

    def read(self, partition: NpyRange):
        import numpy as np

        n = partition.end_row - partition.start_row
        if n <= 0:
            return
        with open(self.path, "rb") as f:
            f.seek(self.data_start + partition.start_row * self.row_bytes)
            buf = f.read(n * self.row_bytes)
        mat = np.frombuffer(buf, dtype=self.descr).reshape(n, self.n_cols)
        for i in range(n):
            yield (partition.start_row + i, mat[i].tolist())
