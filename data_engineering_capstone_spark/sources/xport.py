"""Minimal SAS XPORT (transport v5) writer — fixture-grade.

The reference ingests SAS binaries (reference: notebook cell-5,
dags/libs/lib.py:139 pins the sas7bdat package). This container has no
SAS writer, which previously left :func:`readers.read_sas` untestable
(ROADMAP round-2). XPORT v5 is the openly documented SAS interchange
format (SAS TS-140): 80-byte card records, big-endian NAMESTR variable
descriptors, IBM System/360 hex-float numerics. pandas' ``read_sas``
reads ``.xpt`` natively, so writing it here gives a true differential
test: our writer vs pandas' independent reader.

Scope: numeric (double) and character columns, no labels/formats, no
missing values — exactly what a dimension-table fixture needs. The
writer is single-node by design (SAS files at scale get converted to
parquet once — notebook cell-6 — and never re-read).

IBM hex-float: value = (-1)^s · 0.f · 16^(e-64), f = 56-bit fraction.
Every finite IEEE double within 16^±63 converts EXACTLY (53 mantissa
bits ⊂ 56), so numeric round trips are bit-faithful.
"""

from __future__ import annotations

import math
import struct
from collections.abc import Sequence

_REC = 80


def ieee_to_ibm(x: float) -> bytes:
    """IEEE 754 double → 8-byte IBM System/360 hex float (big-endian)."""
    if x == 0.0:
        return b"\x00" * 8
    if not math.isfinite(x):
        raise ValueError("XPORT numerics must be finite")
    sign = 0x80 if x < 0 else 0x00
    m2, p2 = math.frexp(abs(x))  # abs(x) = m2 * 2^p2, m2 in [0.5, 1)
    e16 = math.ceil(p2 / 4)  # 16^e16 bin: shift = p2 - 4*e16 in (-4, 0]
    shift = p2 - 4 * e16
    mant53 = int(m2 * (1 << 53))  # exact: m2 has 53 significant bits
    frac56 = mant53 << (shift + 3)  # exact 56-bit fraction, in [2^52, 2^56)
    if not -64 <= e16 <= 63:
        raise ValueError(f"exponent out of IBM range: {x}")
    return bytes([sign | (e16 + 64)]) + frac56.to_bytes(7, "big")


def ibm_to_ieee(b: bytes) -> float:
    """Inverse (for self-checks)."""
    if b == b"\x00" * 8:
        return 0.0
    sign = -1.0 if b[0] & 0x80 else 1.0
    e16 = (b[0] & 0x7F) - 64
    frac = int.from_bytes(b[1:8], "big")
    return sign * frac * 2.0 ** (4 * e16 - 56)


def _card(text: str) -> bytes:
    assert len(text) <= _REC
    return text.ljust(_REC).encode("ascii")


def _namestr(
    ntype: int, nvar0: int, nlng: int, name: str, npos: int
) -> bytes:
    return struct.pack(
        ">hhhh8s40s8shhh2s8shhl52s",
        ntype,  # 1 numeric, 2 character
        0,  # nhfun (name hash, unused)
        nlng,  # field length in obs record
        nvar0,  # variable number
        name.upper().ljust(8).encode("ascii"),
        b" " * 40,  # label
        b" " * 8,  # format name
        0, 0, 0,  # nfl nfd nfj
        b"  ",
        b" " * 8,  # informat
        0, 0,  # nifl nifd
        npos,  # position in observation
        b" " * 52,
    )


def write_xport(
    path: str,
    columns: Sequence[tuple[str, str, int]],
    rows: Sequence[Sequence],
    dsname: str = "DATA",
) -> None:
    """Write ``rows`` as an XPORT v5 member.

    ``columns``: (name, kind, width) per column; kind 'num' (width must
    be 8) or 'char' (latin-1, space-padded to width).
    """
    stamp = "01JAN24:00:00:00"
    sas, ver, os_ = "SAS".ljust(8), "9.4".ljust(8), "Linux".ljust(8)
    out = [
        _card(
            "HEADER RECORD*******LIBRARY HEADER RECORD!!!!!!!"
            "000000000000000000000000000000"
        ),
        _card(f"{sas}{sas}{'SASLIB'.ljust(8)}{ver}{os_}{'':24}{stamp}"),
        _card(stamp),
        _card(
            "HEADER RECORD*******MEMBER  HEADER RECORD!!!!!!!"
            "000000000000000001600000000140"
        ),
        _card(
            "HEADER RECORD*******DSCRPTR HEADER RECORD!!!!!!!"
            "000000000000000000000000000000"
        ),
        _card(f"{sas}{dsname.upper().ljust(8)}{'SASDATA'.ljust(8)}{ver}{os_}{'':24}{stamp}"),
        _card(f"{stamp}{'':16}{'':40}{'':8}"),
        _card(
            "HEADER RECORD*******NAMESTR HEADER RECORD!!!!!!!"
            f"000000{len(columns):04d}"
            + "0" * 20
        ),
    ]
    body = b"".join(out)

    npos = 0
    namestrs = b""
    for i, (name, kind, width) in enumerate(columns, start=1):
        if kind == "num" and width != 8:
            raise ValueError("numeric width must be 8")
        namestrs += _namestr(1 if kind == "num" else 2, i, width, name, npos)
        npos += width
    # pad the NAMESTR section to a card boundary
    if len(namestrs) % _REC:
        namestrs += b" " * (_REC - len(namestrs) % _REC)
    body += namestrs
    body += _card(
        "HEADER RECORD*******OBS     HEADER RECORD!!!!!!!"
        "000000000000000000000000000000"
    )

    reclen = npos
    data = bytearray()
    for row in rows:
        for (name, kind, width), v in zip(columns, row):
            if kind == "num":
                data += ieee_to_ibm(float(v))
            else:
                data += str(v)[:width].ljust(width).encode("latin-1")
    # pad observations to a card boundary. Caveat for record lengths
    # <= 80: pandas' reader counts aligned all-blank 8-byte words in the
    # LAST card as tail padding and can drop a final observation whose
    # char fields end in blanks — keep records wider than one card (the
    # >80 path divides by exact record length) or end with a numeric.
    if len(data) % _REC:
        data += b" " * (_REC - len(data) % _REC)
    with open(path, "wb") as f:
        f.write(body + bytes(data))


def parse_xport_header(path: str):
    """Parse an XPORT v5 member header: returns (columns, data_start,
    reclen, nobs) where columns is [(name, kind, width, pos)].

    Mirrors :func:`write_xport`'s layout; used by the distributed Python
    data source (sources/pyds.py) so executors can decode observation
    byte ranges without pandas.
    """
    import os as _os

    with open(path, "rb") as f:
        head = f.read(8 * _REC)
        nam_hdr = head[7 * _REC : 8 * _REC].decode("ascii", "replace")
        if "NAMESTR HEADER" not in nam_hdr:
            raise ValueError("not a single-member XPORT v5 file")
        nvars = int(nam_hdr[54:58])
        nam_bytes = nvars * 140
        nam_padded = nam_bytes + (-nam_bytes % _REC)
        namestrs = f.read(nam_padded)
        obs_hdr = f.read(_REC).decode("ascii", "replace")
        if "OBS     HEADER" not in obs_hdr:
            raise ValueError("missing OBS header record")
        data_start = f.tell()
        size = _os.fstat(f.fileno()).st_size
    cols = []
    reclen = 0
    for i in range(nvars):
        ns = namestrs[i * 140 : (i + 1) * 140]
        ntype, _, nlng, _ = struct.unpack(">hhhh", ns[:8])
        name = ns[8:16].decode("ascii").strip()
        (npos,) = struct.unpack(">l", ns[84:88])
        cols.append((name, "num" if ntype == 1 else "char", nlng, npos))
        reclen += nlng
    total = size - data_start
    nobs = total // reclen
    # Trailing card padding (up to 79 blank bytes) is < one record when
    # reclen >= 80, so exact division is safe there. For reclen < 80 the
    # padding can contain whole record widths, which would decode as
    # phantom rows of blanks — drop trailing all-blank "records" but ONLY
    # those that lie entirely within the final 80-byte card (a genuine
    # all-blank record earlier in the file is data, not padding).
    if reclen < _REC and nobs > 0:
        with open(path, "rb") as f:
            f.seek(data_start + max(0, total - _REC))
            tail = f.read(_REC)
        pad_floor = total - _REC  # byte offset where the final card starts
        while nobs > 0:
            rec_off = (nobs - 1) * reclen
            # padding is < 80 bytes, so it starts strictly after the final
            # card boundary — a record starting at/before pad_floor holds
            # at least one byte of real data and is kept even if blank
            if rec_off <= pad_floor:
                break
            rec = tail[rec_off - max(0, pad_floor) :][:reclen]
            if rec.strip(b" "):
                break
            nobs -= 1
    return cols, data_start, reclen, nobs


def decode_obs(buf: bytes, cols) -> tuple:
    """Decode one observation record using the column specs from
    :func:`parse_xport_header`."""
    out = []
    for _name, kind, width, pos in cols:
        field = buf[pos : pos + width]
        if kind == "num":
            out.append(ibm_to_ieee(field))
        else:
            out.append(field.decode("latin-1").rstrip())
    return tuple(out)
