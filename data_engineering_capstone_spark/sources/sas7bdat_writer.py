"""Minimal SAS7BDAT writer — enough of the (publicly reverse-engineered)
on-disk format to produce files any sas7bdat reader accepts.

Why this exists: the reference ingests ``.sas7bdat`` via the saurfang
spark-sas7bdat package (reference: notebook cell-5; jar pinned at
dags/libs/lib.py:139). This repo substitutes SAS XPORT v5 as the
interchange format (sources/xport.py) and keeps ``read_sas``'s pandas
fallback for real ``.sas7bdat`` files — but the container ships no such
file, so that fallback was untestable. This writer closes the loop: it
emits the uncompressed little-endian 32-bit layout from the public
format documentation (the community spec behind every open-source
reader: BioStatMatt's sas7bdat notes and the readstat/pandas parsers),
and the test suite proves ``pandas.read_sas`` / ``read_sas`` round-trip
it bit-exactly.

Layout written (uncompressed, x86/32-bit, little-endian, utf-8):

* 1024-byte file header (magic, alignment='2' twice → no shifts,
  endianness 0x01, encoding 20, dataset name, timestamps, page size).
* one META page: subheader pointers (12-byte x86 form) for row-size
  (sig F7F7F7F7), column-size (F6F6F6F6), column-text (FDFFFFFF),
  column-name (FFFFFFFF), column-attributes (FCFFFFFF) and one
  format-and-label (FEFBFFFF) per column, with payloads packed at the
  page tail the way SAS does.
* N DATA pages (type 0x0100): fixed-width rows at byte 24; doubles are
  8-byte IEEE little-endian (NaN = missing), strings space-padded.

Only what a *reader* needs is emitted — no compression, no AMD pages,
no 64-bit variant; columns are double or fixed-width string. That is
exactly the subset the reference's fact table uses (28 columns of
double/string).
"""

from __future__ import annotations

import struct

MAGIC = (
    b"\x00\x00\x00\x00\x00\x00\x00\x00"
    b"\x00\x00\x00\x00\xc2\xea\x81\x60"
    b"\xb3\x14\x11\xcf\xbd\x92\x08\x00"
    b"\x09\xc7\x31\x8c\x18\x1f\x10\x11"
)

HEADER_SIZE = 1024
PAGE_BIT_OFFSET = 16          # x86
SUBHEADER_PTR_LEN = 12        # x86
ROWS_OFFSET = PAGE_BIT_OFFSET + 8   # rows / pointers region start


def _u16(v: int) -> bytes:
    return struct.pack("<H", v)


def _u32(v: int) -> bytes:
    return struct.pack("<I", v)


def _f64(v: float) -> bytes:
    return struct.pack("<d", v)


def write_sas7bdat(
    path: str,
    columns: list[tuple[str, str, int]],
    rows: list[tuple],
    dataset: str = "DATASET",
    page_size: int = 8192,
) -> None:
    """Write ``rows`` with ``columns`` = [(name, 'num'|'char', width)].

    Numeric columns are always 8 bytes (width ignored); char columns are
    fixed ``width`` bytes, utf-8, space-padded/truncated. ``None`` means
    missing (NaN / blank).
    """
    ncols = len(columns)
    widths = [8 if kind == "num" else int(w) for _, kind, w in columns]
    row_length = sum(widths)
    offsets = []
    acc = 0
    for w in widths:
        offsets.append(acc)
        acc += w
    if row_length > page_size - ROWS_OFFSET:
        raise ValueError("row does not fit one page; raise page_size")
    rows_per_page = (page_size - ROWS_OFFSET) // row_length
    n_data_pages = max(1, -(-len(rows) // rows_per_page))

    # ---------------- column-text blob (names, offsets relative to blob
    # start INCLUDING its 2 size bytes — that is how readers slice it)
    name_bytes = [n.encode("utf-8") for n, _, _ in columns]
    blob = bytearray()
    blob += b"\x00\x00"            # size placeholder (filled below)
    blob += b"\x00" * 18           # pad covering creator-proc reads
    name_pos = []
    for nb in name_bytes:
        name_pos.append(len(blob))
        blob += nb
        if len(blob) % 4:
            blob += b"\x00" * (4 - len(blob) % 4)
    blob[0:2] = _u16(len(blob))
    text_payload = b"\xfd\xff\xff\xff" + bytes(blob)

    # ---------------- row-size subheader (length 480)
    rs = bytearray(480)
    rs[0:4] = b"\xf7\xf7\xf7\xf7"
    rs[20:24] = _u32(row_length)          # 5 * int_len
    rs[24:28] = _u32(len(rows))           # 6 * int_len
    rs[36:40] = _u32(ncols)               # col_count_p1
    rs[40:44] = _u32(0)                   # col_count_p2
    rs[60:64] = _u32(0)                   # rows on mix page (no mix pages)
    rs[354:356] = _u16(0)                 # lcs
    rs[378:380] = _u16(0)                 # lcp
    rowsize_payload = bytes(rs)

    # ---------------- column-size subheader
    colsize_payload = b"\xf6\xf6\xf6\xf6" + _u32(ncols) + _u32(0)

    # ---------------- column-name subheader: pointers at +12, 8 bytes each
    cn = bytearray(20 + 8 * ncols)
    cn[0:4] = b"\xff\xff\xff\xff"
    for i, nb in enumerate(name_bytes):
        base = 12 + 8 * i
        cn[base + 0:base + 2] = _u16(0)              # text blob index
        cn[base + 2:base + 4] = _u16(name_pos[i])    # offset in blob
        cn[base + 4:base + 6] = _u16(len(nb))        # length
    colname_payload = bytes(cn)

    # ---------------- column-attributes: 12-byte vectors at +12
    ca = bytearray(20 + 12 * ncols)
    ca[0:4] = b"\xfc\xff\xff\xff"
    for i, (w, off) in enumerate(zip(widths, offsets)):
        base = 12 + 12 * i
        ca[base + 0:base + 4] = _u32(off)            # data offset in row
        ca[base + 4:base + 8] = _u32(w)              # data length
        ca[base + 10] = 1 if columns[i][1] == "num" else 2
    colattr_payload = bytes(ca)

    # ---------------- one format-and-label subheader per column
    fmt_payloads = []
    for _ in range(ncols):
        fb = bytearray(52)
        fb[0:4] = b"\xfe\xfb\xff\xff"
        # format/label idx+offset+len all zero → empty format & label
        fmt_payloads.append(bytes(fb))

    subheaders = [
        rowsize_payload,
        colsize_payload,
        text_payload,
        colname_payload,
        colattr_payload,
        *fmt_payloads,
    ]

    # ---------------- meta page: pointers grow from byte 24, payloads
    # packed at the page tail (descending), SAS-style
    meta = bytearray(page_size)
    meta[PAGE_BIT_OFFSET + 0:PAGE_BIT_OFFSET + 2] = _u16(0x0000)   # meta type
    meta[PAGE_BIT_OFFSET + 2:PAGE_BIT_OFFSET + 4] = _u16(len(subheaders))
    meta[PAGE_BIT_OFFSET + 4:PAGE_BIT_OFFSET + 6] = _u16(len(subheaders))
    tail = page_size
    ptr = ROWS_OFFSET
    need = len(subheaders) * SUBHEADER_PTR_LEN + ROWS_OFFSET
    for payload in subheaders:
        tail -= len(payload)
        if tail < need:
            raise ValueError("metadata does not fit one page; raise page_size")
        meta[tail:tail + len(payload)] = payload
        meta[ptr + 0:ptr + 4] = _u32(tail)           # subheader offset
        meta[ptr + 4:ptr + 8] = _u32(len(payload))   # subheader length
        meta[ptr + 8] = 0                            # compression: none
        meta[ptr + 9] = 0                            # type
        ptr += SUBHEADER_PTR_LEN

    # ---------------- data pages
    def encode_row(row: tuple) -> bytes:
        out = bytearray()
        for (name, kind, _w), w, v in zip(columns, widths, row):
            if kind == "num":
                out += _f64(float("nan") if v is None else float(v))
            else:
                # truncate at a CHARACTER boundary: a naive byte slice
                # can split a multibyte UTF-8 sequence, producing bytes
                # pandas read_sas(..., encoding='utf-8') rejects even
                # though the header declares utf-8
                raw = ("" if v is None else str(v)).encode("utf-8")[:w]
                raw = raw.decode("utf-8", errors="ignore").encode("utf-8")
                out += raw + b" " * (w - len(raw))
        return bytes(out)

    data_pages = []
    for p in range(n_data_pages):
        chunk = rows[p * rows_per_page:(p + 1) * rows_per_page]
        page = bytearray(page_size)
        page[PAGE_BIT_OFFSET + 0:PAGE_BIT_OFFSET + 2] = _u16(0x0100)  # data
        page[PAGE_BIT_OFFSET + 2:PAGE_BIT_OFFSET + 4] = _u16(len(chunk))
        page[PAGE_BIT_OFFSET + 4:PAGE_BIT_OFFSET + 6] = _u16(0)
        pos = ROWS_OFFSET
        for row in chunk:
            enc = encode_row(row)
            page[pos:pos + row_length] = enc
            pos += row_length
        data_pages.append(bytes(page))

    # ---------------- file header
    hdr = bytearray(HEADER_SIZE)
    hdr[0:32] = MAGIC
    hdr[32] = ord("2")            # alignment-1: not '3' → 32-bit
    hdr[35] = ord("2")            # alignment-2: not '3' → no offset shift
    hdr[37] = 0x01                # little-endian
    hdr[39] = ord("1")            # unix platform
    hdr[70] = 20                  # utf-8
    ds = dataset.encode("utf-8")[:64].decode("utf-8", errors="ignore").encode("utf-8")
    hdr[92:92 + len(ds)] = ds
    hdr[92 + len(ds):156] = b" " * (64 - len(ds))
    hdr[156:164] = b"DATA    "
    # seconds since 1960-01-01 (fixed stamp → byte-reproducible files)
    stamp = 2_000_000_000.0
    hdr[164:172] = _f64(stamp)
    hdr[172:180] = _f64(stamp)
    hdr[196:200] = _u32(HEADER_SIZE)
    hdr[200:204] = _u32(page_size)
    hdr[204:208] = _u32(1 + len(data_pages))
    hdr[216:224] = b"9.0401M2"
    hdr[224:240] = b"X64_10PRO".ljust(16)
    hdr[240:256] = b"9.04.01M2".ljust(16)
    hdr[256:272] = b"SASBUILD".ljust(16)
    hdr[272:288] = b"Linux".ljust(16)

    with open(path, "wb") as f:
        f.write(bytes(hdr))
        f.write(bytes(meta))
        for page in data_pages:
            f.write(page)
