"""Minimal pure-Python ``.xls`` (BIFF8 inside CFB) writer.

The reference emits legacy ``.xls`` workbooks (dividend_extractor.py:
1445-1453 via pandas/xlwt); this container has no Excel library at all, so
``sinks.write_excel_compat`` previously degraded to CSV. This module
writes a real single-sheet ``.xls`` from scratch using only the public
file-format specs:

- [MS-XLS]: Excel Binary File Format (BIFF8) — BOF/BOUNDSHEET/DIMENSIONS/
  LABEL/NUMBER/EOF records;
- [MS-CFB]: Compound File Binary container — FAT, directory, mini stream.

Scope is deliberately the compat-shim scope: one sheet, string + number
cells, no formatting beyond the default font/XF table Excel expects. Cell
strings are written as uncompressed UTF-16 ``Label`` records (no SST, so
no CONTINUE-spanning logic); numbers as IEEE-double ``Number`` records.
BIFF8 hard limits apply: 65536 rows x 256 cols.

This is an output adapter, not an operator: everything stays driver-side
over already-small collected results (the same boundary as the openpyxl
shim it backs up).
"""

from __future__ import annotations

import struct
from collections.abc import Iterable, Sequence

_MAX_ROWS = 65536
_MAX_COLS = 256
# BIFF8 records are capped at 8224 DATA BYTES; a Label's payload is
# 9 fixed bytes + 2 bytes per UTF-16 code unit, so the cell cap is
# (8224 - 9) // 2 = 4107 chars (longer text would need CONTINUE records)
_MAX_CELL_CHARS = 4000


# --------------------------------------------------------------------------
# BIFF8 records
# --------------------------------------------------------------------------


def _rec(rt: int, data: bytes) -> bytes:
    return struct.pack("<HH", rt, len(data)) + data


def _utf16_units(s: str, max_units: int) -> bytes:
    """UTF-16LE payload capped at ``max_units`` CODE UNITS (the unit BIFF
    cch counts — an astral char costs two), never splitting a surrogate
    pair at the cap."""
    enc = s.encode("utf-16-le")
    if len(enc) > 2 * max_units:
        enc = enc[: 2 * max_units]
        last = int.from_bytes(enc[-2:], "little")
        if 0xD800 <= last <= 0xDBFF:  # dangling high surrogate
            enc = enc[:-2]
    return enc


def _unicode_str(s: str) -> bytes:
    """XLUnicodeString: cch(2) flags(1: fHighByte=1 -> UTF-16LE) chars."""
    enc = _utf16_units(s, _MAX_CELL_CHARS)
    return struct.pack("<HB", len(enc) // 2, 0x01) + enc


def _short_unicode_str(s: str) -> bytes:
    """ShortXLUnicodeString: cch(1) flags(1) chars (sheet/font names)."""
    enc = _utf16_units(s, 255)
    return struct.pack("<BB", len(enc) // 2, 0x01) + enc


def _bof(dt: int) -> bytes:
    # vers=0x0600 (BIFF8), dt: 0x0005 globals / 0x0010 worksheet
    return _rec(
        0x0809,
        struct.pack("<HHHHII", 0x0600, dt, 0x0DBB, 0x07CC, 0, 0x0006),
    )


_EOF = _rec(0x000A, b"")


def _font() -> bytes:
    # dyHeight 200 twips (10pt), grbit 0, icv auto, weight 400, then
    # sss/uls/bFamily/bCharSet/reserved, name Arial — 14 fixed bytes
    data = struct.pack(
        "<HHHHHBBBB", 200, 0, 0x7FFF, 400, 0, 0, 0, 0, 0
    ) + _short_unicode_str("Arial")
    return _rec(0x0031, data)


def _xf(style: bool) -> bytes:
    # 20 bytes: ifnt ifmt flags(style XF: fLocked|fStyle|parent=0xFFF ->
    # 0xFFF5; cell XF: fLocked, parent style 0 -> 0x0001), alignment byte
    # 0x20 = vertical bottom, border/fill zeroed, used-attribute tail.
    flags = 0xFFF5 if style else 0x0001
    data = (
        struct.pack("<HHH", 0, 0, flags)
        + bytes([0x20, 0, 0, 0])
        + b"\x00" * 8
        + struct.pack("<H", 0x20C0)
    )
    assert len(data) == 20
    return _rec(0x00E0, data)


def _dimensions(n_rows: int, n_cols: int) -> bytes:
    return _rec(
        0x0200, struct.pack("<IIHHH", 0, n_rows, 0, n_cols, 0)
    )


def _label(row: int, col: int, value: str) -> bytes:
    return _rec(
        0x0204, struct.pack("<HHH", row, col, 15) + _unicode_str(value)
    )


def _number(row: int, col: int, value: float) -> bytes:
    return _rec(0x0203, struct.pack("<HHHd", row, col, 15, float(value)))


def _workbook_stream(sheet_name: str, headers: Sequence[str],
                     rows: Iterable[Sequence]) -> bytes:
    """BIFF8 workbook stream: globals substream + one worksheet substream."""
    grid: list[Sequence] = [list(headers), *[list(r) for r in rows]]
    if len(grid) > _MAX_ROWS:
        raise ValueError(
            f"BIFF8 sheet holds at most {_MAX_ROWS} rows, got {len(grid)}"
        )
    n_cols = max((len(r) for r in grid), default=0)
    if n_cols > _MAX_COLS:
        raise ValueError(
            f"BIFF8 sheet holds at most {_MAX_COLS} columns, got {n_cols}"
        )

    cells = bytearray()
    for r, rowvals in enumerate(grid):
        for c, v in enumerate(rowvals):
            if v is None or (isinstance(v, str) and v == ""):
                continue
            if isinstance(v, bool):
                cells += _label(r, c, str(v))
            elif isinstance(v, (int, float)):
                cells += _number(r, c, v)
            else:
                cells += _label(r, c, str(v))

    sheet = (
        _bof(0x0010)
        + _dimensions(len(grid), n_cols)
        + bytes(cells)
        + _EOF
    )

    # globals: BOF WINDOW1 FONTx4 XFx16 BOUNDSHEET EOF. Excel's reader
    # expects at least 4 fonts (index 4 is skipped historically) and cell
    # XF index 15, hence the fixed-size tables.
    window1 = _rec(
        0x003D, struct.pack("<HHHHHHHHH", 0x168, 0x10E, 0x3A5C, 0x23BE,
                            0x0038, 0, 0, 1, 0x0258)
    )
    fonts = _font() * 4
    xfs = b"".join(_xf(style=True) for _ in range(15)) + _xf(style=False)

    def globals_bytes(sheet_offset: int) -> bytes:
        boundsheet = _rec(
            0x0085,
            struct.pack("<IH", sheet_offset, 0x0000)
            + _short_unicode_str(sheet_name),
        )
        return (
            _bof(0x0005) + window1 + fonts + xfs + boundsheet + _EOF
        )

    # BOUNDSHEET stores the absolute sheet-BOF offset; its own length is
    # offset-independent, so two passes converge immediately
    size = len(globals_bytes(0))
    return globals_bytes(size) + sheet


# --------------------------------------------------------------------------
# CFB container ([MS-CFB] v3: 512-byte sectors, 64-byte mini sectors)
# --------------------------------------------------------------------------

_FREE = 0xFFFFFFFF
_END = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD


def _pad(b: bytes, n: int) -> bytes:
    return b + b"\x00" * (-len(b) % n)


def _dir_entry(name: str, typ: int, start: int, size: int,
               child: int = _FREE) -> bytes:
    raw = name.encode("utf-16-le") + b"\x00\x00"
    return (
        raw.ljust(64, b"\x00")
        + struct.pack("<H", len(raw))
        + struct.pack("<BB", typ, 1)  # type, black
        + struct.pack("<III", _FREE, _FREE, child)  # left, right, child
        + b"\x00" * 16  # clsid
        + b"\x00" * 4  # state
        + b"\x00" * 16  # timestamps
        + struct.pack("<I", start)
        + struct.pack("<Q", size)
    )


def _chain(first: int, count: int) -> list[int]:
    return [*range(first + 1, first + count), _END] if count else []


def _cfb(stream: bytes) -> bytes:
    """Wrap one 'Workbook' stream in a v3 compound file."""
    use_mini = len(stream) < 4096
    sectors: list[bytes] = []
    fat: list[int] = []

    if use_mini:
        mini = _pad(stream, 64)
        n_mini = len(mini) // 64
        mini_fat = _chain(0, n_mini)
        mini_fat_data = _pad(
            b"".join(struct.pack("<I", e) for e in mini_fat), 512
        )
        n_ms = len(_pad(mini, 512)) // 512
        # sectors: [ministream x n_ms][miniFAT x n_mf][dir][FAT...]
        for i in range(n_ms):
            sectors.append(_pad(mini[i * 512:(i + 1) * 512], 512))
        fat += _chain(0, n_ms)
        n_mf = len(mini_fat_data) // 512
        first_mf = len(sectors)
        for i in range(n_mf):
            sectors.append(mini_fat_data[i * 512:(i + 1) * 512])
        fat += _chain(first_mf, n_mf)
        root_start, root_size = 0, len(mini)
        wb_start = 0  # mini-sector index
        first_minifat, n_minifat = first_mf, n_mf
    else:
        data = _pad(stream, 512)
        n_wb = len(data) // 512
        for i in range(n_wb):
            sectors.append(data[i * 512:(i + 1) * 512])
        fat += _chain(0, n_wb)
        root_start, root_size = _END, 0
        wb_start = 0
        first_minifat, n_minifat = _END, 0

    dir_sector_idx = len(sectors)
    directory = _pad(
        _dir_entry("Root Entry", 5, root_start, root_size, child=1)
        + _dir_entry("Workbook", 2, wb_start, len(stream))
        + b"\x00" * 256,  # two unused (all-zero) directory entries
        512,
    )
    sectors.append(directory)
    fat.append(_END)

    # FAT sectors (self-referencing entries), sized iteratively; free
    # entries are 0xFFFFFFFF, never zero (zero would alias sector 0)
    n_fat = 1
    while (len(sectors) + n_fat) * 4 > n_fat * 512:
        n_fat += 1
    if n_fat > 109:
        # >109 FAT sectors (~6.8 MB) needs DIFAT chaining, out of scope
        # for the compat shim's small outputs
        raise ValueError(
            f"workbook stream of {len(stream)} bytes exceeds the minimal "
            "CFB writer's header-DIFAT capacity (~6.8 MB)"
        )
    fat += [_FATSECT] * n_fat
    fat += [_FREE] * (n_fat * 128 - len(fat))
    fat_data = b"".join(struct.pack("<I", e) for e in fat)
    fat_first = len(sectors)
    for i in range(n_fat):
        sectors.append(fat_data[i * 512:(i + 1) * 512])

    difat = [fat_first + i for i in range(n_fat)]
    difat += [_FREE] * (109 - len(difat))
    header = (
        b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
        + b"\x00" * 16
        + struct.pack("<HHHHHH", 0x003E, 0x0003, 0xFFFE, 0x0009, 0x0006, 0)
        + b"\x00" * 4
        + struct.pack("<I", 0)  # transaction
        + struct.pack("<I", n_fat)
        + struct.pack("<I", dir_sector_idx)
        + struct.pack("<I", 0)
        + struct.pack("<I", 0x1000)  # mini cutoff 4096
        + struct.pack("<I", first_minifat)
        + struct.pack("<I", n_minifat)
        + struct.pack("<I", _END)  # first DIFAT sector
        + struct.pack("<I", 0)  # n DIFAT sectors
        + b"".join(struct.pack("<I", s) for s in difat)
    )
    assert len(header) == 512, len(header)
    return header + b"".join(sectors)


def write_xls(path: str, headers: Sequence[str], rows: Iterable[Sequence],
              sheet_name: str = "Sheet1") -> str:
    """Write a single-sheet legacy ``.xls`` workbook; returns ``path``."""
    stream = _workbook_stream(sheet_name, headers, rows)
    with open(path, "wb") as fh:
        fh.write(_cfb(stream))
    return path
