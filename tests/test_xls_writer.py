"""Round-trip tests for the pure-Python .xls writer.

The reader half below is written INDEPENDENTLY from the [MS-CFB]/[MS-XLS]
specs (header offsets, FAT walking, record parsing) rather than reusing
any writer helper — so a writer bug cannot cancel itself out in the
assertions. No Excel library exists in this container; this is the only
way to validate the bytes.
"""

from __future__ import annotations

import struct

from fund_data_etl_pipeline_spark.operators.xls_writer import write_xls

END, FREE = 0xFFFFFFFE, 0xFFFFFFFF


def _read_cfb_stream(blob: bytes, stream_name: str) -> bytes:
    assert blob[:8] == b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    (sector_shift,) = struct.unpack_from("<H", blob, 30)
    (mini_shift,) = struct.unpack_from("<H", blob, 32)
    (n_fat,) = struct.unpack_from("<I", blob, 44)
    (first_dir,) = struct.unpack_from("<I", blob, 48)
    (mini_cutoff,) = struct.unpack_from("<I", blob, 56)
    (first_minifat,) = struct.unpack_from("<I", blob, 60)
    sect = 1 << sector_shift
    assert sect == 512 and (1 << mini_shift) == 64 and mini_cutoff == 4096

    def sector(i: int) -> bytes:
        off = 512 + i * sect
        return blob[off:off + sect]

    difat = struct.unpack_from("<109I", blob, 76)
    fat = []
    for s in difat[:n_fat]:
        fat += list(struct.unpack(f"<{sect // 4}I", sector(s)))

    def chain(start: int) -> bytes:
        out, cur, seen = b"", start, set()
        while cur != END:
            assert cur not in seen, "FAT cycle"
            seen.add(cur)
            out += sector(cur)
            cur = fat[cur]
        return out

    directory = chain(first_dir)
    entries = {}
    for off in range(0, len(directory), 128):
        e = directory[off:off + 128]
        (nlen,) = struct.unpack_from("<H", e, 64)
        if nlen < 2:
            continue
        name = e[: nlen - 2].decode("utf-16-le")
        (start,) = struct.unpack_from("<I", e, 116)
        (size,) = struct.unpack_from("<Q", e, 120)
        entries[name] = (e[66], start, size)

    typ, start, size = entries[stream_name]
    assert typ == 2
    if size >= mini_cutoff:
        return chain(start)[:size]
    # mini stream lives in the root entry's regular chain
    _, root_start, root_size = entries["Root Entry"]
    ministream = chain(root_start)[:root_size]
    minifat = []
    cur = first_minifat
    while cur != END:
        minifat += list(struct.unpack(f"<{sect // 4}I", sector(cur)))
        cur = fat[cur]
    out, cur = b"", start
    while cur != END:
        out += ministream[cur * 64:(cur + 1) * 64]
        cur = minifat[cur]
    return out[:size]


def _parse_biff_cells(stream: bytes) -> tuple[dict[tuple[int, int], object], int]:
    """Walk BIFF records; return {(row, col): value} for the worksheet
    substream and the count of substreams (BOF records)."""
    cells: dict[tuple[int, int], object] = {}
    pos, bofs, in_sheet = 0, 0, False
    while pos + 4 <= len(stream):
        rt, ln = struct.unpack_from("<HH", stream, pos)
        data = stream[pos + 4:pos + 4 + ln]
        pos += 4 + ln
        if rt == 0x0809:
            bofs += 1
            (vers, dt) = struct.unpack_from("<HH", data, 0)
            assert vers == 0x0600
            in_sheet = dt == 0x0010
        elif rt == 0x0204 and in_sheet:  # Label
            r, c, _ = struct.unpack_from("<HHH", data, 0)
            cch, flags = struct.unpack_from("<HB", data, 6)
            assert flags == 0x01
            cells[(r, c)] = data[9:9 + 2 * cch].decode("utf-16-le")
        elif rt == 0x0203 and in_sheet:  # Number
            r, c, _, v = struct.unpack_from("<HHHd", data, 0)
            cells[(r, c)] = v
    return cells, bofs


def _roundtrip(tmp_path, headers, rows):
    p = str(tmp_path / "out.xls")
    write_xls(p, headers, rows)
    blob = open(p, "rb").read()
    assert len(blob) % 512 == 0
    stream = _read_cfb_stream(blob, "Workbook")
    cells, bofs = _parse_biff_cells(stream)
    assert bofs == 2  # globals + one worksheet
    return cells


def test_small_workbook_ministream_roundtrip(tmp_path):
    """<4096-byte stream exercises the miniFAT path; Chinese headers
    exercise UTF-16 Label encoding."""
    headers = ["基金代码", "金额", "平台"]
    rows = [["000001", 1234.56, "盈米"], ["000002", 78.9, "联泰"]]
    cells = _roundtrip(tmp_path, headers, rows)
    assert cells[(0, 0)] == "基金代码"
    assert cells[(0, 2)] == "平台"
    assert cells[(1, 0)] == "000001"
    assert cells[(1, 1)] == 1234.56
    assert cells[(2, 2)] == "联泰"


def test_large_workbook_fat_roundtrip(tmp_path):
    """>4096-byte stream exercises the regular-FAT path across multiple
    sectors; integers survive as doubles (BIFF Number cells)."""
    headers = ["id", "name", "value"]
    rows = [[i, f"row-{i:04d}", i * 0.5] for i in range(500)]
    cells = _roundtrip(tmp_path, headers, rows)
    assert cells[(1, 0)] == 0.0
    assert cells[(500, 1)] == "row-0499"
    assert cells[(250, 2)] == 249 * 0.5
    assert len(cells) == 3 + 500 * 3  # numeric zeros are written, not skipped


def test_empty_and_none_cells_skipped(tmp_path):
    cells = _roundtrip(
        tmp_path, ["a", "b"], [["", None], ["x", 1]]
    )
    assert (1, 0) not in cells and (1, 1) not in cells
    assert cells[(2, 0)] == "x" and cells[(2, 1)] == 1.0


def test_write_excel_compat_prefers_builtin_xls(spark, tmp_path):
    from fund_data_etl_pipeline_spark.operators.sinks import write_excel_compat

    df = spark.createDataFrame(
        [("000001", 10.5)], "fund_code string, amount double"
    )
    p = str(tmp_path / "【境内基金业务】红利再投.xls")
    out = write_excel_compat(df, p, cn_headers=True)
    assert out == p
    blob = open(p, "rb").read()
    assert blob[:8] == b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    cells, _ = _parse_biff_cells(_read_cfb_stream(blob, "Workbook"))
    assert cells[(1, 1)] == 10.5


def test_cell_strings_never_exceed_record_cap(tmp_path):
    """BIFF8 caps record data at 8224 bytes; an over-long cell must be
    truncated to fit (9 fixed bytes + 2/char), never emit an oversized
    record."""
    big = "字" * 20_000
    p = str(tmp_path / "big.xls")
    write_xls(p, ["col"], [[big]])
    stream = _read_cfb_stream(open(p, "rb").read(), "Workbook")
    pos = 0
    while pos + 4 <= len(stream):
        rt, ln = struct.unpack_from("<HH", stream, pos)
        assert ln <= 8224, f"record {rt:#x} has {ln} data bytes"
        pos += 4 + ln
    cells, _ = _parse_biff_cells(stream)
    assert cells[(1, 0)] == big[:4000]


def test_hypothesis_roundtrip(tmp_path):
    from hypothesis import given, settings, strategies as st

    cell = st.one_of(
        st.text(
            alphabet=st.characters(
                codec="utf-16",
                exclude_categories=("Cs",),
            ),
            max_size=40,
        ),
        st.floats(allow_nan=False, allow_infinity=False, width=64),
        st.integers(min_value=-2**40, max_value=2**40),
        st.none(),
    )

    @settings(max_examples=25, deadline=None)
    @given(st.lists(st.lists(cell, min_size=2, max_size=2), max_size=12))
    def run(rows):
        p = str(tmp_path / "h.xls")
        write_xls(p, ["a", "b"], rows)
        cells, _ = _parse_biff_cells(
            _read_cfb_stream(open(p, "rb").read(), "Workbook")
        )
        for ri, row in enumerate(rows, start=1):
            for ci, v in enumerate(row):
                got = cells.get((ri, ci))
                if v is None or v == "":
                    assert got is None
                elif isinstance(v, str):
                    assert got == v
                else:
                    assert got == float(v)

    run()
