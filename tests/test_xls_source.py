"""Legacy .xls (BIFF8) ingestion (VERDICT r5 item 4; reference
pro.py:99-108 — the watcher accepts both .xlsx and .xls, and until this
round only .xlsx was parseable).

sources/xls.py vendors a stdlib CFB + BIFF8 reader; these tests cover
the container (mini-stream AND regular-sector layouts), the cell record
set (LABELSST/RK/NUMBER/BOOLERR/MULRK/FORMULA+STRING), CONTINUE-split
shared strings (the genuinely tricky BIFF8 rule: a split string restarts
with a fresh flags byte), the BIFF5 typed error, and the `read_excel`
magic-byte dispatch shared with the xlsx path.
"""

from __future__ import annotations

import struct

import pytest

from _big_data_analytics_and_visualization_tracking_student_progress__spark.sources.readers import (
    read_excel,
)
from _big_data_analytics_and_visualization_tracking_student_progress__spark.sources.xls import (
    _BOF,
    _BOOLERR,
    _BOUNDSHEET,
    _CONTINUE,
    _EOF,
    _FORMULA,
    _LABELSST,
    _MULRK,
    _SST,
    _STRING,
    CFB_SIG,
    UnsupportedXlsError,
    _cfb_wrap,
    _decode_rk,
    _rec,
    read_xls_rows,
    write_minimal_xls,
)

HEADER = ["F_MASV", "F_DIEM2", "F_PASSED"]
ROWS = [
    ["B2012345", 8.5, True],  # 8.5 → NUMBER record
    ["B2012346", 4.0, False],  # 4.0 → RK integer record
    [None, None, None],  # all-empty: skipped (pro.py:41 any(row))
    ["B2012347", None, True],  # sparse row: None survives
]
EXPECT = [
    ("B2012345", 8.5, True),
    ("B2012346", 4.0, False),
    ("B2012347", None, True),
]


def test_xls_round_trip_ministream(tmp_path):
    """Streams under the 4096-byte CFB cutoff live in 64-byte mini
    sectors (how Excel actually writes small workbooks)."""
    path = str(tmp_path / "grades.xls")
    write_minimal_xls(path, HEADER, ROWS)
    header, rows = read_xls_rows(path)
    assert header == HEADER
    assert rows == EXPECT


def test_xls_round_trip_regular_sectors(tmp_path):
    path = str(tmp_path / "grades_fat.xls")
    write_minimal_xls(path, HEADER, ROWS, force_fat=True)
    header, rows = read_xls_rows(path)
    assert header == HEADER
    assert rows == EXPECT


def test_large_workbook_multi_fat_round_trip(tmp_path):
    """>64 KB workbook streams need more than one FAT sector (one maps
    128 sectors); the writer chains them through the header DIFAT and
    the reader walks them back — this is the sf1-scale shape of
    modified_file_reingest's drop file."""
    rows = [[f"D{i:05d}", float(i), i % 2 == 0] for i in range(3000)]
    path = str(tmp_path / "big.xls")
    write_minimal_xls(path, HEADER, rows)
    import os

    assert os.path.getsize(path) > 100_000  # genuinely multi-FAT
    header, got = read_xls_rows(path)
    assert header == HEADER
    assert len(got) == 3000
    assert got[0] == ("D00000", 0.0, True)
    assert got[-1] == ("D02999", 2999.0, False)


def test_rk_decoding():
    # integer, integer/100, and truncated-double forms ([MS-XLS] 2.5.276)
    assert _decode_rk((42 << 2) | 2) == 42.0
    assert _decode_rk(((-7) << 2 | 2) & 0xFFFFFFFF) == -7.0
    assert _decode_rk(((1234 << 2) | 2 | 1) & 0xFFFFFFFF) == 12.34
    top30 = struct.unpack("<Q", struct.pack("<d", 2.5))[0] >> 32
    assert _decode_rk(top30 & 0xFFFFFFFC) == 2.5


def _wrap_records(globals_body: bytes, sheet_cells: bytes) -> bytes:
    """Assemble a workbook stream from raw globals records (caller
    supplies SST et al.) + one worksheet with the given cell records."""
    sheet = (
        _rec(_BOF, struct.pack("<HHHHII", 0x0600, 0x0010, 0, 0, 0, 0))
        + sheet_cells
        + _rec(_EOF)
    )
    bs = struct.pack("<IBB", 0, 0, 0) + struct.pack("<BB", 6, 0) + b"Sheet1"
    g = bytearray(
        _rec(_BOF, struct.pack("<HHHHII", 0x0600, 0x0005, 0, 0, 0, 0))
    )
    g += globals_body
    bs_at = len(g)
    g += _rec(_BOUNDSHEET, bs) + _rec(_EOF)
    struct.pack_into("<I", g, bs_at + 4, len(g))
    return bytes(g) + sheet


def test_sst_continue_split_mid_string(tmp_path):
    """A shared string split across SST→CONTINUE restarts with a new
    flags byte — here the first half is compressed, the second half
    UTF-16 ([MS-XLS] 2.5.293)."""
    s1, s2a, s2b = "id", "abc", "déf"
    sst1 = struct.pack("<II", 2, 2)
    sst1 += struct.pack("<HB", len(s1), 0) + s1.encode("latin-1")
    # second string: cch covers both halves; payload stops mid-string
    sst1 += struct.pack("<HB", len(s2a) + len(s2b), 0) + s2a.encode("latin-1")
    cont = bytes([1]) + s2b.encode("utf-16-le")  # fresh grbit: fHighByte
    cells = (
        _rec(_LABELSST, struct.pack("<HHHI", 0, 0, 0, 0))
        + _rec(_LABELSST, struct.pack("<HHHI", 1, 0, 0, 1))
    )
    wb = _wrap_records(_rec(_SST, sst1) + _rec(_CONTINUE, cont), cells)
    path = str(tmp_path / "cont.xls")
    with open(path, "wb") as fh:
        fh.write(_cfb_wrap(wb))
    header, rows = read_xls_rows(path)
    assert header == [s1]
    assert rows == [(s2a + s2b,)]


def test_mulrk_and_formula_records(tmp_path):
    """MULRK packs a run of RK cells; FORMULA carries a cached double or
    defers a string result to the following STRING record."""
    sst = _rec(_SST, struct.pack("<II", 2, 2)
               + struct.pack("<HB", 1, 0) + b"a"
               + struct.pack("<HB", 1, 0) + b"b")
    mulrk = struct.pack("<HH", 1, 0)
    for v in (10, 20, 30):
        mulrk += struct.pack("<HI", 0, ((v << 2) | 2) & 0xFFFFFFFF)
    mulrk += struct.pack("<H", 2)
    f_num = struct.pack("<HHH", 2, 0, 0) + struct.pack("<d", 6.25) + b"\x00" * 8
    f_str = (
        struct.pack("<HHH", 2, 1, 0)
        + b"\x00" + b"\x00" * 5 + b"\xff\xff"
        + b"\x00" * 8
    )
    cells = (
        _rec(_LABELSST, struct.pack("<HHHI", 0, 0, 0, 0))
        + _rec(_LABELSST, struct.pack("<HHHI", 0, 1, 0, 1))
        + _rec(_MULRK, mulrk)
        + _rec(_FORMULA, f_num)
        + _rec(_FORMULA, f_str)
        + _rec(_STRING, struct.pack("<HB", 3, 0) + b"sum")
        + _rec(_BOOLERR, struct.pack("<HHHBB", 3, 0, 0, 0, 1))  # error cell
    )
    wb = _wrap_records(sst, cells)
    path = str(tmp_path / "mulrk.xls")
    with open(path, "wb") as fh:
        fh.write(_cfb_wrap(wb))
    header, rows = read_xls_rows(path)
    assert header == ["a", "b", "col2"]
    assert rows == [
        (10.0, 20.0, 30.0),
        (6.25, "sum", None),
    ]


def test_biff5_roundtrip(tmp_path):
    """BIFF5 'Book' stream subset: inline LABEL byte strings + RK/
    NUMBER/BOOLERR parse back to the same (header, rows) shape."""
    path = str(tmp_path / "old.xls")
    write_minimal_xls(
        path,
        ["F_MASV", "F_DIEM2", "F_PASSED"],
        [["B001", 8.5, True], ["B002", 4.0, False]],
        biff5=True,
    )
    header, rows = read_xls_rows(path)
    assert header == ["F_MASV", "F_DIEM2", "F_PASSED"]
    assert rows == [("B001", 8.5, True), ("B002", 4.0, False)]


def test_pre_biff5_stream_raises_typed_error(tmp_path):
    """A 'Book' stream that is NOT BIFF5 (BIFF2-4 BOF) names the gap
    instead of mis-parsing."""
    wb = _rec(0x0209, struct.pack("<HH", 0x0300, 0x0010))  # BIFF3 BOF
    blob = _cfb_wrap(wb, stream_name="Book")
    path = str(tmp_path / "ancient.xls")
    with open(path, "wb") as fh:
        fh.write(blob)
    with pytest.raises(UnsupportedXlsError, match="BIFF2-4"):
        read_xls_rows(path)


def test_not_a_compound_file_raises(tmp_path):
    path = str(tmp_path / "bogus.xls")
    with open(path, "wb") as fh:
        fh.write(b"definitely not CFB")
    with pytest.raises(UnsupportedXlsError, match="compound file"):
        read_xls_rows(path)


def test_read_excel_dispatches_on_magic(spark, tmp_path):
    """Same workbook content through .xls lands in the identical Spark
    schema/rows the .xlsx path produces (shared type resolution)."""
    from _big_data_analytics_and_visualization_tracking_student_progress__spark.sources.xlsx import (
        write_minimal_xlsx,
    )

    xls_path = str(tmp_path / "drop.xls")
    xlsx_path = str(tmp_path / "drop.xlsx")
    write_minimal_xls(xls_path, HEADER, ROWS)
    write_minimal_xlsx(xlsx_path, HEADER, ROWS)
    with open(xls_path, "rb") as fh:
        assert fh.read(8) == CFB_SIG

    df_xls = read_excel(spark, xls_path)
    df_xlsx = read_excel(spark, xlsx_path)
    assert df_xls.schema == df_xlsx.schema
    assert df_xls.schema.simpleString() == (
        "struct<F_MASV:string,F_DIEM2:double,F_PASSED:boolean>"
    )
    key = lambda r: r["F_MASV"]  # noqa: E731
    assert sorted(df_xls.collect(), key=key) == sorted(
        df_xlsx.collect(), key=key
    )


def test_writer_row_cap_raises_typed_error(tmp_path):
    """BIFF8 row indexes are uint16 — the 65,536-row sheet cap must
    surface as a typed UnsupportedXlsError naming the limit, not an
    opaque struct.error deep in the pack loop (ADVICE r6)."""
    rows = [[i] for i in range(65536)]  # + header row = 65,537
    with pytest.raises(UnsupportedXlsError, match="65,536"):
        write_minimal_xls(str(tmp_path / "big.xls"), ["a"], rows)


def test_biff5_formula_string_records(tmp_path):
    """BIFF5 FORMULA (0x0406) with a cached string result defers to a
    BIFF5 STRING record (cch + codepage bytes, NO flags byte) — the
    byte-string decode must not be routed through the BIFF8
    XLUnicodeString parser."""
    from _big_data_analytics_and_visualization_tracking_student_progress__spark.sources.xls import (
        _BOF5,
        _BOUNDSHEET,
        _FORMULA5,
        _LABEL,
        _NUMBER,
    )

    f_str = (
        struct.pack("<HHH", 1, 0, 0)
        + b"\x00" + b"\x00" * 5 + b"\xff\xff"
        + b"\x00" * 8
    )
    sheet = (
        _rec(_BOF5, struct.pack("<HHHH", 0x0500, 0x0010, 0, 0))
        + _rec(_LABEL, struct.pack("<HHHH", 0, 0, 0, 3) + b"Bob")
        + _rec(_FORMULA5, f_str)
        + _rec(_STRING, struct.pack("<H", 3) + b"Bob")
        + _rec(_NUMBER, struct.pack("<HHHd", 1, 1, 0, 1.5))
        + _rec(_EOF)
    )
    name = b"Sheet1"
    bs = struct.pack("<IBB", 0, 0, 0) + struct.pack("<B", len(name)) + name
    globals_ = bytearray(
        _rec(_BOF5, struct.pack("<HHHH", 0x0500, 0x0005, 0, 0))
    )
    bs_at = len(globals_)
    globals_ += _rec(_BOUNDSHEET, bs)
    globals_ += _rec(_EOF)
    struct.pack_into("<I", globals_, bs_at + 4, len(globals_))
    blob = _cfb_wrap(bytes(globals_) + sheet, stream_name="Book")
    path = str(tmp_path / "f5.xls")
    with open(path, "wb") as fh:
        fh.write(blob)
    header, rows = read_xls_rows(path)
    assert header == ["Bob", "col1"]
    assert rows == [("Bob", 1.5)]
