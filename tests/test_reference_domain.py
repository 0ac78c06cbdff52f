"""Reference-exact semantics over the reference's own schema
(FIXTURES.md §A): crafted student records with hand-computed expected
outputs pin every behavioral detail observed in app.py/con.py —
grade-boundary bucketing, starred-course and in-progress-term
exclusions, the GPA zero-guard, lenient casts, program classification,
the composite-key NHHK fallback, and the status rules."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from _big_data_analytics_and_visualization_tracking_student_progress__spark.plans.reference_domain import (
    canonicalize_records,
    student_progress_report,
    transcript,
)

SCHEMA = (
    "F_MASV string, F_MAMH string, F_TENMHVN string, F_DVHT string, "
    "F_TENLOP string, NHHK int, F_DIEM2 string, F_TCDTTL string, "
    "F_KHOAHOC string, `@timestamp` timestamp"
)


def _ts(i):
    return dt.datetime(2024, 1, 1, 0, 0, i)


def _records(spark):
    rows = [
        # s1 (B20→khoa 46, MMT via DI class): two passed courses,
        # one starred (excluded), one failing, one in-progress term.
        ("B2010001", "CT101", "Giai tich", "3", "DI20A", 20231, "9.0", "100", "2020", _ts(1)),
        ("B2010001", "CT102", "Vat ly", "2", "DI20A", 20232, "6.5", "100", "2020", _ts(2)),
        ("B2010001", "CT103", "Mon sao *", "3", "DI20A", 20232, "8.0", "100", "2020", _ts(3)),
        ("B2010001", "CT104", "Hoa hoc", "4", "DI20A", 20231, "3.9", "100", "2020", _ts(4)),
        ("B2010001", "CT105", "Do an", "2", "DI20A", 20251, "9.5", "120", "2020", _ts(5)),
        # s2 (B22→khoa 48, NNA via FL class): completed (credits >= 141).
        ("B2230002", "AV201", "Anh van", "5", "FL22B", 20241, "8.0", "141", "2022", _ts(6)),
        # s3 (B24→khoa 50, MMT): no passed courses → GPA zero-guard;
        # F_DVHT junk exercises the lenient cast; far behind.
        ("B2450003", "CT301", "Mang may tinh", "abc", "DI24C", 20241, "2.0", "10", "2024", _ts(7)),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_progress_report_matches_hand_computation(spark):
    report = {
        r.F_MASV: r
        for r in student_progress_report(spark, _records(spark)).collect()
    }

    # s1: passed = CT101 (9.0→4.0pt ×3cr) + CT102 (6.5→2.5pt ×2cr);
    # starred CT103, failing CT104 (3.9 < 4.0), in-progress CT105 excluded.
    # GPA = (4.0*3 + 2.5*2) / 5 = 17/5 = 3.4
    s1 = report["B2010001"]
    assert s1.nganh == "MMT" and s1.khoa == 46
    assert s1.dtbctl == 3.4
    # latest-by-timestamp cumulative credits = 120 (the 20251 row)
    assert s1.credits_completed == 120.0
    # remaining = 156-120 = 36; elapsed = (2024-2020)*3 = 12 semesters;
    # remaining_semesters = 13-12 = 1 → capacity 20 < 36 → behind
    assert s1.remaining_credits == 36.0
    assert s1.status == "behind"

    # s2: NNA khoa 48 → 141 required, completed 141 → remaining 0 → completed
    s2 = report["B2230002"]
    assert s2.nganh == "NNA" and s2.khoa == 48
    assert s2.dtbctl == 3.5  # 8.0 → 3.5, single 5-credit course
    assert s2.remaining_credits == 0.0 and s2.status == "completed"

    # s3: zero passed credits → GPA guard yields 0.0 (not NULL);
    # khoa 50: remaining = 161-10 = 151; elapsed = 0 → remaining 13
    # semesters → capacity 260 ≥ 151 → on_track
    s3 = report["B2450003"]
    assert s3.dtbctl == 0.0
    assert s3.status == "on_track"


def test_canonicalize_derived_columns_and_key_fallback(spark):
    rows = [
        ("B2010001", "CT101", "GT", "3", "DI20A", 20231, "9.0", "100", "2020", _ts(1)),
        ("B2230002", "AV201", "AV", "5", "FL22B", None, "8.0", "141", "2022", _ts(2)),
        ("B2450003", "XX300", "XX", "2", "ZZ24",  20241, "bad", "10",  "2024", _ts(3)),
    ]
    rec = {
        r.F_MAMH: r
        for r in canonicalize_records(
            spark.createDataFrame(rows, SCHEMA)
        ).collect()
    }
    # con.py:46-52 — per-program copies, NULL on the other side
    assert rec["CT101"].MMT == "GT" and rec["CT101"].DIEM_MMT == 9.0
    assert rec["CT101"].NNA is None
    assert rec["AV201"].NNA == "AV" and rec["AV201"].DIEM_NNA == 8.0
    # neither prefix → both NULL
    assert rec["XX300"].MMT is None and rec["XX300"].NNA is None
    # lenient cast: invalid grade → NULL, not error (con.py:39-43)
    assert rec["XX300"].F_DIEM2 is None
    # con.py:23-30 — 4-part key with NHHK, 3-part fallback without
    assert rec["CT101"].doc_id == "CT101_B2010001_2020_20231"
    assert rec["AV201"].doc_id == "AV201_B2230002_2022"


def test_transcript_projection_sort_and_derived_term_parts(spark):
    out = transcript(_records(spark), "B2010001").collect()
    assert [r.F_MAMH for r in out] == ["CT101", "CT104", "CT102", "CT103", "CT105"]
    assert out[0].nam_hoc == 2023 and out[0].hoc_ky == 1
    assert out[-1].nam_hoc == 2025 and out[-1].hoc_ky == 1
    assert all(r.F_MASV == "B2010001" for r in out)
