"""Reference-domain pipeline: the EXACT app.py/con.py semantics over the
reference's own schema (FIXTURES.md §A) — Vietnamese column names in,
the Streamlit app's per-student analytics out.

A user of the reference switches by pointing this at their records table
(the Excel→Kafka→ES stream re-landed as parquet by streaming/pipeline):

- cohort from the student-id prefix          (app.py:15-21, 86)
- program from class-name prefixes DI/FL    (app.py:90-98; con.py:46-52)
- (program, cohort) → required credits/duration dims (app.py:24-27, 33-36)
- 10-pt → 4-pt grade bucketing w/ pinned boundaries  (app.py:39-55)
- GPA over passed courses, starred-course and in-progress-term
  exclusions, zero-denominator guard        (app.py:128-144)
- elapsed/remaining-semester arithmetic + status rules (app.py:102-121,
  161-178)
- consumer-side derived per-program columns and the composite doc key
  with its NHHK-presence fallback           (con.py:23-30, 46-52)

Everything is native expressions; the dims are broadcast VALUES tables
(the reference's hardcoded dicts, SURVEY.md §1.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import (
    composite_key,
    dround,
    grade_bucket_4pt,
    lenient_double,
)

# app.py:15-21 — cohort map: student-id prefix → intake cohort (khóa)
COHORT_DIM = [("B20", 46), ("B21", 47), ("B22", 48), ("B23", 49), ("B24", 50)]

# app.py:24-27, 33-36 — (program, cohort) → required credits / semesters
PROGRAM_DIM = [
    ("MMT", 46, 156, 13), ("MMT", 47, 156, 13), ("MMT", 48, 161, 13),
    ("MMT", 49, 161, 13), ("MMT", 50, 161, 13),
    ("NNA", 46, 141, 12), ("NNA", 47, 141, 12), ("NNA", 48, 141, 12),
    ("NNA", 49, 141, 12), ("NNA", 50, 141, 12),
]

CURRENT_YEAR = 2024        # app.py:104 fixed reference year
IN_PROGRESS_TERM = 20251   # app.py:131 exclusion
SEMESTERS_PER_YEAR = 3     # app.py:112
CREDITS_PER_SEMESTER = 20  # app.py:117 capacity factor


def canonicalize_records(df: DataFrame) -> DataFrame:
    """Consumer-side typing + derivations (con.py:32-52): lenient casts,
    per-program derived columns, composite doc id with NHHK fallback."""
    out = (
        df.withColumn("F_DIEM2", lenient_double(F.col("F_DIEM2")))
        .withColumn("F_DVHT", lenient_double(F.col("F_DVHT")))
        .withColumn("F_TCDTTL", lenient_double(F.col("F_TCDTTL")))
        # con.py:46-52 — copy course/grade into per-program columns
        .withColumn(
            "NNA",
            F.when(F.col("F_TENLOP").startswith("FL"), F.col("F_TENMHVN")),
        )
        .withColumn(
            "DIEM_NNA",
            F.when(F.col("F_TENLOP").startswith("FL"), F.col("F_DIEM2")),
        )
        .withColumn(
            "MMT",
            F.when(F.col("F_TENLOP").startswith("DI"), F.col("F_TENMHVN")),
        )
        .withColumn(
            "DIEM_MMT",
            F.when(F.col("F_TENLOP").startswith("DI"), F.col("F_DIEM2")),
        )
    )
    # con.py:23-30 — 4-part key when NHHK present, 3-part fallback else
    return out.withColumn(
        "doc_id",
        composite_key(
            F.col("F_MAMH"), F.col("F_MASV"), F.col("F_KHOAHOC"),
            F.col("NHHK"),
            fallback=composite_key(
                F.col("F_MAMH"), F.col("F_MASV"), F.col("F_KHOAHOC")
            ),
        ),
    )


def student_progress_report(spark: SparkSession, records: DataFrame) -> DataFrame:
    """The app.py:58-191 serving pipeline as one expression tree,
    for ALL students at once (the reference computes one student per
    Streamlit rerun; same math, set-at-a-time)."""
    rec = canonicalize_records(records)

    cohort_dim = F.broadcast(
        spark.createDataFrame(COHORT_DIM, "prefix string, khoa int")
    )
    program_dim = F.broadcast(
        spark.createDataFrame(
            PROGRAM_DIM,
            "nganh string, khoa int, total_credits int, total_semesters int",
        )
    )

    # app.py:128,131 — passed courses excluding starred + in-progress term
    passed = (
        (F.col("F_DIEM2") >= 4.0)
        & ~F.col("F_TENMHVN").contains("*")
        & (F.col("NHHK") != F.lit(IN_PROGRESS_TERM))
    )
    graded = rec.withColumn("diem4", grade_bucket_4pt(F.col("F_DIEM2")))

    per_student = graded.groupBy("F_MASV").agg(
        F.count(F.lit(1)).alias("n_rows"),
        # app.py:90-98 — existential program classification
        F.max(
            F.when(F.col("F_TENLOP").startswith("DI"), 1).otherwise(0)
        ).alias("__is_mmt"),
        F.max(
            F.when(F.col("F_TENLOP").startswith("FL"), 1).otherwise(0)
        ).alias("__is_nna"),
        # app.py:137-144 — weighted GPA over passed courses (doubles are
        # fine here: per-student row counts are tiny and the reference
        # itself sums in row order; dround pins the emitted precision)
        F.sum(F.when(passed, F.col("diem4") * F.col("F_DVHT")).otherwise(0.0))
        .alias("__pts"),
        F.sum(F.when(passed, F.col("F_DVHT")).otherwise(0.0)).alias("__cr"),
        # app.py:108 — cumulative credits; reference takes an arbitrary
        # first row, we pin latest-by-event-time for determinism
        F.max_by(F.col("F_TCDTTL"), F.col("`@timestamp`")).alias(
            "credits_completed"
        ),
    )

    classified = per_student.withColumn(
        "nganh",
        F.when(F.col("__is_mmt") == 1, F.lit("MMT"))
        .when(F.col("__is_nna") == 1, F.lit("NNA")),
    ).withColumn(
        "khoa_prefix", F.substring(F.col("F_MASV"), 1, 3)
    )

    report = (
        classified.join(
            cohort_dim, classified.khoa_prefix == cohort_dim.prefix, "left"
        )
        .join(program_dim, ["nganh", "khoa"], "left")
        .withColumn(
            "dtbctl",
            dround(
                F.when(
                    F.col("__cr") > 0, F.col("__pts") / F.col("__cr")
                ).otherwise(F.lit(0.0)),
                4,
            ),
        )
        .withColumn(
            "remaining_credits",
            F.col("total_credits") - F.coalesce(F.col("credits_completed"), F.lit(0.0)),
        )
        # app.py:102-121 — elapsed years since intake; 3 semesters/year
        .withColumn(
            "elapsed_semesters",
            (F.lit(CURRENT_YEAR) - (F.lit(2020) + F.col("khoa") - F.lit(46)))
            * F.lit(SEMESTERS_PER_YEAR),
        )
        .withColumn(
            "remaining_semesters",
            F.col("total_semesters") - F.col("elapsed_semesters"),
        )
        # app.py:161-178 — status rules
        .withColumn(
            "status",
            F.when(F.col("remaining_credits") <= 0, F.lit("completed"))
            .when(
                F.col("remaining_credits")
                <= F.col("remaining_semesters") * F.lit(CREDITS_PER_SEMESTER),
                F.lit("on_track"),
            )
            .otherwise(F.lit("behind")),
        )
        .select(
            "F_MASV", "nganh", "khoa", "n_rows", "dtbctl",
            "credits_completed", "total_credits", "remaining_credits",
            "remaining_semesters", "status",
        )
        .orderBy("F_MASV")
    )
    return report


def transcript(records: DataFrame, masv: str) -> DataFrame:
    """app.py:58-191 single-student view: point filter → projection →
    derived year/semester columns → sort → cap (ES size:1000)."""
    rec = canonicalize_records(records)
    return (
        rec.filter(F.col("F_MASV") == F.lit(masv))
        .select(
            "F_MAMH", "F_TENMHVN", "F_DVHT", "F_MASV", "F_TENLOP",
            "NHHK", "F_DIEM2", "F_TCDTTL",
            # app.py:181-182 — year/semester from the term key
            F.substring(F.col("NHHK").cast("string"), 1, 4)
            .cast("int")
            .alias("nam_hoc"),
            F.substring(F.col("NHHK").cast("string"), 5, 1)
            .cast("int")
            .alias("hoc_ky"),
        )
        # app.py:185 sorts by NHHK alone (arbitrary tie order); we pin a
        # deterministic total order with the course code tiebreaker
        .orderBy("NHHK", "F_MAMH")
        .limit(1000)
    )
