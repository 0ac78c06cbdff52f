"""Flagship plan — the reference's serving-path analytics (app.py:58-191)
re-expressed as ONE declarative DataFrame expression tree over the driver's
star-schema fixtures.

Reference pipeline (per student): point filter → projection → dimension
dict-lookups → grade bucketing (10pt→4pt CASE, app.py:39-55) → pass/term
filters (app.py:128,131) → weighted-average GPA with zero-guard
(app.py:137-144) → rule-based status (app.py:161-178) → sort (app.py:185).

Fixture mapping: customer≈student, lineitem⋈orders≈course attempts,
nation/region≈cohort/program dims.  grade10 = l_quantity/5 (0.2-10.0),
credits = l_extendedprice/10000.

Scale notes (100 TB posture):
- lineitem⋈orders is the one big shuffle (both sides huge): equi-join on
  orderkey — Catalyst picks sort-merge; AQE handles skew.  On a real
  deployment both tables would be bucketed by orderkey to make it
  shuffle-free; fixtures are plain parquet so we let AQE size it.
- customer/nation/region joins are broadcast (dimension side is tiny
  relative to fact) — no shuffle of the fact table for them.
- Aggregation is partial (map-side combine) then final per c_custkey —
  Catalyst does this automatically for sum/count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datasets import load_table
from ..functions.scalar import dround, grade_bucket_4pt, status_case

# program_dim analog (reference app.py:24-27, 33-36 hardcoded dicts →
# broadcast-able VALUES dim): per-region credit requirement + semester count.
PROGRAM_DIM_ROWS = [
    ("AFRICA", 100.0, 12),
    ("AMERICA", 110.0, 12),
    ("ASIA", 120.0, 13),
    ("EUROPE", 130.0, 13),
    ("MIDDLE EAST", 140.0, 14),
]
PROGRAM_DIM_SQL_VALUES = ", ".join(
    f"('{name}', {cred}, {sem})" for name, cred, sem in PROGRAM_DIM_ROWS
)


def _graded_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem⋈orders⋈customer⋈nation⋈region with derived grade columns."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    dim = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "c_name", "n_name", "r_name")
    )

    fact = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dim), orders.o_custkey == dim.c_custkey)
        .withColumn("grade10", F.col("l_quantity") / F.lit(5.0))
        .withColumn("credits", F.col("l_extendedprice") / F.lit(10000.0))
        .withColumn("grade4", grade_bucket_4pt(F.col("grade10")))
    )
    return fact


def flagship_progress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer progress report: GPA, credits, completion pct, status.

    Aggregation runs on the integer key alone; the (name, nation,
    region) attributes are functionally dependent on it and join back
    AFTER the aggregate — the shuffle carries (key, partials), never
    strings, and the hash-aggregate hashes one long instead of four
    columns.  At 100 TB that is the difference between shuffling the
    fact table's width and shuffling its key."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    dim = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "c_name", "n_name", "r_name")
    )

    fact = (
        lineitem.select(
            "l_orderkey", "l_quantity", "l_extendedprice",
            "l_returnflag", "l_linestatus",
        )
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .withColumn("grade10", F.col("l_quantity") / F.lit(5.0))
        .withColumn("credits", F.col("l_extendedprice") / F.lit(10000.0))
        .withColumn("grade4", grade_bucket_4pt(F.col("grade10")))
    )

    # P3/P4 analog: passed = grade >= 4.0 on the 10-pt scale, excluding
    # "starred" rows (returnflag contains R, app.py:128 — `contains`, not
    # a regex: the semantics are a literal-substring test and RLIKE would
    # drag a regex engine into the per-row hot path) and the in-progress
    # term (open linestatus, app.py:131).  Materialized ONCE as a boolean
    # column so the six aggregate CASE branches reuse it instead of
    # re-evaluating the compound predicate per branch.
    fact = fact.withColumn(
        "passed",
        (F.col("grade10") >= 4.0)
        & (~F.col("l_returnflag").contains("R"))
        & (F.col("l_linestatus") != "O"),
    )
    passed = F.col("passed")

    # Fixed-point aggregation: the fixture's prices are exact cents and
    # grade4 is an exact tenth, so the weighted sums are EXACT long sums
    # (order-independent ⇒ deterministic across any partitioning) on the
    # codegen fast path — ~2× faster than DECIMAL accumulators, which
    # box into Decimal128 state.  One double division at the edge; both
    # operands are integers < 2^53, so the quotient is bit-identical on
    # any IEEE engine (the DuckDB oracle mirrors the same scaled longs).
    cents = F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("long")
    g4x10 = (F.col("grade4") * 10.0).cast("long")
    per_student = (
        fact.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_courses"),
            F.sum(F.when(passed, cents).otherwise(F.lit(0))).alias("__cents"),
            F.sum(
                F.when(passed, g4x10 * cents).otherwise(F.lit(0))
            ).alias("__prod"),
        )
        .select(
            "o_custkey",
            "n_courses",
            dround(
                F.when(
                    F.col("__cents") > 0,
                    F.col("__prod").cast("double")
                    / (F.col("__cents") * 10).cast("double"),
                ).otherwise(F.lit(0.0)),
                4,
            ).alias("gpa4"),
            (F.col("__cents").cast("double") / F.lit(1000000.0)).alias(
                "credits_earned"
            ),
        )
        .join(F.broadcast(dim), F.col("o_custkey") == dim.c_custkey)
        .select(
            "c_custkey", "c_name", "n_name", "r_name",
            "n_courses", "gpa4", "credits_earned",
        )
    )

    program_dim = F.broadcast(
        spark.createDataFrame(
            PROGRAM_DIM_ROWS, "r_name string, required_credits double, total_semesters int"
        )
    )

    report = (
        per_student.join(program_dim, "r_name")
        .withColumn("remaining", F.col("required_credits") - F.col("credits_earned"))
        .withColumn(
            "pct_complete",
            dround(
                F.least(
                    F.col("credits_earned") / F.col("required_credits") * 100.0,
                    F.lit(100.0),
                ),
                2,
            ),
        )
        .withColumn(
            "status",
            status_case(
                F.col("remaining"),
                # capacity analog of app.py:117: remaining semesters × 20
                (F.col("total_semesters") - F.lit(8)) * F.lit(20.0),
            ),
        )
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            "r_name",
            "n_courses",
            "gpa4",
            "credits_earned",
            "pct_complete",
            "status",
        )
        .orderBy("c_custkey")
    )
    return report


FLAGSHIP_ORACLE_SQL = f"""
WITH program_dim(r_name, required_credits, total_semesters) AS (
    VALUES {PROGRAM_DIM_SQL_VALUES}
),
fact AS (
    SELECT c.c_custkey, c.c_name, n.n_name, r.r_name,
           l.l_quantity / 5.0 AS grade10,
           l.l_extendedprice,
           l.l_extendedprice / 10000.0 AS credits,
           CASE WHEN l.l_quantity / 5.0 >= 9.0 THEN 4.0
                WHEN l.l_quantity / 5.0 >= 8.0 THEN 3.5
                WHEN l.l_quantity / 5.0 >= 7.0 THEN 3.0
                WHEN l.l_quantity / 5.0 >= 6.5 THEN 2.5
                WHEN l.l_quantity / 5.0 >= 5.5 THEN 2.0
                WHEN l.l_quantity / 5.0 >= 5.0 THEN 1.5
                WHEN l.l_quantity / 5.0 >= 4.0 THEN 1.0
                ELSE 0.0 END AS grade4,
           (l.l_quantity / 5.0 >= 4.0
            AND NOT contains(l.l_returnflag, 'R')
            AND l.l_linestatus <> 'O') AS passed
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
),
per_student AS (
    SELECT c_custkey, c_name, n_name, r_name,
           COUNT(*) AS n_courses,
           CASE WHEN SUM(CASE WHEN passed
                             THEN CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)
                             ELSE 0 END) > 0
                THEN FLOOR(
                     CAST(SUM(CASE WHEN passed
                                  THEN CAST(grade4 * 10.0 AS BIGINT)
                                       * CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)
                                  ELSE 0 END) AS DOUBLE)
                     / CAST(SUM(CASE WHEN passed
                                    THEN CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)
                                    ELSE 0 END) * 10 AS DOUBLE)
                     * 10000.0 + 0.5) / 10000.0
                ELSE 0.0 END AS gpa4,
           CAST(SUM(CASE WHEN passed
                        THEN CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)
                        ELSE 0 END) AS DOUBLE) / 1000000.0 AS credits_earned
    FROM fact
    GROUP BY c_custkey, c_name, n_name, r_name
)
SELECT s.c_custkey, s.c_name, s.n_name, s.r_name, s.n_courses, s.gpa4,
       s.credits_earned,
       FLOOR(LEAST(s.credits_earned / p.required_credits * 100.0, 100.0)
             * 100.0 + 0.5) / 100.0 AS pct_complete,
       CASE WHEN p.required_credits - s.credits_earned <= 0 THEN 'completed'
            WHEN p.required_credits - s.credits_earned
                 <= (p.total_semesters - 8) * 20.0 THEN 'on_track'
            ELSE 'behind' END AS status
FROM per_student s
JOIN program_dim p USING (r_name)
ORDER BY s.c_custkey
"""


def transcript_lookup(
    spark: SparkSession, sf_dir: str, custkey: int = 1
) -> DataFrame:
    """E3 point-lookup analog (app.py:60-70 ES match + app.py:82-185):
    one student's transcript — filter → project → derive → sort → limit.

    The equality filter on o_custkey is pushed into the orders scan
    (PushedFilters) before the join, so at 100 TB this reads only the
    row-groups whose min/max straddle the key."""
    fact = _graded_fact(spark, sf_dir)
    return (
        fact.filter(F.col("c_custkey") == F.lit(custkey))
        .select(
            "c_custkey",
            "l_orderkey",
            "l_linenumber",
            dround(F.col("grade10"), 4).alias("grade10"),
            F.col("grade4"),
            dround(F.col("credits"), 4).alias("credits"),
            "l_returnflag",
            "l_linestatus",
        )
        .orderBy("l_orderkey", "l_linenumber")
        .limit(1000)
    )
