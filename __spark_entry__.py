"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _big_data_analytics_and_visualization_tracking_student_progress__spark.registry import (  # noqa: E402
    all_queries,
    resolve_oracle,
)

# The driver compares Spark vs DuckDB at sf=0.01; data-dependent oracles
# (lazy callables) are resolved against that same fixture dir.
ORACLE_SF_DIR = os.environ.get(
    "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from _big_data_analytics_and_visualization_tracking_student_progress__spark.plans import (
        flagship_progress,
    )

    return flagship_progress(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: qd.fn for name, qd in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    out: dict[str, str] = {}
    for name, qd in all_queries().items():
        sql = resolve_oracle(qd, ORACLE_SF_DIR)
        if sql is not None:
            out[name] = sql
    return out
