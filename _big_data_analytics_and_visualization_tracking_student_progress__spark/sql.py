"""SQL surface: register the engine's tables as views and execute ANSI
SQL through Catalyst.

The reference's only "query language" is a hand-built Elasticsearch
match-query dict (app.py:60-67); this engine exposes full SQL.  Queries
written in the shared ANSI subset (standard functions, DECIMAL casts,
FLOOR-based rounding) run unchanged on both Spark and the DuckDB oracle,
which is how `queries/core.py::sql_revenue_by_nation` pins the surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .datasets import TABLES, load_table


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every fixture table as a temp view (idempotent)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run an ANSI SQL query against the registered views."""
    register_views(spark, sf_dir)
    return spark.sql(query)
