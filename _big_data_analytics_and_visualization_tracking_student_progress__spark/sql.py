"""SQL surface: register the engine's tables as views and execute ANSI
SQL through Catalyst.

The reference's only "query language" is a hand-built Elasticsearch
match-query dict (app.py:60-67); this engine exposes full SQL.  Queries
written in the shared ANSI subset (standard functions, DECIMAL casts,
FLOOR-based rounding) run unchanged on both Spark and the DuckDB oracle,
which is how `queries/core.py::sql_revenue_by_nation` pins the surface.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from .datasets import TABLES, load_table


def referenced_tables(query: str) -> list[str]:
    """Fixture tables the query text actually references (word-boundary
    match outside of identifiers).  Registering only these keeps a
    schema problem in one fixture from failing SQL that never touches
    it (round-2 lesson: an events encoding change broke pure-TPC-H
    SQL because every table was loaded eagerly)."""
    return [
        name
        for name in TABLES
        if re.search(rf"\b{name}\b", query, flags=re.IGNORECASE)
    ]


def register_views(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> None:
    """Expose fixture tables as temp views (idempotent).  With no
    explicit list, registers everything."""
    for name in tables if tables is not None else TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run an ANSI SQL query, lazily registering only the views the
    query text references."""
    register_views(spark, sf_dir, referenced_tables(query))
    return spark.sql(query)
