"""Fixture-table loaders.

Driver fixtures: TPC-H-ish star schema + ``events`` (stream substrate) +
``documents``/``embeddings`` (text / similarity substrate) as parquet at
``/root/testdata/sf{0.001,0.01,0.1}/``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan; Catalyst handles column pruning and
    filter pushdown — callers express filters declaratively and they
    reach the scan (`PushedFilters` in .explain).

    `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects; we read it as a nanosecond long
    (`legacy.parquet.nanosAsLong`) and re-derive a microsecond
    timestamp column, keeping the raw nanos as `ts_nanos` for
    precision-sensitive ordering."""
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # timestamp_micros yields TIMESTAMP (session-tz); pin UTC so
        # date_format output is timezone-independent and matches DuckDB's
        # naive TIMESTAMP_NS rendering.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        return (
            df.withColumnRenamed("ts", "ts_nanos")
            # integer `div`, not `/`: double division of 2024-epoch nanos
            # (~1.7e18 > 2^53) is ±128 ns imprecise and can shift the
            # derived microsecond by one
            .withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts_nanos div 1000")),
            )
        )
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}
