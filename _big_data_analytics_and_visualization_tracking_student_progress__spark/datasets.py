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


def derive_event_time(df: DataFrame) -> DataFrame:
    """Normalize an events frame to carry BOTH `ts` (microsecond
    TIMESTAMP, session-tz) and `ts_nanos` (epoch-nanos long), whatever
    encoding the parquet files used.  Fixture generations have shipped
    `ts` as INT64 epoch-nanos AND as parquet timestamp[us]; the loader
    must not pin one encoding (round-2 lesson).

    Branches on the *loaded* dtype:
    - long           → the raw value is epoch nanos; derive the
                       timestamp with integer `div` (double division of
                       2024-epoch nanos, ~1.7e18 > 2^53, is ±128 ns
                       imprecise and can shift the microsecond by one).
    - timestamp[_ntz]→ keep it (cast NTZ→LTZ is identity under the UTC
                       session tz we pin) and derive the nanos long via
                       `unix_micros * 1000` — exact integer arithmetic.
    """
    ts_type = df.schema["ts"].dataType.typeName()
    if ts_type in ("long", "integer"):
        return df.withColumnRenamed("ts", "ts_nanos").withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts_nanos div 1000")),
        )
    return df.withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).withColumn("ts_nanos", F.unix_micros(F.col("ts")) * F.lit(1000))


# Resolved-schema cache: fixture parquet is immutable within a round, so
# the footer/schema inference and the events-encoding probe are paid ONCE
# per (session, path) — every later load supplies the schema explicitly
# and the timed region of a query never re-reads footers.  Keyed by
# session id so a restarted JVM re-probes (and re-pins its UTC tz /
# legacy-nanos confs, which are session-scoped).
_EVENTS_CACHE: dict[tuple[int, str], tuple[object, bool]] = {}
_SCHEMA_CACHE: dict[tuple[int, str], object] = {}
_UTC_PINNED: set[int] = set()


def _pin_utc(spark: SparkSession) -> None:
    # timestamp columns render in session-tz; pin UTC so date_format
    # output is timezone-independent and matches DuckDB's naive
    # TIMESTAMP rendering.  One conf RPC per session, not per load.
    if id(spark) not in _UTC_PINNED:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        _UTC_PINNED.add(id(spark))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan; Catalyst handles column pruning and
    filter pushdown — callers express filters declaratively and they
    reach the scan (`PushedFilters` in .explain).

    `events` is normalized by `derive_event_time` to always expose
    `ts` (microsecond timestamp) + `ts_nanos` (epoch-nanos long),
    regardless of which physical encoding the fixture files carry."""
    if name == "events":
        _pin_utc(spark)
        path = os.path.join(sf_dir, "events.parquet")
        key = (id(spark), path)
        cached = _EVENTS_CACHE.get(key)
        if cached is not None:
            # legacy-nanos conf (if it was needed) is session-sticky and
            # was set by the probe below in this same session.
            schema, _legacy = cached
            return derive_event_time(spark.read.schema(schema).parquet(path))
        try:
            df = spark.read.parquet(path)
            # Force analysis so an unreadable TIMESTAMP(NANOS) physical
            # type surfaces here, not lazily in the caller's plan.
            _ = df.schema["ts"].dataType
            legacy = False
        except Exception:
            # Legacy fallback: files whose TIMESTAMP(NANOS) the reader
            # rejects outright are re-read as epoch-nanos longs.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(path)
            legacy = True
        _EVENTS_CACHE[key] = (df.schema, legacy)
        return derive_event_time(df)
    path = os.path.join(sf_dir, f"{name}.parquet")
    key = (id(spark), path)
    schema = _SCHEMA_CACHE.get(key)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[key] = df.schema
        return df
    return spark.read.schema(schema).parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}
