"""Bucketed (co-located) joins — the shuffle-free path for repeated
big×big joins (SURVEY.md §4 scale notes; flagship's lineitem⋈orders).

A plain equi-join of two large tables shuffles BOTH sides on the key
every query.  Writing both sides bucketed by the join key (same bucket
count) pins an identical hash-partitioning into the table layout, so
Catalyst plans a SortMergeJoin with NO Exchange on either side — at
100 TB this turns the dominant recurring shuffle into a one-time write
cost.  This module wraps the write/read/verify cycle; the plan test
(tests/test_plans.py) asserts the exchange-free property.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed managed table (parquet).  Sorting within
    buckets additionally removes the join's Sort node."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        num_buckets, bucket_col
    )
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs Catalyst
    emits no Exchange for either side."""
    on = [on] if isinstance(on, str) else on
    return spark.table(left_table).join(spark.table(right_table), on, how)
