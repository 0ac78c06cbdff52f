"""Window / ordering operators (SURVEY.md §2.5 W1-W2, §2.3 J4 dedup half).

Scale note: a window partitioned by a high-cardinality key (event_id,
student id) shuffles once on that key and streams within partitions —
no driver materialization.  `top_k` compiles to TakeOrderedAndProject:
each task keeps a k-size heap, only k×partitions rows reach the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_by_key(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[Column]
) -> DataFrame:
    """Keep exactly the latest row per key — the read-side half of the
    reference's idempotent ES upsert (con.py:55-63: deterministic `_id`,
    last write wins).  `order_by` must be a deterministic total order
    (e.g. ts DESC, then a unique tiebreaker)."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def top_k(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """W2 — sort + cap (reference ES size:1000, app.py:66,185).
    Catalyst plans TakeOrderedAndProject — no full sort, no full shuffle."""
    return df.orderBy(*order_by).limit(k)
