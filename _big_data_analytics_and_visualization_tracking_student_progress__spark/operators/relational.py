"""Relational operators (SURVEY.md §2.2 P*, §2.3 J*, §2.7 set ops).

The reference's "joins" are dict lookups against tiny hardcoded dimensions
(app.py:15-36, 86, 100-101) — exactly Spark's broadcast hash join.  Its CDC
diff (pro.py:46-55) is a left-anti join on row hashes.  Everything here is
a thin, scale-annotated composition of built-in DataFrame ops so Catalyst
keeps full optimization freedom (pushdown, pruning, join reordering).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def broadcast_lookup(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str] | Column,
    how: str = "left",
) -> DataFrame:
    """J1/J2 — dimension enrichment via broadcast hash join.

    The dim side ships to every executor once; the fact side is never
    shuffled — the only join strategy that stays O(fact-scan) at 100 TB.
    """
    return fact.join(F.broadcast(dim), on, how)


def anti_join(left: DataFrame, right: DataFrame, on: list[str] | Column) -> DataFrame:
    """J3 — rows of `left` with no match in `right` (reference CDC diff:
    new hashes minus snapshot hashes, pro.py:46-55)."""
    return left.join(right, on, "left_anti")


def semi_join(left: DataFrame, right: DataFrame, on: list[str] | Column) -> DataFrame:
    """Existence filter: rows of `left` with ≥1 match in `right`.
    Unlike an inner join it never duplicates left rows, and Spark can
    short-circuit the probe."""
    return left.join(right, on, "left_semi")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """As-of (point-in-time) join: for every left row, attach the columns
    of the single right row with the same `key` and the greatest
    `right_ts` <= `left_ts` ("backward"; "forward" = smallest >=).

    Spark has no built-in as-of join; the scalable realization is a
    union-merge: tag both sides, shuffle ONCE on `key`, sort within
    partitions by time, and propagate the most recent right-side values
    with last(ignorenulls) over an unbounded-preceding window.  This is
    O(n log n) per key-partition with a single exchange — versus the
    naive range self-join which is O(left × right) per key.  Time ties:
    the right row at exactly left_ts matches (<=), right-side tag sorts
    first on equal timestamps.
    """
    lt, rt = F.col(left_ts), F.col(right_ts)
    if direction not in ("backward", "forward"):
        raise ValueError(direction)
    sign = 1 if direction == "backward" else -1

    l_tagged = left.withColumn("__t", lt.cast("double") * sign).withColumn(
        "__side", F.lit(1)
    )
    r_proj = right.select(
        F.col(key),
        (F.col(right_ts).cast("double") * sign).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    l_cols = [F.col(c) for c in left.columns]
    merged = l_tagged.select(
        F.col(key).alias("__k"),
        "__t",
        "__side",
        F.struct(*l_cols).alias("__l"),
        *[F.lit(None).cast(r_proj.schema[f"__r_{c}"].dataType).alias(f"__r_{c}") for c in right_cols],
    ).unionByName(
        r_proj.select(
            F.col(key).alias("__k"),
            "__t",
            "__side",
            F.lit(None).cast(
                l_tagged.select(F.struct(*l_cols).alias("__l")).schema["__l"].dataType
            ).alias("__l"),
            *[F.col(f"__r_{c}") for c in right_cols],
        )
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.select(
        "__side",
        "__l",
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"__r_{c}")
            for c in right_cols
        ],
    ).filter(F.col("__side") == 1)
    return filled.select(
        F.col("__l.*"),
        *[F.col(f"__r_{c}").alias(c) for c in right_cols],
    )


def range_join_broadcast(
    fact: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    how: str = "inner",
) -> DataFrame:
    """Range (theta) join of a fact value against a small table of
    [lo, hi) intervals — broadcast nested-loop by construction, which is
    the right physical plan when the range table is dimension-sized: the
    fact side streams through untouched (no shuffle, no sort).  For two
    LARGE range sides one would bucketize both to equi-join keys first;
    that variant is `jaccard_pairs`-style blocking, not needed for the
    reference's dimension-shaped lookups."""
    cond = (F.col(value_col) >= ranges[lo_col]) & (F.col(value_col) < ranges[hi_col])
    return fact.join(F.broadcast(ranges), cond, how)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation with key salting — the skew guard for a
    groupBy whose key distribution is pathological (one key holding a
    large fraction of all rows, e.g. a boilerplate document hash or a
    bot user id).

    Phase 1 groups on (key, salt) so the hot key's rows spread across
    `salt_buckets` reducers; phase 2 re-aggregates the per-salt partials
    on the key alone — by then the hot key is one row per bucket.  Only
    decomposable aggregates (sum/count/min/max) are valid here; the
    caller provides the partial expression per output column and this
    helper applies the same combiner (sum for sums/counts, min/max for
    min/max is the caller's choice via `aggs` semantics: partials are
    re-summed).

    AQE's skew-join handling covers *joins*; for aggregations Spark
    already does map-side partials, which usually suffices — salting is
    for the case where even the partial rows of one key overwhelm a
    single reducer (billions of identical keys per partition count).
    """
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(f"__p_{name}") for name, expr in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(f"__p_{name}").alias(name) for name in aggs]
    )
