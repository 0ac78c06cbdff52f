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


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap: int,
    tiebreak_col: str,
) -> DataFrame:
    """Batch sessionization: assign a session id per key where
    consecutive events more than `gap` (same units as `ts_col`) apart
    start a new session — the batch complement of the streaming session
    window (streaming/pipeline.py).

    Two window passes over ONE shuffle on the key (both windows share
    the (key, ts) sort): lag() marks session starts, a running sum of
    start-flags numbers them.  `session_id` = (key, seq) is stable and
    dense; `ts_col` must be totally ordered per key via `tiebreak_col`
    (ties would otherwise make lag() partition-order-dependent)."""
    order = [F.col(ts_col).asc(), F.col(tiebreak_col).asc()]
    w = Window.partitionBy(key_col).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    is_start = (
        prev.isNull() | ((F.col(ts_col) - prev) > F.lit(gap))
    ).cast("int")
    run = Window.partitionBy(key_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_seq", F.sum(is_start).over(run))


def grouped_top_k(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    k: int,
) -> DataFrame:
    """Top-k rows per group (generalizes latest_by_key's k=1): one
    shuffle on the keys, rank inside the sorted partition, cut at k.
    `order_by` must totally order each group (unique tiebreaker) or the
    selected rows are partition-order-dependent.  At scale prefer this
    over per-group sort+limit loops: the window's sort is the only cost
    and rows beyond k never leave their executor."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k)
        .withColumnRenamed("__rank", "rank")
    )


def sequential_funnel(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Exact ordered funnel: a user reaches stage k iff events of types
    steps[0..k-1] occur in strictly increasing (ts, tiebreak) order.
    Stronger than the min-per-type approximation (which misses a later
    re-occurrence of an early step) and still one shuffle: every window
    shares the (user, ts, tiebreak) partitioning+sort, so Catalyst plans
    a single Exchange followed by stacked running-max scans.

    Returns (step, step_name, users_reached, conversion) with one row
    per step; conversion = users_reached / step-1 users (exact int/int
    double division)."""
    order = [F.col(ts_col).asc(), F.col(tiebreak_col).asc()]
    w_prev = Window.partitionBy(user_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, -1
    )
    out = df
    for i, step in enumerate(steps):
        cond = F.col(type_col) == F.lit(step)
        if i > 0:
            # coalesce: the frame is empty on each user's first row and
            # max() yields NULL there — flags must stay strictly 0/1 or
            # the stage aggregate below inherits three-valued logic.
            prev_seen = F.coalesce(
                F.max(F.col(f"__hit{i - 1}")).over(w_prev), F.lit(0)
            )
            cond = cond & (prev_seen == 1)
        out = out.withColumn(f"__hit{i}", F.when(cond, F.lit(1)).otherwise(F.lit(0)))
    stage = F.greatest(
        F.lit(0),
        *[F.max(F.col(f"__hit{i}") * (i + 1)) for i in range(len(steps))],
    )
    per_user = out.groupBy(user_col).agg(stage.alias("stage"))
    # users_reached(k) = Σ users with stage ≥ k.  Aggregate to per-stage
    # counts first (≤ |steps|+1 rows), then turn the ≥ relation into an
    # EQUALITY join by exploding each stage row down to the steps it
    # satisfies (sequence(1, stage) — stage ≤ |steps| by construction):
    # same sums, but a broadcastable hash join instead of the ≥-theta
    # BroadcastNestedLoopJoin, whose |steps| x |stages| row expansion is
    # the textbook exploding-join shape if the funnel ever grows (guide
    # §3.3; r15 — values identical, funnel oracle green).  The left join
    # against the step dimension keeps steps no user reached at 0 (an
    # equality join on raw stage would drop them).
    by_stage = per_user.groupBy("stage").agg(F.count(F.lit(1)).alias("n"))
    reached_counts = (
        by_stage.filter(F.col("stage") >= 1)
        .select(
            F.explode(
                F.sequence(F.lit(1).cast("long"), F.col("stage").cast("long"))
            ).alias("step"),
            "n",
        )
        .groupBy("step")
        .agg(F.sum("n").alias("__n"))
    )
    from ..localframe import local_frame

    steps_dim = local_frame(
        df.sparkSession,
        [(i + 1, s) for i, s in enumerate(steps)],
        "step bigint, step_name string",
    )
    reached = steps_dim.join(reached_counts, "step", "left").select(
        "step",
        "step_name",
        F.coalesce(F.col("__n"), F.lit(0)).alias("users_reached"),
    )
    return reached.withColumn(
        "conversion",
        F.col("users_reached").cast("double")
        / F.first("users_reached").over(
            Window.orderBy("step").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
