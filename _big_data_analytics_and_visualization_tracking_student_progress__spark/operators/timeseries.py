"""Time-series operators that exceed SQL-window expressiveness —
`applyInPandas` grouped-map surface (SURVEY.md §2.9).

EWMA is *recursively* defined (each output depends on the previous
output, not on a frame of inputs), so no window aggregate expresses it;
this is exactly the case the grouped-map Arrow path exists for: one
shuffle on the key, each group arrives as a single pandas DataFrame,
the recursion runs vectorized-in-batch per group, output streams back
as Arrow.

Scale notes: state per task = one group's frame, so the operator scales
to any number of keys; a single pathological key whose history exceeds
executor memory would need chunked carry-state (applyInPandasWithState)
— documented, not needed for per-entity telemetry cardinalities.

Determinism: the smoothing uses literally `alpha*x + beta*prev` with
beta computed once as `1 - alpha` — the same two IEEE multiplies and one
add any other engine (e.g. a DuckDB recursive CTE written the same way)
performs, so results are bit-identical cross-engine.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def ewma_by_key(
    df: DataFrame,
    key: str,
    order_cols: list[str],
    value_col: str,
    alpha: float,
    out_cols: list[str],
) -> DataFrame:
    """Per-key exponentially weighted moving average over a deterministic
    total order.  Emits `out_cols` + `ewma`."""
    beta = 1.0 - alpha
    schema = ", ".join(
        f"{c} {t}"
        for c, t in zip(
            out_cols + ["ewma"],
            [dict(df.dtypes)[c] for c in out_cols] + ["double"],
        )
    )

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        vals = pdf[value_col].to_numpy()
        out = [0.0] * len(vals)
        prev = 0.0
        for i, x in enumerate(vals):
            prev = x if i == 0 else alpha * x + beta * prev
            out[i] = prev
        res = pdf[out_cols].copy()
        res["ewma"] = out
        return res

    return df.groupBy(key).applyInPandas(smooth, schema)


def resample_gapfill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step: str = "10 minutes",
    scale: int = 4,
) -> DataFrame:
    """Regularize an event stream onto a fixed time grid per key:
    bucket-average, then densify (emit EVERY bucket between each key's
    first and last observation) and forward-fill gaps — the hypertable
    `time_bucket_gapfill` + `locf` shape, composed from native ops:

      1. bucket + aggregate  (one shuffle on (key, bucket))
      2. per-key spine        `sequence(min, max, step)` + explode —
         gap rows are *generated*, never read
      3. left join spine⋈agg  (shuffle on (key, bucket))
      4. forward fill         `last(value, ignorenulls=True)` over an
         unbounded-preceding row frame (same (key) partitioning)

    The bucket average uses the decimal-sum + IEEE quantization pattern
    (exact, partition-order-independent), so the whole operator is
    oracle-checkable.  Emits (key, bucket_ts, value, is_gap)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..functions.scalar import dround, dsum

    bucketed = df.select(
        F.col(key_col),
        F.window(F.col(ts_col), step)["start"].alias("__mb"),
        F.col(value_col).alias("__v0"),
    )
    agg = bucketed.groupBy(key_col, "__mb").agg(
        dround(
            dsum(F.col("__v0"), scale).cast("double") / F.count(F.lit(1)), 4
        ).alias("__v")
    )
    spine = (
        agg.groupBy(key_col)
        .agg(F.min("__mb").alias("__mn"), F.max("__mb").alias("__mx"))
        .select(
            F.col(key_col),
            F.explode(
                F.sequence(F.col("__mn"), F.col("__mx"), F.expr(f"interval {step}"))
            ).alias("__mb"),
        )
    )
    j = spine.join(agg, [key_col, "__mb"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("__mb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        F.col(key_col),
        F.col("__mb").alias("bucket_ts"),
        F.last("__v", ignorenulls=True).over(w).alias("value"),
        F.col("__v").isNull().alias("is_gap"),
    )
