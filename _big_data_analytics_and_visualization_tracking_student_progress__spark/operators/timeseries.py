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
