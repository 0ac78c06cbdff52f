"""Custom stateful streaming operator via `applyInPandasWithState`
(SURVEY.md §2.9: the engine's arbitrary-stateful surface; the reference's
only state is the in-memory CDC hash dict, pro.py:18).

`running_totals` keeps a per-key (count, sum) accumulator across
micro-batches — the canonical arbitrary-stateful shape (per-entity
counters, rate limits, monotonic gauges).  State lives in the state
store (checkpointed, partition-local, keyed by the groupBy key), so the
operator scales horizontally: each executor holds only its key range's
state, and recovery replays from the checkpoint.

Arrow-batched: each group's rows arrive as pandas DataFrames; the
accumulator update is vectorized (`len`/`sum` over the batch), never
row-at-a-time Python.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n bigint, total double"
STATE_SCHEMA = "n bigint, total double"


def _update(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n": [n], "total": [total]})


def running_totals(events: DataFrame, key: str = "user_id") -> DataFrame:
    """Emit the updated (count, sum) per key after every micro-batch."""
    return events.groupBy(key).applyInPandasWithState(
        _update,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
