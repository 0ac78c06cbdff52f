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

The update function is a SELF-CONTAINED closure (pickled by value, no
reference to this module): executors never need this package importable,
which matters because the driver process may run from any working
directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n bigint, total double"
STATE_SCHEMA = "n bigint, total double"


def running_totals(events: DataFrame, key: str = "user_id") -> DataFrame:
    """Emit the updated (count, sum) per key after every micro-batch."""

    def update(key_tuple, pdfs, state):
        import pandas as _pd

        if state.exists:
            n, total = state.get
        else:
            n, total = 0, 0.0
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield _pd.DataFrame(
            {"user_id": [key_tuple[0]], "n": [n], "total": [total]}
        )

    return events.groupBy(key).applyInPandasWithState(
        update,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
