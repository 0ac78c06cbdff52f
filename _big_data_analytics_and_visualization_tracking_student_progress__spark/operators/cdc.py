"""Change-data-capture via row hashing (SURVEY.md P6/J3/T3).

Reference behavior (pro.py:29-32, 46-55): MD5 of each row's sort-keyed
JSON; a file's new snapshot is diffed against the previous snapshot's
hash set and only changed/new rows are emitted.

Spark-first realization: `with_row_hash` stamps a deterministic md5 over
a canonical (sorted) column order, `diff_snapshots` is a left-anti join
on the hash.  At scale the anti join shuffles both sides on the hash —
already minimal (the hash is uniformly distributed, so no skew); the
snapshot side can additionally be stored bucketed by row_hash to make
incremental diffs shuffle-free on the snapshot side.

Unlike the reference's unbounded in-memory `file_hash_data` dict
(pro.py:18), the snapshot here is a table: retention is a partition-drop,
and state survives restarts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..functions.scalar import row_hash
from .relational import anti_join

HASH_COL = "row_hash"


def with_row_hash(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Stamp the canonical md5 row hash (reference pro.py:29-32)."""
    cols = cols if cols is not None else df.columns
    return df.withColumn(HASH_COL, row_hash(cols))


def diff_snapshots(
    new: DataFrame, old: DataFrame, cols: list[str] | None = None
) -> DataFrame:
    """Rows of `new` that are new-or-changed vs `old` (pro.py:46-55).

    Byte-identical rows (same hash) are suppressed; changed rows appear
    because any column change changes the hash.  Deletions are out of
    scope, matching the reference.
    """
    cols = cols if cols is not None else new.columns
    new_h = with_row_hash(new, cols)
    old_h = with_row_hash(old.select(*[c for c in old.columns if c in set(cols)]), cols)
    return anti_join(new_h, old_h.select(HASH_COL), [HASH_COL]).drop(HASH_COL)


def apply_cdc_ops(
    ops: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Collapse an insert/update/delete op log to final keyed state.

    Generalizes the reference's single-op upsert (con.py:55-63 only ever
    overwrites by `_id`; it has no delete path) to the full CDC op set:
    per key, the LATEST op (by `order_cols`, e.g. ts + a unique
    tie-break) wins; a winning delete removes the key.  One shuffle on
    the key, one window pass — the op payload rides along, so replaying
    any suffix of the log over a previous application is idempotent.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    return (
        ops.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .filter(F.col(op_col) != delete_op)
    )


def scd2_intervals(
    df: DataFrame,
    key_cols: list[str],
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Slowly-changing-dimension type 2: compress an attribute's change
    log into validity intervals [valid_from, valid_to) per key, with
    `valid_to` NULL on the current row.

    Run-compression (keep a row only when the attribute differs from
    its predecessor, null-safe) and the LEAD that closes each interval
    share one partitioning on the key: the filter preserves sort order
    and distribution, so the second window adds no exchange — one
    shuffle total regardless of history length.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy(*key_cols).orderBy(ts_col, tiebreak_col)
    changed = df.withColumn("__prev", F.lag(attr_col).over(w)).filter(
        ~F.col("__prev").eqNullSafe(F.col(attr_col))
    )
    return (
        changed.withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
        .withColumnRenamed(ts_col, "valid_from")
        .drop("__prev")
    )
