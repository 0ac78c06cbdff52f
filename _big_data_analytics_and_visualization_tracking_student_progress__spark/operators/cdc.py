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
