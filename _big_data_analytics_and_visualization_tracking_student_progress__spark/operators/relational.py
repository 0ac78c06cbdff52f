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
