"""Shared leaf definitions for the keyed-table family: the commit
error types, the optimistic-concurrency retry loop, and the pure-
DataFrame MERGE builders (`merge_by_key`, `merge_clauses`).  Lives
below the `ManifestSnapshotTable` mixin modules so they can import it
without a cycle; the public import path stays `operators.upsert`
(which re-exports everything here).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .windows import latest_by_key


class ConstraintViolationError(ValueError):
    """A write batch violated a table CHECK constraint.  The commit was
    abandoned whole — the already-written candidate files are removed
    with the claim and the table stays readable at its current version,
    the Delta `ALTER TABLE ADD CONSTRAINT CHECK` enforcement contract.
    SQL CHECK semantics: a row violates only when the expression is
    FALSE — NULL passes (unknown is not a violation)."""


class CommitConflictError(RuntimeError):
    """A concurrent writer holds (or already won) the next snapshot
    version of a `ManifestSnapshotTable`.  The loser's work is not
    partially applied — the table stays readable at its current version
    — and the correct response is to re-run the whole commit (re-read,
    re-merge) against the new basis, exactly the Delta/Iceberg
    optimistic-concurrency retry contract (`retry_commit` below is
    that retry loop)."""


def retry_commit(
    fn,
    attempts: int = 5,
    backoff_s: float = 0.05,
    max_backoff_s: float = 2.0,
):
    """Run a commit closure with the standard optimistic-concurrency
    retry loop — Delta's automatic conflict retry.  ``fn`` must be the
    WHOLE commit (e.g. ``lambda: table.upsert(batch)``): every commit
    method re-reads its basis under a fresh version claim, so simply
    re-invoking it after a `CommitConflictError` replays the merge
    against the peer's published state — no lost updates, no partial
    application (the loser's claim was abandoned whole).  Exponential
    backoff, CAPPED at ``max_backoff_s`` (an uncapped 2^n sleep at
    attempt 20 would be hours — large attempt budgets must mean "keep
    trying", never "hang"), with deterministic per-attempt jitter to
    spread herds, and no sleep after the final loss; raises the final
    `CommitConflictError` after ``attempts`` losses (a writer that
    cannot win in N rounds signals real contention the caller should
    see, not mask)."""
    import time as _time

    if attempts < 1:
        raise ValueError("retry_commit needs attempts >= 1")
    last: CommitConflictError | None = None
    for attempt in range(attempts):
        try:
            return fn()
        except CommitConflictError as e:
            last = e
            if attempt + 1 >= attempts:
                break  # final loss: raise now, don't sleep first
            # deterministic jitter (no RNG): stagger by attempt parity;
            # cap applied AFTER the jitter so no sleep ever exceeds
            # max_backoff_s, honoring the docstring's contract
            _time.sleep(
                min(
                    max_backoff_s,
                    backoff_s * (2**attempt) * (1 + 0.37 * (attempt % 3)),
                )
            )
    raise last


def merge_by_key(
    target: DataFrame | None,
    source: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
) -> DataFrame:
    """MERGE semantics: rows from `source` replace same-key rows in
    `target`; ties broken by `order_by` (descending recency first), with
    source preferred over target on exact ties via a provenance column.

    Schema evolution: a source batch may carry columns the target lacks
    (the reference's ragged Excel rows — new headers appear mid-stream,
    pro.py:38) and vice versa; the union fills either side's missing
    columns with NULL (`allowMissingColumns`), so the table widens
    additively instead of rejecting the batch.

    Concurrency: single-writer, like any non-transactional table layout —
    the streaming runner serializes batches through one foreachBatch."""
    src = source.withColumn("__src", F.lit(1))
    if target is None:
        merged = src
    else:
        tgt = target.withColumn("__src", F.lit(0))
        merged = tgt.unionByName(src, allowMissingColumns=True)
    out = latest_by_key(
        merged, keys, list(order_by) + [F.col("__src").desc()]
    )
    return out.drop("__src")


def merge_clauses(
    target: DataFrame | None,
    source: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    *,
    when_matched_update: Column | None = None,
    when_not_matched_insert: Column | None = None,
    when_matched_delete: Column | None = None,
    when_not_matched_by_source_delete: Column | None = None,
) -> DataFrame:
    """Conditional MERGE — the full Delta/Iceberg `MERGE INTO` clause
    surface, where `merge_by_key` is only its unconditional
    (always-update, always-insert, never-delete) special case:

    - matched (key in both) and ``when_matched_delete`` → row dropped;
    - matched and ``when_matched_update`` → source row replaces target;
    - matched otherwise → target row kept unchanged;
    - source-only and ``when_not_matched_insert`` → source row inserted
      (dropped otherwise);
    - target-only and ``when_not_matched_by_source_delete`` → row
      dropped (Delta's WHEN NOT MATCHED BY SOURCE THEN DELETE — the
      "source is the full desired state, reap everything it no longer
      names" sync shape); target-only otherwise → kept unchanged.
      This condition can only usefully reference ``t.<col>`` — the
      source side is all-NULL on such rows, so any ``s.`` comparison
      is NULL → false.  BY SOURCE ... UPDATE (set-expressions) is not
      implemented.

    Condition Columns reference the two sides as ``t.<col>`` /
    ``s.<col>`` (e.g. ``F.col("s.ts") >= F.col("t.ts")``); an
    unqualified column name is ambiguous and will be rejected by the
    analyzer.  ``None`` conditions mean the clause always applies
    (delete defaults to never).  NULL condition results count as
    false, SQL-style.  Clause precedence matches Delta: delete is
    tested before update.

    The source is first collapsed to one row per key by ``order_by``
    recency (a batch may carry several versions of a key); schema may
    differ between the sides — both are aligned to the union-by-name
    schema, missing columns NULL, same additive evolution as
    `merge_by_key`.  One full-outer shuffle join on the key — the
    Delta MERGE physical shape — with NULL-safe key equality so NULL
    key components match themselves, consistent with
    `latest_by_key`'s groupBy."""
    srcd = latest_by_key(source, keys, list(order_by))
    if target is None:
        target = srcd.limit(0)
    t_ = target.unionByName(
        srcd.limit(0), allowMissingColumns=True
    ).withColumn("__t", F.lit(1))
    s_ = srcd.unionByName(
        target.limit(0), allowMissingColumns=True
    ).withColumn("__s", F.lit(1))
    cols = [c for c in s_.columns if c != "__s"]
    cond = None
    for k in keys:
        e = F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}"))
        cond = e if cond is None else cond & e
    j = t_.alias("t").join(s_.alias("s"), cond, "full_outer")
    has_t = F.col("t.__t").isNotNull()
    has_s = F.col("s.__s").isNotNull()
    upd = (
        F.lit(True)
        if when_matched_update is None
        else F.coalesce(when_matched_update, F.lit(False))
    )
    ins = (
        F.lit(True)
        if when_not_matched_insert is None
        else F.coalesce(when_not_matched_insert, F.lit(False))
    )
    dele = (
        F.lit(False)
        if when_matched_delete is None
        else F.coalesce(when_matched_delete, F.lit(False))
    )
    bs_dele = (
        F.lit(False)
        if when_not_matched_by_source_delete is None
        else F.coalesce(when_not_matched_by_source_delete, F.lit(False))
    )
    keep = (
        ~(has_t & has_s & dele)
        & ~(has_s & ~has_t & ~ins)
        & ~(has_t & ~has_s & bs_dele)
    )
    take_s = (has_s & ~has_t) | (has_t & has_s & ~dele & upd)
    return j.filter(keep).select(
        *[
            F.when(take_s, F.col(f"s.{c}"))
            .otherwise(F.col(f"t.{c}"))
            .alias(c)
            for c in cols
        ]
    )
