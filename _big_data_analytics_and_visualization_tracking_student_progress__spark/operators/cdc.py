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


def reconcile_tables(
    a: DataFrame, b: DataFrame, n_buckets: int = 64
) -> DataFrame:
    """Merkle-style table reconciliation: find keys that differ between
    two snapshots without full-table comparison.

    Inputs are frames of (k, fp) — key plus a row fingerprint (use
    `portable_hash64` over the canonicalized row).  Phase 1 reduces each
    side to `n_buckets` (count, XOR-of-fingerprints) summaries — a
    map-side-combinable aggregate, so 100 TB collapses to n_buckets rows
    before anything crosses the network.  Phase 2 full-joins only the
    rows of MISMATCHED buckets to classify each differing key as
    added / deleted / changed.  With drift touching few buckets, phase 2
    reads ~drift-sized input instead of two full tables — the anti-entropy
    pattern of Dynamo/Cassandra replica repair, here as two shuffles.

    XOR checksums cannot overflow (unlike SUM) and are order/partition
    independent; a bucket whose count AND checksum match is skipped, so
    the diff is exact up to XOR-collision (2^-60 per bucket).
    (Generalizes the reference's row-hash CDC diff, pro.py:46-55, from
    one file vs its snapshot to whole-table vs whole-table.)
    """
    from pyspark.sql import functions as F

    from .dedup import portable_hash64

    def bucketize(df: DataFrame) -> DataFrame:
        return df.withColumn(
            "bucket",
            F.pmod(portable_hash64(F.col("k").cast("string")), F.lit(n_buckets)),
        )

    ba, bb = bucketize(a), bucketize(b)

    def summarize(df: DataFrame, tag: str) -> DataFrame:
        return df.groupBy("bucket").agg(
            F.count(F.lit(1)).alias(f"n_{tag}"),
            F.expr("bit_xor(fp)").alias(f"cs_{tag}"),
        )

    bad = (
        summarize(ba, "a")
        .join(summarize(bb, "b"), "bucket", "full")
        .filter(
            F.col("n_a").isNull()
            | F.col("n_b").isNull()
            | (F.col("n_a") != F.col("n_b"))
            | (F.col("cs_a") != F.col("cs_b"))
        )
        .select("bucket")
    )
    fa = ba.join(F.broadcast(bad), "bucket", "left_semi").select(
        F.col("k").alias("k_a"), F.col("fp").alias("fp_a")
    )
    fb = bb.join(F.broadcast(bad), "bucket", "left_semi").select(
        F.col("k").alias("k_b"), F.col("fp").alias("fp_b")
    )
    d = fa.join(fb, fa["k_a"] == fb["k_b"], "full")
    return d.filter(
        F.col("k_b").isNull()
        | F.col("k_a").isNull()
        | (F.col("fp_a") != F.col("fp_b"))
    ).select(
        F.coalesce("k_a", "k_b").alias("k"),
        F.when(F.col("k_b").isNull(), F.lit("deleted"))
        .when(F.col("k_a").isNull(), F.lit("added"))
        .otherwise(F.lit("changed"))
        .alias("diff_type"),
    )
