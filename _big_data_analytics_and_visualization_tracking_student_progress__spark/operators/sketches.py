"""Mergeable distinct-count sketches (HyperLogLog).

The reference has no approximate aggregates at all (SURVEY §2.4 —
its only counts are exact `len(hits)`, app.py:75), but at 100 TB a
COUNT(DISTINCT) is a full shuffle of every distinct key; an HLL
register table is a few KB per group, merges with MAX, and costs one
map-side pass.  This module implements HLL with the engine-portable
md5-prefix hash so the whole sketch — registers AND estimate — is
oracle-checkable in DuckDB (the same trick as the portable MinHash
twin in operators/dedup.py).

Register layout for the 60-bit portable hash, precision `p`:
  bucket = h & (2^p - 1)
  w      = h >> p                      (60-p bits, non-negative)
  rho(w) = (60 - p) - bitlen(w) + 1    (leading-zero count + 1;
           w = 0 -> (60 - p) + 1, the all-zeros register max)
bitlen is LENGTH(bin(w)) — Spark and DuckDB both render minimal
binary digits for non-negative longs, so rho is bit-identical.

Estimate (raw HLL, alpha_16 = 0.673 for p = 4): every term 2^-M is
scaled by 2^(W+1) (W = 60-p) so the per-bucket terms are exact
BIGINT powers of two; the single double division at the end is the
same IEEE operation on both engines.  Small/large-range corrections
(linear counting / bias) are deliberately omitted: they need ln(),
whose libm rounding differs across engines; production precisions
(p = 12-16) sit outside the correction regime for corpus-scale
cardinalities anyway.

All logic is native column expressions — no UDFs; registers merge
with a groupBy-MAX, so partial sketches from independent partitions,
days, or clusters combine exactly (monoid, like operators/
incremental.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import portable_hash64


def hll_rho(w: Column, width: int) -> Column:
    """Leading-zero-rank of a non-negative `width`-bit value."""
    return (
        F.when(w == 0, F.lit(width + 1))
        .otherwise(F.lit(width + 1) - F.length(F.bin(w)))
        .cast("int")
    )


def hll_registers(
    df: DataFrame, value: Column, p: int = 4, group_cols: list[str] | None = None
) -> DataFrame:
    """Per-bucket max-rank register table: (group_cols…, bucket, register).

    One map-side hash + one shrinking groupBy (at most 2^p rows per
    group survive the partial aggregate — the shuffle moves registers,
    never values).  Union register tables from any batching and
    re-aggregate with MAX to merge.
    """
    m = 1 << p
    width = 60 - p
    h = portable_hash64(value.cast("string"))
    keyed = df.select(
        *(group_cols or []),
        (h.bitwiseAND(F.lit(m - 1))).alias("bucket"),
        F.shiftright(h, p).alias("w"),
    ).withColumn("rho", hll_rho(F.col("w"), width))
    return (
        keyed.groupBy(*(group_cols or []), "bucket")
        .agg(F.max("rho").alias("register"))
    )


def hll_merge(registers: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Merge partial register tables (the sketch monoid op)."""
    return (
        registers.groupBy(*(group_cols or []), "bucket")
        .agg(F.max("register").alias("register"))
    )


def hll_estimate(
    registers: DataFrame, p: int = 4, group_cols: list[str] | None = None
) -> DataFrame:
    """Raw-HLL cardinality estimate from a register table.

    Emits (group_cols…, n_buckets, sum_scaled, est_distinct):
    sum_scaled = Σ 2^(W+1-M) over observed buckets plus 2^(W+1) per
    empty bucket — exact BIGINT; est = alpha·m²·2^(W+1) / sum_scaled,
    one IEEE division, quantized with the shared FLOOR(x·s+0.5)/s.
    """
    if p != 4:
        raise ValueError("portable estimate constant (alpha) tabled for p=4 only")
    m = 1 << p
    width = 60 - p
    alpha = 0.673  # HLL alpha for m=16 (Flajolet et al. 2007, Fig. 3)
    agg = registers.groupBy(*(group_cols or [])).agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(
            F.expr(f"shiftleft(cast(1 as bigint), {width + 1} - register)")
        ).alias("observed"),
    )
    sum_scaled = (
        F.col("observed")
        + (F.lit(m) - F.col("n_buckets"))
        * F.shiftleft(F.lit(1).cast("long"), width + 1)
    ).alias("sum_scaled")
    out = agg.select(
        *(group_cols or []),
        F.col("n_buckets").cast("long").alias("n_buckets"),
        sum_scaled.cast("long").alias("sum_scaled"),
    )
    numer = (F.lit(alpha) * F.lit(float(m * m))) * F.pow(F.lit(2.0), F.lit(float(width + 1)))
    est = numer / F.col("sum_scaled").cast("double")
    return out.withColumn(
        "est_distinct", F.floor(est * F.lit(1000.0) + F.lit(0.5)) / F.lit(1000.0)
    )


# ---------------------------------------------------------------------------
# Count-min sketch — point-frequency estimates / heavy hitters.  Like
# the HLL above, built on the portable md5-prefix hash with pure
# integer counters, so build AND probe are oracle-checkable in DuckDB.
# The sketch is depth x width counters (<= 256 rows at the defaults):
# a SUM-mergeable monoid, one map pass + one shrinking groupBy to
# build, a broadcast join to probe — the 100 TB alternative to a full
# per-key count when only frequent keys (or a probe set) matter.
# ---------------------------------------------------------------------------
def cms_build(
    df: DataFrame, value: Column, depth: int = 4, width: int = 64
) -> DataFrame:
    """(row_i, pos, cnt) counter table: row_i's hash is seeded by
    prefixing the row index to the value string ('i:v'), the standard
    independent-hash-family construction."""
    keyed = df.select(value.cast("string").alias("v")).select(
        "v",
        F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("row_i"),
    )
    pos = portable_hash64(
        F.concat_ws(":", F.col("row_i"), F.col("v"))
    ) % width
    return (
        keyed.select("row_i", pos.alias("pos"))
        .groupBy("row_i", "pos")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(sketches: DataFrame) -> DataFrame:
    """Merge unioned counter tables (counters add)."""
    return sketches.groupBy("row_i", "pos").agg(F.sum("cnt").alias("cnt"))


def cms_lookup(
    sketch: DataFrame,
    probes: DataFrame,
    key: Column,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Estimate each probe key's frequency: min over the key's depth
    counters (empty counter = 0).  The sketch is tiny — broadcast — so
    the probe costs one map-side join + a groupBy on the probe key."""
    p = probes.select(key.cast("string").alias("k")).distinct()
    pe = p.select(
        "k",
        F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("row_i"),
    ).withColumn(
        "pos",
        portable_hash64(F.concat_ws(":", F.col("row_i"), F.col("k"))) % width,
    )
    joined = pe.join(F.broadcast(sketch), ["row_i", "pos"], "left")
    return joined.groupBy("k").agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count")
    )
