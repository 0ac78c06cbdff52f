"""Bloom-filter runtime join pruning (the Spark 3.3 runtime-filter /
Delta dynamic-file-pruning pattern, built from first principles).

At 100 TB the dominant cost of `fact ⋈ selective-dim` is shuffling fact
rows that will never find a partner.  A Bloom filter built from the
(already filtered, small) dim keys and probed on the fact side BEFORE
the join's exchange drops the non-matching majority at scan time, so
only plausible rows pay the shuffle.  False positives are culled by the
exact join that follows; false negatives are impossible, so the final
result is bit-identical to the plain join — which is exactly what the
DuckDB oracle checks.

Representation: the filter is itself a tiny DataFrame of (word, mask)
longs — `m_bits/64` rows max — built with one aggregation and applied
with k broadcast hash joins.  No driver-side bitset, no UDF; both sides
stay whole-stage-codegen'd, and the build parallelizes like any other
aggregate.  (The reference has no analog; this generalizes its
"query only the matching index" delegation to ES, app.py:60-70.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import portable_hash64


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k bit positions in [0, m_bits) via independent portable hashes
    (engine-portable md5-prefix, so an oracle can replay the filter)."""
    return [
        F.pmod(
            portable_hash64(F.concat_ws("#", key.cast("string"), F.lit(str(i)))),
            F.lit(m_bits),
        )
        for i in range(k)
    ]


def bloom_build(
    df: DataFrame, key: Column, m_bits: int = 1 << 16, k: int = 3
) -> DataFrame:
    """Build the filter as a (word: long, mask: long) frame.

    One explode + one aggregate; output is at most m_bits/64 rows
    (1024 for the default 64 Kbit filter), trivially broadcastable.
    """
    pos = F.explode(F.array(*_positions(key, m_bits, k))).alias("pos")
    return (
        df.select(pos)
        .select(
            F.shiftright(F.col("pos"), 6).alias("word"),
            (F.col("pos") % 64).cast("int").alias("bit"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(shiftleft(1L, bit))").alias("mask"))
    )


def bloom_probe(
    df: DataFrame,
    key: Column,
    bloom: DataFrame,
    m_bits: int = 1 << 16,
    k: int = 3,
) -> DataFrame:
    """Keep only rows that MIGHT be in the set (no false negatives).

    k broadcast joins against the (word, mask) frame; a missing word or
    an unset bit proves absence, so inner-join + bit-test implements the
    classic `might_contain`.  Runs before any exchange of `df`, which is
    the entire point: the shuffle downstream sees only survivors.
    """
    out = df
    for i, pos in enumerate(_positions(key, m_bits, k)):
        w = bloom.select(
            F.col("word").alias(f"__bw{i}"), F.col("mask").alias(f"__bm{i}")
        )
        out = (
            out.withColumn(f"__bp{i}", pos)
            .join(
                F.broadcast(w),
                F.shiftright(F.col(f"__bp{i}"), 6) == F.col(f"__bw{i}"),
                "inner",
            )
            .filter(
                F.expr(
                    f"(shiftright(__bm{i}, CAST(__bp{i} % 64 AS INT)) & 1) = 1"
                )
            )
            .drop(f"__bp{i}", f"__bw{i}", f"__bm{i}")
        )
    return out


def bloom_pruned_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = 1 << 16,
    k: int = 3,
    how: str = "inner",
) -> DataFrame:
    """fact ⋈ dim with a Bloom pre-filter on the fact side.

    Exact result (the join removes false positives); the filter only
    shrinks what the exchange has to move.  Use when dim is selective
    but too large / too late-derived for static partition pruning.
    """
    bloom = bloom_build(dim, F.col(dim_key), m_bits, k)
    pruned = bloom_probe(fact, F.col(fact_key), bloom, m_bits, k)
    return pruned.join(dim, pruned[fact_key] == dim[dim_key], how)
