"""Deterministic hash-based sampling and dataset splitting.

Training-data pipelines need samples and train/val/test splits that are
(a) reproducible across runs/engines/cluster sizes, (b) leakage-free
(the same key always lands in the same split — `df.sample`'s
per-partition RNG gives neither), and (c) free: these are map-side
filters on a key hash — no shuffle, no state, trivially correct at
100 TB.  Built on `portable_hash64` so every variant is oracle-checked
against DuckDB, not just row-counted.

Cluster-aware (near-dup-safe) splitting composes with dedup: label docs
with `connected_components` clusters, then split on the *cluster* key so
near-duplicates can never straddle train/test (the classic contamination
bug); property-tested in tests/test_northstar_ops.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import portable_hash64

BUCKETS = 10_000


def sample_bucket(key: Column, buckets: int = BUCKETS) -> Column:
    """Stable bucket in [0, buckets) from the stringified key."""
    return portable_hash64(key.cast("string")) % buckets


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, buckets: int = BUCKETS
) -> DataFrame:
    """Keep ~fraction of rows, decided purely by the key hash."""
    return df.filter(sample_bucket(F.col(key_col), buckets) < int(fraction * buckets))


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    buckets: int = BUCKETS,
    split_col: str = "split",
) -> DataFrame:
    """Add a split label ('train'/'val'/'test'/…) by cumulative hash
    ranges.  Weights must sum to ≤ 1; any residual bucket range falls in
    the last split.  Same key ⇒ same split, forever, on any engine."""
    bucket = sample_bucket(F.col(key_col), buckets)
    names = list(weights)
    cum = 0.0
    expr = None
    for name in names[:-1]:
        cum += weights[name]
        cond = bucket < int(cum * buckets)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    label = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(split_col, label)


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    buckets: int = BUCKETS,
) -> DataFrame:
    """Per-stratum sampling rates (e.g. keep 100% of rare languages, 5%
    of the dominant one) — still a pure map-side filter."""
    bucket = sample_bucket(F.col(key_col), buckets)
    thresh = None
    for stratum, frac in fractions.items():
        cond = F.col(strata_col) == stratum
        val = int(frac * buckets)
        thresh = F.when(cond, val) if thresh is None else thresh.when(cond, val)
    thresh = (
        F.lit(int(default_fraction * buckets))
        if thresh is None
        else thresh.otherwise(int(default_fraction * buckets))
    )
    return df.filter(bucket < thresh)


def deterministic_shuffle(
    df: DataFrame, key: Column, seed: int = 0, out_col: str = "shuffle_key"
) -> DataFrame:
    """Reproducible global shuffle for training-data ordering: every
    row gets a pseudorandom sort key xxhash64(key, seed) — the same
    (data, seed) always yields the same permutation on any cluster
    size or partitioning, unlike `orderBy(rand())` whose seed is
    per-partition and whose result moves with the split layout.
    Changing ``seed`` gives an independent epoch permutation.

    Returns the frame with ``out_col`` added; callers `orderBy`/
    `sortWithinPartitions`/`repartitionByRange` on it as their writer
    requires — at 100 TB the usual shape is repartitionByRange(
    out_col) + sortWithinPartitions(out_col), one range shuffle to
    totally ordered output files."""
    return df.withColumn(out_col, F.xxhash64(key, F.lit(seed)))
