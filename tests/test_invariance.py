"""Partitioning invariance: registered queries must produce identical
results under a different shuffle layout (3 partitions, AQE off) than
the session default — the property that makes answers trustworthy when
the same code runs on a 1000-executor cluster instead of local[4].
Catches order-dependent double accumulation, per-partition RNG, and
first()/head() nondeterminism."""

from __future__ import annotations

import pytest

from _big_data_analytics_and_visualization_tracking_student_progress__spark.registry import (
    all_queries,
)

from .conftest import SF_SMALL


def _canon(df):
    return sorted(
        tuple(str(x) for x in r)
        for r in df.select(*sorted(df.columns)).collect()
    )


@pytest.mark.parametrize(
    "qname",
    [
        "flagship_progress",
        "pricing_summary",
        "dedup_minhash_lsh",
        "curation_pipeline",
        "value_outliers_mad",
        "ewma_user_values",
        "tfidf_top_terms",
    ],
)
def test_results_invariant_under_partitioning(spark, qname):
    q = all_queries()[qname].fn
    spark.catalog.clearCache()
    base = _canon(q(spark, SF_SMALL))
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.catalog.clearCache()
        alt = _canon(q(spark, SF_SMALL))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        spark.catalog.clearCache()
    assert base == alt, f"{qname} changed under repartitioning"
