"""Bit-level pins for the r15 LSH banding kernel (`_lsh_band_rows`):
the Arrow/numpy kernel must emit EXACTLY the (doc, band) rows of the
expression form it replaced — explode(lsh_band_keys(
minhash_from_hashes(sh, P), B, R, portable=False)) — because a single
differing signature changes which candidate pairs exist, and the
fast-path dedup queries' results with them."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from _big_data_analytics_and_visualization_tracking_student_progress__spark.operators.dedup import (
    _lsh_band_rows,
    lsh_band_keys,
    minhash_from_hashes,
    minhash_lsh_pairs,
)
from .conftest import SF_SMALL

NP, B, R = 16, 4, 4

I64_MIN, I64_MAX = -(2**63), 2**63 - 1


def _expression_bands(filtered):
    signed = filtered.withColumn(
        "sig", minhash_from_hashes(F.col("sh"), NP)
    )
    return signed.select(
        "doc",
        F.explode(
            lsh_band_keys(F.col("sig"), B, R, portable=False)
        ).alias("band"),
    )


def _rows(df):
    return sorted((r["doc"], r["band"]) for r in df.collect())


def test_kernel_bit_equals_expression_form_on_stress_vectors(spark):
    rng = random.Random(1457)
    data = [
        (1, [0]),
        (2, [I64_MIN, I64_MAX, 0, -1, 1]),
        (3, [I64_MAX]),
        (4, [I64_MIN]),
        (5, [-1, -2, -3]),
        (6, [42] ),
        # duplicates survive array_distinct upstream only once, but the
        # kernel must not CARE about duplicates either
        (7, [7, 7, 7]),
    ] + [
        (100 + i, [rng.randint(I64_MIN, I64_MAX) for _ in range(rng.randint(1, 60))])
        for i in range(120)
    ]
    df = spark.createDataFrame(data, "doc long, sh array<long>")
    assert _rows(_lsh_band_rows(df, NP, B, R)) == _rows(
        _expression_bands(df)
    )


def test_kernel_handles_string_doc_ids(spark):
    df = spark.createDataFrame(
        [("a", [1, 2, 3]), ("b", [-5]), ("c", [I64_MAX, I64_MIN])],
        "doc string, sh array<long>",
    )
    assert _rows(_lsh_band_rows(df, NP, B, R)) == _rows(
        _expression_bands(df)
    )


def test_fast_lsh_pairs_unchanged_end_to_end(spark):
    """The full fast-path pair set on the real fixture must be
    identical to the expression pipeline's (rebuilt verbatim here via
    a kernel-bypassing monkeypatch would be circular — instead compare
    against the portable-independent invariant: recompute pairs with
    the kernel and with the expression banding wired through the same
    persist/verify tail)."""
    from _big_data_analytics_and_visualization_tracking_student_progress__spark.datasets import (
        load_table,
    )
    from _big_data_analytics_and_visualization_tracking_student_progress__spark.operators import (
        dedup as D,
    )

    docs = load_table(spark, SF_SMALL, "documents")
    got = sorted(
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in minhash_lsh_pairs(docs, "doc_id", "text").collect()
    )

    # expression pipeline, verbatim pre-kernel shape
    raw = docs.filter(F.col("text").isNotNull()).select(
        F.col("doc_id").alias("doc"),
        D.word_shingles(F.col("text"), 3).alias("sh"),
    )
    sh_tbl = raw.select(
        "doc", F.array_distinct(D.shingle_hashes(F.col("sh"))).alias("sh")
    ).persist()
    banded = _expression_bands(sh_tbl.filter(F.size("sh") > 0))
    buckets = (
        banded.groupBy("band")
        .agg(F.sort_array(F.collect_list("doc")).alias("ds"))
        .filter((F.size("ds") > 1) & (F.size("ds") <= 1000))
    )
    ds = F.col("ds")
    cand = (
        buckets.select(
            F.explode(
                F.flatten(
                    F.transform(
                        ds,
                        lambda x, i: F.transform(
                            F.slice(ds, i + 2, F.size(ds)),
                            lambda y: F.struct(
                                x.alias("id_a"), y.alias("id_b")
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    exp = sorted(
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in cand.join(
            sh_tbl.select(F.col("doc").alias("id_a"), F.col("sh").alias("sh_a")),
            "id_a",
        )
        .join(
            sh_tbl.select(F.col("doc").alias("id_b"), F.col("sh").alias("sh_b")),
            "id_b",
        )
        .withColumn("jaccard", D.jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= 0.5)
        .select("id_a", "id_b", "jaccard")
        .collect()
    )
    sh_tbl.unpersist()
    assert got == exp and len(got) > 0
