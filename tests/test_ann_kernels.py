"""The Arrow/numpy ANN kernels (r14 optimization) must be BIT-FAITHFUL
to the higher-order-function expressions they replaced: `with_cluster`
and `pq_encode` feed hash-checked oracles (dual-retrained-literal
IVF-PQ, embedding_pq_codes' exact reconstruction errors), so any ulp or
tie-break drift is a correctness regression, not a perf detail.

Two pins:
- exact equality against the ORIGINAL zip_with/aggregate/array_min
  expression form, rebuilt verbatim in this test, over vectors designed
  to stress fold order and argmin ties;
- the empirically pinned edge semantics (NULL vector / ragged length /
  NULL element / NaN / overflow-to-inf) recorded from the expression
  form before the kernel landed.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from _big_data_analytics_and_visualization_tracking_student_progress__spark.operators import (
    similarity as S,
)


def _expr_with_cluster(df, vec_col, centroids, out_col="__c"):
    """The pre-r14 expression form, verbatim: broadcast centroid data,
    zip_with+aggregate sqdist, array_min over (d, i) structs."""
    spark = df.sparkSession
    cent_df = spark.createDataFrame(
        [(centroids,)], "__cent array<array<double>>"
    )
    v = F.col(vec_col).cast("array<double>")

    def sq(vv, c):
        return F.aggregate(
            F.zip_with(vv, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    scored = F.transform(
        F.col("__cent"),
        lambda c, i: F.struct(sq(v, c).alias("d"), i.cast("int").alias("i")),
    )
    return (
        df.crossJoin(F.broadcast(cent_df))
        .withColumn(out_col, F.array_min(scored)["i"])
        .drop("__cent")
    )


def _expr_pq_encode(df, vec_col, codebooks, out_prefix="__pq"):
    """The pre-r14 expression form of pq_encode, verbatim."""
    spark = df.sparkSession
    books_df = spark.createDataFrame(
        [(codebooks,)], "__books array<array<array<double>>>"
    )
    v = F.col(vec_col).cast("array<double>")

    def sq(vv, c):
        return F.aggregate(
            F.zip_with(vv, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    def scorer(sub):
        return lambda c, i: F.struct(
            sq(sub, c).alias("d"), i.cast("int").alias("i")
        )

    new_cols = []
    for j, (cb, start) in enumerate(
        zip(codebooks, S.pq_subspace_offsets(codebooks))
    ):
        sub = F.slice(v, start, len(cb[0]))
        scored = F.transform(F.col("__books")[j], scorer(sub))
        new_cols.append(F.array_min(scored).alias(f"{out_prefix}{j}"))
    return (
        df.crossJoin(F.broadcast(books_df))
        .select("*", *new_cols)
        .drop("__books")
    )


def _stress_rows():
    """Vectors chosen to stress fold order (magnitudes differing by
    many ulps, so pairwise vs sequential summation WOULD diverge) and
    argmin ties (exact-equal distances must break to the lower index)."""
    return [
        (1, [1.0, 2.0, 3.0, 4.0]),
        (2, [1e15, 1.0, -1e15, 1.0]),          # catastrophic cancellation
        (3, [0.1, 0.2, 0.3, 0.4]),             # non-representable decimals
        (4, [1e-300, 1e300, -1e300, 1e-300]),  # magnitude spread
        (5, [2.0, 2.0, 2.0, 2.0]),             # equidistant tie
        (6, [-0.0, 0.0, -0.0, 0.0]),           # signed zeros
        (7, [math.pi, math.e, math.tau, 1 / 3]),
    ]


_CENTS = [
    [1.0, 2.0, 3.0, 4.0],
    [4.0, 3.0, 2.0, 1.0],
    [1.0, 2.0, 3.0, 4.0],      # duplicate of 0: tie must go to 0
    [0.1, 0.2, 0.3, 0.4],
    [1e15, 1.0, -1e15, 1.0],
]

_BOOKS = [
    [[1.0, 2.0], [0.1, 0.2], [1.0, 2.0]],      # dup codes: tie to 0
    [[3.0, 4.0], [1e15, -1e15], [0.3, 0.4]],
]

_EDGE_ROWS = [
    (11, None),                      # NULL vector
    (12, [1.0]),                     # ragged short
    (13, [1.0, 2.0, 3.0, 4.0, 5.0]),  # ragged long
    (14, [1.0, None, 3.0, 4.0]),     # NULL element
    (15, [float("nan"), 1.0, 1.0, 1.0]),  # NaN element
    (16, [1e200, 1e200, 1e200, 1e200]),   # overflow -> inf distances
]


@pytest.fixture(scope="module")
def frames(spark):
    clean = spark.createDataFrame(_stress_rows(), "id long, v array<double>")
    edges = spark.createDataFrame(_EDGE_ROWS, "id long, v array<double>")
    return clean, edges


def _rows_by_id(df, cols):
    return {
        r["id"]: tuple(r[c] for c in cols)
        for r in df.collect()
    }


def _same_double(a, b):
    if a is None or b is None:
        return a is None and b is None
    # bit-level equality (NaN == NaN, -0.0 != 0.0)
    return math.isnan(a) and math.isnan(b) or repr(a) == repr(b)


def test_with_cluster_matches_expression_form(frames):
    clean, edges = frames
    for df in (clean, edges):
        kern = _rows_by_id(S.with_cluster(df, "v", _CENTS), ["__c"])
        expr = _rows_by_id(_expr_with_cluster(df, "v", _CENTS), ["__c"])
        assert kern == expr


def test_pq_encode_matches_expression_form(frames):
    clean, edges = frames
    for df in (clean, edges):
        k_df = S.pq_encode(df, "v", _BOOKS)
        e_df = _expr_pq_encode(df, "v", _BOOKS)
        kern = {r["id"]: (r["__pq0"], r["__pq1"]) for r in k_df.collect()}
        expr = {r["id"]: (r["__pq0"], r["__pq1"]) for r in e_df.collect()}
        assert set(kern) == set(expr)
        for i in kern:
            for kst, est in zip(kern[i], expr[i]):
                assert kst["i"] == est["i"], (i, kern[i], expr[i])
                assert _same_double(kst["d"], est["d"]), (
                    i, kern[i], expr[i],
                )


def test_with_cluster_edge_semantics_pinned(frames):
    """The empirical pins recorded from the expression form: every
    degenerate row lands in cluster 0 (all-NULL or all-NaN distances
    tie to the lowest index)."""
    _clean, edges = frames
    got = _rows_by_id(S.with_cluster(edges, "v", _CENTS), ["__c"])
    assert got == {i: (0,) for i in (11, 12, 13, 14, 15, 16)}


def test_pq_encode_output_types(frames):
    clean, _edges = frames
    out = S.pq_encode(clean, "v", _BOOKS)
    sub = dict(out.dtypes)
    assert sub["__pq0"] == "struct<d:double,i:int>"
    assert sub["__pq1"] == "struct<d:double,i:int>"
    assert dict(out.dtypes)["v"] == "array<double>"  # input col untouched
