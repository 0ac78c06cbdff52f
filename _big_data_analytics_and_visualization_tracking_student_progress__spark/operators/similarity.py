"""Similarity search over embedding columns (array<float>).

Two tiers:
- brute-force cosine top-k: exact; native higher-order functions
  (zip_with + aggregate) keep the arithmetic JVM-side; top-k compiles to
  TakeOrderedAndProject (per-partition heaps, no global sort).
- LSH-bucketed ANN (random hyperplane signatures): the scale path — the
  corpus is scanned once to stamp signatures; a query probes only its
  bucket (and optional 1-bit-flip neighbor buckets).  At 100 TB the
  signature column is computed once at ingest and the bucketed table is
  the index.

Hyperplanes are generated from a fixed seed on the driver and embedded
as literals (tiny: n_planes × dim floats), so plans are deterministic
and require no state.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _lit_vec(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity to a literal query vector.

    One scan, no shuffle except the k-row TakeOrdered collect.  The
    double arithmetic is sequential left-fold per row → deterministic
    and engine-portable bit-for-bit."""
    q = _lit_vec(query_vec)
    scored = df.select(
        F.col(id_col),
        cosine(F.col(vec_col).cast("array<double>"), q).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    q_id: str = "q_id",
    c_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact k-NN of each query row against the corpus: broadcast the
    (small) query side, score in one corpus scan, keep top-k per query
    with a window.  Shuffle volume = corpus × |queries| scored rows →
    only viable for modest query batches; the ANN path below is the
    scale alternative."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(q_id), F.col(vec_col).cast("array<double>").alias("q_vec")
    )
    c = corpus.select(
        F.col(c_id), F.col(vec_col).cast("array<double>").alias("c_vec")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        q_id,
        c_id,
        cosine(F.col("q_vec"), F.col("c_vec")).alias("cos_sim"),
    )
    w = Window.partitionBy(q_id).orderBy(F.col("cos_sim").desc(), F.col(c_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, "cos_sim", "rank")
    )


# ---------------------------------------------------------------------------
# Random-hyperplane LSH (signed random projections)
# ---------------------------------------------------------------------------
def hyperplanes(dim: int, n_planes: int = 12, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).astype(float).tolist()


def rh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Bit-signature: bit i = sign(vec · plane_i)."""
    sig = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        bit = F.when(dot(vec, _lit_vec(p)) > 0, F.lit(2**i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = sig.bitwiseOR(bit)
    return sig


def ann_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    probe_flips: int = 1,
) -> DataFrame:
    """Approximate top-k: score only rows whose hyperplane signature is
    within `probe_flips` bit-flips of the query's (multi-probe LSH).

    At scale the signature is a persisted column and `sig` a pushed-down
    equality/IN filter — the scan touches only matching buckets."""
    dim = len(query_vec)
    planes = hyperplanes(dim, n_planes)
    qv = np.array(query_vec, dtype=float)
    qsig = 0
    for i, p in enumerate(planes):
        if float(np.dot(qv, np.array(p))) > 0:
            qsig |= 1 << i
    probes = {qsig}
    if probe_flips >= 1:
        for i in range(n_planes):
            probes.add(qsig ^ (1 << i))
    if probe_flips >= 2:
        for i in range(n_planes):
            for j in range(i + 1, n_planes):
                probes.add(qsig ^ (1 << i) ^ (1 << j))

    signed = df.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("sig", rh_signature(F.col("v"), planes))
    bucket = signed.filter(F.col("sig").isin([int(s) for s in probes]))
    q = _lit_vec(list(query_vec))
    scored = bucket.select(
        F.col(id_col), cosine(F.col("v"), q).alias("cos_sim")
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


# ---------------------------------------------------------------------------
# Arrow-vectorized alternative path: identical semantics to the native
# `cosine` expression, computed by numpy over Arrow batches.  The native
# expression is the default (stays in codegen); this exists for the
# cases where the scoring function outgrows SQL expressions (learned
# re-rankers, quantized distance kernels) — and its equality with the
# native path is pinned in tests.
# ---------------------------------------------------------------------------
def cosine_pandas_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        mask = a.notna() & b.notna()
        if not mask.any():
            return pd.Series([None] * len(a), dtype="float64")
        xa = np.stack(a[mask].to_numpy())  # (n, d) — fixed-dim embeddings
        yb = np.stack(b[mask].to_numpy())
        num = np.einsum("ij,ij->i", xa, yb)
        den = np.linalg.norm(xa, axis=1) * np.linalg.norm(yb, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = np.where(den > 0, num / den, 0.0)
        out = pd.Series([None] * len(a), dtype="float64")
        out[mask.to_numpy()] = cos
        return out

    return _cos
