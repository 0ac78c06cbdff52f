"""OPTIMIZE ZORDER BY: Morton-interleaved clustering in
`ManifestSnapshotTable.compact(cluster_method="zorder")`.

Pinned: the rewrite is observationally the identity; with per-file
zone maps, a Z-ordered layout skips files for predicates on EVERY
cluster column, where the linear (lexicographic) layout serves only
its leading column; non-numeric cluster columns and bad method names
are refused.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from _big_data_analytics_and_visualization_tracking_student_progress__spark.operators.upsert import (
    ManifestSnapshotTable,
)


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="zorder_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _build(spark, root, name):
    t = ManifestSnapshotTable(
        spark, os.path.join(root, name), keys=["day", "k"],
        order_cols=["seq"], partition_by=["day"],
        stats_cols=["x", "y"],
    )
    # the full 64x64 grid: x and y independent, so locality in one
    # says nothing about the other
    rows = spark.range(4096).select(
        F.lit(0).alias("day"),
        F.col("id").cast("int").alias("k"),
        (F.col("id") % 64).cast("int").alias("x"),
        (F.col("id") / 64).cast("int").alias("y"),
        F.lit(1).alias("seq"),
    )
    t.upsert(rows.withColumn("seq", F.col("seq").cast("int")))
    return t


def _files_kept(t, col, lo, hi):
    _df, _fk, _ft, files_kept, files_total = t.read_where_all(
        [(col, lo, hi)]
    )
    return files_kept, files_total


def test_zorder_skips_on_every_cluster_column(spark, root):
    lin = _build(spark, root, "lin")
    zor = _build(spark, root, "zor")
    before = sorted(tuple(r) for r in zor.read().collect())
    lin.compact(cluster_by=["x", "y"], cluster_files=16)
    zor.compact(
        cluster_by=["x", "y"], cluster_files=16, cluster_method="zorder"
    )
    # identity: same rows after either layout rewrite
    assert sorted(tuple(r) for r in zor.read().collect()) == before
    assert sorted(tuple(r) for r in lin.read().collect()) == before

    # leading column: both layouts skip
    lx_kept, lx_total = _files_kept(lin, "x", 0, 7)
    zx_kept, zx_total = _files_kept(zor, "x", 0, 7)
    assert lx_total > 8 and zx_total > 8  # the layout actually split
    assert lx_kept < lx_total and zx_kept < zx_total

    # NON-leading column: the lexicographic sort scatters y across
    # every file (each file spans the whole y domain), Z-order keeps
    # locality for it too
    ly_kept, ly_total = _files_kept(lin, "y", 0, 7)
    zy_kept, _ = _files_kept(zor, "y", 0, 7)
    assert ly_kept == ly_total  # linear layout cannot skip on y
    assert zy_kept < ly_kept

    # and the 2-D probe (both ranges) is strictly better than either
    _df, _fk, _ft, z2_kept, _tot = zor.read_where_all(
        [("x", 0, 7), ("y", 0, 7)]
    )
    assert z2_kept <= zy_kept
    # exactness survives the pruning
    got = sorted(
        (r.x, r.y) for r in _df.collect()
    )
    assert got == sorted(
        (r.x, r.y)
        for r in zor.read()
        .filter((F.col("x") <= 7) & (F.col("y") <= 7))
        .collect()
    )


def test_zorder_rejects_bad_inputs(spark, root):
    t = _build(spark, root, "t")
    with pytest.raises(ValueError, match="cluster_method"):
        t.compact(cluster_by=["x"], cluster_method="hilbert")
    t2 = ManifestSnapshotTable(
        spark, os.path.join(root, "t2"), keys=["day", "k"],
        order_cols=["seq"], partition_by=["day"],
    )
    t2.upsert(spark.createDataFrame(
        [(0, 1, "s", 1)], "day int, k int, v string, seq int"
    ))
    with pytest.raises(ValueError, match="numeric"):
        t2.compact(cluster_by=["v"], cluster_method="zorder")
    with pytest.raises(ValueError, match="1-4"):
        t2.compact(cluster_by=[], cluster_files=4, cluster_method="zorder")
    # '__zkey' is reserved by the zorder rewrite (withColumn would
    # silently destroy a user column of that name)
    t3 = ManifestSnapshotTable(
        spark, os.path.join(root, "t3"), keys=["day", "k"],
        order_cols=["seq"], partition_by=["day"],
    )
    t3.upsert(spark.createDataFrame(
        [(0, 1, 2, 3, 1)], "day int, k int, x int, __zkey int, seq int"
    ))
    with pytest.raises(ValueError, match="__zkey"):
        t3.compact(cluster_by=["x"], cluster_method="zorder")


def test_zorder_handles_nulls_and_constants(spark, root):
    t = ManifestSnapshotTable(
        spark, os.path.join(root, "t"), keys=["day", "k"],
        order_cols=["seq"], partition_by=["day"], stats_cols=["x"],
    )
    t.upsert(spark.createDataFrame(
        [(0, 1, None, 5, 1), (0, 2, 3, 5, 1), (0, 3, 9, 5, 1)],
        "day int, k int, x int, c int, seq int",
    ))
    before = sorted((r.k, r.x) for r in t.read().collect())
    # constant column contributes no order, NULL x buckets first —
    # neither crashes nor drops rows
    t.compact(cluster_by=["x", "c"], cluster_files=2,
              cluster_method="zorder")
    assert sorted((r.k, r.x) for r in t.read().collect()) == before


def test_quantile_bucketing_survives_skew(spark, root):
    """On a heavy-tailed column the uniform-width grid collapses
    almost every row into bucket 0 — the Morton key then carries no
    information for that dimension and its file envelopes all start at
    the hot value — while quantile (equal-population) buckets keep the
    skipping effective."""
    def build(name):
        t = ManifestSnapshotTable(
            spark, os.path.join(root, name), keys=["day", "k"],
            order_cols=["seq"], partition_by=["day"],
            stats_cols=["x", "y"],
        )
        # x heavy-tailed: 98% of rows at 0..9, a thin tail to 1e9
        rows = spark.range(4096).select(
            F.lit(0).alias("day"),
            F.col("id").cast("int").alias("k"),
            F.when(F.col("id") % 50 < 49, (F.col("id") % 10))
            .otherwise((F.col("id") % 100) * 10_000_000)
            .cast("long").alias("x"),
            (F.col("id") % 64).cast("int").alias("y"),
            F.lit(1).cast("int").alias("seq"),
        )
        t.upsert(rows)
        return t

    uni = build("uni")
    qua = build("qua")
    before = sorted(tuple(r) for r in qua.read().collect())
    uni.compact(cluster_by=["x", "y"], cluster_files=16,
                cluster_method="zorder")
    qua.compact(cluster_by=["x", "y"], cluster_files=16,
                cluster_method="zorder", cluster_bucketing="quantile")
    assert sorted(tuple(r) for r in qua.read().collect()) == before

    # probe INSIDE the hot region (where ~all the rows live): uniform
    # buckets put the whole region in one bucket, so every file's x
    # envelope starts there and nothing skips; quantile buckets
    # subdivide it
    u_kept, u_total = _files_kept(uni, "x", 0, 4)
    q_kept, q_total = _files_kept(qua, "x", 0, 4)
    assert u_kept == u_total  # uniform grid blind inside the hot region
    assert q_kept < q_total
    # exactness under the pruned read
    df, *_ = qua.read_where_all([("x", 0, 4)])
    assert df.count() == qua.read().filter(
        (F.col("x") >= 0) & (F.col("x") <= 4)
    ).count()
    # bad bucketing name is refused
    with pytest.raises(ValueError, match="bucketing"):
        uni.compact(cluster_by=["x"], cluster_method="zorder",
                    cluster_bucketing="exotic")


def test_cluster_spec_persists_and_auto_compact_reapplies(spark, root):
    """The clustering spec is table metadata (Delta's clustered-table
    shape): `compact(cluster_by=…)` persists it in the manifest, every
    later commit carries it, and `maybe_compact` — the streaming
    sink's auto-OPTIMIZE — re-applies it, so the Z-order layout (and
    its file skipping) survives auto-compaction instead of being
    silently bin-packed away.  A bare explicit `compact()` clears it
    (the caller asked for plain bin-packing); dropping a clustering
    column is refused while the spec names it."""
    t = _build(spark, root, "spec")
    # a second fragment so single-day commits can scatter the manifest
    t.upsert(
        spark.createDataFrame(
            [(1, 1, 1, 1, 1)], "day int, k int, x int, y int, seq int"
        )
    )
    t.compact(
        cluster_by=["x", "y"], cluster_files=16, cluster_method="zorder"
    )
    spec = t._manifest_doc()["cluster"]
    assert spec == {
        "by": ["x", "y"], "files": 16, "method": "zorder",
        "bucketing": "uniform",
    }
    # carried over ordinary commits (scatter the manifest too)
    for s in (2, 3):
        t.upsert(
            spark.createDataFrame(
                [(0, 1, 1, 1, s)], "day int, k int, x int, y int, seq int"
            )
        )
    assert t._manifest_doc()["cluster"] == spec
    # auto-OPTIMIZE fires (scatter > 1 holder) and re-applies the spec:
    # the rewrite is clustered (multiple files per fragment, file
    # skipping engages on the TRAILING cluster column), not bin-packed
    v = t.maybe_compact(1)
    assert v is not None
    assert t._manifest_doc()["cluster"] == spec
    kept, total = _files_kept(t, "y", 0, 7)
    assert total > 1 and kept < total
    with pytest.raises(ValueError, match="clustering column"):
        t.drop_column("y")
    # explicit bare compact = plain bin-packing, spec cleared
    t.upsert(
        spark.createDataFrame(
            [(0, 1, 1, 1, 9)], "day int, k int, x int, y int, seq int"
        )
    )
    t.compact()
    assert "cluster" not in t._manifest_doc()
    t.drop_column("y")  # no spec left to protect it
