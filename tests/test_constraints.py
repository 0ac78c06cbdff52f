"""CHECK constraints on ManifestSnapshotTable (Delta ADD CONSTRAINT
CHECK): enforced in a single pass via df.observe riding the write job
(zero extra scans); FALSE violates, NULL passes; a violation abandons
the whole commit; deletes/compaction never check."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from _big_data_analytics_and_visualization_tracking_student_progress__spark.operators.upsert import (
    ConstraintViolationError,
    ManifestSnapshotTable,
)

SCHEMA = "day int, k int, v int, seq int"


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="chk_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _mk(spark, root, **kw):
    base = dict(
        keys=["day", "k"], order_cols=["seq"], partition_by=["day"],
        constraints={"v_nonneg": F.col("v") >= 0},
    )
    base.update(kw)
    return ManifestSnapshotTable(spark, os.path.join(root, "t"), **base)


def test_violation_abandons_commit_whole(spark, root):
    t = _mk(spark, root)
    t.upsert(spark.createDataFrame([(0, 1, 5, 1)], SCHEMA))
    with pytest.raises(ConstraintViolationError, match="v_nonneg"):
        t.upsert(spark.createDataFrame(
            [(0, 2, 7, 2), (1, 3, -1, 2)], SCHEMA,
        ))
    # nothing partial: versions, content and claim dir all clean
    assert t.versions() == [1]
    assert sorted((r.k, r.v) for r in t.read().collect()) == [(1, 5)]
    assert sorted(os.listdir(t.path)) == ["v=00001"]


def test_null_passes_sql_style(spark, root):
    t = _mk(spark, root)
    t.upsert(spark.createDataFrame([(0, 1, None, 1)], SCHEMA))
    assert [r.v for r in t.read().collect()] == [None]


def test_merge_into_checks_and_deletes_do_not(spark, root):
    t = _mk(spark, root)
    t.upsert(spark.createDataFrame([(0, 1, 5, 1), (0, 2, 6, 1)], SCHEMA))
    with pytest.raises(ConstraintViolationError):
        t.merge_into(
            spark.createDataFrame([(0, 1, -9, 2)], SCHEMA),
            when_matched_update=F.lit(True),
        )
    assert t.versions() == [1]
    # a valid merge commits fine
    t.merge_into(
        spark.createDataFrame([(0, 1, 9, 2)], SCHEMA),
        when_matched_update=F.lit(True),
    )
    # deletes and compaction never constraint-check: simulate a
    # constraint ADDED AFTER bad data landed — erasure must not block
    loose = ManifestSnapshotTable(
        spark, t.path, keys=["day", "k"], order_cols=["seq"],
        partition_by=["day"],
    )
    loose.upsert(spark.createDataFrame([(1, 9, -5, 3)], SCHEMA))
    strict = _mk(spark, root)  # same path, constraint back on
    strict.delete(spark.createDataFrame([(0, 2)], "day int, k int"))
    strict.delete_dv(spark.createDataFrame([(0, 1)], "day int, k int"))
    strict.compact()
    assert sorted((r.day, r.k, r.v) for r in strict.read().collect()) == [
        (1, 9, -5)
    ]
    # ...but the next upsert TOUCHING the bad partition re-validates
    # carried rows and surfaces the violation
    with pytest.raises(ConstraintViolationError):
        strict.upsert(spark.createDataFrame([(1, 10, 1, 4)], SCHEMA))


def test_persisted_constraints_bind_every_writer(spark, root):
    """add_constraint persists the CHECK as SQL in the manifest:
    a FRESH handle with no constructor constraints still enforces it
    (the handle-local-only bypass is closed), it survives rewriting
    commits, and drop_constraint lifts it."""
    t = ManifestSnapshotTable(
        spark, os.path.join(root, "t"), keys=["day", "k"],
        order_cols=["seq"], partition_by=["day"],
    )
    t.upsert(spark.createDataFrame([(0, 1, 5, 1)], SCHEMA))
    v = t.add_constraint("v_nonneg", "v >= 0")
    ops = {r.version: r.op for r in t.history().collect()}
    assert ops[v] == "add_constraint"
    assert t.table_constraints() == {"v_nonneg": "v >= 0"}
    fresh = ManifestSnapshotTable(
        spark, t.path, keys=["day", "k"], order_cols=["seq"],
        partition_by=["day"],
    )
    with pytest.raises(ConstraintViolationError, match="v_nonneg"):
        fresh.upsert(spark.createDataFrame([(0, 2, -1, 2)], SCHEMA))
    # survives rewriting and metadata-less commit paths
    fresh.upsert(spark.createDataFrame([(0, 2, 2, 2)], SCHEMA))
    fresh.delete_dv(spark.createDataFrame([(0, 2)], "day int, k int"))
    fresh.compact()
    assert fresh.table_constraints() == {"v_nonneg": "v >= 0"}
    with pytest.raises(ConstraintViolationError):
        fresh.upsert(spark.createDataFrame([(0, 3, -7, 3)], SCHEMA))
    # drop lifts it for everyone
    fresh.drop_constraint("v_nonneg")
    t.upsert(spark.createDataFrame([(0, 3, -7, 3)], SCHEMA))
    assert sorted(r.v for r in t.read().collect()) == [-7, 5]
    # unknown name raises unless if_exists
    with pytest.raises(ValueError, match="no constraint"):
        fresh.drop_constraint("v_nonneg")
    assert fresh.drop_constraint("v_nonneg", if_exists=True) == (
        fresh.versions()[-1]
    )


def test_add_constraint_validates_existing_data(spark, root):
    t = ManifestSnapshotTable(
        spark, os.path.join(root, "t"), keys=["day", "k"],
        order_cols=["seq"], partition_by=["day"],
    )
    t.upsert(spark.createDataFrame([(0, 1, -5, 1), (0, 2, 3, 1)], SCHEMA))
    with pytest.raises(ConstraintViolationError, match="existing row"):
        t.add_constraint("v_nonneg", "v >= 0")
    assert t.table_constraints() == {}
    # duplicate names refused
    t.add_constraint("v_over_min", "v >= -10")
    with pytest.raises(ValueError, match="already exists"):
        t.add_constraint("v_over_min", "v >= 0")
    # dv-deleting the violating row unblocks the stricter ADD (the
    # validation scan reads LIVE content)
    t.delete_dv(spark.createDataFrame([(0, 1)], "day int, k int"))
    t.add_constraint("v_nonneg", "v >= 0")
    assert set(t.table_constraints()) == {"v_over_min", "v_nonneg"}
