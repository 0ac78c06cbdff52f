"""Predicate UPDATE (`ManifestSnapshotTable.update_where`) — SQL
``UPDATE t SET ... WHERE ...`` under the manifest's copy-on-write
commit discipline.

Pinned semantics: TRUE rows get each assignment evaluated against the
PRE-update row (so column swaps behave as in SQL); NULL-condition rows
stay, like SQL UPDATE; only partitions holding a matching row are
rewritten (everything else inherited by reference); updated columns are
cast back to their pre-update type so an UPDATE can never drift the
schema; CHECK constraints are enforced (an UPDATE can introduce a
violation, unlike a DELETE); live deletion vectors on a touched
partition are materialized by the rewrite, never resurrected; key /
partition columns are not assignable; old snapshots still read the
pre-update state; the change feed tags the rewritten keys."""

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


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="updw_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _mk(spark, root, **kw):
    base = dict(
        keys=["day", "k"], order_cols=["seq"], partition_by=["day"],
    )
    base.update(kw)
    return ManifestSnapshotTable(spark, os.path.join(root, "t"), **base)


def _seed(spark, t):
    return t.upsert(
        spark.createDataFrame(
            [
                (0, 1, "a", 10.0, 1),
                (0, 2, "b", 20.0, 1),
                (1, 1, "c", 30.0, 1),
                (1, 3, "d", 40.0, 1),
                (2, 5, "e", None, 1),
            ],
            "day int, k int, v string, amt double, seq int",
        )
    )


def _state(t):
    df = t.read()
    if df is None:
        return []
    return sorted((r.day, r.k, r.v, r.amt) for r in df.collect())


def test_basic_update_and_null_condition_rows_kept(spark, root):
    t = _mk(spark, root)
    _seed(spark, t)
    # amt IS NULL rows evaluate the condition to NULL -> unchanged
    t.update_where(
        F.col("amt") < 25.0,
        {"v": F.concat(F.col("v"), F.lit("!")), "amt": "amt * 2"},
    )
    assert _state(t) == [
        (0, 1, "a!", 20.0),
        (0, 2, "b!", 40.0),
        (1, 1, "c", 30.0),
        (1, 3, "d", 40.0),
        (2, 5, "e", None),
    ]


def test_assignments_see_preupdate_row_swap(spark, root):
    t = _mk(spark, root)
    t.upsert(
        spark.createDataFrame(
            [(0, 1, "x", 1.0, 1), (0, 2, "y", 2.0, 1)],
            "day int, k int, v string, amt double, seq int",
        )
    )
    # swap-like: both assignments read the PRE-update row
    t.update_where(
        F.lit(True),
        {"v": F.concat(F.lit("was"), F.col("amt").cast("int")),
         "amt": F.col("amt") + F.length("v")},
    )
    assert _state(t) == [(0, 1, "was1", 2.0), (0, 2, "was2", 3.0)]


def test_partition_pruning_inherits_untouched(spark, root):
    t = _mk(spark, root)
    v1 = _seed(spark, t)
    v2 = t.update_where(F.col("day") == 1, {"amt": "amt + 1"})
    m = t.manifest()
    assert m["day=1"] == v2
    assert m["day=0"] == v1 and m["day=2"] == v1
    # history records the op and the touched set
    h = {r.version: r for r in t.history().collect()}
    assert h[v2].op == "update_where"
    assert h[v2].n_touched == 1
    assert t._manifest_doc(v2)["commit"]["touched"] == ["day=1"]


def test_no_match_is_a_noop(spark, root):
    t = _mk(spark, root)
    v1 = _seed(spark, t)
    assert t.update_where(F.col("k") > 99, {"amt": "amt + 1"}) == v1
    assert t.versions() == [v1]


def test_refuses_key_partition_and_unknown_columns(spark, root):
    t = _mk(spark, root)
    v1 = _seed(spark, t)
    with pytest.raises(ValueError, match="key/partition"):
        t.update_where(F.lit(True), {"k": "k + 1"})
    with pytest.raises(ValueError, match="key/partition"):
        t.update_where(F.lit(True), {"day": "day + 1"})
    with pytest.raises(ValueError, match="unknown columns"):
        t.update_where(F.lit(True), {"nope": "1"})
    with pytest.raises(ValueError, match="at least one"):
        t.update_where(F.lit(True), {})
    # every refusal abandoned its claim: table unchanged and writable
    assert t.versions() == [v1]
    assert t.update_where(F.col("k") == 1, {"amt": "amt"}) == v1 + 1


def test_updated_column_keeps_its_type(spark, root):
    t = _mk(spark, root)
    _seed(spark, t)
    before = dict(t.read().dtypes)
    # int-literal assignment onto a double column must not narrow it
    t.update_where(F.col("k") == 1, {"amt": F.lit(7)})
    assert dict(t.read().dtypes) == before
    assert (7.0 in {r.amt for r in t.read().collect()})


def test_check_constraint_blocks_violating_update(spark, root):
    t = _mk(spark, root)
    _seed(spark, t)
    t.add_constraint("amt_pos", "amt >= 0")
    state = _state(t)
    vs = t.versions()
    with pytest.raises(ConstraintViolationError):
        t.update_where(F.col("day") == 0, {"amt": "-amt"})
    assert t.versions() == vs and _state(t) == state
    # a passing update still lands (NULL amt passes CHECK, SQL-style)
    t.update_where(F.col("day") == 2, {"v": F.lit("ok")})
    assert (2, 5, "ok", None) in _state(t)


def test_dv_deleted_rows_stay_dead_and_vector_materializes(spark, root):
    t = _mk(spark, root)
    _seed(spark, t)
    t.delete_dv(spark.createDataFrame([(0, 1)], "day int, k int"))
    assert "day=0" in t._dv_map(t._manifest_doc())
    t.update_where(F.col("day") == 0, {"amt": "amt + 100"})
    # the rewrite read live content: the dv-deleted row is gone for
    # good and the touched fragment's vector was materialized away
    assert _state(t) == [
        (0, 2, "b", 120.0),
        (1, 1, "c", 30.0),
        (1, 3, "d", 40.0),
        (2, 5, "e", None),
    ]
    assert "day=0" not in t._dv_map(t._manifest_doc())


def test_time_travel_and_change_feed(spark, root):
    t = _mk(spark, root)
    v1 = _seed(spark, t)
    pre = _state(t)
    v2 = t.update_where(F.col("k") == 1, {"amt": "amt * 10"})
    old = sorted(
        (r.day, r.k, r.v, r.amt) for r in t.read(version=v1).collect()
    )
    assert old == pre
    feed = t.changes(v1, v2)
    tagged = sorted(
        (r.day, r.k, r._change_type, r.amt) for r in feed.collect()
    )
    assert tagged == [
        (0, 1, "update_postimage", 100.0),
        (1, 1, "update_postimage", 300.0),
    ]


def test_zone_maps_refresh_on_update(spark, root):
    t = _mk(spark, root, stats_cols=["amt"])
    _seed(spark, t)
    t.update_where(F.col("day") == 0, {"amt": "amt + 1000"})
    env = t.fragment_stats()["day=0"]["amt"]
    assert env == [1010.0, 1020.0]
    # pruned read routes through the fresh envelopes: day=1 is proved
    # out of range; day=2 (NULL-only amt, no envelope) is kept
    # conservatively — pruning is an optimization, never a filter
    df, frags_kept, frags_total, _, _ = t.read_where("amt", 1000, 2000)
    assert frags_kept == 2 and frags_total == 3
    assert sorted(r.k for r in df.collect()) == [1, 2]
