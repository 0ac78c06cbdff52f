"""Shallow clone (`ManifestSnapshotTable.clone_to`) — Delta's
``CREATE TABLE ... SHALLOW CLONE``: a new, independently writable table
whose first snapshot references the source's current files BY PATH.

Pinned semantics: zero data copied (the clone dir holds exactly one
manifest version, no data dirs); reads resolve inherited fragments,
deletion vectors, and bloom sidecars through the manifest's ``base``
map; schema/defaults/constraints/zone-maps ride the copied manifest;
writes to either table never affect the other (the clone detaches the
fragments it rewrites; the source keeps owning its files); the clone's
local version sequence starts above every referenced source version;
``compact()`` severs every base reference (deep-copy materialization);
clones chain transitively; vacuum on the clone never touches source
dirs; rollback works across the base map."""

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
    d = tempfile.mkdtemp(prefix="clone_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _mk(spark, root, name="src", **kw):
    base = dict(
        keys=["day", "k"], order_cols=["seq"], partition_by=["day"],
    )
    base.update(kw)
    return ManifestSnapshotTable(spark, os.path.join(root, name), **base)


def _seed(spark, t):
    return t.upsert(
        spark.createDataFrame(
            [(0, 1, 1.0, 1), (0, 2, 2.0, 1), (1, 3, 3.0, 1), (2, 4, 4.0, 1)],
            "day int, k int, v double, seq int",
        )
    )


def _state(t):
    df = t.read()
    if df is None:
        return []
    return sorted((r.day, r.k, r.v) for r in df.collect())


def test_clone_is_zero_copy_and_reads_equal(spark, root):
    src = _mk(spark, root)
    _seed(spark, src)
    cl = src.clone_to(os.path.join(root, "cl"))
    assert _state(cl) == _state(src)
    # ZERO data copied: the clone dir holds one manifest version only
    vdirs = os.listdir(cl.path)
    assert len(vdirs) == 1
    assert not os.path.exists(os.path.join(cl.path, vdirs[0], "data"))
    # local sequence starts above every referenced source version
    assert cl.versions() == [2]
    h = {r.version: r.op for r in cl.history().collect()}
    assert h[2] == "clone"


def test_writes_are_independent_both_ways(spark, root):
    src = _mk(spark, root)
    _seed(spark, src)
    cl = src.clone_to(os.path.join(root, "cl"))
    cl.upsert(
        spark.createDataFrame(
            [(0, 9, 9.0, 2)], "day int, k int, v double, seq int"
        )
    )
    cl.delete_where(F.col("k") == 3)
    assert (0, 9, 9.0) in _state(cl) and (1, 3, 3.0) not in _state(cl)
    # the source never sees clone writes
    assert _state(src) == [
        (0, 1, 1.0), (0, 2, 2.0), (1, 3, 3.0), (2, 4, 4.0),
    ]
    # and source writes after the clone never reach the clone
    src.upsert(
        spark.createDataFrame(
            [(2, 8, 8.0, 2)], "day int, k int, v double, seq int"
        )
    )
    assert (2, 8, 8.0) not in _state(cl)


def test_clone_carries_schema_defaults_constraints_stats(spark, root):
    src = _mk(spark, root, stats_cols=["v"])
    _seed(spark, src)
    src.add_column("tag", "string", initial_default="x")
    src.add_constraint("v_pos", "v > 0")
    cl = src.clone_to(os.path.join(root, "cl"))
    assert cl.table_schema() == src.table_schema()
    assert cl.table_defaults() == {"tag": "x"}
    assert cl.table_constraints() == {"v_pos": "v > 0"}
    assert {r.tag for r in cl.read().collect()} == {"x"}
    # zone maps rode the manifest: pruned read + metadata count work
    n, meta, scanned = cl.count_rows()
    assert (n, scanned) == (4, 0)
    df, fk, ft, _, _ = cl.read_where("v", 3.0, 4.0)
    assert fk == 2 and ft == 3
    assert sorted(r.k for r in df.collect()) == [3, 4]
    # persisted constraints bind clone writers
    with pytest.raises(Exception, match="v_pos"):
        cl.upsert(
            spark.createDataFrame(
                [(0, 9, -1.0, 2, "t")],
                "day int, k int, v double, seq int, tag string",
            )
        )


def test_clone_resolves_source_deletion_vectors(spark, root):
    src = _mk(spark, root)
    _seed(spark, src)
    src.delete_dv(spark.createDataFrame([(0, 1)], "day int, k int"))
    cl = src.clone_to(os.path.join(root, "cl"))
    assert (0, 1, 1.0) not in _state(cl)
    # a clone-side DV delete writes a LOCAL sidecar; source unaffected
    cl.delete_dv(spark.createDataFrame([(1, 3)], "day int, k int"))
    assert (1, 3, 3.0) not in _state(cl)
    assert (1, 3, 3.0) in _state(src)


def test_compact_severs_base_references(spark, root):
    src = _mk(spark, root)
    _seed(spark, src)
    cl = src.clone_to(os.path.join(root, "cl"))
    before = _state(cl)
    cl.compact()
    assert cl._manifest_doc().get("base") in (None, {})
    shutil.rmtree(src.path)
    # a fresh handle must read fine with the source gone
    fresh = _mk(spark, root, name="cl")
    assert _state(fresh) == before


def test_source_vacuum_breaks_clone_documented_caveat(spark, root):
    src = _mk(spark, root, keep_versions=1)
    _seed(spark, src)
    cl = src.clone_to(os.path.join(root, "cl"))
    # rewrite every partition source-side; retention (keep_versions=1)
    # then deletes the clone's borrowed basis version
    src.update_where(F.lit(True), {"v": "v + 1"})
    assert not os.path.exists(os.path.join(src.path, "v=00001"))
    with pytest.raises(Exception):
        _state(cl)  # borrowed files gone — exactly Delta's caveat


def test_chained_clone_resolves_transitively(spark, root):
    src = _mk(spark, root)
    _seed(spark, src)
    c1 = src.clone_to(os.path.join(root, "c1"))
    c1.upsert(
        spark.createDataFrame(
            [(0, 9, 9.0, 2)], "day int, k int, v double, seq int"
        )
    )
    c2 = c1.clone_to(os.path.join(root, "c2"))
    # c2 references day=0 from c1 (rewritten there) and day=1/2 from
    # the ORIGINAL src — transitively, not through c1
    base = c2._manifest_doc()["base"]
    assert set(base.values()) == {
        os.path.abspath(src.path), os.path.abspath(c1.path),
    }
    assert (0, 9, 9.0) in _state(c2)
    assert (1, 3, 3.0) in _state(c2)


def test_clone_vacuum_and_rollback_never_touch_source(spark, root):
    src = _mk(spark, root)
    _seed(spark, src)
    src_dirs = sorted(os.listdir(src.path))
    cl = src.clone_to(os.path.join(root, "cl"))
    clone_v = cl.versions()[0]
    cl.upsert(
        spark.createDataFrame(
            [(0, 9, 9.0, 2)], "day int, k int, v double, seq int"
        )
    )
    cl.rollback(clone_v)  # across the base map (external dirs exist)
    assert _state(cl) == _state(src)
    cl.keep_versions = 1
    cl.vacuum()
    assert sorted(os.listdir(src.path)) == src_dirs
    assert _state(cl) == _state(src)


def test_clone_refusals(spark, root):
    src = _mk(spark, root)
    with pytest.raises(ValueError, match="empty table"):
        src.clone_to(os.path.join(root, "cl"))
    _seed(spark, src)
    dest = os.path.join(root, "occupied")
    os.makedirs(dest)
    with open(os.path.join(dest, "junk"), "w") as fh:
        fh.write("x")
    with pytest.raises(ValueError, match="not empty"):
        src.clone_to(dest)


def test_clone_bloom_sidecars_resolve_through_base(spark, root):
    src = _mk(spark, root, stats_cols=["v"], bloom_cols=["k"])
    _seed(spark, src)
    src.compact(cluster_by=["k"], cluster_files=4)  # builds sidecars
    cl = src.clone_to(os.path.join(root, "cl"))
    df, fk, ft, flk, flt = cl.read_where_eq([("k", 3)])
    assert [r.day for r in df.collect()] == [1]
    # bloom skipping engaged on the clone (fewer files than total)
    assert flk < flt


def test_clone_inherits_generated_partitions(spark, root):
    src = ManifestSnapshotTable(
        spark, os.path.join(root, "gsrc"), keys=["day", "k"],
        order_cols=["seq"], partition_by=["day"],
        generated_partitions={"day": "CAST(ts DIV 10 AS INT)"},
    )
    src.upsert(
        spark.createDataFrame(
            [(1, 5, 1.0, 1)], "k int, ts long, v double, seq int"
        )
    )
    cl = src.clone_to(os.path.join(root, "gcl"))
    # the derivation rides the cloned manifest: a clone batch may omit
    # the partition column too, and a wrong value is refused
    cl.upsert(
        spark.createDataFrame(
            [(2, 25, 2.0, 1)], "k int, ts long, v double, seq int"
        )
    )
    assert sorted((r.day, r.k) for r in cl.read().collect()) == [
        (0, 1), (2, 2),
    ]
    with pytest.raises(ValueError, match="declared derivation"):
        cl.upsert(
            spark.createDataFrame(
                [(9, 3, 55, 3.0, 1)],
                "day int, k int, ts long, v double, seq int",
            )
        )


def test_time_travel_after_detach_resolves_pruned_base_entries(spark, root):
    """Regression (ADVICE r10): `_base_map` used to load from the
    LATEST manifest, but `_carry_meta` prunes base entries as borrowed
    fragments are rewritten — so after a clone detached a fragment,
    a FRESH handle's `read(version=…)` / `changes()` / `restore()`
    targeting the earlier clone snapshot resolved the still-borrowed
    external version to a nonexistent local v-dir.  The earliest
    readable manifest's base map is a superset of every later one
    (entries never re-enter), so resolution now goes through it."""
    src = _mk(spark, root)
    # two source versions so holders reference DIFFERENT versions:
    # v1 holds day=0/1, v2 holds day=2
    src.upsert(
        spark.createDataFrame(
            [(0, 1, 1.0, 1), (1, 3, 3.0, 1)],
            "day int, k int, v double, seq int",
        )
    )
    src.upsert(
        spark.createDataFrame(
            [(2, 4, 4.0, 1)], "day int, k int, v double, seq int"
        )
    )
    cl = src.clone_to(os.path.join(root, "cl"))
    clone_v = cl.versions()[0]
    before = _state(cl)
    # rewrite day=2 on the clone: the new manifest's holders no longer
    # reference src v2, so _carry_meta prunes its base entry
    cl.upsert(
        spark.createDataFrame(
            [(2, 4, 44.0, 2)], "day int, k int, v double, seq int"
        )
    )
    latest_base = cl._manifest_doc().get("base") or {}
    assert "2" not in latest_base  # pruning actually happened
    # a FRESH handle (cold base cache) must still time-travel to the
    # clone-creation snapshot, diff across it, and restore it
    fresh = _mk(spark, root, name="cl")
    assert _state_at(fresh, clone_v) == before
    feed = fresh.changes(clone_v, fresh.versions()[-1])
    assert sorted(
        (r.k, r._change_type) for r in feed.collect()
    ) == [(4, "update_postimage")]
    fresh.restore(clone_v)
    assert _state(fresh) == before


def _state_at(t, v):
    return sorted((r.day, r.k, r.v) for r in t.read(version=v).collect())


def test_vacuum_keep_seconds_caches_commit_timestamps(spark, root):
    """Regression (ADVICE r10): with keep_seconds set, vacuum runs on
    every publish and used to re-parse EVERY readable version's
    manifest.json for its commit ts — O(history) JSON reads per
    commit.  Timestamps are immutable once committed, so they are
    cached on the handle after the first look."""
    t = _mk(spark, root, name="ts", keep_seconds=3600.0)
    _seed(spark, t)
    t.upsert(
        spark.createDataFrame(
            [(0, 1, 5.0, 2)], "day int, k int, v double, seq int"
        )
    )
    assert set(t._ts_cache) >= set(t.versions()[:-1])
    # cached entries are trusted: poison the cache for the oldest
    # version and observe vacuum act on it (no re-parse happened)
    t._ts_cache[t.versions()[0]] = 0.0  # far past the cutoff
    t.keep_versions = 1
    t.keep_seconds = 1e-9
    t.vacuum()
    assert len(t.versions()) == 1
