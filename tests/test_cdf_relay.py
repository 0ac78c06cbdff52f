"""Streaming change-data-feed relay (changes_relay_run): the manifest
table as a stream source.

Pinned: the accumulated feed equals bootstrap-insert(v1) plus
changes(v-1, v) for every later commit; re-running the relay resumes
from the feed's high-water and relays ONLY new commits; a torn
per-version write (no _SUCCESS) is rewritten idempotently; a vacuumed
gap between the relayed high-water and the earliest readable version
raises instead of silently skipping commits.
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
from _big_data_analytics_and_visualization_tracking_student_progress__spark.streaming.pipeline import (
    changes_relay_run,
    read_change_feed,
)


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="cdf_relay_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _mk(spark, root, **kw):
    base = dict(keys=["d", "k"], order_cols=["v"], partition_by=["d"])
    base.update(kw)
    return ManifestSnapshotTable(spark, os.path.join(root, "t"), **base)


def _commit3(spark, t):
    t.upsert(spark.createDataFrame([(0, 1, 1), (1, 2, 2)],
                                   "d int, k int, v int"))
    t.upsert(spark.createDataFrame([(0, 1, 9), (0, 3, 3)],
                                   "d int, k int, v int"))
    t.delete(spark.createDataFrame([(1, 2)], "d int, k int"))


def _rows(feed):
    return sorted(
        (r.commit_version, r._change_type, r.d, r.k, r.v)
        for r in feed.collect()
    )


def test_feed_equals_bootstrap_plus_per_version_changes(spark, root):
    t = _mk(spark, root)
    _commit3(spark, t)
    feed = changes_relay_run(spark, t, workdir=os.path.join(root, "wd"))
    assert _rows(feed) == [
        (1, "insert", 0, 1, 1),
        (1, "insert", 1, 2, 2),
        (2, "insert", 0, 3, 3),
        (2, "update_postimage", 0, 1, 9),
        (3, "delete", 1, 2, 2),  # delete carries the pre-image
    ]
    # cross-check v2/v3 rows against the batch API directly
    batch2 = sorted(
        (r._change_type, r.d, r.k, r.v)
        for r in t.changes(1, 2).collect()
    )
    assert batch2 == [
        r[1:] for r in _rows(feed) if r[0] == 2
    ]


def test_relay_resumes_only_new_commits(spark, root):
    t = _mk(spark, root)
    _commit3(spark, t)
    wd = os.path.join(root, "wd")
    changes_relay_run(spark, t, workdir=wd)
    # mtime-stamp the feed dirs, then relay again with nothing new:
    # nothing is rewritten (whole-dir overwrites would bump mtimes)
    feed_dir = os.path.join(wd, "feed")
    stamps = {
        n: os.path.getmtime(os.path.join(feed_dir, n))
        for n in os.listdir(feed_dir)
        if n.startswith("commit_version=")
    }
    changes_relay_run(spark, t, workdir=wd)
    for n, ts in stamps.items():
        assert os.path.getmtime(os.path.join(feed_dir, n)) == ts
    # a new commit relays exactly one new partition
    t.upsert(spark.createDataFrame([(0, 5, 5)], "d int, k int, v int"))
    feed = changes_relay_run(spark, t, workdir=wd)
    assert [
        r for r in _rows(feed) if r[0] == 4
    ] == [(4, "insert", 0, 5, 5)]
    assert sorted({r[0] for r in _rows(feed)}) == [1, 2, 3, 4]


def test_torn_feed_write_is_rewritten_on_replay(spark, root):
    t = _mk(spark, root)
    _commit3(spark, t)
    wd = os.path.join(root, "wd")
    before = _rows(changes_relay_run(spark, t, workdir=wd))
    # simulate a crash after writing v3's files but before its marker:
    # in production the streaming checkpoint replays the unfinished
    # batch on restart — model that with a fresh checkpoint over the
    # SAME feed (the feed itself is the cursor, so already-marked
    # versions are skipped and the torn one is rewritten)
    os.remove(os.path.join(wd, "feed", "commit_version=3", "_SUCCESS"))
    shutil.rmtree(os.path.join(wd, "ckpt"))
    feed_dir = os.path.join(wd, "feed")
    stamp_v1 = os.path.getmtime(os.path.join(feed_dir, "commit_version=1"))
    after = _rows(changes_relay_run(spark, t, workdir=wd))
    assert after == before
    # marked versions were not rewritten on the replay
    assert os.path.getmtime(
        os.path.join(feed_dir, "commit_version=1")
    ) == stamp_v1
    assert os.path.exists(
        os.path.join(feed_dir, "commit_version=3", "_SUCCESS")
    )


def test_retention_gap_raises(spark, root):
    t = _mk(spark, root, keep_versions=1)
    wd = os.path.join(root, "wd")
    t.upsert(spark.createDataFrame([(0, 1, 1)], "d int, k int, v int"))
    changes_relay_run(spark, t, workdir=wd)
    # two more commits; keep_versions=1 vacuums v2 away before the
    # relay sees it -> relaying v3 would silently skip v2's changes
    t.upsert(spark.createDataFrame([(0, 2, 2)], "d int, k int, v int"))
    t.upsert(spark.createDataFrame([(0, 3, 3)], "d int, k int, v int"))
    from pyspark.sql.utils import StreamingQueryException

    with pytest.raises(
        (RuntimeError, StreamingQueryException), match="retention gap"
    ):
        changes_relay_run(spark, t, workdir=wd)


def test_single_commit_is_pure_bootstrap(spark, root):
    t = _mk(spark, root)
    t.upsert(spark.createDataFrame([(0, 1, 1)], "d int, k int, v int"))
    feed = changes_relay_run(spark, t, workdir=os.path.join(root, "wd"))
    assert _rows(feed) == [(1, "insert", 0, 1, 1)]
    assert read_change_feed(spark, os.path.join(root, "wd")) is not None


def test_relay_never_rebootstraps_over_vacuumed_diff_base(spark, root):
    """A relay that already bootstrapped may only continue via diffs.
    If retention vacuums the last-relayed version while its successor
    survives, a naive earliest-readable bootstrap would silently
    duplicate every live row in the feed — the relay must raise the
    retention-gap error instead."""
    t = _mk(spark, root, keep_versions=2)
    wd = os.path.join(root, "wd")
    t.upsert(spark.createDataFrame([(0, 1, 1)], "d int, k int, v int"))
    t.upsert(spark.createDataFrame([(0, 2, 2)], "d int, k int, v int"))
    changes_relay_run(spark, t, workdir=wd)  # high-water = 2
    t.upsert(spark.createDataFrame([(0, 3, 3)], "d int, k int, v int"))
    t.upsert(spark.createDataFrame([(0, 4, 4)], "d int, k int, v int"))
    assert t.versions() == [3, 4]  # v2 vacuumed away
    from pyspark.sql.utils import StreamingQueryException

    with pytest.raises(
        (RuntimeError, StreamingQueryException), match="retention gap"
    ):
        changes_relay_run(spark, t, workdir=wd)


def test_relay_carries_dv_only_commits(spark, root):
    """A deletion-vector commit moves no data files but is a real
    snapshot: the relay must pick it up (manifest.json is the stream
    trigger) and emit its delete rows, exactly like a CoW delete."""
    t = _mk(spark, root)
    t.upsert(spark.createDataFrame([(0, 1, 1), (0, 2, 2), (1, 3, 3)],
                                   "d int, k int, v int"))
    t.delete_dv(spark.createDataFrame([(0, 2)], "d int, k int"))
    feed = changes_relay_run(spark, t, workdir=os.path.join(root, "wd"))
    assert _rows(feed) == [
        (1, "insert", 0, 1, 1),
        (1, "insert", 0, 2, 2),
        (1, "insert", 1, 3, 3),
        (2, "delete", 0, 2, 2),  # dv delete carries the pre-image too
    ]
    # a later dv commit on the OTHER fragment relays incrementally
    t.delete_where_dv(F.col("d") == 1)
    feed2 = changes_relay_run(spark, t, workdir=os.path.join(root, "wd"))
    assert _rows(feed2)[-1] == (3, "delete", 1, 3, 3)


def test_relay_spans_schema_evolution(spark, root):
    """A feed accumulated across a base add_column must surface the
    new column for EVERY row (NULL before the evolution) — the merged
    union schema, not whichever footer parquet samples first."""
    t = _mk(spark, root)
    t.upsert(spark.createDataFrame([(0, 1, 1)], "d int, k int, v int"))
    wd = os.path.join(root, "wd")
    changes_relay_run(spark, t, workdir=wd)
    t.add_column("tag", "string", initial_default="x")
    t.upsert(
        spark.createDataFrame(
            [(0, 2, 2, "hot")], "d int, k int, v int, tag string"
        )
    )
    feed = changes_relay_run(spark, t, workdir=wd)
    assert "tag" in feed.columns
    got = sorted(
        (r.commit_version, r._change_type, r.k, r.tag)
        for r in feed.collect()
    )
    # the bootstrap insert predates the column (NULL in the feed —
    # feed files are immutable history); the post-evolution commit
    # emits ONLY the true insert: the carried row k=1 produces no
    # update event because alignment makes its pre-image read the
    # default ('x') that the rewrite then materialized — identical
    # images, so the evolution itself never floods the feed
    assert got == [
        (1, "insert", 1, None),
        (3, "insert", 2, "hot"),
    ]
