"""Per-file bloom-filter skipping + metadata-only aggregates on the
ManifestSnapshotTable.

Bloom contract: `read_where_eq` must return EXACTLY the rows the
unpruned scan-and-filter returns, for every probed value, present or
absent (bloom filters have no false negatives; false positives are
re-checked by the exact predicate) — while opening strictly fewer
files than the fragment holds whenever sidecars exist and the layout
has multiple files per fragment.  Metadata contract: `count_rows` /
`metadata_min_max` equal the scan aggregates exactly, across upsert,
delete, merge and compact commits, and report zero scanned fragments
whenever stats are recorded.
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
    d = tempfile.mkdtemp(prefix="ms_bloom_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _table(spark, root, **kw):
    base = dict(
        keys=["day", "k"],
        order_cols=["seq"],
        partition_by=["day"],
        stats_cols=["seq"],
        bloom_cols=["k"],
        bloom_bits=1 << 12,
        bloom_k=5,
    )
    base.update(kw)
    return ManifestSnapshotTable(spark, root, **base)


def _seed(spark, t, days=3, keys_per_day=120):
    rows = [
        (d, d * 10_000 + k, d * 10_000 + k)
        for d in range(days)
        for k in range(keys_per_day)
    ]
    t.upsert(spark.createDataFrame(rows, "day int, k long, seq long"))
    # multi-file layout clustered on a column UNCORRELATED with k's hash
    # order: seq == k here, so cluster on seq — every file still holds a
    # contiguous k range; probe pruning below therefore also rides zone
    # maps, which is fine: the dedicated scatter test uses a hashed
    # cluster column so ONLY blooms can prune.
    t.compact(cluster_by=["seq"], cluster_files=12)


def test_bloom_equals_unpruned_scan_for_every_value(spark, root):
    t = _table(spark, root)
    _seed(spark, t)
    full = t.read()
    # sample of present values across days + guaranteed-absent values
    probes = [0, 7, 10_050, 20_119, 999, -1, 10_500]
    for p in probes:
        frame, fk, ft, flk, flt = t.read_where_eq([("k", p)])
        got = sorted((r.day, r.k, r.seq) for r in frame.collect())
        want = sorted(
            (r.day, r.k, r.seq)
            for r in full.filter(F.col("k") == p).collect()
        )
        assert got == want, f"probe {p}: {got} != {want}"
        assert flk <= flt


def test_bloom_skips_where_zone_maps_cannot(spark, root):
    # stats only on seq; files clustered by seq2 = bit-reversed k, so
    # k values scatter across files and no k-envelope exists anywhere:
    # any pruning observed is the bloom tier's.
    t = ManifestSnapshotTable(
        spark, root, keys=["day", "k"], order_cols=["seq"],
        partition_by=["day"], stats_cols=["seq"],
        bloom_cols=["k"], bloom_bits=1 << 12, bloom_k=5,
    )
    rows = [
        (d, k, int(format(k & 0xFF, "08b")[::-1], 2))
        for d in range(2)
        for k in range(256)
    ]
    t.upsert(spark.createDataFrame(rows, "day int, k long, seq long"))
    t.compact(cluster_by=["seq"], cluster_files=16)
    frame, fk, ft, flk, flt = t.read_where_eq([("k", 77)])
    assert [(r.day, r.k) for r in frame.collect()] == [(0, 77), (1, 77)] or \
        sorted((r.day, r.k) for r in frame.collect()) == [(0, 77), (1, 77)]
    assert flt >= 8, f"layout not multi-file: {flk}/{flt}"
    assert flk * 2 <= flt, f"bloom pruned nothing: {flk}/{flt}"
    # absent value: every file pruned, exact empty result
    frame0, _, _, flk0, _ = t.read_where_eq([("k", 4096)])
    assert frame0.count() == 0
    assert flk0 == 0


def test_bloom_conservative_without_sidecar(spark, root):
    t = ManifestSnapshotTable(
        spark, root, keys=["day", "k"], order_cols=["seq"],
        partition_by=["day"], stats_cols=["seq"],
    )
    rows = [(d, k, k) for d in range(2) for k in range(50)]
    t.upsert(spark.createDataFrame(rows, "day int, k long, seq long"))
    frame, fk, ft, flk, flt = t.read_where_eq([("k", 7)])
    assert sorted((r.day, r.k) for r in frame.collect()) == [(0, 7), (1, 7)]
    assert flk == flt  # nothing pruned, nothing lost


def test_bloom_sidecar_inherited_by_reference(spark, root):
    t = _table(spark, root)
    t.upsert(spark.createDataFrame([(0, 1, 1), (0, 2, 2)],
                                   "day int, k long, seq long"))
    v1 = t.versions()[-1]
    # second commit touches ONLY day=1; day=0's fragment (and sidecar)
    # stay referenced in v1
    t.upsert(spark.createDataFrame([(1, 3, 3)], "day int, k long, seq long"))
    assert t.manifest()["day=0"] == v1
    latest = t.versions()[-1]
    assert not os.path.exists(
        os.path.join(t._vdir(latest), t._BLOOM_SIDECAR)
    ) or t._bloom_frags(latest, ["day=0"])["day=0"] == {}
    frame, *_ = t.read_where_eq([("k", 2)])
    assert [(r.day, r.k) for r in frame.collect()] == [(0, 2)]


def test_bloom_null_probe_refused(spark, root):
    t = _table(spark, root)
    t.upsert(spark.createDataFrame([(0, 1, 1)], "day int, k long, seq long"))
    with pytest.raises(ValueError, match="NULL"):
        t.read_where_eq([("k", None)])


def test_bloom_never_indexes_nulls(spark, root):
    t = ManifestSnapshotTable(
        spark, root, keys=["day", "k"], order_cols=["seq"],
        partition_by=["day"], bloom_cols=["extra"],
        bloom_bits=1 << 10, bloom_k=3,
    )
    t.upsert(spark.createDataFrame(
        [(0, 1, 1, None), (0, 2, 2, "x"), (0, 3, 3, None)],
        "day int, k long, seq long, extra string",
    ))
    frame, *_ = t.read_where_eq([("extra", "x")])
    assert [r.k for r in frame.collect()] == [2]
    # an all-NULL bloom column in a commit: no entry, still readable
    t.upsert(spark.createDataFrame(
        [(1, 4, 4, None)], "day int, k long, seq long, extra string",
    ))
    frame2, *_ = t.read_where_eq([("extra", "x")])
    assert [r.k for r in frame2.collect()] == [2]


def test_count_rows_metadata_only_across_commits(spark, root):
    t = _table(spark, root)
    rows = [(d, k, k) for d in range(3) for k in range(40)]
    t.upsert(spark.createDataFrame(rows, "day int, k long, seq long"))
    n, meta, scanned = t.count_rows()
    assert (n, meta, scanned) == (120, 3, 0)
    t.delete_where(F.col("k") % 4 == 0)
    n2, _, sc2 = t.count_rows()
    assert (n2, sc2) == (90, 0)
    assert n2 == t.read().count()
    # keyed delete emptying a whole fragment keeps counts consistent
    t.delete(spark.createDataFrame(
        [(2, k) for k in range(40)], "day int, k long"))
    n3, meta3, sc3 = t.count_rows()
    assert (n3, sc3) == (60, 0)
    assert meta3 == 2  # day=2 left the manifest entirely
    # historical snapshots still count exactly
    n1, _, _ = t.count_rows(version=1)
    assert n1 == 120


def test_count_rows_scans_pre_stats_commits(spark, root):
    t = ManifestSnapshotTable(
        spark, root, keys=["day", "k"], order_cols=["seq"],
        partition_by=["day"],  # no stats_cols
    )
    t.upsert(spark.createDataFrame(
        [(0, 1, 1), (1, 2, 2)], "day int, k long, seq long"))
    n, meta, scanned = t.count_rows()
    assert (n, meta, scanned) == (2, 0, 2)  # exact, via scan fallback
    # enabling stats later: a compact REWRITE backfills (cluster_by
    # forces it — a single-holder table otherwise no-ops), count goes
    # metadata-only
    t2 = _table(spark, root)
    t2.compact(cluster_by=["seq"])
    n2, meta2, sc2 = t2.count_rows()
    assert (n2, sc2) == (2, 0) and meta2 == 2


def test_metadata_min_max_exact_with_all_null_fragment(spark, root):
    t = ManifestSnapshotTable(
        spark, root, keys=["day", "k"], order_cols=["seq"],
        partition_by=["day"], stats_cols=["v"],
    )
    t.upsert(spark.createDataFrame(
        [(0, 1, 1, 5.0), (0, 2, 2, -3.5), (1, 3, 3, None), (1, 4, 4, None)],
        "day int, k long, seq long, v double",
    ))
    mn, mx, meta, scanned = t.metadata_min_max("v")
    assert (mn, mx, scanned) == (-3.5, 5.0, 0)
    assert meta == 2  # the all-NULL fragment is RECORDED, not scanned
    # empty table
    t0 = _table(spark, tempfile.mkdtemp(prefix="ms_empty_"))
    try:
        assert t0.count_rows() == (0, 0, 0)
        assert t0.metadata_min_max("seq") == (None, None, 0, 0)
    finally:
        shutil.rmtree(t0.path, ignore_errors=True)


def test_reserved_rows_key_refused_in_stats_cols(spark, root):
    with pytest.raises(ValueError, match="reserved"):
        ManifestSnapshotTable(
            spark, root, keys=["day", "k"], order_cols=["seq"],
            partition_by=["day"], stats_cols=["#rows"],
        )


def test_history_records_every_commit_kind(spark, root):
    t = _table(spark, root)
    t.upsert(spark.createDataFrame(
        [(0, 1, 1), (1, 2, 2)], "day int, k long, seq long"))
    t.merge_into(
        spark.createDataFrame([(0, 3, 3)], "day int, k long, seq long"))
    t.delete(spark.createDataFrame([(1, 2)], "day int, k long"))
    t.compact()
    got = [(r.version, r.op, r.n_touched) for r in
           t.history().orderBy("version").collect()]
    # the delete emptied day=1, so the compact rewrites only day=0
    assert got == [
        (1, "upsert", 2),
        (2, "merge", 1),
        (3, "delete", 1),
        (4, "compact", 1),
    ]
    # ts is audit color: present and monotone-ish, never oracle-checked
    ts = [r.ts for r in t.history().orderBy("version").collect()]
    assert all(x is not None for x in ts) and ts == sorted(ts)


def test_history_null_op_for_pre_recording_manifests(spark, root):
    import json

    t = _table(spark, root)
    t.upsert(spark.createDataFrame([(0, 1, 1)], "day int, k long, seq long"))
    # simulate a manifest written before op recording existed
    mpath = os.path.join(t._vdir(1), "manifest.json")
    doc = json.load(open(mpath))
    doc.pop("commit")
    with open(mpath, "w") as fh:
        json.dump(doc, fh)
    row = t.history().collect()[0]
    assert (row.version, row.op, row.n_touched) == (1, None, None)


def test_bloom_probe_casts_to_column_type(spark, root):
    """Bloom probes must hash the probe value AS THE COLUMN'S TYPE:
    the build side indexed cast(7.0d as string) = "7.0", so probing
    the SQL-equal int literal 7 must not become a bloom false negative
    (silently missing rows the exact predicate matches)."""
    t = ManifestSnapshotTable(
        spark, root, keys=["day", "k"], order_cols=["seq"],
        partition_by=["day"], bloom_cols=["x"],
        bloom_bits=1 << 10, bloom_k=3,
    )
    t.upsert(spark.createDataFrame(
        [(0, 1, 1, 7.0), (0, 2, 2, 8.5)],
        "day int, k long, seq long, x double",
    ))
    frame, _fk, _ft, flk, flt = t.read_where_eq([("x", 7)])
    assert [(r.k, r.x) for r in frame.collect()] == [(1, 7.0)]
    # and a string column probed with a str stays exact too
    t2 = ManifestSnapshotTable(
        spark, f"{root}_s", keys=["day", "k"], order_cols=["seq"],
        partition_by=["day"], bloom_cols=["s"],
        bloom_bits=1 << 10, bloom_k=3,
    )
    try:
        t2.upsert(spark.createDataFrame(
            [(0, 1, 1, "7.0")], "day int, k long, seq long, s string",
        ))
        fr2, *_ = t2.read_where_eq([("s", "7.0")])
        assert [r.k for r in fr2.collect()] == [1]
    finally:
        import shutil as _sh

        _sh.rmtree(t2.path, ignore_errors=True)


# ---------------------------------------------------------------------------
# Bloom-bounded key LOCATION for keyed deletes under stable_partitions
# (round 12): when the key can't name its partition, the locate step
# should come from bloom sidecars (metadata only) for erasure-sized
# batches, falling back to the semi-join scan otherwise.  False
# positives cost a needless fragment visit, never a wrong result.
# ---------------------------------------------------------------------------
def _stable_table(spark, root, **kw):
    base = dict(
        keys=["k"],
        order_cols=["seq"],
        partition_by=["day"],
        stable_partitions=True,
        bloom_cols=["k"],
        bloom_bits=1 << 12,
        bloom_k=5,
    )
    base.update(kw)
    return ManifestSnapshotTable(spark, os.path.join(root, "st"), **base)


def _stable_seed(spark, t, days=4, keys_per_day=100):
    rows = [
        (d, d * 10_000 + k, 1)
        for d in range(days)
        for k in range(keys_per_day)
    ]
    t.upsert(spark.createDataFrame(rows, "day int, k long, seq int"))
    return rows


def test_bloom_locate_agrees_with_scan_and_prunes(spark, root):
    t = _stable_table(spark, root)
    _stable_seed(spark, t)
    # keys living in day=2 only, plus one absent key
    keys = spark.createDataFrame(
        [(20_001,), (20_055,), (999_999,)], "k long"
    )
    prev_doc = t._manifest_doc()
    prev = {f: int(v) for f, v in prev_doc["partitions"].items()}
    frags = t._bloom_locate_fragments(
        keys.select(*t.keys).distinct(), prev_doc, prev
    )
    assert frags is not None  # the fast path applied
    assert "day=2" in frags   # no false negatives ever
    assert len(frags) < len(prev)  # and it actually pruned
    # end to end: the delete commit touches only the located fragments
    v = t.delete(keys)
    moved = {f for f, hv in t.manifest().items() if hv == v}
    assert moved <= frags and "day=2" in moved
    assert t.read().filter(F.col("k").isin(20_001, 20_055)).count() == 0
    assert t.read().count() == 4 * 100 - 2


def test_bloom_locate_dv_twin(spark, root):
    t = _stable_table(spark, root)
    _stable_seed(spark, t)
    keys = spark.createDataFrame([(30_010,)], "k long")
    v = t.delete_dv(keys)
    # merge-on-read: data holders unmoved, the DV rides the new commit
    assert all(hv < v for hv in t.manifest().values())
    assert t.read().filter(F.col("k") == 30_010).count() == 0
    assert t.read().count() == 4 * 100 - 1


def test_bloom_locate_falls_back_without_blooms_or_on_big_batches(
    spark, root
):
    t = _stable_table(spark, root, bloom_cols=None)
    _stable_seed(spark, t)
    prev_doc = t._manifest_doc()
    prev = {f: int(v) for f, v in prev_doc["partitions"].items()}
    keys = spark.createDataFrame([(10_001,)], "k long")
    assert t._bloom_locate_fragments(keys, prev_doc, prev) is None
    # the scan fallback still deletes correctly
    t.delete(keys)
    assert t.read().filter(F.col("k") == 10_001).count() == 0

    t2 = _stable_table(spark, os.path.join(root, "big"))
    _stable_seed(spark, t2)
    doc2 = t2._manifest_doc()
    prev2 = {f: int(v) for f, v in doc2["partitions"].items()}
    over = t2._BLOOM_LOCATE_MAX_KEYS + 1
    big = spark.range(over).select(F.col("id").alias("k"))
    assert t2._bloom_locate_fragments(big, doc2, prev2) is None


def test_bloom_locate_absent_keys_is_cheap_noop(spark, root):
    t = _stable_table(spark, root)
    _stable_seed(spark, t)
    before = t.versions()[-1]
    # absent values: with 12-bit bitsets over 100 keys/file the probe
    # should prune every fragment (no false positive at this density),
    # and the delete must be a clean no-op either way
    v = t.delete(spark.createDataFrame([(777_777,), (888_888,)], "k long"))
    assert t.read().count() == 4 * 100
    assert t.versions()[-1] == v >= before


def test_bloom_locate_casts_probe_to_column_type(spark, root):
    """An INT-typed erasure batch against a DOUBLE key column must
    still locate (the build hashed "7.0", a raw int probe would hash
    "7" — a bloom false negative = a silently missed delete).  The
    locate probe casts through the declared manifest schema first."""
    t = ManifestSnapshotTable(
        spark,
        os.path.join(root, "typed"),
        keys=["k"],
        order_cols=["seq"],
        partition_by=["day"],
        stable_partitions=True,
        bloom_cols=["k"],
        bloom_bits=1 << 12,
        bloom_k=5,
    )
    t.upsert(
        spark.createDataFrame(
            [(d, float(d * 100 + i), 1) for d in range(3) for i in range(40)],
            "day int, k double, seq int",
        )
    )
    prev_doc = t._manifest_doc()
    prev = {f: int(v) for f, v in prev_doc["partitions"].items()}
    int_keys = spark.createDataFrame([(205,)], "k int")
    frags = t._bloom_locate_fragments(int_keys, prev_doc, prev)
    assert frags is not None and "day=2" in frags
    t.delete(int_keys)
    assert t.read().filter(F.col("k") == 205.0).count() == 0
    assert t.read().count() == 119
