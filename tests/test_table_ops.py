"""Operational surface of `ManifestSnapshotTable`: RESTORE (the
history-preserving undo), ANALYZE-style zone-map backfill without
rewrite, and DESCRIBE DETAIL.

Pinned semantics: `restore(v)` is a NEW metadata-only commit that
makes v's state (data, dv, schema, defaults, constraints) current —
nothing deleted, the undone commits stay in history, restore is
itself restorable; `backfill_stats()` records both zone-map tiers for
uncovered fragments in one scan + metadata commit (no file moves),
after which pruned reads and metadata-only aggregates cover the whole
table, and a second call is a no-op; `describe_detail()` is one
metadata-only row."""

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
    d = tempfile.mkdtemp(prefix="tops_")
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
            [(0, 1, 1.0, 1), (0, 2, 2.0, 1), (1, 3, 3.0, 1)],
            "day int, k int, v double, seq int",
        )
    )


def _state(t):
    df = t.read()
    if df is None:
        return []
    return sorted((r.day, r.k, r.v) for r in df.collect())


def test_restore_is_a_new_commit_preserving_history(spark, root):
    t = _mk(spark, root)
    v1 = _seed(spark, t)
    good = _state(t)
    v2 = t.update_where(F.lit(True), {"v": "v * 100"})  # the bad commit
    v3 = t.restore(v1)
    assert _state(t) == good
    # nothing was deleted: the bad commit is still readable history
    assert t.versions() == [v1, v2, v3]
    assert sorted(r.v for r in t.read(version=v2).collect()) == [
        100.0, 200.0, 300.0,
    ]
    ops = {r.version: r.op for r in t.history().collect()}
    assert ops[v3] == "restore"
    # restore of the restore (undo the undo) also works
    v4 = t.restore(v2)
    assert sorted(r.v for r in t.read().collect()) == [100.0, 200.0, 300.0]
    assert t.versions() == [v1, v2, v3, v4]


def test_restore_carries_table_metadata(spark, root):
    t = _mk(spark, root)
    v1 = _seed(spark, t)
    t.add_column("tag", "string", initial_default="x")
    t.add_constraint("v_pos", "v > 0")
    v3 = t.versions()[-1]
    t.update_where(F.lit(True), {"v": "v + 1"})
    t.restore(v3)
    # schema + default + constraint all restored with the state
    assert t.table_schema()[-1] == ("tag", "string")
    assert t.table_defaults() == {"tag": "x"}
    assert t.table_constraints() == {"v_pos": "v > 0"}
    assert _state(t) == [(0, 1, 1.0), (0, 2, 2.0), (1, 3, 3.0)]
    # restoring PAST a schema change reverts the schema too
    t.restore(v1)
    assert t.table_schema() == [
        ("day", "int"), ("k", "int"), ("v", "double"), ("seq", "int"),
    ]
    assert t.table_constraints() == {}


def test_restore_refusals(spark, root):
    t = _mk(spark, root, keep_versions=2)
    v1 = _seed(spark, t)
    with pytest.raises(ValueError):
        t.restore(99)
    t.update_where(F.lit(True), {"v": "v + 1"})
    t.update_where(F.lit(True), {"v": "v + 1"})
    # v1 was demoted to a holder by retention — not restorable
    assert v1 not in t.versions()
    with pytest.raises(ValueError):
        t.restore(v1)


def test_restore_keeps_dv_state(spark, root):
    t = _mk(spark, root)
    _seed(spark, t)
    t.delete_dv(spark.createDataFrame([(0, 1)], "day int, k int"))
    v_dv = t.versions()[-1]
    t.update_where(F.lit(True), {"v": "v * 10"})  # materializes the dv
    t.restore(v_dv)
    # the restored snapshot applies the vector again
    assert _state(t) == [(0, 2, 2.0), (1, 3, 3.0)]
    assert "day=0" in t._dv_map(t._manifest_doc())


def test_backfill_stats_without_rewrite(spark, root):
    # table loaded WITHOUT stats_cols: no envelopes anywhere
    plain = _mk(spark, root)
    _seed(spark, plain)
    v1 = plain.versions()[-1]
    assert plain.fragment_stats() == {}
    # a stats-configured handle on the same path backfills
    t = _mk(spark, root, stats_cols=["v"])
    v2 = t.backfill_stats()
    # metadata-only: no data dir, no holder moves
    assert not os.path.exists(t._data_dir(v2))
    assert set(t.manifest().values()) == {v1}
    # both tiers recorded; metadata aggregates now cover everything
    assert t.fragment_stats()["day=0"]["v"] == [1.0, 2.0]
    n, meta, scanned = t.count_rows()
    assert (n, meta, scanned) == (3, 2, 0)
    mn, mx, meta2, scanned2 = t.metadata_min_max("v")
    assert (mn, mx, scanned2) == (1.0, 3.0, 0)
    # pruned read engages
    df, fk, ft, _, _ = t.read_where("v", 3.0, 9.0)
    assert (fk, ft) == (1, 2)
    assert [r.k for r in df.collect()] == [3]
    # convergence: a second call is a no-op (no new version)
    assert t.backfill_stats() == v2
    h = {r.version: r.op for r in t.history().collect()}
    assert h[v2] == "backfill_stats"


def test_backfill_stats_handles_absent_columns(spark, root):
    plain = _mk(spark, root)
    _seed(spark, plain)
    plain.add_column("score", "int")
    t = _mk(spark, root, stats_cols=["v", "score"])
    v = t.backfill_stats()
    # absent column recorded as an all-NULL envelope (what alignment
    # makes those values read as) -> coverage converges
    assert t.fragment_stats()["day=0"]["score"] == [None, None]
    assert t.backfill_stats() == v
    # and metadata_min_max stays exact: all-NULL contributes nothing
    mn, mx, meta, scanned = t.metadata_min_max("score")
    assert (mn, mx, scanned) == (None, None, 0)


def test_describe_detail(spark, root):
    t = _mk(spark, root, stats_cols=["v"])
    _seed(spark, t)
    t.delete_dv(spark.createDataFrame([(0, 1)], "day int, k int"))
    d = t.describe_detail().first()
    assert d.format == "parquet+manifest"
    assert d.partition_columns == "day"
    assert d.num_fragments == 2
    assert d.num_files >= 2 and d.size_bytes > 0
    assert d.dv_rows == 1
    assert d.current_version == t.versions()[-1]
    assert d.cloned_from is None
    assert '"v", "double"' in d.schema_json.replace("[", "(").replace(
        "]", ")"
    ).replace("(", "").replace(")", "") or "v" in d.schema_json
    # a clone reports its origin
    cl = t.clone_to(os.path.join(root, "cl"))
    dc = cl.describe_detail().first()
    assert dc.cloned_from == os.path.abspath(t.path)
    assert dc.num_fragments == 2


# ---------------------------------------------------------------------------
# Property: any interleaving of upserts, predicate updates, metadata-only
# column adds (with and without initial defaults), keyed deletes, and
# restores leaves read() equal to a plain dict model replaying the same
# ops — including restores to any earlier snapshot (model state stacks).
# ---------------------------------------------------------------------------
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_COL_POOL = ["c1", "c2", "c3"]

_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("upsert"), st.lists(
            st.tuples(st.integers(0, 1), st.integers(0, 3),
                      st.integers(0, 9)),
            min_size=1, max_size=3)),
        st.tuples(st.just("update"), st.tuples(
            st.integers(2, 3), st.integers(0, 1))),
        st.tuples(st.just("addcol"), st.tuples(
            st.sampled_from(_COL_POOL),
            st.one_of(st.none(), st.integers(0, 5)))),
        st.tuples(st.just("delete"), st.lists(
            st.tuples(st.integers(0, 1), st.integers(0, 3)),
            min_size=1, max_size=2)),
        st.tuples(st.just("restore"), st.integers(0, 10)),
    ),
    min_size=2,
    max_size=7,
)


@given(ops=_OPS)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_dml_ddl_interleavings_match_model(spark, ops):
    import copy

    root = tempfile.mkdtemp(prefix="tops_prop_")
    try:
        t = ManifestSnapshotTable(
            spark, os.path.join(root, "t"), keys=["day", "k"],
            order_cols=["seq"], partition_by=["day"],
        )
        # model: (day, k) -> {col: value}; cols: name -> default fill
        model: dict[tuple, dict] = {}
        cols: dict[str, int | None] = {}
        snaps: list[tuple] = []  # (version, model copy, cols copy)

        def snap():
            vs = t.versions()
            if vs and (not snaps or snaps[-1][0] != vs[-1]):
                snaps.append(
                    (vs[-1], copy.deepcopy(model), dict(cols))
                )

        seq = 0
        for kind, payload in ops:
            seq += 1
            if kind == "upsert":
                dedup = {(d, k): v for d, k, v in payload}
                schema = "day int, k int, v int, seq int" + "".join(
                    f", {c} int" for c in cols
                )
                rows = [
                    (d, k, v, seq, *[(k + v) % 7 for _c in cols])
                    for (d, k), v in dedup.items()
                ]
                t.upsert(spark.createDataFrame(rows, schema))
                for (d, k), v in dedup.items():
                    model[(d, k)] = {"v": v} | {
                        c: (k + v) % 7 for c in cols
                    }
            elif kind == "update":
                m, r = payload
                t.update_where(
                    F.col("k") % m == r, {"v": "v + 10"}
                )
                for (d, k), row in model.items():
                    if k % m == r:
                        row["v"] += 10
            elif kind == "addcol":
                name, default = payload
                if name in cols or not t.versions():
                    continue  # dup, or nothing committed to evolve
                t.add_column(name, "int", initial_default=default)
                cols[name] = default
                for row in model.values():
                    row[name] = default
            elif kind == "delete":
                batch = list({(d, k) for d, k in payload})
                t.delete(spark.createDataFrame(batch, "day int, k int"))
                for dk in batch:
                    model.pop(dk, None)
            else:  # restore
                if not snaps:
                    continue
                v, m_snap, c_snap = snaps[payload % len(snaps)]
                if v not in t.versions():
                    continue
                t.restore(v)
                model = copy.deepcopy(m_snap)
                cols = dict(c_snap)
            snap()
            df = t.read()
            got = {}
            if df is not None:
                assert df.columns == ["day", "k", "v", "seq"] + list(
                    cols
                )
                for r in df.collect():
                    d = r.asDict()
                    got[(d["day"], d["k"])] = {
                        c: d[c] for c in ("v", *cols)
                    }
            want = {
                dk: {c: row.get(c) for c in ("v", *cols)}
                for dk, row in model.items()
            }
            assert got == want
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_history_reports_live_row_counts(spark, root):
    t = _mk(spark, root, stats_cols=["v"])
    v1 = _seed(spark, t)  # 3 rows
    t.delete_dv(spark.createDataFrame([(0, 1)], "day int, k int"))
    v2 = t.versions()[-1]
    t.upsert(
        spark.createDataFrame(
            [(2, 9, 9.0, 2)], "day int, k int, v double, seq int"
        )
    )
    v3 = t.versions()[-1]
    h = {r.version: r.n_rows for r in t.history().collect()}
    assert h == {v1: 3, v2: 2, v3: 3}
    # a stats-free table reports None instead of a wrong number
    p = ManifestSnapshotTable(
        spark, os.path.join(root, "p"), keys=["day", "k"],
        order_cols=["seq"], partition_by=["day"],
    )
    _seed(spark, p)
    assert [r.n_rows for r in p.history().collect()] == [None]


def test_time_based_retention(spark, root):
    import time as _time

    # keep_seconds huge: nothing is vacuumed regardless of count
    t = _mk(spark, root, keep_seconds=3600.0)
    v1 = _seed(spark, t)
    for i in range(3):
        t.update_where(F.col("k") == 1, {"v": f"v + {i + 1}"})
    assert t.versions()[0] == v1  # all four snapshots retained
    # keep_seconds tiny: only the latest survives the next publish
    t2 = ManifestSnapshotTable(
        spark, t.path, keys=["day", "k"], order_cols=["seq"],
        partition_by=["day"], keep_seconds=0.001,
    )
    _time.sleep(0.05)
    v_new = t2.update_where(F.col("k") == 1, {"v": "v + 100"})
    assert t2.versions() == [v_new]
    # union policy: count OR age retains
    t3 = ManifestSnapshotTable(
        spark, t.path, keys=["day", "k"], order_cols=["seq"],
        partition_by=["day"], keep_versions=2, keep_seconds=0.001,
    )
    _time.sleep(0.05)
    t3.update_where(F.col("k") == 1, {"v": "v + 1"})
    assert len(t3.versions()) == 2  # count policy floor holds


def test_generated_partition_columns(spark, root):
    day_expr = "CAST(ts DIV 10 AS INT)"
    t = ManifestSnapshotTable(
        spark, os.path.join(root, "g"), keys=["day", "k"],
        order_cols=["seq"], partition_by=["day"],
        generated_partitions={"day": day_expr},
    )
    # batches may OMIT the partition column entirely — it is derived
    t.upsert(
        spark.createDataFrame(
            [(1, 5, 1.0, 1), (2, 25, 2.0, 1)],
            "k int, ts long, v double, seq int",
        )
    )
    assert sorted((r.day, r.k) for r in t.read().collect()) == [
        (0, 1), (2, 2),
    ]
    assert set(t.manifest()) == {"day=0", "day=2"}
    # a batch CARRYING the column must match the derivation
    with pytest.raises(ValueError, match="declared derivation"):
        t.upsert(
            spark.createDataFrame(
                [(9, 3, 55, 3.0, 1)],
                "day int, k int, ts long, v double, seq int",
            )
        )
    t.upsert(
        spark.createDataFrame(
            [(5, 3, 55, 3.0, 1)],
            "day int, k int, ts long, v double, seq int",
        )
    )
    # the derivation persisted: a FRESH handle without the constructor
    # arg still derives (manifest-declared, like constraints)
    t2 = ManifestSnapshotTable(
        spark, t.path, keys=["day", "k"], order_cols=["seq"],
        partition_by=["day"],
    )
    assert t2._effective_generated(t2._manifest_doc()) == {
        "day": day_expr
    }
    t2.upsert(
        spark.createDataFrame(
            [(4, 41, 4.0, 1)], "k int, ts long, v double, seq int"
        )
    )
    got = sorted((r.day, r.k) for r in t2.read().collect())
    assert got == [(0, 1), (2, 2), (4, 4), (5, 3)]
    # merge path derives too
    t2.merge_into(
        spark.createDataFrame(
            [(6, 61, 6.0, 2)], "k int, ts long, v double, seq int"
        )
    )
    assert (6, 6) in {(r.day, r.k) for r in t2.read().collect()}
    # constructor validation: generation must target partition columns
    with pytest.raises(ValueError, match="not in partition_by"):
        ManifestSnapshotTable(
            spark, os.path.join(root, "bad"), keys=["day", "k"],
            order_cols=["seq"], partition_by=["day"],
            generated_partitions={"v": "1"},
        )


def test_fstats_sidecar_shape_and_backfill_holder_retention(spark, root):
    """The file-metadata sidecar split (VERDICT r10 item 3): per-file
    envelopes never ride the manifest JSON — each commit writes a
    parquet sidecar covering ONLY its rewritten fragments, the doc
    carries {fragment → sidecar-holder} in ``fstats_v``, and vacuum
    treats a backfill commit's sidecar as a live reference (its
    covered fragments' DATA may live elsewhere)."""
    t = _mk(spark, root, stats_cols=["v"])
    v1 = _seed(spark, t)
    doc = t._manifest_doc()
    assert "file_stats" not in doc
    assert set(doc["fstats_v"]) == {"day=0", "day=1"}
    # second commit touches day=1 only: its sidecar covers just day=1
    v2 = t.upsert(
        spark.createDataFrame(
            [(1, 9, 9.0, 2)], "day int, k int, v double, seq int"
        )
    )
    assert t._read_fstats_sidecar(v2, None).keys() == {"day=1"}
    assert t._manifest_doc()["fstats_v"] == {"day=0": v1, "day=1": v2}
    # the public accessor assembles both sidecars transparently
    fs = t.file_stats()
    assert set(fs) == {"day=0", "day=1"}
    assert all("#rows" in e for fdoc in fs.values() for e in fdoc.values())

    # backfill on a stats-less sibling table: the backfill version's
    # ONLY content is its sidecar — retention must keep it alive as a
    # holder while its covered fragments' data versions survive
    plain = ManifestSnapshotTable(
        spark, os.path.join(root, "p"), keys=["day", "k"],
        order_cols=["seq"], partition_by=["day"],
    )
    plain.upsert(
        spark.createDataFrame(
            [(0, 1, 1.0, 1), (1, 2, 2.0, 1)],
            "day int, k int, v double, seq int",
        )
    )
    s = ManifestSnapshotTable(
        spark, os.path.join(root, "p"), keys=["day", "k"],
        order_cols=["seq"], partition_by=["day"], stats_cols=["v"],
        keep_versions=1,
    )
    bv = s.backfill_stats()
    # churn day=1 twice so retention (keep_versions=1) sweeps
    for seq in (2, 3):
        s.upsert(
            spark.createDataFrame(
                [(1, 2, float(seq), seq)],
                "day int, k int, v double, seq int",
            )
        )
    # the backfill version is no longer a readable snapshot, but its
    # sidecar still serves day=0's file envelopes
    assert bv not in s.versions()
    assert os.path.exists(
        os.path.join(s._vdir(bv), s._FSTATS_SIDECAR)
    )
    assert s._manifest_doc()["fstats_v"]["day=0"] == bv
    assert "day=0" in s.file_stats()
    n, meta, scanned = s.count_rows()
    assert (n, scanned) == (2, 0)
