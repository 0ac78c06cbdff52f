"""Schema evolution on `ManifestSnapshotTable` — metadata-only DDL
(the Delta/Iceberg shape: no data file is rewritten at any table size).

Pinned semantics: the manifest carries the DECLARED schema ([name,
type] in order), established by the first write commit and carried by
every later one; `add_column` / `widen_column` are metadata-only
commits; every read path aligns physical scans — typed NULL for
columns a file predates, a lossless cast for widened ones, declared
order; an evolving upsert (schema_evolution=True) may add columns or
widen types, and is refused without the flag; batches missing declared
columns are always refused (NULL-filling would clobber matched rows);
old snapshots keep their own schema (time travel is schema-accurate);
rewriting commits (upsert/delete/update/compact) MATERIALIZE pending
evolution on the partitions they touch; widening is whitelisted
(int-chain, float->double, decimal growth) and anything else refused."""

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
    d = tempfile.mkdtemp(prefix="sev_")
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


def test_first_write_establishes_schema(spark, root):
    t = _mk(spark, root)
    _seed(spark, t)
    assert t.table_schema() == [
        ("day", "int"), ("k", "int"), ("v", "double"), ("seq", "int"),
    ]


def test_add_column_is_metadata_only_and_reads_null(spark, root):
    t = _mk(spark, root)
    v1 = _seed(spark, t)
    v2 = t.add_column("tag", "string")
    # metadata-only: no data dir, every fragment still held by v1
    assert not os.path.exists(t._data_dir(v2))
    assert set(t.manifest().values()) == {v1}
    df = t.read()
    assert df.columns == ["day", "k", "v", "seq", "tag"]
    assert {r.tag for r in df.collect()} == {None}
    # time travel: the old snapshot keeps its own schema
    assert t.read(version=v1).columns == ["day", "k", "v", "seq"]
    h = {r.version: r.op for r in t.history().collect()}
    assert h[v2] == "add_column"


def test_add_column_validations(spark, root):
    t = _mk(spark, root)
    with pytest.raises(ValueError, match="no committed schema"):
        t.add_column("x", "int")
    _seed(spark, t)
    vs = t.versions()
    with pytest.raises(ValueError, match="already exists"):
        t.add_column("v", "int")
    with pytest.raises(ValueError, match="reserved"):
        t.add_column("__rel", "string")
    with pytest.raises(Exception):
        t.add_column("x", "not_a_type")
    assert t.versions() == vs  # every refusal abandoned its claim


def test_evolving_upsert_adds_and_backfills_on_touch(spark, root):
    t = _mk(spark, root)
    v1 = _seed(spark, t)
    batch = spark.createDataFrame(
        [(0, 1, 9.0, 2, "hot")],
        "day int, k int, v double, seq int, tag string",
    )
    with pytest.raises(ValueError, match="schema_evolution=True"):
        t.upsert(batch)
    v2 = t.upsert(batch, schema_evolution=True)
    assert t.table_schema()[-1] == ("tag", "string")
    got = sorted((r.day, r.k, r.v, r.tag) for r in t.read().collect())
    # day=0 rewritten (tag materialized, carried row NULL); day=1
    # inherited by reference and NULL-filled on read
    assert got == [(0, 1, 9.0, "hot"), (0, 2, 2.0, None), (1, 3, 3.0, None)]
    assert t.manifest() == {"day=0": v2, "day=1": v1}


def test_batch_missing_declared_column_refused(spark, root):
    t = _mk(spark, root)
    _seed(spark, t)
    with pytest.raises(ValueError, match="lacks table columns"):
        t.upsert(
            spark.createDataFrame([(0, 1, 5)], "day int, k int, seq int")
        )


def test_widen_column_and_narrow_batches_cast_up(spark, root):
    t = _mk(spark, root)
    _seed(spark, t)
    t.add_column("n", "int")
    t.upsert(
        spark.createDataFrame(
            [(0, 1, 1.0, 2, 7)], "day int, k int, v double, seq int, n int"
        )
    )
    # a WIDER batch (bigint vs declared int) is refused without the
    # flag — and an INCOMPATIBLE one (double vs int) always
    with pytest.raises(ValueError, match="wider than the declared"):
        t.upsert(
            spark.createDataFrame(
                [(1, 3, 3.5, 3, 8)],
                "day int, k int, v double, seq int, n bigint",
            )
        )
    with pytest.raises(ValueError, match="incompatible"):
        t.upsert(
            spark.createDataFrame(
                [(1, 3, 3.5, 3, 1.5)],
                "day int, k int, v double, seq int, n double",
            )
        )
    t.widen_column("n", "bigint")
    assert dict(t.read().dtypes)["n"] == "bigint"
    # a batch still carrying the NARROW type is cast up silently
    t.upsert(
        spark.createDataFrame(
            [(1, 3, 3.5, 2, 8)], "day int, k int, v double, seq int, n int"
        )
    )
    assert dict(t.read().dtypes)["n"] == "bigint"
    got = {(r.day, r.k): r.n for r in t.read().collect()}
    assert got[(0, 1)] == 7 and got[(1, 3)] == 8


def test_widen_whitelist(spark, root):
    t = _mk(spark, root)
    _seed(spark, t)
    with pytest.raises(ValueError, match="not a lossless widening"):
        t.widen_column("v", "float")  # narrowing
    with pytest.raises(ValueError, match="not a lossless widening"):
        t.widen_column("k", "string")  # reinterpretation
    with pytest.raises(ValueError, match="partition column"):
        t.widen_column("day", "bigint")
    with pytest.raises(ValueError, match="no column"):
        t.widen_column("nope", "bigint")
    # decimal growth: scale and integer digits may only grow
    W = ManifestSnapshotTable._widens
    assert W("decimal(10,2)", "decimal(20,2)")
    assert W("decimal(10,2)", "decimal(22,4)")
    assert not W("decimal(10,2)", "decimal(10,4)")  # int digits shrink
    assert not W("decimal(10,2)", "decimal(9,2)")
    assert W("tinyint", "bigint") and not W("bigint", "int")
    assert W("float", "double") and not W("double", "float")
    assert not W("int", "int")


def test_delete_and_update_materialize_pending_evolution(spark, root):
    t = _mk(spark, root)
    _seed(spark, t)
    t.add_column("tag", "string")
    # predicate delete on the evolved table: condition may reference
    # the new column (NULL -> kept), rewrite materializes it
    t.delete_where((F.col("tag") == "x") | (F.col("k") == 2))
    got = sorted((r.day, r.k, r.tag) for r in t.read().collect())
    assert got == [(0, 1, None), (1, 3, None)]
    # update assigning the evolved column
    t.update_where(F.col("day") == 1, {"tag": F.lit("seen")})
    got = sorted((r.day, r.k, r.tag) for r in t.read().collect())
    assert got == [(0, 1, None), (1, 3, "seen")]
    # physical check: the rewritten day=1 fragment now CONTAINS tag
    m = t.manifest()
    raw = spark.read.parquet(
        os.path.join(t._data_dir(m["day=1"]), "day=1")
    )
    assert "tag" in raw.columns


def test_compact_materializes_everywhere(spark, root):
    t = _mk(spark, root, stats_cols=["v"])
    _seed(spark, t)
    t.add_column("score", "bigint")
    v = t.compact()
    for frag, hv in t.manifest().items():
        assert hv == v
        raw = spark.read.parquet(
            os.path.join(t._data_dir(hv), frag)
        )
        assert dict(raw.dtypes)["score"] == "bigint"
    # post-compact reads need no alignment projection; schema intact
    assert t.table_schema()[-1] == ("score", "bigint")


def test_changes_across_schema_evolution(spark, root):
    t = _mk(spark, root)
    v1 = _seed(spark, t)
    t.add_column("tag", "string")
    v3 = t.upsert(
        spark.createDataFrame(
            [(0, 1, 1.0, 2, "hot")],
            "day int, k int, v double, seq int, tag string",
        )
    )
    feed = t.changes(v1, v3)
    rows = sorted(
        (r._change_type, r.day, r.k, r.tag) for r in feed.collect()
    )
    # only the rewritten fragment enters the diff; the changed row
    # carries the evolved column
    assert rows == [("update_postimage", 0, 1, "hot")]


def test_constraint_on_evolved_column(spark, root):
    t = _mk(spark, root)
    _seed(spark, t)
    t.add_column("score", "int")
    # existing rows read NULL there -> CHECK passes (SQL semantics)
    t.add_constraint("score_pos", "score >= 0")
    with pytest.raises(Exception, match="score_pos"):
        t.upsert(
            spark.createDataFrame(
                [(0, 9, 1.0, 3, -5)],
                "day int, k int, v double, seq int, score int",
            )
        )
    t.upsert(
        spark.createDataFrame(
            [(0, 9, 1.0, 3, 5)],
            "day int, k int, v double, seq int, score int",
        )
    )
    assert {r.score for r in t.read().collect()} == {None, 5}


def test_dv_delete_after_add_column(spark, root):
    t = _mk(spark, root)
    _seed(spark, t)
    t.add_column("tag", "string")
    # predicate DV delete whose condition touches the evolved column
    t.delete_where_dv(F.col("tag").isNull() & (F.col("k") == 2))
    got = sorted((r.day, r.k) for r in t.read().collect())
    assert got == [(0, 1), (1, 3)]


def test_metadata_min_max_on_evolved_column(spark, root):
    t = _mk(spark, root, stats_cols=["v"])
    _seed(spark, t)
    t.add_column("score", "int")
    # no envelope recorded for score anywhere -> full scan, exact NULLs
    mn, mx, meta, scanned = t.metadata_min_max("score")
    assert (mn, mx) == (None, None) and scanned == 2
    t.upsert(
        spark.createDataFrame(
            [(0, 1, 1.0, 2, 42)],
            "day int, k int, v double, seq int, score int",
        )
    )
    mn, mx, *_ = t.metadata_min_max("score")
    assert (mn, mx) == (42, 42)


def test_add_column_initial_default(spark, root):
    t = _mk(spark, root)
    v1 = _seed(spark, t)
    v2 = t.add_column("status", "string", initial_default="active")
    assert not os.path.exists(t._data_dir(v2))  # still metadata-only
    assert t.table_defaults() == {"status": "active"}
    # pre-evolution rows read the declared default, not NULL
    assert {r.status for r in t.read().collect()} == {"active"}
    # the default is part of the declaration: time travel before the
    # add has no column; the add snapshot fills everywhere
    assert "status" not in t.read(version=v1).columns
    # new batches must still carry the column explicitly
    with pytest.raises(ValueError, match="lacks table columns"):
        t.upsert(
            spark.createDataFrame(
                [(0, 9, 9.0, 2)], "day int, k int, v double, seq int"
            )
        )
    t.upsert(
        spark.createDataFrame(
            [(0, 9, 9.0, 2, "new")],
            "day int, k int, v double, seq int, status string",
        )
    )
    got = {(r.k): r.status for r in t.read().collect()}
    # rewritten partition materialized the default for carried rows;
    # inherited partition still fills it on read
    assert got == {1: "active", 2: "active", 3: "active", 9: "new"}
    # defaults survive rewrites (carried metadata)
    assert t.table_defaults() == {"status": "active"}


def test_add_column_default_validations(spark, root):
    t = _mk(spark, root)
    _seed(spark, t)
    with pytest.raises(ValueError, match="does not cast"):
        t.add_column("n", "int", initial_default="abc")
    with pytest.raises(ValueError, match="JSON scalar"):
        t.add_column("n", "int", initial_default=[1, 2])
    # int default on a bigint column is fine
    t.add_column("n", "bigint", initial_default=7)
    assert {r.n for r in t.read().collect()} == {7}
    # and constraints see the default, not NULL
    t.add_constraint("n_pos", "n > 0")


def test_streaming_sink_schema_evolution(spark, root, tmp_path):
    from pyspark.sql.utils import StreamingQueryException

    from _big_data_analytics_and_visualization_tracking_student_progress__spark.sources.readers import (  # noqa: E501
        file_stream,
    )
    from _big_data_analytics_and_visualization_tracking_student_progress__spark.streaming.pipeline import (  # noqa: E501
        upsert_stream_run,
    )

    t = _mk(spark, root)
    src1 = str(tmp_path / "src1")
    spark.createDataFrame(
        [(0, 1, 1.0, 1), (1, 2, 2.0, 1)],
        "day int, k int, v double, seq int",
    ).coalesce(1).write.mode("append").parquet(src1)
    upsert_stream_run(
        spark,
        file_stream(spark, src1, "day int, k int, v double, seq int"),
        t,
        workdir=str(tmp_path / "run1"),
    )
    # mid-flight schema gain: a second source carries a new column —
    # refused without the sink flag, additive with it
    src2 = str(tmp_path / "src2")
    sch2 = "day int, k int, v double, seq int, tag string"
    spark.createDataFrame(
        [(0, 1, 9.0, 2, "hot")], sch2
    ).coalesce(1).write.mode("append").parquet(src2)
    with pytest.raises(StreamingQueryException, match="schema_evolution"):
        upsert_stream_run(
            spark,
            file_stream(spark, src2, sch2),
            t,
            workdir=str(tmp_path / "run2"),
        )
    out = upsert_stream_run(
        spark,
        file_stream(spark, src2, sch2),
        t,
        workdir=str(tmp_path / "run3"),
        schema_evolution=True,
    )
    got = sorted((r.day, r.k, r.v, r.tag) for r in out.collect())
    assert got == [(0, 1, 9.0, "hot"), (1, 2, 2.0, None)]
    assert t.table_schema()[-1] == ("tag", "string")


def test_merge_into_respects_declared_schema(spark, root):
    t = _mk(spark, root)
    _seed(spark, t)
    # slim source (keys + condition field only) stays legal: a
    # delete-only merge never needs the full row
    t.merge_into(
        spark.createDataFrame([(0, 2, 99, 99.0)],
                              "day int, k int, seq int, v double")
        .select("day", "k", "seq"),
        when_matched_update=F.lit(False),
        when_not_matched_insert=F.lit(False),
        when_matched_delete=F.lit(True),
    )
    assert sorted((r.day, r.k) for r in t.read().collect()) == [
        (0, 1), (1, 3),
    ]
    # but ADDING a column through a merge requires the flag
    wide = spark.createDataFrame(
        [(0, 1, 9.0, 5, "hot")],
        "day int, k int, v double, seq int, tag string",
    )
    with pytest.raises(ValueError, match="schema_evolution=True"):
        t.merge_into(wide)
    t.merge_into(wide, schema_evolution=True)
    assert t.table_schema()[-1] == ("tag", "string")
    got = sorted((r.day, r.k, r.tag) for r in t.read().collect())
    assert got == [(0, 1, "hot"), (1, 3, None)]


def test_drop_column_metadata_only(spark, root):
    t = _mk(spark, root)
    v1 = _seed(spark, t)
    t.add_column("tag", "string", initial_default="x")
    v_drop = t.drop_column("tag")
    # metadata-only: no data dir, no holder moves
    assert not os.path.exists(t._data_dir(v_drop))
    assert set(t.manifest().values()) == {v1}
    # the column vanished from reads (old files keep their bytes)
    assert t.read().columns == ["day", "k", "v", "seq"]
    assert t.table_defaults() == {}
    # a rewrite sheds the bytes physically on the touched partition
    t.update_where(F.col("day") == 0, {"v": "v + 1"})
    raw = spark.read.parquet(
        os.path.join(t._data_dir(t.manifest()["day=0"]), "day=0")
    )
    assert "tag" not in raw.columns
    h = {r.version: r.op for r in t.history().collect()}
    assert h[v_drop] == "drop_column"
    # time travel before the drop still shows the column
    assert "tag" in t.read(version=v_drop - 1).columns


def test_drop_column_refusals(spark, root):
    t = _mk(spark, root)
    _seed(spark, t)
    with pytest.raises(ValueError, match="key/partition"):
        t.drop_column("k")
    with pytest.raises(ValueError, match="key/partition"):
        t.drop_column("day")
    with pytest.raises(ValueError, match="no column"):
        t.drop_column("nope")
    t.add_constraint("v_pos", "v > 0")
    with pytest.raises(ValueError, match="constraint"):
        t.drop_column("v")
    t.drop_constraint("v_pos")
    t.drop_column("v")
    assert t.read().columns == ["day", "k", "seq"]


def test_drop_column_generated_reference_refused(spark, root):
    t = ManifestSnapshotTable(
        spark, os.path.join(root, "g"), keys=["day", "k"],
        order_cols=["seq"], partition_by=["day"],
        generated_partitions={"day": "CAST(ts DIV 10 AS INT)"},
    )
    t.upsert(
        spark.createDataFrame(
            [(1, 5, 1)], "k int, ts long, seq int"
        )
    )
    with pytest.raises(ValueError, match="derives from it"):
        t.drop_column("ts")


def test_dropped_name_reuse_blocked_until_compact(spark, root):
    t = _mk(spark, root)
    _seed(spark, t)
    t.add_column("tag", "string")
    t.upsert(
        spark.createDataFrame(
            [(0, 1, 1.0, 2, "old-bytes")],
            "day int, k int, v double, seq int, tag string",
        )
    )
    t.drop_column("tag")
    # re-adding the name would resurrect 'old-bytes' from the files
    with pytest.raises(ValueError, match="resurrect"):
        t.add_column("tag", "string")
    with pytest.raises(ValueError, match="compact"):
        t.upsert(
            spark.createDataFrame(
                [(1, 3, 3.0, 2, "new")],
                "day int, k int, v double, seq int, tag string",
            ),
            schema_evolution=True,
        )
    # a fresh name is always fine
    t.add_column("tag2", "string")
    # compact physically sheds the bytes -> the name frees up
    t.compact()
    t.add_column("tag", "string")
    assert {r.tag for r in t.read().collect()} == {None}  # no ghosts


def test_drop_order_column_refused(spark, root):
    """Regression (ADVICE r10): dropping an order column made every
    later upsert/merge fail at analysis time (winners are ordered by
    it) while the drop tombstone blocked re-adding the name — an
    unwritable table.  Refused up front, like keys and partitions."""
    t = _mk(spark, root)
    _seed(spark, t)
    with pytest.raises(ValueError, match="order column"):
        t.drop_column("seq")
    # table still fully writable afterwards
    t.upsert(
        spark.createDataFrame(
            [(0, 1, 9.0, 2)], "day int, k int, v double, seq int"
        )
    )
    assert {r.k: r.v for r in t.read().collect()}[1] == 9.0


def test_evolving_write_refuses_reserved_dv_names(spark, root):
    """Regression (ADVICE r10): schema_evolution=True used to accept
    __rel/__ri as 'extra' columns — written physically but silently
    dropped from the declared schema, then colliding with the DV
    address columns `_align_schema` appends for keep_pos reads."""
    t = _mk(spark, root)
    _seed(spark, t)
    bad = _seed_frame_with(spark, "__rel", "string")
    with pytest.raises(ValueError, match="reserved for DV"):
        t.upsert(bad, schema_evolution=True)
    bad = _seed_frame_with(spark, "__ri", "bigint")
    with pytest.raises(ValueError, match="reserved for DV"):
        t.upsert(bad, schema_evolution=True)


def _seed_frame_with(spark, name, ddl):
    from pyspark.sql import functions as F

    return spark.createDataFrame(
        [(0, 1, 1.0, 2)], "day int, k int, v double, seq int"
    ).withColumn(name, F.lit(None).cast(ddl))
