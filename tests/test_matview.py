"""IncrementalAggView: materialized rollups over ManifestSnapshotTable
maintained by recomputing ONLY the fragments whose manifest holder
moved since the last refresh.  The invariant every test circles back
to: ``view.read()`` is row-for-row identical to aggregating
``base.read()`` directly, no matter how commits and refreshes
interleave."""
import os

import pytest
from pyspark.sql import functions as F

from _big_data_analytics_and_visualization_tracking_student_progress__spark.operators.matview import (
    IncrementalAggView,
)
from _big_data_analytics_and_visualization_tracking_student_progress__spark.operators.upsert import (
    ManifestSnapshotTable,
)


def _mk_base(spark, tmp_path):
    return ManifestSnapshotTable(
        spark,
        str(tmp_path / "base"),
        keys=["day", "k"],
        order_cols=["seq"],
        partition_by=["day"],
    )


def _rows(spark, data):
    return spark.createDataFrame(data, "day string, k int, v int, seq int")


def _mk_view(spark, tmp_path, base, **kw):
    return IncrementalAggView(
        spark,
        str(tmp_path / "mv"),
        base,
        group_cols=["grp"],
        measures=[
            ("n", None, "count"),
            ("sum_v", "v", "sum"),
            ("max_v", "v", "max"),
            ("min_v", "v", "min"),
        ],
        prepare=lambda df: df.withColumn("grp", F.col("k") % 2),
        **kw,
    )


def _direct(base):
    """The view's contract: aggregate the merged snapshot directly."""
    return (
        base.read()
        .withColumn("grp", F.col("k") % 2)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sum_v"),
            F.max("v").alias("max_v"),
            F.min("v").alias("min_v"),
        )
    )


def _frame_set(df):
    cols = sorted(df.columns)
    return {tuple(str(r[c]) for c in cols) for r in df.collect()}


class TestIncrementalAggView:
    def test_initial_refresh_builds_and_matches_direct(self, spark, tmp_path):
        base = _mk_base(spark, tmp_path)
        base.upsert(_rows(spark, [
            ("d1", 1, 10, 1), ("d1", 2, 20, 1),
            ("d2", 3, 30, 1), ("d3", 4, 40, 1),
        ]))
        view = _mk_view(spark, tmp_path, base)
        info = view.refresh()
        assert (info["recomputed"], info["inherited"], info["total"]) == (3, 0, 3)
        assert _frame_set(view.read()) == _frame_set(_direct(base))

    def test_refresh_recomputes_only_changed_fragments(self, spark, tmp_path):
        base = _mk_base(spark, tmp_path)
        base.upsert(_rows(spark, [
            ("d1", 1, 10, 1), ("d2", 3, 30, 1), ("d3", 4, 40, 1),
        ]))
        view = _mk_view(spark, tmp_path, base)
        view.refresh()
        # second commit touches ONLY d2 (replaces k=3, adds k=5)
        base.upsert(_rows(spark, [("d2", 3, 31, 2), ("d2", 5, 50, 2)]))
        info = view.refresh()
        assert (info["recomputed"], info["inherited"], info["total"]) == (1, 2, 3)
        assert _frame_set(view.read()) == _frame_set(_direct(base))

    def test_noop_refresh_when_base_unchanged(self, spark, tmp_path):
        base = _mk_base(spark, tmp_path)
        base.upsert(_rows(spark, [("d1", 1, 10, 1)]))
        view = _mk_view(spark, tmp_path, base)
        v1 = view.refresh()["version"]
        info = view.refresh()
        assert info == {
            "version": -1, "recomputed": 0, "inherited": 1, "total": 1,
        }
        assert view.versions() == [v1]  # no new snapshot written

    def test_empty_base_is_a_noop(self, spark, tmp_path):
        base = _mk_base(spark, tmp_path)
        view = _mk_view(spark, tmp_path, base)
        assert view.refresh()["total"] == 0
        assert view.read() is None

    def test_crash_before_marker_leaves_previous_readable(
        self, spark, tmp_path
    ):
        base = _mk_base(spark, tmp_path)
        base.upsert(_rows(spark, [("d1", 1, 10, 1)]))
        view = _mk_view(spark, tmp_path, base)
        view.refresh()
        before = _frame_set(view.read())
        # simulate a crashed refresh: version dir without _SUCCESS
        os.makedirs(str(tmp_path / "mv" / "v=00009"))
        assert view.versions() == [1]
        assert _frame_set(view.read()) == before
        # and a real refresh after more commits clears the debris path
        base.upsert(_rows(spark, [("d2", 2, 20, 1)]))
        view.refresh()
        assert _frame_set(view.read()) == _frame_set(_direct(base))

    def test_vacuum_retains_newest_and_old_version_still_readable(
        self, spark, tmp_path
    ):
        base = _mk_base(spark, tmp_path)
        view = _mk_view(spark, tmp_path, base, keep_versions=2)
        for i in range(4):
            base.upsert(_rows(spark, [(f"d{i}", i, i * 10, 1)]))
            view.refresh()
        vs = view.versions()
        assert len(vs) == 2  # snapshots are self-contained: plain retention
        # the older retained version reflects the base as of refresh 3
        older = view.read(version=vs[0])
        assert older.agg(F.sum("n")).first()[0] == 3
        assert _frame_set(view.read()) == _frame_set(_direct(base))

    def test_interleaved_commits_and_refreshes_property(self, spark, tmp_path):
        """Model check: arbitrary commit/refresh interleaving, the view
        always equals the direct aggregate after each refresh."""
        base = _mk_base(spark, tmp_path)
        view = _mk_view(spark, tmp_path, base)
        batches = [
            [("d1", 1, 5, 1), ("d2", 2, 6, 1)],
            [("d1", 1, 7, 2)],                       # replace a key
            [("d3", 9, 1, 1), ("d2", 4, 2, 1)],      # new frag + touch old
            [("d1", 6, 3, 1), ("d3", 9, 9, 2)],
        ]
        refresh_after = {1, 3}  # skip refreshing after batches 0 and 2
        for i, b in enumerate(batches):
            base.upsert(_rows(spark, b))
            if i in refresh_after:
                view.refresh()
                assert _frame_set(view.read()) == _frame_set(_direct(base))
        # a refresh that covers TWO commits recomputes their union
        base.upsert(_rows(spark, [("d2", 2, 8, 3)]))
        base.upsert(_rows(spark, [("d4", 0, 4, 1)]))
        info = view.refresh()
        assert info["recomputed"] == 2 and info["total"] == 4

    def test_rejects_non_decomposable_kind_and_name_collision(
        self, spark, tmp_path
    ):
        base = _mk_base(spark, tmp_path)
        with pytest.raises(ValueError, match="not decomposable"):
            IncrementalAggView(
                spark, str(tmp_path / "x"), base, ["grp"],
                [("q", "v", "median")],
            )
        with pytest.raises(ValueError, match="collide"):
            IncrementalAggView(
                spark, str(tmp_path / "x"), base, ["grp"],
                [("grp", "v", "sum")],
            )

    def test_avg_and_hll_measures_merge_from_partials(self, spark, tmp_path):
        """avg and hll_distinct stay correct across incremental
        refreshes: the merged view equals the same aggregate computed
        directly over the full base (identical arithmetic, so exact
        equality — not approximate)."""
        from _big_data_analytics_and_visualization_tracking_student_progress__spark.operators.sketches import (
            hll_estimate,
            hll_registers,
        )

        base = _mk_base(spark, tmp_path)
        view = IncrementalAggView(
            spark,
            str(tmp_path / "mv2"),
            base,
            group_cols=["grp"],
            measures=[
                ("avg_v", "v", "avg"),
                ("du", "k", "hll_distinct"),
            ],
            prepare=lambda df: df.withColumn("grp", F.col("k") % 2),
        )
        base.upsert(_rows(spark, [
            ("d1", 1, 10, 1), ("d1", 2, 20, 1), ("d2", 3, 31, 1),
            ("d2", 4, 40, 1), ("d3", 5, 50, 1),
        ]))
        view.refresh()
        # incremental: touch ONLY d2 (replace k=3, add k=6)
        base.upsert(_rows(spark, [("d2", 3, 30, 2), ("d2", 6, 60, 2)]))
        info = view.refresh()
        assert info["recomputed"] == 1
        got = {
            (r.grp, r.avg_v, r.du) for r in view.read().collect()
        }
        prepared = base.read().withColumn("grp", F.col("k") % 2)
        avg_direct = {
            (r.grp, r.avg_v)
            for r in prepared.groupBy("grp")
            .agg(
                (
                    F.floor(
                        F.sum("v").cast("double")
                        / F.count("v").cast("double")
                        * F.lit(1e9)
                        + F.lit(0.5)
                    )
                    / F.lit(1e9)
                ).alias("avg_v")
            )
            .collect()
        }
        hll_direct = {
            (r.grp, r.est_distinct)
            for r in hll_estimate(
                hll_registers(
                    prepared, F.col("k"), p=4, group_cols=["grp"]
                ),
                p=4,
                group_cols=["grp"],
            ).collect()
        }
        assert {(g, a) for g, a, _ in got} == avg_direct
        assert {(g, d) for g, _, d in got} == hll_direct

    def test_empty_recompute_evicts_stale_partials(self, spark, tmp_path):
        """Regression: a changed fragment whose recompute yields ZERO
        partial rows (filtering prepare) must still evict its old
        partial rows — eviction keys off the old partials, not the
        fresh ones."""
        base = _mk_base(spark, tmp_path)
        view = IncrementalAggView(
            spark,
            str(tmp_path / "mvf"),
            base,
            group_cols=["grp"],
            measures=[("n", None, "count"), ("sum_v", "v", "sum")],
            prepare=lambda df: df.filter(F.col("v") > 0).withColumn(
                "grp", F.col("k") % 2
            ),
        )
        base.upsert(_rows(spark, [("d1", 1, 10, 1), ("d2", 2, 5, 1)]))
        view.refresh()
        # replace d1's only row with one the prepare filter drops
        base.upsert(_rows(spark, [("d1", 1, -10, 2)]))
        view.refresh()
        got = {(r.grp, r.n, r.sum_v) for r in view.read().collect()}
        assert got == {(0, 1, 5)}  # d1's old (1,1,10) partial evicted

    def test_fragment_dropping_delete_stays_incremental(
        self, spark, tmp_path
    ):
        """Regression: a delete that removes a fragment from the
        manifest evicts that fragment's partials WITHOUT a full
        rebuild — the other fragments' partials are inherited."""
        base = _mk_base(spark, tmp_path)
        view = _mk_view(spark, tmp_path, base)
        base.upsert(_rows(spark, [
            ("d1", 1, 10, 1), ("d2", 2, 20, 1), ("d3", 3, 30, 1),
        ]))
        view.refresh()
        base.delete(spark.createDataFrame([("d2", 2)], "day string, k int"))
        info = view.refresh()
        # nothing recomputed (no holder moved), d1/d3 inherited
        assert (info["recomputed"], info["inherited"], info["total"]) \
            == (0, 2, 2)
        assert _frame_set(view.read()) == _frame_set(_direct(base))

    def test_all_rows_deleted_empties_view(self, spark, tmp_path):
        base = _mk_base(spark, tmp_path)
        view = _mk_view(spark, tmp_path, base)
        base.upsert(_rows(spark, [("d1", 1, 10, 1)]))
        view.refresh()
        base.delete(spark.createDataFrame([("d1", 1)], "day string, k int"))
        view.refresh()
        assert view.read().count() == 0

    def test_group_cols_may_include_partition_cols(self, spark, tmp_path):
        """Regression: the natural daily-rollup shape — group by the
        base's own partition column — must work (dims deduped)."""
        base = _mk_base(spark, tmp_path)
        view = IncrementalAggView(
            spark,
            str(tmp_path / "mvd"),
            base,
            group_cols=["day"],
            measures=[("n", None, "count"), ("sum_v", "v", "sum")],
        )
        base.upsert(_rows(spark, [
            ("d1", 1, 10, 1), ("d1", 2, 20, 1), ("d2", 3, 30, 1),
        ]))
        view.refresh()
        base.upsert(_rows(spark, [("d2", 4, 40, 1)]))
        info = view.refresh()
        assert info["recomputed"] == 1
        got = {(r.day, r.n, r.sum_v) for r in view.read().collect()}
        assert got == {("d1", 2, 30), ("d2", 2, 70)}

    def test_refresh_log_records_every_outcome(self, spark, tmp_path):
        base = _mk_base(spark, tmp_path)
        view = _mk_view(spark, tmp_path, base)
        base.upsert(_rows(spark, [("d1", 1, 10, 1), ("d2", 2, 20, 1)]))
        view.refresh()
        view.refresh()  # no-op
        base.upsert(_rows(spark, [("d2", 2, 21, 2)]))
        view.refresh()
        assert [
            (i["recomputed"], i["inherited"]) for i in view.refresh_log
        ] == [(2, 0), (0, 2), (1, 1)]


class TestStreamingContinuousAggregate:
    """upsert_stream_run(view=...): the view refreshes once per
    micro-batch commit, each refresh O(partitions the batch touched)."""

    def _stream(self, spark, watch):
        from _big_data_analytics_and_visualization_tracking_student_progress__spark.sources.readers import (
            file_stream,
        )

        return file_stream(
            spark,
            str(watch),
            "day string, k int, v int, seq int",
            max_files_per_trigger=1,
        )

    @staticmethod
    def _stage(df, watch, name, mtime):
        from _big_data_analytics_and_visualization_tracking_student_progress__spark.queries.streaming_q import (
            _stage_single_file,
        )

        _stage_single_file(df, str(watch), name, mtime)

    def test_view_refreshes_per_batch_and_matches_direct(
        self, spark, tmp_path
    ):
        from _big_data_analytics_and_visualization_tracking_student_progress__spark.streaming.pipeline import (
            upsert_stream_run,
        )

        watch = tmp_path / "in"
        watch.mkdir()
        self._stage(
            _rows(spark, [("d1", 1, 10, 1), ("d2", 3, 30, 1)]),
            watch, "b1.parquet", 1_000_000_000,
        )
        self._stage(
            _rows(spark, [("d2", 3, 31, 2), ("d2", 5, 50, 2)]),
            watch, "b2.parquet", 1_000_000_100,
        )
        base = _mk_base(spark, tmp_path)
        view = _mk_view(spark, tmp_path, base)
        upsert_stream_run(
            spark,
            self._stream(spark, watch),
            base,
            workdir=str(tmp_path / "run"),
            view=view,
        )
        # batch 1 commits d1+d2 (both recomputed); batch 2 touches only
        # d2 — its refresh recomputes 1 fragment and inherits the other
        assert [
            (i["recomputed"], i["inherited"]) for i in view.refresh_log
        ] == [(2, 0), (1, 1)]
        assert _frame_set(view.read()) == _frame_set(_direct(base))

    def test_view_converges_under_streamed_tombstones(self, spark, tmp_path):
        """Tombstone deletes move or drop fragments; the continuous
        aggregate refreshed per batch must still equal the direct
        aggregate of the final table."""
        from pyspark.sql.types import StructType

        from _big_data_analytics_and_visualization_tracking_student_progress__spark.sources.readers import (
            file_stream,
        )
        from _big_data_analytics_and_visualization_tracking_student_progress__spark.streaming.pipeline import (
            upsert_stream_run,
        )

        schema = "day string, k int, v int, seq int, op string"
        watch = tmp_path / "in"
        watch.mkdir()

        def rows(data):
            return spark.createDataFrame(data, schema)

        self._stage(
            rows([("d1", 1, 10, 1, "u"), ("d2", 3, 30, 1, "u"),
                  ("d2", 5, 50, 1, "u")]),
            watch, "b1.parquet", 1_000_000_000,
        )
        # batch 2: delete d2/k=3, update d2/k=5 — only d2's refresh runs
        self._stage(
            rows([("d2", 3, 0, 2, "d"), ("d2", 5, 51, 2, "u")]),
            watch, "b2.parquet", 1_000_000_100,
        )
        base = _mk_base(spark, tmp_path)
        view = _mk_view(spark, tmp_path, base)
        upsert_stream_run(
            spark,
            file_stream(spark, str(watch), schema, max_files_per_trigger=1),
            base,
            workdir=str(tmp_path / "run"),
            view=view,
            tombstone_predicate=F.col("op") == "d",
        )
        assert _frame_set(view.read()) == _frame_set(
            base.read()
            .withColumn("grp", F.col("k") % 2)
            .groupBy("grp")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("v").alias("sum_v"),
                F.max("v").alias("max_v"),
                F.min("v").alias("min_v"),
            )
        )
        assert {(r.day, r.k, r.v) for r in base.read().collect()} == {
            ("d1", 1, 10), ("d2", 5, 51),
        }

    def test_view_over_wrong_base_is_rejected(self, spark, tmp_path):
        from _big_data_analytics_and_visualization_tracking_student_progress__spark.streaming.pipeline import (
            upsert_stream_run,
        )

        watch = tmp_path / "in"
        watch.mkdir()
        self._stage(
            _rows(spark, [("d1", 1, 10, 1)]), watch, "b1.parquet",
            1_000_000_000,
        )
        base = _mk_base(spark, tmp_path)
        other = ManifestSnapshotTable(
            spark,
            str(tmp_path / "other"),
            keys=["day", "k"],
            order_cols=["seq"],
            partition_by=["day"],
        )
        view = _mk_view(spark, tmp_path, other)
        with pytest.raises(ValueError, match="over the sink table"):
            upsert_stream_run(
                spark,
                self._stream(spark, watch),
                base,
                workdir=str(tmp_path / "run"),
                view=view,
            )


class TestDefinitionDrift:
    """Config-drift gate: reconstructing a view over the same path with
    a different definition must NOT union old-definition partials with
    new ones (they would NULL-fill the new measures for inherited
    fragments) — it rebuilds from scratch instead."""

    def test_changed_measures_force_full_rebuild(self, spark, tmp_path):
        # the exact ADVICE repro: measures [count] -> [sum], then an
        # incremental refresh over a second commit; read() must equal
        # the direct aggregate, not a NULL-filled union
        base = _mk_base(spark, tmp_path)
        base.upsert(_rows(spark, [("d1", 1, 10, 1), ("d2", 2, 40, 1)]))
        v1 = IncrementalAggView(
            spark, str(tmp_path / "mv"), base,
            group_cols=["grp"],
            measures=[("n", None, "count")],
            prepare=lambda df: df.withColumn("grp", F.col("k") % 2),
        )
        v1.refresh()
        base.upsert(_rows(spark, [("d2", 3, 20, 2)]))
        v2 = IncrementalAggView(
            spark, str(tmp_path / "mv"), base,
            group_cols=["grp"],
            measures=[("sum_v", "v", "sum")],
            prepare=lambda df: df.withColumn("grp", F.col("k") % 2),
        )
        info = v2.refresh()
        # drift detected: EVERY fragment recomputed, none inherited
        assert info["recomputed"] == info["total"] == 2
        direct = (
            base.read()
            .withColumn("grp", F.col("k") % 2)
            .groupBy("grp")
            .agg(F.sum("v").alias("sum_v"))
        )
        assert _frame_set(v2.read()) == _frame_set(direct)

    def test_changed_prepare_code_forces_full_rebuild(self, spark, tmp_path):
        base = _mk_base(spark, tmp_path)
        base.upsert(_rows(spark, [("d1", 1, 10, 1), ("d2", 2, 40, 1)]))
        measures = [("sum_v", "v", "sum")]
        v1 = IncrementalAggView(
            spark, str(tmp_path / "mv"), base,
            group_cols=["grp"], measures=measures,
            prepare=lambda df: df.withColumn("grp", F.col("k") % 2),
        )
        v1.refresh()
        base.upsert(_rows(spark, [("d2", 3, 20, 2)]))
        v2 = IncrementalAggView(
            spark, str(tmp_path / "mv"), base,
            group_cols=["grp"], measures=measures,
            # different bucketing: grp is now k % 3
            prepare=lambda df: df.withColumn("grp", F.col("k") % 3),
        )
        info = v2.refresh()
        assert info["recomputed"] == info["total"] == 2
        direct = (
            base.read()
            .withColumn("grp", F.col("k") % 3)
            .groupBy("grp")
            .agg(F.sum("v").alias("sum_v"))
        )
        assert _frame_set(v2.read()) == _frame_set(direct)

    def test_unchanged_definition_stays_incremental(self, spark, tmp_path):
        # the gate must not tax the steady state: same definition (same
        # lambda code, same closure) → the second handle's refresh
        # still recomputes only the touched fragment
        base = _mk_base(spark, tmp_path)
        base.upsert(_rows(spark, [("d1", 1, 10, 1), ("d2", 2, 40, 1)]))
        mk = lambda: _mk_view(spark, tmp_path, base)  # noqa: E731
        mk().refresh()
        base.upsert(_rows(spark, [("d2", 3, 20, 2)]))
        info = mk().refresh()
        assert info == {
            "version": 2, "recomputed": 1, "inherited": 1, "total": 2,
        }

    def test_drift_on_empty_base_raises(self, spark, tmp_path):
        base = _mk_base(spark, tmp_path)
        base.upsert(_rows(spark, [("d1", 1, 10, 1)]))
        v1 = IncrementalAggView(
            spark, str(tmp_path / "mv"), base,
            group_cols=["day"], measures=[("n", None, "count")],
        )
        v1.refresh()
        base.delete_where(F.lit(True))  # empty the table
        v2 = IncrementalAggView(
            spark, str(tmp_path / "mv"), base,
            group_cols=["day"], measures=[("sum_v", "v", "sum")],
        )
        with pytest.raises(ValueError, match="definition changed"):
            v2.refresh()


class TestExactSourceValidation:
    """sum/avg sources must be exactly mergeable (integral/decimal):
    float partial sums depend on fragment merge order in the last ulp."""

    def test_double_sum_source_is_rejected(self, spark, tmp_path):
        base = _mk_base(spark, tmp_path)
        base.upsert(_rows(spark, [("d1", 1, 10, 1)]))
        view = IncrementalAggView(
            spark, str(tmp_path / "mv"), base,
            group_cols=["day"],
            measures=[("sum_vd", "vd", "sum")],
            prepare=lambda df: df.withColumn(
                "vd", F.col("v").cast("double") / 3.0
            ),
        )
        with pytest.raises(ValueError, match="not exactly mergeable"):
            view.refresh()

    def test_decimal_and_integral_sources_are_accepted(
        self, spark, tmp_path
    ):
        base = _mk_base(spark, tmp_path)
        base.upsert(_rows(spark, [("d1", 1, 10, 1), ("d1", 2, 20, 1)]))
        view = IncrementalAggView(
            spark, str(tmp_path / "mv"), base,
            group_cols=["day"],
            measures=[
                ("sum_dec", "vdec", "sum"),
                ("avg_v", "v", "avg"),
            ],
            prepare=lambda df: df.withColumn(
                "vdec", F.col("v").cast("decimal(20,2)")
            ),
        )
        view.refresh()
        got = {(r.day, str(r.sum_dec), r.avg_v) for r in view.read().collect()}
        assert got == {("d1", "30.00", 15.0)}


def test_view_converges_across_base_schema_evolution(spark, tmp_path):
    """Schema evolution on the BASE interacts correctly with the view:
    an add_column commit moves no fragments (refresh is a no-op), and
    a later upsert carrying the new column recomputes only its touched
    fragments — the view's contract (read == direct aggregate of the
    base) holds throughout, with a measure over the evolved column
    contributing NULL-as-absent for pre-evolution rows."""
    base = _mk_base(spark, tmp_path)
    base.upsert(_rows(spark, [
        ("d1", 1, 10, 1), ("d2", 3, 30, 1),
    ]))
    # a measure over a column the base lacks is refused until the
    # base evolves — evolve FIRST, then declare the view
    base.add_column("w", "int", initial_default=5)
    view = IncrementalAggView(
        spark,
        str(tmp_path / "mv2"),
        base,
        group_cols=["grp"],
        measures=[("n", None, "count"), ("sum_w", "w", "sum")],
        prepare=lambda df: df.withColumn("grp", F.col("k") % 2),
    )
    info = view.refresh()
    assert (info["recomputed"], info["inherited"]) == (2, 0)
    got = {(r.grp): (r.n, r.sum_w) for r in view.read().collect()}
    assert got == {1: (2, 10)}  # both rows read the default 5
    # a metadata-only evolution moves no fragments: refresh no-ops
    base.add_column("z", "string")
    assert view.refresh()["version"] == -1
    # an upsert carrying the evolved columns recomputes only d2
    base.upsert(
        spark.createDataFrame(
            [("d2", 5, 50, 2, 7, "x")],
            "day string, k int, v int, seq int, w int, z string",
        )
    )
    info = view.refresh()
    assert (info["recomputed"], info["inherited"]) == (1, 1)
    got = {(r.grp): (r.n, r.sum_w) for r in view.read().collect()}
    assert got == {1: (3, 17)}  # 5 + 5 + 7
