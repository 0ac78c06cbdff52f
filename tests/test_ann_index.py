"""ManagedIvfIndex: the materialized IVF ANN index with a manifest-
backed lifecycle (VERDICT r11 item 3) — incremental appends as pruned
commits, same-cell updates, reassign on re-embedding, right-to-erasure
deletes, scatter-bounded compaction, and partition-pruned probes."""

from pyspark.sql import functions as F

from _big_data_analytics_and_visualization_tracking_student_progress__spark.datasets import (
    load_table,
)
from _big_data_analytics_and_visualization_tracking_student_progress__spark.operators import (
    similarity as S,
)
from _big_data_analytics_and_visualization_tracking_student_progress__spark.operators.ann_index import (
    ManagedIvfIndex,
)

from .conftest import SF_SMALL


def _fixture_index(spark, tmp_path, emb, centroids):
    idx = ManagedIvfIndex(spark, str(tmp_path / "mgd"), centroids)
    idx.upsert(emb.filter(F.col("vec_id") % 5 != 0))
    idx.upsert(emb.filter(F.col("vec_id") % 5 == 0))
    return idx


def test_probe_matches_inline_ivf_and_prunes(spark, tmp_path):
    emb = load_table(spark, SF_SMALL, "embeddings")
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]
    ]
    centroids = S.train_ivf_centroids_sample(
        emb, "embedding", "vec_id", k=8, iters=5
    )
    idx = _fixture_index(spark, tmp_path, emb, centroids)

    probed = idx.probe(qv, k=10, nprobe=3)
    inline = S.ivf_topk(emb, qv, k=10, nprobe=3, centroids=centroids)
    assert [r.vec_id for r in probed.collect()] == [
        r.vec_id for r in inline.collect()
    ]

    # manifest-level pruning is real: only the probed cells' fragments
    # resolve, and every file the scan reads lives in a probed cell dir
    cells = set(idx.probe_cells(qv, 3))
    cand, kept, total = idx.table.read_partitions([(c,) for c in cells])
    assert kept <= 3 < total
    touched = {
        r.f
        for r in cand.select(
            F.col("_metadata.file_path").alias("f")
        ).distinct().collect()
    }
    assert touched and all(
        any(f"__c={c}/" in f for c in cells) for f in touched
    ), touched


def test_append_rewrites_only_touched_cells(spark, tmp_path):
    emb = load_table(spark, SF_SMALL, "embeddings")
    centroids = S.train_ivf_centroids_sample(
        emb, "embedding", "vec_id", k=8, iters=5
    )
    idx = ManagedIvfIndex(spark, str(tmp_path / "mgd"), centroids)
    # split the corpus along its (frozen-quantizer) cell assignment:
    # the append batch lives entirely in one cell
    stamped = S.with_cluster(emb, "embedding", centroids)
    c0 = stamped.head()["__c"]
    v1 = idx.upsert(
        stamped.filter(F.col("__c") != c0).drop("__c")
    )
    m1 = idx.table.manifest()

    # a one-cell append: every other cell must keep its v1 holder
    # (inherited by reference — append cost tracks the batch's cells,
    # not the corpus)
    v2 = idx.upsert(stamped.filter(F.col("__c") == c0).drop("__c"))
    m2 = idx.table.manifest()
    touched = {f for f, v in m2.items() if v == v2}
    inherited = {f for f, v in m2.items() if v == v1}
    assert touched == {f"__c={c0}"}, (m1, m2)
    assert inherited == set(m1), (m1, m2)


def test_same_cell_reupsert_latest_wins(spark, tmp_path):
    emb = load_table(spark, SF_SMALL, "embeddings")
    centroids = S.train_ivf_centroids_sample(
        emb, "embedding", "vec_id", k=8, iters=5
    )
    idx = _fixture_index(spark, tmp_path, emb, centroids)
    n_before = idx.table.read().count()
    # identical vectors re-arrive (same cells): a pruned merge where
    # the later __seq wins — no duplicate ids, no row-count change
    idx.upsert(emb.filter(F.col("vec_id") % 10 == 1))
    got = idx.table.read()
    assert got.count() == n_before
    assert got.groupBy("vec_id").count().filter("count > 1").count() == 0


def test_reassign_handles_cell_move(spark, tmp_path):
    # two far-apart 1-cell centroids; id 7 re-embeds from cell 0's
    # neighborhood into cell 1's — plain upsert would leave a stale
    # twin in cell 0, reassign deletes it first
    centroids = [[0.0, 0.0], [10.0, 10.0]]
    base = spark.createDataFrame(
        [(7, [0.1, 0.2]), (8, [9.9, 9.8])], "vec_id int, embedding array<double>"
    )
    idx = ManagedIvfIndex(spark, str(tmp_path / "mgd"), centroids)
    idx.upsert(base)
    moved = spark.createDataFrame(
        [(7, [9.5, 9.5])], "vec_id int, embedding array<double>"
    )
    idx.upsert(moved, reassign=True)
    rows = idx.table.read().select("vec_id", "__c").collect()
    assert sorted((r["vec_id"], r["__c"]) for r in rows) == [(7, 1), (8, 1)]
    # the probe near the new location finds the moved vector once
    got = idx.probe([9.6, 9.6], k=5, nprobe=1).collect()
    assert [r.vec_id for r in got].count(7) == 1


def test_delete_is_right_to_erasure(spark, tmp_path):
    emb = load_table(spark, SF_SMALL, "embeddings")
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]
    ]
    centroids = S.train_ivf_centroids_sample(
        emb, "embedding", "vec_id", k=8, iters=5
    )
    idx = _fixture_index(spark, tmp_path, emb, centroids)
    before = [r.vec_id for r in idx.probe(qv, k=5, nprobe=3).collect()]
    victim = before[0]
    idx.delete(spark.createDataFrame([(victim,)], "vec_id bigint"))
    after = [r.vec_id for r in idx.probe(qv, k=5, nprobe=3).collect()]
    assert victim not in after
    assert idx.table.read().filter(F.col("vec_id") == victim).count() == 0


def test_maybe_compact_bounds_scatter(spark, tmp_path):
    emb = load_table(spark, SF_SMALL, "embeddings")
    centroids = S.train_ivf_centroids_sample(
        emb, "embedding", "vec_id", k=8, iters=5
    )
    idx = ManagedIvfIndex(spark, str(tmp_path / "mgd"), centroids)
    # drip appends, one cell at a time → each commit holds one
    # fragment, so the live manifest scatters across holder versions
    stamped = S.with_cluster(emb, "embedding", centroids)
    cells = [r["__c"] for r in stamped.select("__c").distinct().collect()]
    for c in cells:
        idx.upsert(stamped.filter(F.col("__c") == c).drop("__c"))
    assert len(set(idx.table.manifest().values())) > 1
    v = idx.maybe_compact(max_scatter=1)
    assert v is not None
    # post-OPTIMIZE every fragment is held by the compaction commit
    assert set(idx.table.manifest().values()) == {v}
    # content unscathed
    assert idx.table.read().count() == emb.count()


def test_delete_locates_cells_via_blooms(spark, tmp_path):
    """The erasure batch must find its cells from bloom metadata, not
    a corpus scan: the locate fast path engages (bloom_ids default)
    and returns fewer candidate fragments than the table holds."""
    import types

    emb = load_table(spark, SF_SMALL, "embeddings")
    centroids = S.train_ivf_centroids_sample(
        emb, "embedding", "vec_id", k=8, iters=5
    )
    idx = ManagedIvfIndex(spark, str(tmp_path / "mgd"), centroids)
    idx.upsert(emb)

    seen = {}
    real = type(idx.table)._bloom_locate_fragments

    def spy(self, keys, doc, prev):
        out = real(self, keys, doc, prev)
        seen["frags"], seen["total"] = out, len(prev)
        return out

    idx.table._bloom_locate_fragments = types.MethodType(spy, idx.table)
    victims = spark.createDataFrame([(3,), (7,)], "vec_id bigint")
    idx.delete(victims)
    assert seen["frags"] is not None, "bloom locate did not engage"
    assert 0 < len(seen["frags"]) < seen["total"], seen
    assert idx.table.read().filter(
        F.col("vec_id").isin(3, 7)
    ).count() == 0


def test_knn_join_broadcasts_queries_and_prunes_cells(spark, tmp_path):
    """The batch k-NN join's plan contract: the exploded query side is
    broadcast (index rows never shuffle) and the index scan touches
    only the union of probed cells' directories."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    centroids = S.train_ivf_centroids_sample(
        emb, "embedding", "vec_id", k=8, iters=5
    )
    idx = _fixture_index(spark, tmp_path, emb, centroids)
    queries = emb.filter(F.col("vec_id") % 101 == 1).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    out = idx.knn_join(queries, k=3, nprobe=2)
    rows = out.collect()
    nq = queries.count()
    assert len(rows) == 3 * nq
    per_q = {r["q_id"] for r in rows}
    assert len(per_q) == nq
    # every query's rank-1 neighbor at least as similar as its rank-3
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append((r["rank"], r["cos_sim"]))
    for sims in by_q.values():
        ordered = [s for _r, s in sorted(sims)]
        assert ordered == sorted(ordered, reverse=True)

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:2000]

    # index-side scan limited to the probed-cell union
    probed_union = set()
    for q in queries.select("embedding").collect():
        probed_union.update(idx.probe_cells(list(q[0]), 2))
    cand, kept, total = idx.table.read_partitions(
        [(c,) for c in sorted(probed_union)]
    )
    assert kept == len(probed_union) <= total


def test_stream_built_index_equals_batch_built(spark):
    from _big_data_analytics_and_visualization_tracking_student_progress__spark.queries.streaming_q import (
        stream_built_ivf_index,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    idx = stream_built_ivf_index(spark, SF_SMALL)
    # one commit per micro-batch (4-part staging, maxFilesPerTrigger=1),
    # possibly plus scatter-triggered OPTIMIZE commits
    assert len(idx.table.versions()) >= 4
    got = idx.table.read()
    assert got.count() == emb.count()
    assert got.groupBy("vec_id").count().filter("count > 1").count() == 0


def test_stream_built_pq_index_equals_batch_built(spark, tmp_path):
    """Streaming maintenance of the PQ tier (completing the matrix:
    text ✓, raw IVF ✓): each micro-batch encodes to m-byte codes and
    lands as one pruned MERGE commit; the final codes table and ADC
    probe are identical to a one-shot batch build with the same frozen
    quantizers."""
    import os

    from _big_data_analytics_and_visualization_tracking_student_progress__spark.operators.ann_index import (  # noqa: E501
        ManagedPqIndex,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    centroids = S.train_ivf_centroids_sample(
        emb, "embedding", "vec_id", k=8, iters=5
    )
    books = S.train_pq_codebooks_portable(
        emb, "embedding", "vec_id", m=4, k=16, iters=4
    )
    batch_idx = ManagedPqIndex(spark, str(tmp_path / "pq_b"), centroids, books)
    batch_idx.upsert(emb)

    parts = str(tmp_path / "parts")
    emb.repartition(3).write.parquet(parts)
    stream_idx = ManagedPqIndex(
        spark, str(tmp_path / "pq_s"), centroids, books
    )
    sdf = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(parts)
    )
    (
        sdf.writeStream.foreachBatch(
            lambda batch_df, _id: stream_idx.upsert(batch_df)
        )
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    assert len(stream_idx.table.versions()) >= 3

    def codes(idx):
        df = idx.table.read()
        code_cols = sorted(c for c in df.columns if c.startswith("__pq"))
        return sorted(
            tuple(r) for r in df.select("vec_id", *code_cols).collect()
        )

    assert codes(stream_idx) == codes(batch_idx)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 3).head()["embedding"]]
    got_s = [tuple(r) for r in stream_idx.probe(qv, k=10, nprobe=3).collect()]
    got_b = [tuple(r) for r in batch_idx.probe(qv, k=10, nprobe=3).collect()]
    assert got_s == got_b


# ---------------------------------------------------------------------------
# Model-based property test: ANY interleaving of upsert-new /
# reassign-upsert / delete must leave the index equal to a plain dict
# model, both in CONTENT (id → vector, cell = argmin distance, ties to
# the lower centroid) and in PROBE results (cosine top-k over the
# probed cells' model entries, ties to the lower id).
# ---------------------------------------------------------------------------
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_CENTROIDS = [[0.0, 0.0], [10.0, 0.0], [0.0, 10.0], [10.0, 10.0]]
_VEC = st.tuples(
    st.integers(1, 9).map(float), st.integers(1, 9).map(float)
)
_OPS = st.lists(
    st.one_of(
        st.tuples(
            st.just("up"),
            st.dictionaries(st.integers(0, 9), _VEC, min_size=1, max_size=4),
        ),
        st.tuples(
            st.just("reassign"),
            st.dictionaries(st.integers(0, 9), _VEC, min_size=1, max_size=4),
        ),
        st.tuples(
            st.just("del"),
            st.lists(st.integers(0, 9), min_size=1, max_size=3).map(
                lambda xs: dict.fromkeys(xs)
            ),
        ),
    ),
    min_size=1,
    max_size=5,
)


def _cell_of(vec):
    d = [
        sum((x - c) ** 2 for x, c in zip(vec, cent)) for cent in _CENTROIDS
    ]
    return min(range(len(_CENTROIDS)), key=lambda i: (d[i], i))


def _cos(a, b):
    import math

    dot = sum(x * y for x, y in zip(a, b))
    return dot / (
        math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
    )


@given(ops=_OPS)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_index_matches_dict_model(spark, tmp_path_factory, ops):
    idx = ManagedIvfIndex(
        spark,
        str(tmp_path_factory.mktemp("mgd_prop")),
        _CENTROIDS,
        bloom_ids=True,
    )
    model: dict[int, tuple] = {}
    for kind, payload in ops:
        if kind == "del":
            ids = [i for i in payload if i in model] or list(payload)
            if model:
                idx.delete(
                    spark.createDataFrame([(i,) for i in ids], "vec_id int")
                )
            for i in ids:
                model.pop(i, None)
            continue
        batch = dict(payload)
        if kind == "up":
            # plain upsert's contract: new ids and same-cell updates
            batch = {
                i: v
                for i, v in batch.items()
                if i not in model or _cell_of(v) == _cell_of(model[i])
            }
            if not batch:
                continue
        df = spark.createDataFrame(
            [(i, list(v)) for i, v in batch.items()],
            "vec_id int, embedding array<double>",
        )
        idx.upsert(df, reassign=(kind == "reassign" and bool(model)))
        model.update(batch)

    got = (
        sorted(
            (r["vec_id"], tuple(r["embedding"]), r["__c"])
            for r in idx.table.read().collect()
        )
        if model
        else []
    )
    want = sorted(
        (i, v, _cell_of(v)) for i, v in model.items()
    )
    assert got == want

    if model:
        qv = [5.0, 5.0]
        probe_cells = set(idx.probe_cells(qv, 2))
        cand = {i: v for i, v in model.items() if _cell_of(v) in probe_cells}
        if cand:
            want_ids = [
                i
                for i, _ in sorted(
                    cand.items(), key=lambda kv: (-_cos(kv[1], qv), kv[0])
                )[:5]
            ]
            got_ids = [
                r["vec_id"] for r in idx.probe(qv, k=5, nprobe=2).collect()
            ]
            assert got_ids == want_ids


# ---------------------------------------------------------------------------
# Round-13 lifecycle hardening: broadcast gate + version on knn_join,
# drained-cell empties, monotone __seq under vacuum, skew telemetry.
# ---------------------------------------------------------------------------
_GRID = [[0.0, 0.0], [10.0, 0.0], [0.0, 10.0], [10.0, 10.0]]


def _grid_index(spark, tmp_path, rows, **kw):
    idx = ManagedIvfIndex(
        spark, str(tmp_path / "g"), _GRID, **kw
    )
    idx.upsert(
        spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    )
    return idx


def test_knn_join_shuffle_fallback_above_gate(spark, tmp_path):
    """Above the broadcast gate the join degrades to a shuffled hash
    equi-join on __c (exchange on the cell, both sides) — and returns
    the exact same rows as the broadcast regime."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    centroids = S.train_ivf_centroids_sample(
        emb, "embedding", "vec_id", k=8, iters=5
    )
    idx = _fixture_index(spark, tmp_path, emb, centroids)
    queries = emb.filter(F.col("vec_id") % 101 == 1).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    small = idx.knn_join(queries, k=3, nprobe=2)
    big = idx.knn_join(queries, k=3, nprobe=2, broadcast_bytes=1)

    plan_small = small._jdf.queryExecution().executedPlan().toString()
    plan_big = big._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_small, plan_small[:2000]
    assert "ShuffledHashJoin" in plan_big, plan_big[:2000]
    assert "hashpartitioning(__c" in plan_big, plan_big[:2000]

    key = lambda r: (r["q_id"], r["rank"])  # noqa: E731
    a = sorted(map(tuple, small.collect()), key=lambda t: (t[0], t[3]))
    b = sorted(map(tuple, big.collect()), key=lambda t: (t[0], t[3]))
    assert a == b


def test_knn_join_version_time_travel(spark, tmp_path):
    """knn_join(version=) pins the snapshot the join reads, like
    probe(version=): ids upserted after the pinned version are
    invisible to the batch join."""
    idx = _grid_index(
        spark, tmp_path, [(1, [1.0, 1.0]), (2, [2.0, 2.0])]
    )
    v1 = idx.table.versions()[-1]
    idx.upsert(
        spark.createDataFrame(
            [(3, [1.5, 1.5])], "vec_id long, embedding array<double>"
        )
    )
    queries = spark.createDataFrame(
        [(100, [1.0, 1.0])], "q_id long, embedding array<double>"
    )
    now = idx.knn_join(queries, k=3, nprobe=1)
    then = idx.knn_join(queries, k=3, nprobe=1, version=v1)
    assert {r.vec_id for r in now.collect()} == {1, 2, 3}
    assert {r.vec_id for r in then.collect()} == {1, 2}


def test_probe_and_knn_join_empty_probed_cells(spark, tmp_path):
    """A non-empty index whose probed cells hold no live vectors is a
    legitimate empty result (typed like the real one), not an error —
    only a truly empty index raises."""
    import pytest

    # vectors only in cell 0; probe lands in cell 3
    idx = _grid_index(
        spark, tmp_path, [(1, [1.0, 1.0]), (2, [2.0, 2.0])]
    )
    out = idx.probe([10.0, 10.0], k=3, nprobe=1)
    assert out.count() == 0
    assert out.columns == ["vec_id", "cos_sim"]
    assert out.schema["vec_id"].dataType.simpleString() == "bigint"

    queries = spark.createDataFrame(
        [(7, [10.0, 10.0])], "q_id long, embedding array<double>"
    )
    j = idx.knn_join(queries, k=3, nprobe=1)
    assert j.count() == 0
    assert j.columns == ["q_id", "vec_id", "cos_sim", "rank"]

    empty = ManagedIvfIndex(spark, str(tmp_path / "none"), _GRID)
    with pytest.raises(ValueError, match="empty"):
        empty.probe([1.0, 1.0], k=3)
    with pytest.raises(ValueError, match="empty"):
        empty.knn_join(queries, k=3)


def test_seq_monotone_across_vacuum(spark, tmp_path):
    """__seq identifies commit order even after vacuum trims the
    readable-version list: len(versions())+1 would saturate at
    keep_versions+1, stamping equal __seq on later commits."""
    idx = ManagedIvfIndex(
        spark, str(tmp_path / "kv"), _GRID, keep_versions=2
    )
    for i in range(1, 5):
        idx.upsert(
            spark.createDataFrame(
                [(1, [float(i), 1.0])], "vec_id long, embedding array<double>"
            )
        )
    row = idx.table.read().select("embedding", "__seq").head()
    # content reflects the LAST write and __seq is the 4th commit's
    # version-derived stamp, strictly above the saturated len()+1 value
    assert row["embedding"][0] == 4.0
    assert row["__seq"] == idx.table.versions()[-1]
    assert row["__seq"] >= 4


def test_cell_stats_surfaces_skew(spark, tmp_path):
    """cell_stats is metadata-only telemetry: per-cell live rows/files
    from the manifest, with a max/mean skew summary that flags a hot
    cell on a deliberately skewed corpus."""
    rows = [(i, [1.0 + (i % 3) * 0.1, 1.0]) for i in range(90)]  # cell 0
    rows += [(100, [10.0, 0.1]), (101, [0.1, 10.0])]  # cells 1, 2
    idx = _grid_index(spark, tmp_path, rows)
    stats = idx.cell_stats()
    assert set(stats["cells"]) == {0, 1, 2}
    assert stats["rows_total"] == 92
    assert stats["cells"][0]["rows"] == 90
    assert all(c["files"] >= 1 for c in stats["cells"].values())
    assert stats["skew"] > 2.0  # 90 / mean(~30.7) ≈ 2.9

    # erasure moves the metric: delete the hot cell's rows
    idx.delete(
        spark.createDataFrame(
            [(i,) for i in range(90)], "vec_id long"
        )
    )
    after = idx.cell_stats()
    assert after["rows_total"] == 2
    assert 0 not in after["cells"] or after["cells"][0]["rows"] == 0


# ---------------------------------------------------------------------------
# Managed IVF-PQ index (round 13): codes-not-vectors through the same
# manifest lifecycle; ADC probes and the batch ADC join.
# ---------------------------------------------------------------------------
def test_pq_index_probe_and_knn_join(spark, tmp_path):
    from _big_data_analytics_and_visualization_tracking_student_progress__spark.operators.ann_index import (
        ManagedPqIndex,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    centroids = S.train_ivf_centroids_sample(
        emb, "embedding", "vec_id", k=8, iters=5
    )
    books = S.train_pq_codebooks_portable(
        emb, "embedding", "vec_id", m=4, k=16, iters=4
    )
    idx = ManagedPqIndex(spark, str(tmp_path / "pq"), centroids, books)
    idx.upsert(emb.filter(F.col("vec_id") != 0))
    v1 = idx.table.versions()[-1]
    idx.upsert(emb.filter(F.col("vec_id") == 0))  # one vector, ONE cell
    v2 = idx.table.versions()[-1]
    # the append rewrote exactly one cell; the rest inherited (parent
    # contract holds for the codes layout too)
    moved = [k for k, v in idx.table.manifest().items() if v == v2]
    assert len(moved) == 1
    assert any(v == v1 for v in idx.table.manifest().values())

    qv = [float(x) for x in emb.filter(F.col("vec_id") == 3).head()["embedding"]]
    # probe ≡ the inline IVF-PQ computation over the same corpus
    probes = S.nearest_clusters(centroids, qv, 3)
    cand = (
        S.with_cluster(emb, "embedding", centroids)
        .filter(F.col("__c").isin(probes))
        .drop("__c")
    )
    tabs = S.pq_adc_tables(books, qv)
    enc = S.pq_encode(cand, "embedding", books)
    d2 = None
    for j, tab in enumerate(tabs):
        term = F.element_at(
            F.expr(S.double_array_sql(tab)), F.col(f"__pq{j}")["i"] + F.lit(1)
        )
        d2 = term if d2 is None else d2 + term
    want = [
        (r.vec_id, r.d2)
        for r in cand.sparkSession.createDataFrame(
            enc.select("vec_id", d2.alias("d2"))
            .orderBy(F.col("d2").asc(), F.col("vec_id").asc())
            .limit(10)
            .collect()
        ).collect()
    ]
    got = [(r.vec_id, r.approx_d2) for r in idx.probe(qv, k=10, nprobe=3).collect()]
    assert got == want

    # batch knn_join ≡ per-query probe, in BOTH join regimes
    queries = emb.filter(F.col("vec_id") % 97 == 1).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    for bc in (10 << 20, 1):
        out = idx.knn_join(queries, k=3, nprobe=3, broadcast_bytes=bc)
        plan = out._jdf.queryExecution().executedPlan().toString()
        if bc == 1:
            assert "ShuffledHashJoin" in plan, plan[:1500]
        else:
            assert "BroadcastHashJoin" in plan, plan[:1500]
        by_q = {}
        for r in out.collect():
            by_q.setdefault(r.q_id, []).append((r.rank, r.vec_id, r.approx_d2))
        for q in queries.collect():
            single = [
                (i + 1, r.vec_id, r.approx_d2)
                for i, r in enumerate(
                    idx.probe(list(q.embedding), k=3, nprobe=3).collect()
                )
            ]
            assert sorted(by_q[q.q_id]) == single, q.q_id

    # erasure + time travel: deleted ids vanish from the live probe,
    # remain in the pinned snapshot
    v_full = idx.table.versions()[-1]
    victims = [r.vec_id for r in idx.probe(qv, k=2, nprobe=3).collect()]
    idx.delete(spark.createDataFrame([(v,) for v in victims], "vec_id bigint"))
    live = {r.vec_id for r in idx.probe(qv, k=10, nprobe=3).collect()}
    then = {
        r.vec_id
        for r in idx.probe(qv, k=10, nprobe=3, version=v_full).collect()
    }
    assert not set(victims) & live
    assert set(victims) <= then


def test_pq_probe_refine_exact_rerank(spark, tmp_path):
    """FAISS refine: with refine covering every probed-cell candidate,
    the refined result IS the exact squared-L2 top-k over the probed
    cells; with a small shortlist it is the exact re-rank OF that
    shortlist; recall vs exact is never below the raw ADC probe's."""
    from _big_data_analytics_and_visualization_tracking_student_progress__spark.operators.ann_index import (
        ManagedPqIndex,
        pq_probe_refine,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    centroids = S.train_ivf_centroids_sample(
        emb, "embedding", "vec_id", k=8, iters=5
    )
    books = S.train_pq_codebooks_portable(
        emb, "embedding", "vec_id", m=4, k=16, iters=4
    )
    idx = ManagedPqIndex(spark, str(tmp_path / "pqr"), centroids, books)
    idx.upsert(emb)
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 3).head()["embedding"]
    ]

    probes = S.nearest_clusters(centroids, qv, 3)
    cand = (
        S.with_cluster(emb, "embedding", centroids)
        .filter(F.col("__c").isin(probes))
        .drop("__c")
    )
    qlit = F.expr(S.double_array_sql(qv))
    exact = cand.select(
        "vec_id",
        S._sq_dist(
            F.col("embedding").cast("array<double>"), qlit
        ).alias("d2"),
    ).orderBy(F.col("d2").asc(), F.col("vec_id").asc())
    n_cand = cand.count()

    # refine big enough to cover every candidate -> exact over cells
    got_full = [
        (r.vec_id, r.exact_d2)
        for r in pq_probe_refine(
            idx, emb, qv, k=10, nprobe=3, refine=(n_cand // 10) + 1
        ).collect()
    ]
    want_full = [(r.vec_id, r.d2) for r in exact.limit(10).collect()]
    assert got_full == want_full

    # small shortlist: exact re-rank of exactly the ADC top-20
    short = {
        r.vec_id for r in idx.probe(qv, k=20, nprobe=3).collect()
    }
    got_small = [
        (r.vec_id, r.exact_d2)
        for r in pq_probe_refine(
            idx, emb, qv, k=10, nprobe=3, refine=2
        ).collect()
    ]
    assert {v for v, _ in got_small} <= short
    in_short = [
        (r.vec_id, r.d2)
        for r in exact.collect()
        if r.vec_id in short
    ][:10]
    assert got_small == in_short

    # recall@10 vs exact: refined >= raw ADC
    exact_top = {v for v, _ in want_full}
    adc_top = {
        r.vec_id for r in idx.probe(qv, k=10, nprobe=3).collect()
    }
    refined_top = {v for v, _ in got_small}
    assert len(refined_top & exact_top) >= len(adc_top & exact_top)
