"""Managed IVF ANN index: the materialized IVF layout with a LIFECYCLE.

`similarity.build_ivf_index` writes a one-shot hive layout — the right
shape for a frozen corpus, but production corpora grow, re-embed, and
must honor right-to-erasure.  This module routes the same layout
through `ManifestSnapshotTable` (partition column ``__c`` = the coarse-
quantizer cell), so the index inherits the full storage lifecycle the
text index already has via streaming maintenance:

- **Incremental appends** are pruned MERGE commits: only the cells the
  batch lands in are rewritten, every other cell is inherited by
  reference in the manifest.  Append cost tracks the BATCH, not the
  corpus — the 100 TB contract (see tools/scale_ann_index.py).
- **Compaction** (`maybe_compact`) bounds small-file scatter per cell
  as drip appends accumulate, exactly like the text index's posting
  buckets.
- **DELETE** (right-to-erasure) removes vectors from the index through
  the manifest's keyed-delete path — no rebuild.
- **Probes** read ONLY the nprobe cell fragments via
  `ManifestSnapshotTable.read_partitions` (manifest-level partition
  pruning): per-query I/O is nprobe/n_cells of the files at any corpus
  size, and snapshot isolation means a probe never sees a half-applied
  append.

Reference parity: the reference delegates all retrieval to
Elasticsearch (README.md:26-27 — index + Kibana); this is the
vector-retrieval analogue built Spark-first, with FAISS's
IVF/IDMap-remove posture (sample-trained coarse quantizer, cell-
partitioned postings, delete-by-id) re-expressed as manifest commits.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .similarity import (
    _sq_dist,
    cosine_topk,
    dot,
    l2norm,
    nearest_clusters,
    with_cluster,
)
from .upsert import ManifestSnapshotTable

__all__ = ["ManagedIvfIndex"]


class ManagedIvfIndex:
    """IVF ANN index with manifest-backed incremental maintenance.

    The coarse quantizer (``centroids``) is trained ONCE offline
    (`train_ivf_centroids_sample` — bounded sample, one corpus scan)
    and is immutable for the index's lifetime: cell assignment must be
    a pure function of the vector, or historical cells would go stale.
    Re-training is a new index build (standard FAISS/ScaNN posture).

    Invariant of the pruned append (`upsert`): the manifest table
    prunes its MERGE to the batch's own cells, so an id that is
    RE-EMBEDDED into a different cell must go through
    ``upsert(reassign=True)`` (delete-then-insert, two commits) —
    plain ``upsert`` is for new ids and same-cell updates, where the
    single pruned commit suffices.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        centroids: list[list[float]],
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        keep_versions: int | None = None,
        bloom_ids: bool = True,
    ) -> None:
        self.centroids = [[float(x) for x in c] for c in centroids]
        self.vec_col = vec_col
        self.id_col = id_col
        # stable_partitions: cell = f(vector, frozen centroids) — an id
        # only moves cells if its VECTOR changes, which the reassign
        # path handles as delete+insert.  __seq (commit sequence) is
        # the order column: the latest write of an id wins the merge.
        # bloom_ids: per-file bloom bitsets over the id, so delete()'s
        # key location (stable_partitions = keys don't name their cell)
        # is metadata-only for erasure-sized batches instead of a scan
        # of every cell (`_locate_key_fragments` bloom fast path).
        self.table = ManifestSnapshotTable(
            spark,
            path,
            keys=[id_col],
            order_cols=["__seq"],
            partition_by=["__c"],
            stable_partitions=True,
            keep_versions=keep_versions,
            bloom_cols=[id_col] if bloom_ids else None,
        )

    # -- write path -----------------------------------------------------
    def _stamp(self, batch: DataFrame) -> DataFrame:
        seq = len(self.table.versions()) + 1
        return with_cluster(
            batch.select(
                F.col(self.id_col),
                F.col(self.vec_col).cast("array<double>").alias(self.vec_col),
            ),
            self.vec_col,
            self.centroids,
        ).withColumn("__seq", F.lit(seq))

    def upsert(self, batch: DataFrame, reassign: bool = False) -> int:
        """Index an (id, vector) batch: stamp each row's cell with the
        frozen quantizer, then pruned-MERGE into the cell partitions.
        Only the batch's cells rewrite; with ``reassign`` the ids are
        first deleted wherever they currently live, so a re-embedded
        vector cannot leave a stale twin in its old cell."""
        if reassign and self.table.versions():
            self.table.delete(batch.select(self.id_col))
        return self.table.upsert(self._stamp(batch))

    def delete(self, ids: DataFrame) -> int:
        """Right-to-erasure: remove vectors by id (manifest keyed
        delete — rewrites only the fragments that hold the ids)."""
        return self.table.delete(ids.select(self.id_col))

    def maybe_compact(self, max_scatter: int = 8) -> int | None:
        """Bound per-cell small-file scatter after drip appends —
        delegates to the manifest table's scatter-triggered OPTIMIZE."""
        return self.table.maybe_compact(max_scatter)

    # -- probe path -----------------------------------------------------
    def probe_cells(self, query_vec: Sequence[float], nprobe: int) -> list[int]:
        """The nprobe cells nearest the query (driver-side: the
        centroid table is tiny)."""
        return nearest_clusters(
            self.centroids, [float(x) for x in query_vec], nprobe
        )

    def probe(
        self,
        query_vec: Sequence[float],
        k: int = 10,
        nprobe: int = 4,
        version: int | None = None,
    ) -> DataFrame:
        """ANN top-k: read ONLY the nprobe nearest cells' fragments
        from the (optionally time-traveled) snapshot, exact cosine
        top-k inside them.  The scan lists nprobe cell directories —
        per-query I/O independent of corpus size."""
        cells = self.probe_cells(query_vec, nprobe)
        cand, _, _ = self.table.read_partitions(
            [(c,) for c in cells], version=version
        )
        if cand is None:
            raise ValueError("index is empty — nothing to probe")
        return cosine_topk(
            cand.drop("__c", "__seq"),
            [float(x) for x in query_vec],
            k=k,
            vec_col=self.vec_col,
            id_col=self.id_col,
        )

    def knn_join(
        self,
        queries: DataFrame,
        k: int = 3,
        nprobe: int = 2,
        q_id: str = "q_id",
        q_vec: str | None = None,
    ) -> DataFrame:
        """Batch k-NN JOIN through the index: every query row gets its
        top-k neighbors from the vectors in its nprobe nearest cells.

        The per-query probe set is stamped ENGINE-side (the broadcast
        centroid table, an array_sort over (distance, idx) structs —
        ties to the lower cell, the `with_cluster` convention), then
        exploded to (query, cell) rows; the index side reads ONLY the
        union of probed cells (manifest partition pruning — across any
        batch that union is at most n_cells, so per-batch I/O is
        bounded by the index layout, never the corpus).  The equi-join
        on the cell broadcasts the exploded query side, so index rows
        never shuffle; exact cosine + per-query top-k window inside
        the matched cells.  Approximate in recall only (unprobed
        cells), never in precision — the IVF batch-lookup contract.

        Returns (q_id, <id_col>, cos_sim, rank) with rank 1..k per
        query (ties break to the lower id)."""
        from pyspark.sql import Window

        q_vec = q_vec or self.vec_col
        spark = queries.sparkSession
        cent_df = spark.createDataFrame(
            [(self.centroids,)], "__cent array<array<double>>"
        )
        qv = F.col("__qv")
        scored = F.transform(
            F.col("__cent"),
            lambda c, i: F.struct(
                _sq_dist(qv, c).alias("d"), i.cast("int").alias("i")
            ),
        )
        # norms are computed ONCE per side (pre-explode for queries,
        # per index row for candidates): the per-PAIR work is a single
        # dot-product fold — same subexpressions as cosine(), so the
        # float results are bit-identical to the one-query probe path
        # and the SQL oracle, at a third of the per-pair array work
        probed = (
            queries.select(
                F.col(q_id),
                F.col(q_vec).cast("array<double>").alias("__qv"),
            )
            .withColumn("__qn", l2norm(F.col("__qv")))
            .crossJoin(F.broadcast(cent_df))
            .withColumn(
                "__c",
                F.explode(
                    F.transform(
                        F.slice(F.array_sort(scored), 1, nprobe),
                        lambda s: s["i"],
                    )
                ),
            )
            .drop("__cent")
        )
        # the probed-cell UNION is bounded by n_cells — a driver
        # collect of at most len(centroids) ints, never corpus data
        cells = sorted(
            r["__c"] for r in probed.select("__c").distinct().collect()
        )
        cand, _, _ = self.table.read_partitions([(c,) for c in cells])
        if cand is None:
            raise ValueError("index is empty — nothing to join")
        w = Window.partitionBy(q_id).orderBy(
            F.col("cos_sim").desc(), F.col(self.id_col)
        )
        return (
            cand.select(
                F.col(self.id_col),
                F.col(self.vec_col).cast("array<double>").alias("__cv"),
                "__c",
            )
            .withColumn("__cn", l2norm(F.col("__cv")))
            .join(F.broadcast(probed), "__c")
            .select(
                q_id,
                self.id_col,
                (
                    dot(F.col("__qv"), F.col("__cv"))
                    / (F.col("__qn") * F.col("__cn"))
                ).alias("cos_sim"),
            )
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )
