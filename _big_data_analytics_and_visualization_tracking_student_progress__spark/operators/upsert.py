"""Keyed upsert (MERGE) — the reference's ES `_id` upsert re-expressed
(SURVEY.md §4.3.1; reference con.py:55-63: `es.index(id=doc_id, ...)` —
idempotent last-write-wins by composite key).

`merge_by_key` is pure DataFrame logic (union → latest_by_key) usable in
batch or inside `foreachBatch`; `KeyedParquetTable` is the storage-backed
version for streaming sinks.

Scale posture: the merge shuffles on the business key only.  For a real
100 TB keyed table this is the classic Delta/Iceberg MERGE; without a
table format in this container we implement read-union-dedup-overwrite on
parquet, with the key-hash as the shuffle partitioner.  When the table is
partitioned AND the partition columns are part of the key (the reference's
daily-index-plus-_id shape exactly), `upsert` prunes: only the partitions
present in the batch are read, merged, and rewritten (dynamic partition
overwrite) — per-batch cost tracks batch size, not table size.
Idempotency under replay holds because merging the same batch twice is a
fixed point of last-write-wins (verified in tests).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .windows import latest_by_key


class ConstraintViolationError(ValueError):
    """A write batch violated a table CHECK constraint.  The commit was
    abandoned whole — the already-written candidate files are removed
    with the claim and the table stays readable at its current version,
    the Delta `ALTER TABLE ADD CONSTRAINT CHECK` enforcement contract.
    SQL CHECK semantics: a row violates only when the expression is
    FALSE — NULL passes (unknown is not a violation)."""


class CommitConflictError(RuntimeError):
    """A concurrent writer holds (or already won) the next snapshot
    version of a `ManifestSnapshotTable`.  The loser's work is not
    partially applied — the table stays readable at its current version
    — and the correct response is to re-run the whole commit (re-read,
    re-merge) against the new basis, exactly the Delta/Iceberg
    optimistic-concurrency retry contract (`retry_commit` below is
    that retry loop)."""


def retry_commit(
    fn,
    attempts: int = 5,
    backoff_s: float = 0.05,
    max_backoff_s: float = 2.0,
):
    """Run a commit closure with the standard optimistic-concurrency
    retry loop — Delta's automatic conflict retry.  ``fn`` must be the
    WHOLE commit (e.g. ``lambda: table.upsert(batch)``): every commit
    method re-reads its basis under a fresh version claim, so simply
    re-invoking it after a `CommitConflictError` replays the merge
    against the peer's published state — no lost updates, no partial
    application (the loser's claim was abandoned whole).  Exponential
    backoff, CAPPED at ``max_backoff_s`` (an uncapped 2^n sleep at
    attempt 20 would be hours — large attempt budgets must mean "keep
    trying", never "hang"), with deterministic per-attempt jitter to
    spread herds, and no sleep after the final loss; raises the final
    `CommitConflictError` after ``attempts`` losses (a writer that
    cannot win in N rounds signals real contention the caller should
    see, not mask)."""
    import time as _time

    if attempts < 1:
        raise ValueError("retry_commit needs attempts >= 1")
    last: CommitConflictError | None = None
    for attempt in range(attempts):
        try:
            return fn()
        except CommitConflictError as e:
            last = e
            if attempt + 1 >= attempts:
                break  # final loss: raise now, don't sleep first
            # deterministic jitter (no RNG): stagger by attempt parity;
            # cap applied AFTER the jitter so no sleep ever exceeds
            # max_backoff_s, honoring the docstring's contract
            _time.sleep(
                min(
                    max_backoff_s,
                    backoff_s * (2**attempt) * (1 + 0.37 * (attempt % 3)),
                )
            )
    raise last


def merge_by_key(
    target: DataFrame | None,
    source: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
) -> DataFrame:
    """MERGE semantics: rows from `source` replace same-key rows in
    `target`; ties broken by `order_by` (descending recency first), with
    source preferred over target on exact ties via a provenance column.

    Schema evolution: a source batch may carry columns the target lacks
    (the reference's ragged Excel rows — new headers appear mid-stream,
    pro.py:38) and vice versa; the union fills either side's missing
    columns with NULL (`allowMissingColumns`), so the table widens
    additively instead of rejecting the batch.

    Concurrency: single-writer, like any non-transactional table layout —
    the streaming runner serializes batches through one foreachBatch."""
    src = source.withColumn("__src", F.lit(1))
    if target is None:
        merged = src
    else:
        tgt = target.withColumn("__src", F.lit(0))
        merged = tgt.unionByName(src, allowMissingColumns=True)
    out = latest_by_key(
        merged, keys, list(order_by) + [F.col("__src").desc()]
    )
    return out.drop("__src")


def merge_clauses(
    target: DataFrame | None,
    source: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    *,
    when_matched_update: Column | None = None,
    when_not_matched_insert: Column | None = None,
    when_matched_delete: Column | None = None,
    when_not_matched_by_source_delete: Column | None = None,
) -> DataFrame:
    """Conditional MERGE — the full Delta/Iceberg `MERGE INTO` clause
    surface, where `merge_by_key` is only its unconditional
    (always-update, always-insert, never-delete) special case:

    - matched (key in both) and ``when_matched_delete`` → row dropped;
    - matched and ``when_matched_update`` → source row replaces target;
    - matched otherwise → target row kept unchanged;
    - source-only and ``when_not_matched_insert`` → source row inserted
      (dropped otherwise);
    - target-only and ``when_not_matched_by_source_delete`` → row
      dropped (Delta's WHEN NOT MATCHED BY SOURCE THEN DELETE — the
      "source is the full desired state, reap everything it no longer
      names" sync shape); target-only otherwise → kept unchanged.
      This condition can only usefully reference ``t.<col>`` — the
      source side is all-NULL on such rows, so any ``s.`` comparison
      is NULL → false.  BY SOURCE ... UPDATE (set-expressions) is not
      implemented.

    Condition Columns reference the two sides as ``t.<col>`` /
    ``s.<col>`` (e.g. ``F.col("s.ts") >= F.col("t.ts")``); an
    unqualified column name is ambiguous and will be rejected by the
    analyzer.  ``None`` conditions mean the clause always applies
    (delete defaults to never).  NULL condition results count as
    false, SQL-style.  Clause precedence matches Delta: delete is
    tested before update.

    The source is first collapsed to one row per key by ``order_by``
    recency (a batch may carry several versions of a key); schema may
    differ between the sides — both are aligned to the union-by-name
    schema, missing columns NULL, same additive evolution as
    `merge_by_key`.  One full-outer shuffle join on the key — the
    Delta MERGE physical shape — with NULL-safe key equality so NULL
    key components match themselves, consistent with
    `latest_by_key`'s groupBy."""
    srcd = latest_by_key(source, keys, list(order_by))
    if target is None:
        target = srcd.limit(0)
    t_ = target.unionByName(
        srcd.limit(0), allowMissingColumns=True
    ).withColumn("__t", F.lit(1))
    s_ = srcd.unionByName(
        target.limit(0), allowMissingColumns=True
    ).withColumn("__s", F.lit(1))
    cols = [c for c in s_.columns if c != "__s"]
    cond = None
    for k in keys:
        e = F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}"))
        cond = e if cond is None else cond & e
    j = t_.alias("t").join(s_.alias("s"), cond, "full_outer")
    has_t = F.col("t.__t").isNotNull()
    has_s = F.col("s.__s").isNotNull()
    upd = (
        F.lit(True)
        if when_matched_update is None
        else F.coalesce(when_matched_update, F.lit(False))
    )
    ins = (
        F.lit(True)
        if when_not_matched_insert is None
        else F.coalesce(when_not_matched_insert, F.lit(False))
    )
    dele = (
        F.lit(False)
        if when_matched_delete is None
        else F.coalesce(when_matched_delete, F.lit(False))
    )
    bs_dele = (
        F.lit(False)
        if when_not_matched_by_source_delete is None
        else F.coalesce(when_not_matched_by_source_delete, F.lit(False))
    )
    keep = (
        ~(has_t & has_s & dele)
        & ~(has_s & ~has_t & ~ins)
        & ~(has_t & ~has_s & bs_dele)
    )
    take_s = (has_s & ~has_t) | (has_t & has_s & ~dele & upd)
    return j.filter(keep).select(
        *[
            F.when(take_s, F.col(f"s.{c}"))
            .otherwise(F.col(f"t.{c}"))
            .alias(c)
            for c in cols
        ]
    )


class KeyedParquetTable:
    """A keyed, mutable table on parquet — the engine's stand-in for the
    reference's Elasticsearch index (daily index + `_id` upsert,
    con.py:55-63).  Used as the target of the streaming `foreachBatch`
    sink (streaming/sinks.py)."""

    def __init__(self, spark: SparkSession, path: str, keys: Sequence[str],
                 order_cols: Sequence[str] | str,
                 partition_by: Sequence[str] = (),
                 stable_partitions: bool = False):
        self.spark = spark
        self.path = path
        self.keys = list(keys)
        self.order_cols = (
            [order_cols] if isinstance(order_cols, str) else list(order_cols)
        )
        # S6 — date-partitioned sink naming (reference daily index
        # `phantich1-YYYY.MM.DD`, con.py:58): partition dirs replace the
        # per-day index, and queries prune on the partition column.
        self.partition_by = list(partition_by)
        # Caller's promise that each key's partition values never change
        # across batches (e.g. the partition is derived from an immutable
        # attribute of the keyed entity) — enables partition-pruned MERGE
        # even when the partition columns aren't structurally in the key.
        self.stable_partitions = stable_partitions

    def _schema_path(self) -> str:
        return os.path.join(self.path, "_table_schema.json")

    def read(self) -> DataFrame | None:
        """Under PRUNED merges, partitions rewritten by a schema-widening
        batch carry the new column while untouched partitions' files
        don't — a single-footer schema pick would silently drop the new
        column from the view (and a later merge would then erase it from
        disk).  The widened schema is persisted as a sidecar at write
        time, so reads apply it in O(1) instead of a mergeSchema footer
        sweep that grows with table file count; files lacking a column
        read it as NULL — the additive widening merge_by_key documents.
        Tables written before the sidecar existed fall back to
        mergeSchema once (the next upsert writes the sidecar)."""
        if not os.path.exists(os.path.join(self.path, "_SUCCESS")):
            return None
        sp = self._schema_path()
        if os.path.exists(sp):
            import json

            from pyspark.sql.types import StructType

            with open(sp) as fh:
                schema = StructType.fromJson(json.load(fh))
            return self.spark.read.schema(schema).parquet(self.path)
        return (
            self.spark.read.option("mergeSchema", "true").parquet(self.path)
        )

    def _can_prune(self) -> bool:
        """Partition-pruned MERGE is sound only when the partition
        columns are part of the business key: then a key lives in
        exactly one partition forever, so partitions the batch does not
        touch cannot contain rows the merge would change.  (A key that
        could MOVE partitions would leave its stale row behind in the
        old partition under pruning.)  `stable_partitions=True` is the
        caller's explicit promise of the same invariant when the
        partition is derived rather than key-embedded."""
        return bool(self.partition_by) and (
            self.stable_partitions
            or set(self.partition_by) <= set(self.keys)
        )

    def _merge_changes_column_types(
        self, target: DataFrame, batch: DataFrame
    ) -> bool:
        """Plan-only probe (no job runs): does merging `batch` coerce
        any column the table already has to a different type?"""
        merged_schema = merge_by_key(
            target, batch, self.keys,
            [F.col(c).desc() for c in self.order_cols],
        ).schema
        existing = {f.name: f.dataType for f in target.schema.fields}
        return any(
            f.name in existing and f.dataType != existing[f.name]
            for f in merged_schema.fields
        )

    def upsert(self, batch: DataFrame) -> None:
        target = self.read()
        prune = target is not None and self._can_prune()
        if prune and self._merge_changes_column_types(target, batch):
            # Pruned rewrites are sound only for ADDITIVE widening.  If
            # the merge would COERCE a shared column to a different type
            # (e.g. a formerly-int column arriving as string), the
            # sidecar would no longer match the physical type inside
            # untouched partitions' old files and every later read would
            # fail on parquet conversion.  The full rewrite is immune —
            # it rewrites all files with the coerced type — so fall back
            # to it for this batch.
            prune = False
        if prune:
            # The 100 TB move: merge and rewrite ONLY the partitions
            # present in the batch (classic Delta/Iceberg MERGE file
            # pruning, expressed with parquet partition dirs + dynamic
            # partition overwrite).  Touched-partition list is bounded
            # control data — one row per partition in the batch, not
            # per record.
            touched = [
                tuple(r)
                for r in batch.select(*self.partition_by)
                .distinct()
                .collect()
            ]
            if not touched:
                return
            pred = None
            for combo in touched:
                clause = F.lit(True)
                for col, val in zip(self.partition_by, combo):
                    clause = clause & F.col(col).eqNullSafe(F.lit(val))
                pred = clause if pred is None else (pred | clause)
            # partition pruning pushes this filter into the directory
            # listing: untouched partitions are never even read
            target = target.filter(pred)
        merged = merge_by_key(
            target, batch, self.keys, [F.col(c).desc() for c in self.order_cols]
        )
        # Localize before overwrite: the read and write touch the same
        # path, so materialize through a temp location.
        tmp = self.path + "__staging"
        merged.write.mode("overwrite").parquet(tmp)
        final = self.spark.read.parquet(tmp)
        writer = final.write.mode("overwrite")
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
            if prune:
                # replace only the partition dirs present in `final`,
                # leave every other partition's files untouched
                writer = writer.option("partitionOverwriteMode", "dynamic")
        import json
        import shutil

        def write_sidecar() -> None:
            os.makedirs(self.path, exist_ok=True)
            stmp = self._schema_path() + ".tmp"
            with open(stmp, "w") as fh:
                json.dump(final.schema.jsonValue(), fh)
            os.replace(stmp, self._schema_path())

        # Sidecar/data ordering is crash-safety-critical and differs by
        # write mode.  Dynamic partition overwrite PRESERVES root-level
        # files, so the old (possibly narrower) sidecar would survive a
        # crash after the data write — hiding a widened column until the
        # next merge erased it from disk.  Refresh the sidecar FIRST
        # there: a crash in between leaves a harmlessly-wide sidecar
        # (missing columns read as NULL, the replayed batch re-merges).
        # Static overwrite WIPES the directory, sidecar included, so
        # there the sidecar can only be written after the data: a crash
        # in between leaves no sidecar at all → the mergeSchema
        # fallback, which is correct.
        if prune:
            write_sidecar()
        writer.parquet(self.path)
        if not prune:
            write_sidecar()
        # best-effort cleanup
        shutil.rmtree(tmp, ignore_errors=True)


class SnapshotKeyedTable:
    """Time-travel variant of KeyedParquetTable: every upsert commits a
    new immutable snapshot dir `v=N` instead of overwriting in place —
    MVCC on plain parquet (the read half of a Delta/Iceberg commit,
    without the transaction log).  Readers pin any retained version;
    rollback = re-pointing to an older N; concurrent readers never see a
    half-written table because a snapshot only becomes visible once its
    `_SUCCESS` marker exists.

    Scale note: each commit rewrites the full table (copy-on-write of
    every file), which is the right shape for a dimension/state table
    but NOT for a 100 TB fact table — `ManifestSnapshotTable` below is
    that shape: the same MERGE dataflow committing only changed
    partitions plus a manifest.  The merge itself still shuffles on the
    business key only."""

    def __init__(self, spark: SparkSession, path: str, keys: Sequence[str],
                 order_cols: Sequence[str] | str, keep_versions: int | None = None):
        self.spark = spark
        self.path = path
        self.keys = list(keys)
        self.order_cols = (
            [order_cols] if isinstance(order_cols, str) else list(order_cols)
        )
        self.keep_versions = keep_versions

    def _vdir(self, v: int) -> str:
        return os.path.join(self.path, f"v={v:05d}")

    def versions(self) -> list[int]:
        if not os.path.isdir(self.path):
            return []
        out = []
        for name in os.listdir(self.path):
            if name.startswith("v=") and os.path.exists(
                os.path.join(self.path, name, "_SUCCESS")
            ):
                out.append(int(name[2:]))
        return sorted(out)

    def read(self, version: int | None = None) -> DataFrame | None:
        vs = self.versions()
        if not vs:
            return None
        if version is None:
            version = vs[-1]
        if version not in vs:
            raise ValueError(f"version {version} not in {vs}")
        return self.spark.read.parquet(self._vdir(version))

    def upsert(self, batch: DataFrame) -> int:
        target = self.read()
        merged = merge_by_key(
            target, batch, self.keys, [F.col(c).desc() for c in self.order_cols]
        )
        new_v = (self.versions()[-1] + 1) if self.versions() else 1
        merged.write.mode("overwrite").parquet(self._vdir(new_v))
        if self.keep_versions is not None:
            self.vacuum()
        return new_v

    def rollback(self, version: int) -> None:
        """Drop all snapshots newer than `version` (it becomes latest)."""
        import shutil

        for v in self.versions():
            if v > version:
                shutil.rmtree(self._vdir(v), ignore_errors=True)

    def vacuum(self) -> None:
        """Retain only the newest `keep_versions` snapshots."""
        import shutil

        if self.keep_versions is None:
            return
        vs = self.versions()
        for v in vs[: max(0, len(vs) - self.keep_versions)]:
            shutil.rmtree(self._vdir(v), ignore_errors=True)


class ManifestSnapshotTable:
    """Incremental MVCC snapshots on plain parquet — the "100 TB fact
    table" shape `SnapshotKeyedTable`'s scale note names: each commit
    writes ONLY the partitions the batch touches, plus a manifest
    mapping every partition to the snapshot version that holds its
    current files.  Unchanged partitions are inherited BY REFERENCE
    (a manifest entry pointing at an older version's files), never
    copied — so copy-on-write cost tracks the batch, not the table,
    while readers still get immutable point-in-time snapshots,
    rollback, and retention.  This is the read half of a Delta/Iceberg
    commit with the manifest playing the transaction log's role.

    Layout::

        root/v=00001/data/<pcol>=<val>/part-*.parquet
        root/v=00001/manifest.json   {"partitions": {"<pcol>=<val>": 1}}
        root/v=00001/_CLAIM          (writer identity: pid/host/ts)
        root/v=00001/_SUCCESS        (commit marker, written LAST)

    Concurrency: commits use optimistic concurrency — every writer
    atomically claims its version directory (os.mkdir) BEFORE reading
    its commit basis, so two concurrent writers can never both publish
    the same version or silently drop each other's commits; the loser
    raises `CommitConflictError` and must re-run against the new basis.
    See the "commit protocol" section below.

    Soundness: pruned MERGE requires that a key can never change
    partition, so the constructor demands partition columns ⊆ keys or
    an explicit ``stable_partitions=True`` promise (same invariant as
    `KeyedParquetTable._can_prune`).  Partition values must be
    non-null scalars whose ``str()`` is filesystem-safe (the reference
    daily-index shape: one string date column).
    """

    def __init__(self, spark: SparkSession, path: str, keys: Sequence[str],
                 order_cols: Sequence[str] | str,
                 partition_by: Sequence[str],
                 stable_partitions: bool = False,
                 keep_versions: int | None = None,
                 keep_seconds: float | None = None,
                 stats_cols: Sequence[str] | None = None,
                 claim_ttl_seconds: float = 3600.0,
                 bloom_cols: Sequence[str] | None = None,
                 bloom_bits: int = 1 << 16,
                 bloom_k: int = 5,
                 constraints: dict[str, Column] | None = None,
                 generated_partitions: dict[str, str] | None = None):
        self.spark = spark
        self.path = path
        self.keys = list(keys)
        self.order_cols = (
            [order_cols] if isinstance(order_cols, str) else list(order_cols)
        )
        self.partition_by = list(partition_by)
        # Zone maps: per-fragment [min, max] envelopes for these columns
        # ride in every manifest (the Delta/Iceberg data-skipping
        # stats), maintained incrementally — each commit records
        # envelopes for the partitions it rewrote and inherits the rest
        # by reference, exactly like the data files.  Numeric / string /
        # bool columns only (envelopes are stored as JSON).
        self.stats_cols = list(stats_cols) if stats_cols else []
        if self._ROWS_KEY in self.stats_cols:
            raise ValueError(f"{self._ROWS_KEY!r} is a reserved stats key")
        # Bloom filters: per-FILE bloom bitsets over these columns ride
        # each version as a `blooms.json` sidecar (the Delta bloom-
        # filter-index shape).  They answer the skipping question zone
        # maps can't: EQUALITY on a high-cardinality column whose values
        # are scattered across every file, where each file's [min, max]
        # spans the whole domain.  `bloom_bits` is the per-file bitset
        # size (size ≈ 10 bits per expected distinct value per file for
        # ~1% false positives); `bloom_k` the hash count.  Sidecars are
        # inherited BY REFERENCE like the data files — the manifest's
        # fragment→holder map locates them, so unchanged fragments'
        # (potentially large) bitsets are never copied forward.
        self.bloom_cols = list(bloom_cols) if bloom_cols else []
        self.bloom_bits = int(bloom_bits)
        self.bloom_k = int(bloom_k)
        # CHECK constraints (Delta ADD CONSTRAINT CHECK): {name →
        # boolean Column}, enforced on every row a WRITING commit
        # produces (incoming rows AND the carried rows of rewritten
        # partitions — so a constraint added later surfaces violations
        # the next time old data is touched).  Checked in a SINGLE
        # pass via df.observe riding the write job itself — zero extra
        # scan at any table size; a violation abandons the whole
        # commit (ConstraintViolationError).  SQL semantics: FALSE
        # violates, NULL passes.  DELETE/compact paths don't check —
        # removing or relocating rows cannot introduce a violation,
        # and a GDPR erasure must never be blocked by an unrelated
        # constraint on carried data.
        self.constraints = dict(constraints) if constraints else {}
        # Generated partition columns (Delta generated columns, the
        # date-bucketed fact-table shape): {partition col → SQL expr
        # over the other columns}.  Write batches may OMIT the column
        # (it is derived) or carry it (one observe counter riding the
        # batch's first job proves every provided value equals the
        # derivation — zero extra scans, like CHECK constraints).
        # Persisted in the manifest on first write so every writer
        # handle derives identically.
        self.generated_partitions = (
            dict(generated_partitions) if generated_partitions else {}
        )
        bad_gen = sorted(
            set(self.generated_partitions) - set(partition_by)
        )
        if bad_gen:
            raise ValueError(
                f"generated_partitions must target partition columns; "
                f"{bad_gen} are not in partition_by"
            )
        if self.bloom_cols and (self.bloom_bits < 8 or self.bloom_k < 1):
            raise ValueError("need bloom_bits >= 8 and bloom_k >= 1")
        self._bloom_cache: dict[tuple[int, str], dict] = {}
        if not self.partition_by:
            raise ValueError("ManifestSnapshotTable requires partition_by")
        self.stable_partitions = stable_partitions
        if not (stable_partitions or set(self.partition_by) <= set(self.keys)):
            raise ValueError(
                "partition-pruned commits need partition columns inside the "
                "key, or stable_partitions=True (a key that moved partitions "
                "would leave its stale row behind in the old partition)"
            )
        self.keep_versions = keep_versions
        # Time-based retention (Delta's VACUUM ... RETAIN N HOURS):
        # snapshots whose commit timestamp is younger than this stay
        # readable regardless of count.  Composable with
        # keep_versions — vacuum retains the UNION of both policies
        # (and always the latest snapshot).
        self.keep_seconds = keep_seconds
        # Cross-host fallback for reclaiming a crashed writer's version
        # claim (same-host claims are judged by liveness of the
        # recorded pid, not age) — see `_claim_is_stale`.
        self.claim_ttl_seconds = claim_ttl_seconds
        # Shallow-clone base map (version → origin table root), loaded
        # lazily from any committed manifest — see `_base_map`.
        self._base_cache: dict[int, str] | None = None
        # version → commit timestamp, immutable once committed.  With
        # time-based retention, vacuum runs on every _publish and
        # needs every readable version's commit ts — without this
        # cache that is O(history) manifest-JSON parses PER COMMIT,
        # unbounded for long-lived time-retained tables.
        self._ts_cache: dict[int, float] = {}

    # -- layout helpers -------------------------------------------------
    def _vdir(self, v: int) -> str:
        return os.path.join(self.path, f"v={v:05d}")

    def _base_map(self) -> dict[int, str]:
        """version → ORIGIN table root for versions this table
        references but does not own (`clone_to` shallow clones); {}
        for ordinary tables.  Loaded from the EARLIEST readable
        manifest: external versions only enter the map at clone
        creation, and `_carry_meta` prunes entries monotonically as
        borrowed fragments are rewritten (a rewritten fragment's
        holder is local and can never point back outside), so the
        oldest retained manifest's map is a superset of every later
        one — resolving THROUGH it keeps `read(version=…)`,
        `changes()`, and `restore()` correct for earlier clone
        snapshots whose borrowed fragments the latest manifest has
        already shed.  No new version number can re-enter the map
        (the clone's local sequence starts above every mapped
        version), so the superset is safe to cache per handle."""
        if self._base_cache is None:
            vs = self.versions()
            if not vs:
                return {}
            doc = self._manifest_doc(vs[0])
            self._base_cache = {
                int(k): v for k, v in (doc.get("base") or {}).items()
            }
        return self._base_cache

    def _vdir_of(self, v: int) -> str:
        """Version dir with shallow-clone resolution: a version in the
        base map lives under its origin table's root, everything else
        is local.  Claim/write paths keep using the local `_vdir` —
        a new commit can never collide with an external version
        number because clone creation seeds the local sequence above
        them all."""
        base = self._base_map().get(v)
        return os.path.join(base, f"v={v:05d}") if base else self._vdir(v)

    def _data_dir(self, v: int) -> str:
        return os.path.join(self._vdir_of(v), "data")

    # Hive's escapePathName character set (FileUtils.charToEscape):
    # control chars plus the dir-syntax/glob/uri-special set.  Manifest
    # fragments must match the dir names Spark ACTUALLY writes, or a
    # value like '10:30' would commit fine and then wedge every read
    # with PATH_NOT_FOUND.
    _ESCAPE = {chr(i) for i in range(32)} | set('"#%\'*/:=?\\\x7f{[]^')

    @classmethod
    def _hive_escape(cls, s: str) -> str:
        return "".join(
            f"%{ord(ch):02X}" if ch in cls._ESCAPE else ch for ch in s
        )

    @staticmethod
    def _render(val) -> str:
        if isinstance(val, bool):  # Spark renders booleans lowercase
            return "true" if val else "false"
        return str(val)

    def _part_key(
        self, combo: Sequence, cols: Sequence[str] | None = None
    ) -> str:
        for val in combo:
            if val is None:
                raise ValueError("NULL partition values are not supported")
        return "/".join(
            f"{c}={self._hive_escape(self._render(v))}"
            for c, v in zip(cols or self.partition_by, combo)
        )

    def _check_scheme(self) -> None:
        """Refuse a commit from a handle whose configured partition
        scheme differs from the table's CURRENT one (after a
        `compact(partition_by=…)` partition evolution, a handle built
        with the old scheme would render fragment names that match
        nothing in the live manifest and write a divergent layout).
        Reads are unaffected — every snapshot resolves through its own
        manifest's fragment names."""
        pb = self._manifest_doc().get("partition_by")
        if pb and list(pb) != list(self.partition_by):
            raise ValueError(
                f"handle is configured with partition_by="
                f"{list(self.partition_by)} but the table's current "
                f"scheme is {list(pb)} (partition evolution happened); "
                "construct the handle with the current scheme"
            )

    # Demotion tombstone: a version dir kept on disk ONLY because a
    # retained manifest inherits some of its partition files.  A holder
    # is not a complete snapshot — its own manifest may reference
    # versions vacuum already deleted — so versions()/read()/rollback()
    # must not offer it as a readable point-in-time state.
    _HOLDER_MARKER = "_HOLDER_ONLY"

    def _is_holder(self, v: int) -> bool:
        return os.path.exists(os.path.join(self._vdir(v), self._HOLDER_MARKER))

    def _committed_dirs(self) -> list[int]:
        """Every committed version dir on disk — complete snapshots AND
        demoted holders (vacuum's sweep domain)."""
        if not os.path.isdir(self.path):
            return []
        return sorted(
            int(name[2:])
            for name in os.listdir(self.path)
            if name.startswith("v=")
            and os.path.exists(os.path.join(self.path, name, "_SUCCESS"))
        )

    def versions(self) -> list[int]:
        """Complete, readable snapshots (holder-only dirs excluded)."""
        return [v for v in self._committed_dirs() if not self._is_holder(v)]

    def _written_fragments(self, v: int) -> set[str]:
        """The partition-dir fragments actually present under a
        version's data dir (nested one level per partition column)."""
        level = [""]
        root = self._data_dir(v)
        for _ in self.partition_by:
            nxt = []
            for rel in level:
                base = os.path.join(root, rel) if rel else root
                for name in os.listdir(base):
                    if "=" in name and os.path.isdir(
                        os.path.join(base, name)
                    ):
                        nxt.append(f"{rel}/{name}" if rel else name)
            level = nxt
        return set(level)

    def _manifest_doc(self, version: int | None = None) -> dict:
        """Parsed manifest.json of a readable snapshot ({} when the
        table has no committed versions)."""
        import json

        vs = self.versions()
        if not vs:
            return {}
        if version is None:
            version = vs[-1]
        if version not in vs:
            if self._is_holder(version):
                raise ValueError(
                    f"version {version} is retained only as a data holder "
                    "for newer manifests (its own manifest may reference "
                    f"vacuumed versions); readable snapshots: {vs}"
                )
            raise ValueError(f"version {version} not in {vs}")
        with open(os.path.join(self._vdir(version), "manifest.json")) as fh:
            return json.load(fh)

    def manifest(self, version: int | None = None) -> dict[str, int]:
        """partition-dir-fragment → version holding its current files."""
        doc = self._manifest_doc(version)
        return {k: int(v) for k, v in doc.get("partitions", {}).items()}

    def fragment_stats(
        self, version: int | None = None
    ) -> dict[str, dict[str, list]]:
        """Zone maps: partition-dir-fragment → {stats_col: [min, max]}.
        Fragments committed before ``stats_cols`` was configured (or
        whose commit lacked the column) have no entry — readers must
        treat a missing envelope as unprunable."""
        return self._manifest_doc(version).get("stats", {})

    def file_stats(
        self, version: int | None = None
    ) -> dict[str, dict[str, dict[str, list]]]:
        """Per-FILE zone maps: partition-dir-fragment → {file name →
        {stats_col: [min, max]}}.  The finer tier below
        `fragment_stats`; absent for pre-file-stats commits (readers
        keep whole fragments conservatively).  Assembled from the
        per-version parquet sidecars (this accessor reads EVERY
        covered fragment — internal pruned reads fetch only
        survivors via `_file_stats_for`)."""
        return self._file_stats_for(self._manifest_doc(version))

    @staticmethod
    def _commit_info(op: str, frags: set) -> dict:
        """Per-commit operation metadata recorded in the manifest —
        the DESCRIBE HISTORY payload.  `touched` names the fragments
        this commit rewrote (or dropped); wall-clock `ts` is audit
        color, never part of any oracle-checked output."""
        import time

        return {"op": op, "touched": sorted(frags), "ts": time.time()}

    def history(self) -> DataFrame:
        """The commit log as a DataFrame — Delta's DESCRIBE HISTORY:
        one row per READABLE snapshot with its operation, touched-
        fragment count, and timestamp.  Pure manifest metadata (no
        data reads); versions committed before operation recording (or
        retained only as data holders) surface op=NULL / are absent,
        respectively, mirroring `versions()`."""
        from pyspark.sql.types import (
            DoubleType,
            IntegerType,
            StringType,
            StructField,
            StructType,
        )

        from pyspark.sql.types import LongType

        rk = self._ROWS_KEY
        rows = []
        for v in self.versions():
            doc = self._manifest_doc(v)
            info = doc.get("commit") or {}
            touched = info.get("touched")
            # live row count straight from the snapshot's FRAGMENT
            # stats (exact counts minus its dv cardinalities) — None
            # when any fragment lacks recorded counts.  Fragment tier
            # only: history never opens a file-stats sidecar
            m = doc.get("partitions", {})
            st = doc.get("stats", {})
            dvr = {
                k: int(n) for k, n in (doc.get("dv_rows") or {}).items()
            }
            n_rows: int | None = 0
            for frag in m:
                env = st.get(frag)
                if not env or rk not in env:
                    n_rows = None
                    break
                n_rows += int(env[rk]) - dvr.get(frag, 0)
            rows.append(
                (
                    v,
                    info.get("op"),
                    len(touched) if touched is not None else None,
                    n_rows,
                    float(info["ts"]) if "ts" in info else None,
                )
            )
        schema = StructType(
            [
                StructField("version", IntegerType(), False),
                StructField("op", StringType(), True),
                StructField("n_touched", IntegerType(), True),
                StructField("n_rows", LongType(), True),
                StructField("ts", DoubleType(), True),
            ]
        )
        return self.spark.createDataFrame(rows, schema)

    # -- deletion vectors -------------------------------------------------
    # Merge-on-read DELETE (Delta deletion vectors / Iceberg v3
    # position deletes): instead of rewriting a whole partition to drop
    # a few rows, a DV commit writes a tiny positional sidecar — one
    # (file, row_index) pair per doomed row — and the read path
    # anti-joins it out.  At 100 TB this is the difference between a
    # GDPR erasure costing O(deleted rows) and O(touched partitions).
    # The manifest carries ``dv`` (fragment → version holding its
    # CURRENT vector, inherited by reference exactly like data
    # fragments) and ``dv_rows`` (fragment → deleted-row count, which
    # keeps `count_rows` metadata-only).  Any commit that REWRITES a
    # fragment reads it live (vector applied) and drops its dv entry —
    # the rewrite materializes the deletes, so vectors never outlive
    # their files; `compact()` is the explicit materialize-everything
    # path.  Zone-map/bloom pruning stays sound (deletion only shrinks
    # a file's content, so recorded envelopes remain supersets), but
    # exact metadata MIN/MAX falls back to scanning dv'd fragments.
    #
    # Row addressing is (path-relative file name, parquet row index):
    # ``rel`` = the file path after its version's ``data/`` root (e.g.
    # ``day=3/part-0-xyz.parquet`` — partition values cannot fake the
    # ``/v=NNNNN/data/`` boundary because hive-escaping encodes ``/``),
    # and ``row_index`` = Spark's ``_metadata.row_index``, stable for
    # an immutable parquet file.  Addressing is version-root-relative,
    # so a relocated table keeps its vectors.
    _DV_REL = r"/v=\d{5}/data/(.*)$"

    def _dv_dir(self, v: int) -> str:
        return os.path.join(self._vdir_of(v), "dv")

    def _dv_map(self, doc: dict) -> dict[str, int]:
        return {k: int(v) for k, v in (doc.get("dv") or {}).items()}

    def _fstats_versions(self, doc: dict) -> set[int]:
        return {int(v) for v in (doc.get("fstats_v") or {}).values()}

    def _carry_meta(
        self, doc: dict, prev_doc: dict, rewritten: set[str] | None = None
    ) -> None:
        """Inherit version-independent table metadata (persisted CHECK
        constraints + the declared logical schema + initial defaults +
        the shallow-clone base map) into a new commit's manifest —
        every commit path calls this, so declared contracts survive
        any rewrite.  Writing paths overwrite the carried schema
        afterwards with the schema of the frame they actually wrote
        (which equals the carried one unless the commit evolved it).

        ``rewritten``: the fragments this commit rewrote — base-map
        entries are pruned to versions the NEW manifest can still
        reference (its partition holders plus the deletion vectors
        that survive the rewrite), so a clone that has rewritten every
        borrowed fragment (e.g. via ``compact``) sheds its last source
        reference and stops depending on the source's retention."""
        cons = prev_doc.get("constraints")
        if cons:
            doc["constraints"] = dict(cons)
        sch = prev_doc.get("schema")
        if sch:
            doc["schema"] = [list(e) for e in sch]
        dfl = prev_doc.get("defaults")
        if dfl:
            doc["defaults"] = dict(dfl)
        gen = prev_doc.get("generated")
        if gen:
            doc["generated"] = dict(gen)
        dropped = prev_doc.get("dropped_columns")
        if dropped:
            doc["dropped_columns"] = list(dropped)
        base = prev_doc.get("base")
        if base:
            rw = rewritten or set()
            keep = (
                {int(h) for h in doc.get("partitions", {}).values()}
                | {
                    v
                    for f, v in self._dv_map(prev_doc).items()
                    if f not in rw
                }
                | {
                    int(v)
                    for f, v in (prev_doc.get("fstats_v") or {}).items()
                    if f not in rw
                }
            )
            kept = {k: v for k, v in base.items() if int(k) in keep}
            if kept:
                doc["base"] = kept

    # -- logical schema (schema evolution) --------------------------------
    # The manifest's `schema` entry is the table's DECLARED column list
    # ([name, Spark DDL type] pairs, in order) — the Delta/Iceberg
    # metadata-schema role: data files written before an `add_column` /
    # `widen_column` / evolving-upsert commit simply lack the column (or
    # carry the narrower type), and every read path aligns them — NULL
    # for missing columns, a lossless cast for widened ones — so old
    # files are NEVER rewritten for a schema change (metadata-only DDL,
    # the only affordable shape at 100 TB).
    _META_COLS = ("__rel", "__ri")
    _INT_WIDTH = {"tinyint": 0, "smallint": 1, "int": 2, "bigint": 3}

    @classmethod
    def _frame_schema(cls, df: DataFrame) -> list[list[str]]:
        return [
            [f.name, f.dataType.simpleString()]
            for f in df.schema.fields
            if f.name not in cls._META_COLS
        ]

    def table_schema(
        self, version: int | None = None
    ) -> list[tuple[str, str]] | None:
        """The declared logical schema at a snapshot as ordered
        ``(name, DDL type)`` pairs — None for tables whose commits
        predate schema recording (their reads stay purely physical)."""
        sch = self._manifest_doc(version).get("schema")
        return [tuple(e) for e in sch] if sch else None

    @staticmethod
    def _dec_params(t: str) -> tuple[int, int] | None:
        import re

        m = re.fullmatch(r"decimal\((\d+),(\d+)\)", t)
        return (int(m.group(1)), int(m.group(2))) if m else None

    @classmethod
    def _widens(cls, frm: str, to: str) -> bool:
        """True when ``frm`` → ``to`` is a STRICT lossless widening —
        the only type changes a metadata-only evolution can declare
        (anything else would reinterpret bytes already on disk):
        tinyint<smallint<int<bigint, float<double, and decimal growth
        that shrinks neither scale nor integer digits."""
        if frm == to:
            return False
        iw = cls._INT_WIDTH
        if frm in iw and to in iw:
            return iw[to] > iw[frm]
        if frm == "float" and to == "double":
            return True
        d0, d1 = cls._dec_params(frm), cls._dec_params(to)
        if d0 and d1:
            (p0, s0), (p1, s1) = d0, d1
            return s1 >= s0 and (p1 - s1) >= (p0 - s0)
        return False

    def _normalize_type(self, ddl: str) -> str:
        """Parse a DDL type string through Spark and return its
        canonical ``simpleString`` (also validates it)."""
        probe = self.spark.range(0).select(F.lit(None).cast(ddl))
        return probe.schema.fields[0].dataType.simpleString()

    def _align_schema(
        self, df: DataFrame | None, doc: dict | None
    ) -> DataFrame | None:
        """Align a physical scan to the manifest's declared schema:
        columns a file predates read as typed NULLs (or the column's
        declared INITIAL DEFAULT, Iceberg-style), columns committed
        narrower than a later widening are cast up, and column order
        follows the declaration.  A no-op (the same frame, no extra
        Project) when the physical schema already matches, so
        pre-evolution tables and hot paths pay nothing."""
        sch = (doc or {}).get("schema")
        if df is None or not sch:
            return df
        have = dict(df.dtypes)
        names = [c for c in df.columns if c not in self._META_COLS]
        if names == [n for n, _t in sch] and all(
            have[n] == t for n, t in sch
        ):
            return df
        defaults = (doc or {}).get("defaults") or {}
        cols: list[Column] = []
        for n, t in sch:
            if n not in have:
                fill = defaults.get(n)
                cols.append(F.lit(fill).cast(t).alias(n))
            elif have[n] == t:
                cols.append(F.col(n))
            else:
                cols.append(F.col(n).cast(t).alias(n))
        cols += [F.col(h) for h in self._META_COLS if h in df.columns]
        return df.select(*cols)

    def _carry_dv(
        self, doc: dict, prev_doc: dict, rewritten: set[str]
    ) -> None:
        """Inherit deletion vectors for fragments this commit did NOT
        rewrite.  A rewritten fragment was read LIVE (vector applied),
        so its deletes are materialized into the new files — its vector
        is dropped with the old files, never carried forward."""
        dv = {
            f: v
            for f, v in self._dv_map(prev_doc).items()
            if f not in rewritten
        }
        if dv:
            doc["dv"] = dv
            doc["dv_rows"] = {
                f: int(n)
                for f, n in (prev_doc.get("dv_rows") or {}).items()
                if f not in rewritten
            }

    def _inherit_stats(
        self, doc: dict, prev_doc: dict, rewritten: set[str], new_v: int,
        vdir: str,
    ) -> None:
        """Zone-map commit discipline shared by every writing path:
        fresh fragment/file envelopes for the partitions this commit
        rewrote, everything else inherited by reference from the basis
        manifest — exactly like the data files.  No-op when the table
        has no ``stats_cols``.

        FRAGMENT envelopes stay in the manifest JSON (O(partitions) —
        fine at any scale).  FILE envelopes are SHARDED out of the
        manifest (VERDICT r10 item 5): each commit writes only the
        rows for the fragments it rewrote into its own
        ``filestats.parquet`` sidecar (the Iceberg manifest-file
        shape), and the manifest carries just ``fstats_v``
        {fragment → sidecar-holder version} — so per-commit metadata
        cost tracks the TOUCHED fragments, and pruned reads fetch
        file stats only for surviving fragments via a
        fragment-filtered pyarrow read."""
        if not self.stats_cols:
            return
        new_fs, new_ffs = self._compute_stats_both(new_v)
        stats = {
            f: s
            for f, s in prev_doc.get("stats", {}).items()
            if f not in rewritten
        }
        stats.update(new_fs)
        doc["stats"] = stats
        fsv = {
            f: int(v)
            for f, v in (prev_doc.get("fstats_v") or {}).items()
            if f not in rewritten
        }
        if new_ffs:
            self._write_fstats_sidecar(vdir, new_ffs)
            for f in new_ffs:
                fsv[f] = new_v
        if fsv:
            doc["fstats_v"] = fsv

    # -- file-stats sidecar ------------------------------------------------
    # Per-version parquet shard of the per-FILE zone maps: one row per
    # (fragment, file) with typed mn_/mx_ envelope columns and the
    # exact row count.  Written driver-side (bounded control data —
    # exactly what the stats collect already holds), read driver-side
    # through pyarrow with a fragment filter, so metadata read cost
    # tracks the fragments a read actually keeps, not the table's
    # total file count — the property that keeps 10^5-10^6-file
    # tables (true 100 TB cardinality) off the driver's heap.
    _FSTATS_SIDECAR = "filestats.parquet"

    def _write_fstats_sidecar(
        self, vdir: str, file_stats: dict[str, dict[str, dict]]
    ) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        rk = self._ROWS_KEY
        cols = sorted(
            {
                c
                for fdoc in file_stats.values()
                for envs in fdoc.values()
                for c in envs
                if c != rk
            }
        )
        rows: dict[str, list] = {"frag": [], "file": [], "nrows": []}
        for c in cols:
            rows[f"mn_{c}"] = []
            rows[f"mx_{c}"] = []
        for frag in sorted(file_stats):
            for fname in sorted(file_stats[frag]):
                envs = file_stats[frag][fname]
                rows["frag"].append(frag)
                rows["file"].append(fname)
                rows["nrows"].append(
                    int(envs[rk]) if rk in envs else None
                )
                for c in cols:
                    mn, mx = envs.get(c) or [None, None]
                    rows[f"mn_{c}"].append(mn)
                    rows[f"mx_{c}"].append(mx)
        pq.write_table(
            pa.table(rows),
            os.path.join(vdir, self._FSTATS_SIDECAR),
            # fragment-sorted row groups small enough that a
            # frag-filtered read skips the others on row-group stats
            row_group_size=4096,
        )

    def _read_fstats_sidecar(
        self, v: int, frags: Sequence[str] | None
    ) -> dict[str, dict[str, dict]]:
        import pyarrow.dataset as ds

        path = os.path.join(self._vdir_of(v), self._FSTATS_SIDECAR)
        if not os.path.exists(path):
            return {}
        dataset = ds.dataset(path, format="parquet")
        flt = (
            ds.field("frag").isin(list(frags))
            if frags is not None
            else None
        )
        tbl = dataset.to_table(filter=flt)
        rk = self._ROWS_KEY
        names = tbl.column_names
        cols = sorted(
            n[3:] for n in names if n.startswith("mn_")
        )
        out: dict[str, dict[str, dict]] = {}
        data = tbl.to_pydict()
        for i in range(tbl.num_rows):
            envs: dict = {}
            if data["nrows"][i] is not None:
                envs[rk] = int(data["nrows"][i])
            for c in cols:
                envs[c] = [data[f"mn_{c}"][i], data[f"mx_{c}"][i]]
            out.setdefault(data["frag"][i], {})[data["file"][i]] = envs
        return out

    def _file_stats_for(
        self, doc: dict, frags: Sequence[str] | None = None
    ) -> dict[str, dict[str, dict]]:
        """Per-FILE zone maps for ``frags`` (default: every fragment
        the doc covers), resolved through the doc's ``fstats_v``
        sidecar map — only the sidecars holding surviving fragments
        are opened, each with a fragment filter.  Docs from before the
        sidecar split may still carry inline ``file_stats``; honored
        as-is."""
        inline = doc.get("file_stats")
        if inline:
            if frags is None:
                return inline
            return {f: inline[f] for f in frags if f in inline}
        fsv = {
            f: int(v) for f, v in (doc.get("fstats_v") or {}).items()
        }
        want = list(fsv) if frags is None else [f for f in frags if f in fsv]
        by_v: dict[int, list[str]] = {}
        for f in want:
            by_v.setdefault(fsv[f], []).append(f)
        out: dict[str, dict[str, dict]] = {}
        for v, fl in sorted(by_v.items()):
            out.update(self._read_fstats_sidecar(v, fl))
        return out

    def _read_dv(self, dv_map: dict[str, int]) -> DataFrame | None:
        """The doomed-row table for ``dv_map`` (fragment → dv holder
        version): columns (frag, rel, row_index), one scan per holder
        version filtered to the fragments it currently serves."""
        if not dv_map:
            return None
        by_version: dict[int, list[str]] = {}
        for frag, v in dv_map.items():
            by_version.setdefault(v, []).append(frag)
        out = None
        for v, frags in sorted(by_version.items()):
            df = self.spark.read.parquet(self._dv_dir(v)).filter(
                F.col("frag").isin(frags)
            )
            out = df if out is None else out.unionByName(df)
        return out

    def _apply_dv(
        self, df: DataFrame | None, dv_map: dict[str, int]
    ) -> DataFrame | None:
        """Anti-join a scan (which carried ``__rel``/``__ri`` metadata
        columns — see `_scan_version`) against the deletion vectors,
        dropping the helper columns.  No broadcast hint: vectors are
        tiny by design (DV deletes are the small-scattered-erasure
        path; mass deletes belong to copy-on-write `delete`), so AQE
        broadcasts them, but a pathologically large vector must degrade
        to a shuffle join rather than OOM the driver."""
        if df is None:
            return None
        if not dv_map or "__rel" not in df.columns:
            return df.drop("__rel", "__ri")
        doomed = self._read_dv(dv_map).select(
            F.col("rel").alias("__rel"),
            F.col("row_index").alias("__ri"),
        )
        return df.join(doomed, ["__rel", "__ri"], "left_anti").drop(
            "__rel", "__ri"
        )

    def _scan_entries_dv(
        self,
        entries: list[tuple[str, int, str]],
        dv: dict[str, int],
        align: dict | None = None,
    ) -> DataFrame | None:
        """Scan ``entries`` = [(fragment, holder version, path)] with
        the merge-on-read tax applied ONLY to vectored fragments'
        paths: clean fragments scan without address columns and never
        enter the anti-join, so the tax tracks the vectored data, not
        the read.  Shared by the pruned read paths.

        ``align``: manifest doc whose declared schema each PER-VERSION
        scan is aligned to BEFORE any union — alignment must happen at
        this level because the union's own missing-column handling
        NULL-fills, which would override a declared initial default."""
        clean: dict[int, list[str]] = {}
        vectored: dict[int, list[str]] = {}
        for frag, v, path in entries:
            tgt = vectored if frag in dv else clean
            tgt.setdefault(v, []).append(path)

        def _union(by_version, with_pos):
            out = None
            for v, paths in sorted(by_version.items()):
                df = self._align_schema(
                    self._scan_version(v, paths, with_pos), align
                )
                out = (
                    df
                    if out is None
                    else out.unionByName(df, allowMissingColumns=True)
                )
            return out

        plain = _union(clean, False)
        tagged = _union(vectored, True)
        if tagged is not None:
            tagged = self._apply_dv(tagged, dv)
        if plain is None:
            return tagged
        if tagged is None:
            return plain
        return plain.unionByName(tagged, allowMissingColumns=True)

    def _scan_version(
        self, v: int, paths: list[str], with_pos: bool
    ) -> DataFrame:
        """One holder-version scan; ``with_pos`` appends the DV row
        address (``__rel``, ``__ri``) from the scan's metadata column
        (it must be derived BEFORE any union — ``_metadata`` only
        resolves on the file-scan relation)."""
        df = self.spark.read.option("basePath", self._data_dir(v)).parquet(
            *sorted(paths)
        )
        if with_pos:
            df = df.select(
                "*",
                F.regexp_extract(
                    F.col("_metadata.file_path"), self._DV_REL, 1
                ).alias("__rel"),
                F.col("_metadata.row_index").alias("__ri"),
            )
        return df

    # -- read -----------------------------------------------------------
    def _read_fragments(
        self,
        frag_to_version: dict[str, int],
        dv: dict[str, int] | None = None,
        keep_pos: bool = False,
        align: dict | None = None,
    ) -> DataFrame | None:
        """Resolve fragment→holder-version mappings into one DataFrame:
        one scan per holding version (basePath keeps hive partition
        inference working across the per-version data roots), versions
        unioned by name so schema may evolve across commits.

        ``dv``: deletion-vector map (fragment → dv holder version) from
        the SAME pinned manifest doc as ``frag_to_version`` — doomed
        rows are anti-joined out, so callers see live content.
        ``keep_pos``: retain the ``__rel``/``__ri`` address columns on
        the result (the DV build path needs them).
        ``align``: manifest doc whose declared schema each PER-VERSION
        scan is aligned to BEFORE the cross-version union — it must
        happen per scan, not after, because the union's own
        missing-column handling NULL-fills, which would override a
        declared initial default."""
        dv = {
            f: v for f, v in (dv or {}).items() if f in frag_to_version
        }
        # the anti-join (and its per-row address derivation) applies
        # ONLY to the vectored fragments' scans — reads of clean
        # fragments pay zero merge-on-read tax, so the tax tracks the
        # VECTORED data, not the table
        clean: dict[int, list[str]] = {}
        vectored: dict[int, list[str]] = {}
        for frag, v in frag_to_version.items():
            tgt = vectored if (frag in dv or keep_pos) else clean
            tgt.setdefault(v, []).append(
                os.path.join(self._data_dir(v), frag)
            )

        def _union(by_version, with_pos):
            out = None
            for v, paths in sorted(by_version.items()):
                df = self._align_schema(
                    self._scan_version(v, paths, with_pos), align
                )
                out = (
                    df
                    if out is None
                    else out.unionByName(df, allowMissingColumns=True)
                )
            return out

        plain = _union(clean, False)
        tagged = _union(vectored, True)
        if tagged is not None and dv:
            doomed = self._read_dv(dv).select(
                F.col("rel").alias("__rel"),
                F.col("row_index").alias("__ri"),
            )
            tagged = tagged.join(doomed, ["__rel", "__ri"], "left_anti")
        if tagged is not None and not keep_pos:
            tagged = tagged.drop("__rel", "__ri")
        if plain is None:
            return tagged
        if tagged is None:
            return plain
        return plain.unionByName(tagged, allowMissingColumns=True)

    def read(self, version: int | None = None) -> DataFrame | None:
        doc = self._manifest_doc(version)
        m = {k: int(v) for k, v in doc.get("partitions", {}).items()}
        if not m:
            return None
        return self._read_fragments(m, dv=self._dv_map(doc), align=doc)

    def version_as_of(self, ts: float) -> int:
        """Resolve a wall-clock timestamp to the snapshot that was
        current then — Delta's ``TIMESTAMP AS OF``: the newest readable
        version whose recorded commit timestamp is <= ``ts``.  Commit
        timestamps ride the manifest's history metadata
        (`_commit_info`); versions with no recorded timestamp
        (pre-history commits) resolve conservatively as "always
        existed".  Raises if ``ts`` predates the first commit, and
        refuses vacuumed history the same way `read(version=...)` does
        (a demoted holder is not a readable snapshot)."""
        best = None
        for v in self.versions():
            info = self._manifest_doc(v).get("commit") or {}
            cts = info.get("ts")
            if cts is None or float(cts) <= ts:
                best = v
        if best is None:
            raise ValueError(
                f"no readable snapshot existed at timestamp {ts} "
                "(or its history was vacuumed)"
            )
        return best

    def read_as_of(self, ts: float) -> DataFrame | None:
        """Time travel by timestamp: `read` of `version_as_of(ts)`."""
        return self.read(self.version_as_of(ts))

    def delete_auto(
        self, keys: DataFrame, dv_max_fraction: float = 0.1
    ) -> int:
        """Keyed DELETE that picks its physical strategy from manifest
        metadata — the Delta-style auto mode: when the batch's key
        count is a small fraction (< ``dv_max_fraction``) of the
        touched partitions' LIVE rows, erase via deletion vectors
        (`delete_dv`: sidecars only, no rewrite); otherwise
        copy-on-write (`delete`: rewrite amortizes better and leaves no
        read tax).  The estimate is metadata-only: one bounded count of
        the (distinct) key batch against per-fragment row counts and
        vector cardinalities already in the manifest — fragments
        without recorded counts make the estimate conservative (assume
        large, prefer rewrite).  Requires partition columns ⊆ keys (the
        constructor's default regime) so the touched set comes from the
        batch alone."""
        if not 0 < dv_max_fraction <= 1:
            raise ValueError("dv_max_fraction must be in (0, 1]")
        if not set(self.partition_by) <= set(self.keys):
            # without batch-side partition locating, the estimate would
            # need a table scan — the caller should choose explicitly
            return self.delete(keys)
        doc = self._manifest_doc()
        prev = {
            k: int(v) for k, v in doc.get("partitions", {}).items()
        }
        if not prev:
            vs = self.versions()
            return vs[-1] if vs else 0
        kd = keys.select(*self.keys).distinct()
        touched = [
            tuple(r)
            for r in kd.select(*self.partition_by).distinct().collect()
        ]
        frags = {self._part_key(c) for c in touched} & set(prev)
        if not frags:
            return self.versions()[-1]
        st = doc.get("stats", {})
        dvr = {k: int(v) for k, v in (doc.get("dv_rows") or {}).items()}
        rk = self._ROWS_KEY
        live = 0
        for f in frags:
            env = st.get(f)
            if not env or rk not in env:
                # unknown size: conservative — rewrite
                return self.delete(keys)
            live += int(env[rk]) - dvr.get(f, 0)
        n_keys = kd.count()
        if live > 0 and n_keys / live < dv_max_fraction:
            return self.delete_dv(keys)
        return self.delete(keys)

    def read_where(
        self, col: str, lo, hi, version: int | None = None
    ) -> tuple[DataFrame | None, int, int, int, int]:
        """Single-column form of `read_where_all` — see there."""
        return self.read_where_all([(col, lo, hi)], version)

    @staticmethod
    def _envelopes_intersect(envs: dict | None, conds) -> bool:
        """True unless SOME condition's recorded envelope proves the
        range empty.  Missing/partial envelopes are unprunable —
        pruning is an optimization, never a filter."""
        for col, lo, hi in conds:
            env = (envs or {}).get(col)
            if env is None or env[0] is None or env[1] is None:
                continue
            if env[1] < lo or env[0] > hi:
                return False
        return True

    def read_where_all(
        self, conds: Sequence[tuple], version: int | None = None
    ) -> tuple[DataFrame | None, int, int, int, int]:
        """Zone-map-pruned range read over a CONJUNCTION of ranges
        (``conds`` = [(col, lo, hi), ...], all inclusive), two tiers of
        data skipping on metadata alone: (1) drop every FRAGMENT whose
        recorded [min, max] envelope for ANY condition's column misses
        its range; (2) inside surviving fragments, drop every FILE the
        same way — which pays once ``compact(cluster_by=[...])`` has
        laid files out over disjoint ranges.  Anything without a
        recorded envelope (fragments or files from pre-``stats_cols``
        commits, or a column absent from that commit's schema) is kept
        conservatively.  The survivors are scanned and the exact
        AND-of-ranges predicate applied.

        This is manifest-level data skipping on non-partition columns —
        at fact-table scale the difference between scanning 2 daily
        partitions and 2000 — complementing the hive-path partition
        pruning read() already gets for ``partition_by`` columns.
        Returns ``(frame, fragments_kept, fragments_total, files_kept,
        files_total)``; frame is None on an empty table.  File counts
        cover the SURVIVING fragments (the denominator pruning tier 2
        works against).
        """
        conds = [tuple(c) for c in conds]
        if not conds:
            raise ValueError("read_where_all needs at least one condition")
        # ONE pinned manifest read: partitions, fragment stats and file
        # stats all come from the same doc — resolving them separately
        # could pair a new commit's envelopes with the old fragment map
        # when a writer lands between the reads, making pruning lossy
        # instead of a pure optimization
        doc = self._manifest_doc(version)
        m = {k: int(v) for k, v in doc.get("partitions", {}).items()}
        if not m:
            return None, 0, 0, 0, 0
        frame, frags_kept, files_kept, files_total = (
            self._pruned_fragment_read(doc, m, conds)
        )
        if frame is None:
            # everything pruned: an empty frame with the table schema
            return (
                self._read_fragments(m, align=doc).filter(
                    F.lit(False)
                ),
                frags_kept,
                len(m),
                files_kept,
                files_total,
            )
        return frame, frags_kept, len(m), files_kept, files_total

    def _pruned_fragment_read(
        self, doc: dict, frag_map: dict[str, int], conds: Sequence[tuple]
    ) -> tuple[DataFrame | None, int, int, int]:
        """Two-tier zone-map pruning + scan of ``frag_map`` (fragment →
        holder version), with both stats tiers read from the PINNED
        manifest ``doc``, and the exact AND-of-ranges predicate applied
        to the survivors (pruning is an optimization, never a filter).
        Shared by `read_where_all` and the range-filtered change feed
        (`changes`/`tail_changes` ``where=``).  Returns ``(frame,
        fragments_kept, files_kept, files_total)``; frame is None when
        ``frag_map`` is empty or everything was pruned; files_total
        counts files in surviving fragments only."""
        st = doc.get("stats", {})
        keep: dict[str, int] = {}
        for frag, v in frag_map.items():
            if self._envelopes_intersect(st.get(frag), conds):
                keep[frag] = v
        pred = None
        for col, lo, hi in conds:
            c = (F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi))
            pred = c if pred is None else pred & c
        if not keep:
            return None, 0, 0, 0
        # tier 2: file-level skipping inside the surviving fragments —
        # file envelopes fetched ONLY for survivors, via the
        # fragment-filtered sidecar read (metadata cost tracks what
        # tier 1 kept, not the table's file count)
        fst = self._file_stats_for(doc, list(keep))
        files_total = files_kept = 0
        entries: list[tuple[str, int, str]] = []
        for frag, v in keep.items():
            frag_dir = os.path.join(self._data_dir(v), frag)
            fdoc = fst.get(frag)
            if not fdoc:
                # no per-file envelopes: whole fragment, conservatively
                n = sum(
                    1
                    for name in os.listdir(frag_dir)
                    if name.endswith(".parquet")
                )
                files_total += n
                files_kept += n
                entries.append((frag, v, frag_dir))
                continue
            files_total += len(fdoc)
            for fname, envs in sorted(fdoc.items()):
                if self._envelopes_intersect(envs, conds):
                    files_kept += 1
                    entries.append(
                        (frag, v, os.path.join(frag_dir, fname))
                    )
        if not entries:
            return None, len(keep), 0, files_total
        dv = {f: v for f, v in self._dv_map(doc).items() if f in keep}
        out = self._scan_entries_dv(entries, dv, align=doc)
        return out.filter(pred), len(keep), files_kept, files_total

    # Reserved key inside stats envelopes: exact per-file / per-fragment
    # row counts, recorded next to the [min, max] envelopes so COUNT(*)
    # can be served from the manifest alone (Iceberg's metadata-only
    # scan).  Not a legal bare SQL identifier, so it cannot collide with
    # a real stats column (the constructor refuses it anyway).
    _ROWS_KEY = "#rows"

    def _compute_stats_both(
        self, new_v: int
    ) -> tuple[dict, dict]:
        """Zone maps for the files just written under ``new_v``, BOTH
        tiers from ONE stats-column read: per-file [min, max] envelopes
        for ``stats_cols`` (one aggregate row per data file — bounded
        control data), with the per-fragment envelopes folded from them
        in plain Python (min of file-mins / max of file-maxes, NULLs
        ignored like the SQL aggregates would).  Every envelope also
        carries the exact row count under the reserved ``#rows`` key
        (both tiers), which is what serves `count_rows` without
        touching data.  Returns ``(fragment_stats, file_stats)``.
        Columns absent from this commit's schema get no envelope, and a
        commit that wrote no data files at all (a delete that emptied
        every touched partition) gets empty stats — readers keep
        envelope-less entries conservatively."""
        if not self.stats_cols:
            return {}, {}
        data_dir = self._data_dir(new_v)
        has_files = any(
            name.endswith(".parquet")
            for _dir, _subdirs, names in os.walk(data_dir)
            for name in names
        )
        if not has_files:
            return {}, {}
        df = self.spark.read.option("basePath", data_dir).parquet(data_dir)
        return self._stats_over(df)

    def _stats_over(self, df: DataFrame) -> tuple[dict, dict]:
        """One stats-column pass over a file scan → both zone-map
        tiers (shared by the write-path `_compute_stats_both` and the
        no-rewrite `backfill_stats`).  One aggregate row per data file
        — bounded control data."""
        present = [c for c in self.stats_cols if c in df.columns]
        aggs = [F.count(F.lit(1)).alias("__nr")]
        for c in present:
            aggs.append(F.min(c).alias(f"mn_{c}"))
            aggs.append(F.max(c).alias(f"mx_{c}"))
        grouped = df.groupBy(
            F.col("_metadata.file_path").alias("__fp"), *self.partition_by
        ).agg(*aggs)
        rk = self._ROWS_KEY
        file_stats: dict[str, dict[str, dict[str, list]]] = {}
        frag_stats: dict[str, dict[str, list]] = {}
        for r in grouped.collect():
            d = r.asDict()
            frag = self._part_key([d[c] for c in self.partition_by])
            fname = os.path.basename(d["__fp"])
            fenv = {c: [d[f"mn_{c}"], d[f"mx_{c}"]] for c in present}
            fenv[rk] = int(d["__nr"])
            file_stats.setdefault(frag, {})[fname] = fenv
            env = frag_stats.setdefault(
                frag, {c: [None, None] for c in present} | {rk: 0}
            )
            env[rk] += int(d["__nr"])
            for c in present:
                mn, mx = d[f"mn_{c}"], d[f"mx_{c}"]
                if mn is not None and (env[c][0] is None or mn < env[c][0]):
                    env[c][0] = mn
                if mx is not None and (env[c][1] is None or mx > env[c][1]):
                    env[c][1] = mx
        return frag_stats, file_stats

    # -- bloom filters (per-file equality skipping) -----------------------
    # Zone maps prune RANGES; they are blind to equality probes on a
    # high-cardinality column whose values round-robin across files
    # (every file's [min, max] spans the domain).  Per-file bloom
    # bitsets close that gap — Delta's bloom filter index — letting a
    # point lookup on a non-partition, non-clustered key open ~1 file
    # instead of every file in the fragment.  Hashing is double-hash-
    # free: position_i = pmod(xxhash64(cast(col as string), i), m),
    # computed by the ENGINE on both the build and the probe side (the
    # probe evaluates the same expression over a 1-row frame), so there
    # is no cross-language hash-compatibility trap.  NULLs are never
    # added and cannot be probed (use IS NULL scans for that).
    _BLOOM_DOC = "blooms.json"  # legacy monolithic doc (read-only)
    _BLOOM_SIDECAR = "blooms.parquet"

    def _compute_blooms(self, new_v: int) -> dict:
        """Bloom sidecar content for the files just written under
        ``new_v``: {fragment → {file → {col → {"m", "k", "bits"}}}}.
        One engine-side job, fully distributed: per row, k candidate
        bit positions per bloom column, chunked into (64-bit word
        index, bit mask) pairs, folded with a map-side-combining
        ``bit_or`` per (file, column, word) — the shuffle carries at
        most min(rows·k, m/64) WORDS per (file, column) — and
        assembled into the final byte arrays by an Arrow-grouped
        ``applyInPandas`` per (file, column), so the driver collects
        exactly ONE binary bitset row per file-column (m/8 bytes each)
        regardless of row count or bitset occupancy.  (Both collapses
        are load-bearing at scale: a position-set collect blew the
        driver at 100M rows, and even word rows carry the file-path
        string ~130 bytes each — 2 GB at 16M occupied words.)"""
        if not self.bloom_cols:
            return {}
        data_dir = self._data_dir(new_v)
        has_files = any(
            name.endswith(".parquet")
            for _dir, _subdirs, names in os.walk(data_dir)
            for name in names
        )
        if not has_files:
            return {}
        df = self.spark.read.option("basePath", data_dir).parquet(data_dir)
        present = [c for c in self.bloom_cols if c in df.columns]
        if not present:
            return {}
        m, k = self.bloom_bits, self.bloom_k
        nwords = (m + 63) // 64
        entries = []
        for c in present:
            qc = f"`{c}`"
            for i in range(k):
                pos = f"pmod(xxhash64(cast({qc} as string), {i}), {m})"
                entries.append(
                    F.expr(
                        "CASE WHEN cast({qc} as string) IS NOT NULL THEN "
                        "named_struct("
                        "'c', '{c}', "
                        "'w', CAST({pos} DIV 64 AS LONG), "
                        "'b', shiftleft(CAST(1 AS LONG), "
                        "CAST(pmod({pos}, 64) AS INT))"
                        ") END".format(qc=qc, c=c, pos=pos)
                    )
                )
        words = (
            df.select(
                F.col("_metadata.file_path").alias("__fp"),
                *self.partition_by,
                F.explode(F.array(*entries)).alias("e"),
            )
            .filter(F.col("e.c").isNotNull())
            .groupBy(
                "__fp",
                *self.partition_by,
                F.col("e.c").alias("__c"),
                F.col("e.w").alias("__w"),
            )
            .agg(F.bit_or(F.col("e.b")).alias("__b"))
        )
        from pyspark.sql.types import BinaryType, StructField, StructType

        key_fields = [
            f
            for f in words.schema.fields
            if f.name not in ("__w", "__b")
        ]
        key_names = [f.name for f in key_fields]
        out_schema = StructType(
            list(key_fields) + [StructField("__bits", BinaryType())]
        )
        nbytes = (m + 7) // 8
        nw = nwords

        def _assemble(pdf):
            # executors only; numpy/pandas imported in the worker.
            # little-endian words give exactly the byte/bit layout the
            # probe tests: bit p lives at byte p>>3, bit p&7
            import numpy as np

            arr = np.zeros(nw, dtype=np.uint64)
            idx = pdf["__w"].to_numpy()
            # per-word rows are already bit_or-folded: indices unique,
            # fancy-indexed |= is safe
            arr[idx] |= (
                pdf["__b"].to_numpy().astype(np.int64).view(np.uint64)
            )
            head = pdf.iloc[[0]][key_names].copy()
            head["__bits"] = [arr.astype("<u8").tobytes()[:nbytes]]
            return head

        bits_df = words.groupBy("__fp", *self.partition_by, "__c").applyInPandas(
            _assemble, out_schema
        )
        out: dict[str, dict[str, dict[str, dict]]] = {}
        # one row per (file, bloom column): m/8 bytes each — the only
        # driver-side payload
        for r in bits_df.collect():
            d = r.asDict()
            frag = self._part_key([d[c] for c in self.partition_by])
            fname = os.path.basename(d["__fp"])
            out.setdefault(frag, {}).setdefault(fname, {})[d["__c"]] = {
                "m": m,
                "k": k,
                "bits": bytes(d["__bits"]),
            }
        return out

    def _write_blooms(self, new_v: int, vdir: str) -> None:
        """Write the version's bloom sidecar (no-op without bloom_cols
        or data files) as PARQUET rows (frag, file, col, m, k, bits) —
        fragment-filterable, so a point probe reads only the surviving
        fragments' bitsets instead of parsing a monolithic JSON doc
        (the 10^5-file metadata bottleneck, VERDICT r10 item 5).
        Sidecars live NEXT TO the files they describe and are resolved
        through the manifest's fragment→holder map, so inherited
        fragments reuse the holder's sidecar by reference — nothing is
        copied forward on unrelated commits, and vacuum's holder
        demotion keeps sidecars alive exactly as long as the files."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        blooms = self._compute_blooms(new_v)
        if not blooms:
            return
        rows: dict[str, list] = {
            "frag": [], "file": [], "col": [], "m": [], "k": [],
            "bits": [],
        }
        for frag in sorted(blooms):
            for fname in sorted(blooms[frag]):
                for c, e in sorted(blooms[frag][fname].items()):
                    rows["frag"].append(frag)
                    rows["file"].append(fname)
                    rows["col"].append(c)
                    rows["m"].append(int(e["m"]))
                    rows["k"].append(int(e["k"]))
                    rows["bits"].append(e["bits"])
        pq.write_table(
            pa.table(rows),
            os.path.join(vdir, self._BLOOM_SIDECAR),
            row_group_size=1024,
        )

    def _bloom_frags(
        self, v: int, frags: Sequence[str]
    ) -> dict[str, dict]:
        """{fragment → {file → {col → entry}}} for the REQUESTED
        fragments of one holder version: a fragment-filtered pyarrow
        read of the parquet sidecar, cached per (version, fragment) —
        version dirs are immutable once committed.  Falls back to the
        legacy monolithic ``blooms.json`` when present; {} entries for
        versions predating bloom_cols."""
        out: dict[str, dict] = {}
        missing: list[str] = []
        for f in frags:
            e = self._bloom_cache.get((v, f))
            if e is None:
                missing.append(f)
            else:
                out[f] = e
        if not missing:
            return out
        fetched: dict[str, dict] = {f: {} for f in missing}
        path = os.path.join(self._vdir_of(v), self._BLOOM_SIDECAR)
        legacy = os.path.join(self._vdir_of(v), self._BLOOM_DOC)
        if os.path.exists(path):
            import pyarrow.dataset as ds

            tbl = ds.dataset(path, format="parquet").to_table(
                filter=ds.field("frag").isin(missing)
            )
            d = tbl.to_pydict()
            for i in range(tbl.num_rows):
                fetched[d["frag"][i]].setdefault(d["file"][i], {})[
                    d["col"][i]
                ] = {
                    "m": int(d["m"][i]),
                    "k": int(d["k"][i]),
                    "bits": d["bits"][i],
                }
        elif os.path.exists(legacy):
            import json

            with open(legacy) as fh:
                doc = json.load(fh)
            for f in missing:
                fetched[f] = doc.get(f, {})
        for f, e in fetched.items():
            self._bloom_cache[(v, f)] = e
            out[f] = e
        # bitsets can be KB-to-MB each; a long-lived reader (streaming
        # relay, serving process) must not accrete them without bound
        while len(self._bloom_cache) > 512:
            self._bloom_cache.pop(next(iter(self._bloom_cache)))
        return out

    def _probe_positions(
        self,
        shapes: set[tuple[str, int, int]],
        values: dict[str, object],
        col_types: dict[str, str],
    ) -> dict[tuple[str, int, int], list[int]]:
        """Candidate bit positions for every (col, m, k) bitset shape in
        play, computed BY THE ENGINE over a 1-row frame with the exact
        build-side expression (same cast, same hash) — one tiny job for
        the whole read.  The probe literal is first cast to the
        COLUMN's type: the build side hashed
        cast(<col as its native type> as string), so probing an int
        literal against a double column must hash "7.0", not "7" — a
        type-mismatched probe would otherwise be a bloom FALSE NEGATIVE
        (silently missing rows the exact predicate matches)."""
        if not shapes:
            return {}
        exprs, order = [], []
        for idx, (c, m, k) in enumerate(sorted(shapes)):
            lit = F.lit(values[c])
            if c in col_types:
                lit = lit.cast(col_types[c])
            s = lit.cast("string")
            for i in range(k):
                exprs.append(
                    F.pmod(F.xxhash64(s, F.lit(i)), F.lit(m)).alias(
                        f"p_{idx}_{i}"
                    )
                )
            order.append((c, m, k))
        row = self.spark.range(1).select(*exprs).first()
        out = {}
        for idx, shape in enumerate(order):
            _c, _m, k = shape
            out[shape] = [int(row[f"p_{idx}_{i}"]) for i in range(k)]
        return out

    @staticmethod
    def _bloom_may_contain(entry: dict, positions: list[int]) -> bool:
        bits = entry.get("bits")
        if bits is None:  # legacy JSON sidecar entry
            import base64

            bits = base64.b64decode(entry["b64"])
        return all(bits[p >> 3] & (1 << (p & 7)) for p in positions)

    def read_where_eq(
        self, pairs: Sequence[tuple], version: int | None = None
    ) -> tuple[DataFrame | None, int, int, int, int]:
        """Equality point read over a CONJUNCTION of (col, value)
        pairs, with THREE tiers of metadata skipping: (1) fragment
        zone-map envelopes (an equality is the degenerate range
        [v, v]); (2) per-file zone-map envelopes; (3) per-file bloom
        bitsets — the tier that actually bites when the probed column
        is high-cardinality and unclustered, where every file's
        envelope spans the domain and tiers 1-2 keep everything.
        Anything without recorded metadata is kept conservatively, and
        the exact equality predicate is applied to the survivors —
        bloom false positives cost a scan, never a wrong row.  NULL
        probe values are refused (SQL `= NULL` matches nothing; bloom
        bitsets never index NULLs).  Returns the same counter shape as
        `read_where_all`: ``(frame, fragments_kept, fragments_total,
        files_kept, files_total)``."""
        pairs = [(c, v) for c, v in pairs]
        if not pairs:
            raise ValueError("read_where_eq needs at least one pair")
        if any(v is None for _c, v in pairs):
            raise ValueError("cannot probe NULL (= NULL matches nothing)")
        values = dict(pairs)
        conds = [(c, v, v) for c, v in pairs]
        doc = self._manifest_doc(version)
        m = {k: int(v) for k, v in doc.get("partitions", {}).items()}
        if not m:
            return None, 0, 0, 0, 0
        st = doc.get("stats", {})
        keep = {
            f: hv
            for f, hv in m.items()
            if self._envelopes_intersect(st.get(f), conds)
        }
        pred = None
        for c, v in pairs:
            e = F.col(c) == F.lit(v)
            pred = e if pred is None else pred & e
        fst = self._file_stats_for(doc, list(keep))
        # one engine probe job for all bitset shapes seen in sidecars;
        # sidecars resolved GROUPED BY HOLDER VERSION, each opened with
        # a filter on the SURVIVING fragments only — probe metadata
        # cost tracks what tier 1 kept, not the table's file count
        shapes: set[tuple[str, int, int]] = set()
        frag_blooms: dict[str, dict] = {}
        by_hv: dict[int, list[str]] = {}
        for frag, hv in keep.items():
            by_hv.setdefault(hv, []).append(frag)
        for hv, fl in sorted(by_hv.items()):
            frag_blooms.update(self._bloom_frags(hv, fl))
        for bdoc in frag_blooms.values():
            for fentry in bdoc.values():
                for c, _v in pairs:
                    be = fentry.get(c)
                    if be:
                        shapes.add((c, int(be["m"]), int(be["k"])))
        col_types: dict[str, str] = {}
        if shapes:
            # probe literals must be cast to the columns' native types:
            # the declared manifest schema when recorded (zero reads),
            # else one surviving fragment's footer — never a plan over
            # every fragment (that alone scaled with table size)
            sch = doc.get("schema")
            if sch:
                col_types = {n: t for n, t in sch}
            else:
                one = dict(sorted(keep.items())[:1])
                col_types = dict(self._read_fragments(one).dtypes)
        probes = self._probe_positions(shapes, values, col_types)
        files_total = files_kept = 0
        entries: list[tuple[str, int, str]] = []
        for frag, hv in sorted(keep.items()):
            frag_dir = os.path.join(self._data_dir(hv), frag)
            fdoc = fst.get(frag) or {}
            bdoc = frag_blooms[frag]
            names = sorted(fdoc) if fdoc else sorted(
                n for n in os.listdir(frag_dir) if n.endswith(".parquet")
            )
            for fname in names:
                files_total += 1
                envs = fdoc.get(fname)
                if envs is not None and not self._envelopes_intersect(
                    envs, conds
                ):
                    continue
                fb = bdoc.get(fname)
                if fb and not all(
                    self._bloom_may_contain(
                        fb[c], probes[(c, int(fb[c]["m"]), int(fb[c]["k"]))]
                    )
                    for c, _v in pairs
                    if fb.get(c)
                ):
                    continue
                files_kept += 1
                entries.append(
                    (frag, hv, os.path.join(frag_dir, fname))
                )
        if not entries:
            return (
                self._read_fragments(m, align=doc).filter(
                    F.lit(False)
                ),
                len(keep),
                len(m),
                0,
                files_total,
            )
        dv = {f: v for f, v in self._dv_map(doc).items() if f in keep}
        out = self._scan_entries_dv(entries, dv, align=doc)
        return out.filter(pred), len(keep), len(m), files_kept, files_total

    # -- metadata-only aggregates -----------------------------------------
    def count_rows(
        self, version: int | None = None
    ) -> tuple[int, int, int]:
        """Exact COUNT(*) of a snapshot served from manifest metadata —
        the Iceberg/Delta metadata-only scan: every stats commit records
        per-file row counts, so counting a 100 TB table costs one
        manifest read, zero data GETs.  Fragments committed before
        ``stats_cols`` was configured have no counts and are scanned
        (exactness is never traded for speed).  Returns ``(rows,
        fragments_from_metadata, fragments_scanned)``."""
        doc = self._manifest_doc(version)
        m = {k: int(v) for k, v in doc.get("partitions", {}).items()}
        if not m:
            return 0, 0, 0
        # fragment tier only — COUNT(*) never opens a file-stats
        # sidecar (the fragment envelope's count is the exact sum of
        # its files' counts by construction)
        st = doc.get("stats", {})
        dv = self._dv_map(doc)
        dvr = {k: int(v) for k, v in (doc.get("dv_rows") or {}).items()}
        rk = self._ROWS_KEY
        total, meta, to_scan = 0, 0, {}
        for frag, hv in m.items():
            env = st.get(frag)
            if frag in dv and frag not in dvr:
                # a vector with no recorded cardinality (should not
                # happen — every DV commit records both) is scanned
                to_scan[frag] = hv
                continue
            if env and rk in env:
                total += int(env[rk]) - dvr.get(frag, 0)
                meta += 1
            else:
                to_scan[frag] = hv
        if to_scan:
            total += self._read_fragments(
                to_scan, dv={f: v for f, v in dv.items() if f in to_scan}
            ).count()
        return total, meta, len(to_scan)

    def metadata_min_max(
        self, col: str, version: int | None = None
    ) -> tuple[object, object, int, int]:
        """Exact MIN/MAX of a stats column served from the fragment
        zone maps (min of fragment-mins / max of fragment-maxes — exact
        because every envelope is the exact min/max of its files).  A
        recorded all-NULL envelope ([None, None]) contributes nothing,
        matching SQL MIN/MAX; fragments WITHOUT a recorded envelope are
        scanned.  Returns ``(min, max, fragments_from_metadata,
        fragments_scanned)``."""
        doc = self._manifest_doc(version)
        m = {k: int(v) for k, v in doc.get("partitions", {}).items()}
        if not m:
            return None, None, 0, 0
        st = doc.get("stats", {})
        dv = self._dv_map(doc)
        mn = mx = None
        meta, to_scan = 0, {}
        for frag, hv in m.items():
            fenv = st.get(frag)
            if fenv is None or col not in fenv or frag in dv:
                # a dv'd fragment's envelope is only a SUPERSET (the
                # row holding the recorded min/max may be deleted) —
                # sound for pruning, not for an exact answer: scan it
                to_scan[frag] = hv
                continue
            meta += 1
            lo, hi = fenv[col]
            if lo is not None and (mn is None or lo < mn):
                mn = lo
            if hi is not None and (mx is None or hi > mx):
                mx = hi
        if to_scan:
            r = (
                self._read_fragments(
                        to_scan,
                        dv={f: v for f, v in dv.items() if f in to_scan}, align=doc,)
                .agg(F.min(col).alias("mn"), F.max(col).alias("mx"))
                .first()
            )
            if r["mn"] is not None and (mn is None or r["mn"] < mn):
                mn = r["mn"]
            if r["mx"] is not None and (mx is None or r["mx"] > mx):
                mx = r["mx"]
        return mn, mx, meta, len(to_scan)

    # -- commit protocol ------------------------------------------------
    # Optimistic concurrency (the Delta/Iceberg baseline): every commit
    # path first CLAIMS the next version number by atomically creating
    # its directory (os.mkdir — EEXIST means someone else owns it), so
    # two writers can never both commit the same version, and the
    # commit basis (the previous manifest) is always read UNDER the
    # claim — a peer cannot slip a commit between basis-read and
    # publish, which is what makes pruned copy-on-write sound under
    # concurrency (no lost updates).  A claim directory carries a
    # `_CLAIM` marker naming its writer (pid/host/ts) and becomes a
    # snapshot only when `_SUCCESS` lands; until then readers cannot
    # see it.  On EEXIST the would-be writer distinguishes:
    #   - `_SUCCESS` present → a peer committed this number between our
    #     dir listing and mkdir; take the next number (safe: the basis
    #     has not been read yet);
    #   - live claim → raise `CommitConflictError` (caller re-runs the
    #     commit against the new basis once the peer publishes);
    #   - crash debris (same-host claim whose pid is gone, or any claim
    #     older than `claim_ttl_seconds`) → reclaim: remove and retry.
    # On a real object store the mkdir would be a conditional PUT of
    # the claim marker (If-None-Match) or a transaction-log service;
    # the protocol shape is identical.
    _CLAIM_MARKER = "_CLAIM"

    def _claim_is_stale(self, vdir: str) -> bool:
        """True when an unfinished version dir is a crashed writer's
        debris (reclaimable), False when it may be a live writer."""
        import json
        import socket
        import time

        cpath = os.path.join(vdir, self._CLAIM_MARKER)
        try:
            with open(cpath) as fh:
                claim = json.load(fh)
        except (FileNotFoundError, ValueError):
            # mkdir happened but the marker never (fully) landed: either
            # a writer inside the sub-second mkdir→marker window or a
            # crash in it — only age can tell
            try:
                age = time.time() - os.path.getmtime(vdir)
            except OSError:
                return False  # dir vanished: someone else handled it
            return age > self.claim_ttl_seconds
        if claim.get("host") == socket.gethostname():
            pid = claim.get("pid")
            if isinstance(pid, int) and pid > 0:
                try:
                    os.kill(pid, 0)
                    return False  # writer process still alive
                except ProcessLookupError:
                    return True  # same host, writer gone: crash debris
                except PermissionError:
                    return False  # alive under another uid
        # cross-host claim (or unreadable identity): TTL decides —
        # pid liveness means nothing across machines
        return time.time() - float(claim.get("ts") or 0) > self.claim_ttl_seconds

    def _claim_version(self) -> tuple[int, str]:
        """Atomically claim the next version; returns (version, dir).

        Loops past versions a peer managed to commit first (safe —
        the caller reads its commit basis after this returns) and past
        reclaimed crash debris; raises `CommitConflictError` on a live
        concurrent claim."""
        import json
        import shutil
        import socket
        import time

        self._check_scheme()
        os.makedirs(self.path, exist_ok=True)
        while True:
            dirs = self._committed_dirs()
            new_v = (dirs[-1] + 1) if dirs else 1
            vdir = self._vdir(new_v)
            try:
                os.mkdir(vdir)
            except FileExistsError:
                if os.path.exists(os.path.join(vdir, "_SUCCESS")):
                    continue  # peer committed this number: next one
                if self._claim_is_stale(vdir):
                    shutil.rmtree(vdir, ignore_errors=True)
                    continue  # crashed attempt's debris: reclaim
                raise CommitConflictError(
                    f"version {new_v} of {self.path} is claimed by a "
                    "concurrent writer; re-run this commit after it "
                    "publishes (or reclaim via claim_ttl_seconds if it "
                    "crashed on another host)"
                )
            with open(os.path.join(vdir, self._CLAIM_MARKER), "w") as fh:
                json.dump(
                    {
                        "pid": os.getpid(),
                        "host": socket.gethostname(),
                        "ts": time.time(),
                    },
                    fh,
                )
            return new_v, vdir

    def _abandon_claim(self, vdir: str) -> None:
        import shutil

        shutil.rmtree(vdir, ignore_errors=True)

    def _effective_constraints(self, doc: dict) -> dict[str, Column]:
        """Constructor-handle constraints ∪ the TABLE-LEVEL constraints
        persisted in the manifest (`add_constraint` — SQL strings, so
        any writer handle resolves and enforces them; a handle-local
        Column cannot be persisted and binds only its own handle).
        Manifest-persisted definitions win name collisions: the table's
        declared contract outranks one writer's local opinion."""
        eff = dict(self.constraints)
        for name, sql in (doc.get("constraints") or {}).items():
            eff[name] = F.expr(sql)
        return eff

    def _observe_constraints(self, df: DataFrame, doc: dict):
        """Attach the CHECK-constraint violation counters to a frame
        about to be written: one `df.observe` aggregate per constraint
        (rows where the expression is FALSE — NULL passes, SQL-style),
        computed by the WRITE job itself, so enforcement costs zero
        extra scans.  ``doc`` is the pinned commit-basis manifest (its
        persisted constraints bind every writer).  Returns ``(df,
        observation | None)``; call `_raise_constraint_violations`
        after the write action."""
        constraints = self._effective_constraints(doc)
        if not constraints:
            return df, None
        from pyspark.sql import Observation

        obs = Observation()
        aggs = [
            F.sum(
                F.when(
                    ~F.coalesce(cond, F.lit(True)), F.lit(1)
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias(name)
            for name, cond in constraints.items()
        ]
        return df.observe(obs, *aggs), obs

    def _raise_constraint_violations(self, obs) -> None:
        if obs is None:
            return
        bad = {
            name: int(n)
            for name, n in obs.get.items()
            if n is not None and int(n) > 0
        }
        if bad:
            raise ConstraintViolationError(
                f"CHECK constraint(s) violated: {bad} (count of rows "
                "where the expression is FALSE; commit abandoned, "
                "table unchanged)"
            )

    def table_constraints(self, version: int | None = None) -> dict:
        """The PERSISTED constraints in force at a snapshot
        ({name → SQL expression string}) — the ones every writer
        handle enforces, unlike the constructor's handle-local
        Columns."""
        return dict(
            self._manifest_doc(version).get("constraints") or {}
        )

    def add_constraint(self, name: str, sql: str) -> int:
        """Persist a table-level CHECK constraint — Delta's ``ALTER
        TABLE ADD CONSTRAINT <name> CHECK (<sql>)``: a metadata-only
        commit (every fragment inherited by reference) that first
        VALIDATES the current live content in one scan, exactly
        Delta's semantics — a constraint never co-exists with data
        violating it.  From this commit on, every writer handle
        enforces it (the SQL string resolves anywhere), and it
        survives every rewrite via `_carry_meta`.  Raises
        `ConstraintViolationError` if existing rows violate, and
        refuses to replace an existing name (drop it first)."""
        cond = F.expr(sql)
        new_v, vdir = self._claim_version()
        try:
            prev_doc = self._manifest_doc()
            existing = dict(prev_doc.get("constraints") or {})
            if name in existing:
                raise ValueError(
                    f"constraint {name!r} already exists "
                    f"({existing[name]!r}); drop it first"
                )
            prev = {
                k: int(v)
                for k, v in prev_doc.get("partitions", {}).items()
            }
            if prev:
                live = self._read_fragments(
                        prev, dv=self._dv_map(prev_doc), align=prev_doc)
                n_bad = live.filter(
                    ~F.coalesce(cond, F.lit(True))
                ).count()
                if n_bad:
                    raise ConstraintViolationError(
                        f"cannot add constraint {name!r}: {n_bad} "
                        "existing row(s) violate it"
                    )
            doc = dict(prev_doc)
            doc.setdefault("partition_by", self.partition_by)
            doc.setdefault("partitions", {})
            doc["commit"] = self._commit_info("add_constraint", set())
            existing[name] = sql
            doc["constraints"] = existing
            import json

            with open(os.path.join(vdir, "manifest.json"), "w") as fh:
                json.dump(doc, fh, sort_keys=True)
        except BaseException:
            self._abandon_claim(vdir)
            raise
        self._publish(vdir)
        return new_v

    def drop_constraint(self, name: str, if_exists: bool = False) -> int:
        """Remove a persisted CHECK constraint (metadata-only commit).
        Raises on an unknown name unless ``if_exists``."""
        new_v, vdir = self._claim_version()
        try:
            prev_doc = self._manifest_doc()
            existing = dict(prev_doc.get("constraints") or {})
            if name not in existing:
                self._abandon_claim(vdir)
                if if_exists:
                    vs = self.versions()
                    return vs[-1] if vs else 0
                raise ValueError(
                    f"no constraint named {name!r}; "
                    f"in force: {sorted(existing)}"
                )
            existing.pop(name)
            doc = dict(prev_doc)
            doc.setdefault("partition_by", self.partition_by)
            doc.setdefault("partitions", {})
            doc["commit"] = self._commit_info("drop_constraint", set())
            if existing:
                doc["constraints"] = existing
            else:
                doc.pop("constraints", None)
            import json

            with open(os.path.join(vdir, "manifest.json"), "w") as fh:
                json.dump(doc, fh, sort_keys=True)
        except BaseException:
            self._abandon_claim(vdir)
            raise
        self._publish(vdir)
        return new_v

    def add_column(
        self, name: str, ddl_type: str, initial_default=None
    ) -> int:
        """``ALTER TABLE ADD COLUMN`` — a METADATA-ONLY commit (the
        Delta/Iceberg shape: no data file is touched at any table
        size): the declared schema gains ``(name, type)`` at the end,
        every fragment is inherited by reference, and from this
        snapshot on all read paths surface the column for rows whose
        files predate it — as a typed NULL, or as ``initial_default``
        when given (Iceberg v3 initial-default semantics: the fill is
        part of the declaration, so every reader sees it and every
        rewrite materializes it; new write batches must still supply
        the column explicitly).  The next write commit that touches a
        partition materializes the column physically.  Refuses
        duplicate names and the reserved DV address columns; the type
        is validated and canonicalized through Spark's DDL parser, and
        a default must survive the cast to it losslessly (a JSON
        scalar, so any writer handle resolves it).  Requires a
        committed schema (the first write establishes it — an empty
        table has nothing to evolve)."""
        import json

        if name in self._META_COLS:
            raise ValueError(f"{name!r} is reserved for DV row addresses")
        norm = self._normalize_type(ddl_type)
        if initial_default is not None:
            if not isinstance(initial_default, (int, float, str, bool)):
                raise ValueError(
                    "initial_default must be a JSON scalar "
                    f"(int/float/str/bool), got "
                    f"{type(initial_default).__name__}"
                )
            probe = self.spark.range(1).select(
                F.lit(initial_default).cast(norm)
            ).first()[0]
            if probe is None:
                raise ValueError(
                    f"initial_default {initial_default!r} does not "
                    f"cast to {norm}"
                )
        new_v, vdir = self._claim_version()
        try:
            prev_doc = self._manifest_doc()
            sch = prev_doc.get("schema")
            if not sch:
                raise ValueError(
                    "table has no committed schema to evolve — the "
                    "first write commit establishes it"
                )
            if name in {n for n, _t in sch}:
                raise ValueError(f"column {name!r} already exists")
            if name in (prev_doc.get("dropped_columns") or []):
                raise ValueError(
                    f"column name {name!r} was dropped and pre-drop "
                    "files still hold its bytes (name-based parquet "
                    "resolution would resurrect them); use a fresh "
                    "name, or compact() first to shed the old bytes"
                )
            doc = dict(prev_doc)
            doc.setdefault("partition_by", self.partition_by)
            doc.setdefault("partitions", {})
            doc["schema"] = [list(e) for e in sch] + [[name, norm]]
            if initial_default is not None:
                defaults = dict(prev_doc.get("defaults") or {})
                defaults[name] = initial_default
                doc["defaults"] = defaults
            doc["commit"] = self._commit_info("add_column", set())
            with open(os.path.join(vdir, "manifest.json"), "w") as fh:
                json.dump(doc, fh, sort_keys=True)
        except BaseException:
            self._abandon_claim(vdir)
            raise
        self._publish(vdir)
        return new_v

    def table_defaults(self, version: int | None = None) -> dict:
        """The initial-default fills in force at a snapshot
        ({column → JSON scalar}) — applied by read alignment to rows
        whose files predate the column's add."""
        return dict(self._manifest_doc(version).get("defaults") or {})

    def drop_column(self, name: str) -> int:
        """``ALTER TABLE DROP COLUMN`` — a METADATA-ONLY commit, the
        third leg of the evolution triad: the declared schema loses
        the column, every read path projects it away (alignment is
        schema-driven), old files keep their bytes untouched, and the
        next rewrite of a partition physically sheds them there.

        Name-based parquet resolution means RE-ADDING the same name
        would resurrect stale bytes from pre-drop files (the format
        has no Iceberg-style field ids), so the drop leaves a
        tombstone in the manifest: `add_column` (and an evolving
        upsert) refuses tombstoned names until a ``compact()`` —
        which physically rewrites everything — clears them.

        Refuses key and partition columns (identity/layout), a column
        any persisted CHECK constraint or generated-partition
        expression references (they would fail analysis on every
        later commit), and unknown names.  A declared initial default
        for the column is dropped with it."""
        import json
        import re

        if name in self.keys or name in self.partition_by:
            raise ValueError(
                f"cannot drop key/partition column {name!r}"
            )
        if name in self.order_cols:
            raise ValueError(
                f"cannot drop order column {name!r}: every later "
                "upsert/merge orders winners by it, so the table "
                "would become unwritable (and the drop tombstone "
                "would block re-adding the name without a compact)"
            )
        new_v, vdir = self._claim_version()
        try:
            prev_doc = self._manifest_doc()
            sch = prev_doc.get("schema")
            if not sch:
                raise ValueError(
                    "table has no committed schema to evolve — the "
                    "first write commit establishes it"
                )
            if name not in {n for n, _t in sch}:
                raise ValueError(
                    f"no column {name!r}; table columns: "
                    f"{sorted(n for n, _t in sch)}"
                )
            token = re.compile(rf"\b{re.escape(name)}\b")
            for cn, sql in (prev_doc.get("constraints") or {}).items():
                if token.search(sql):
                    raise ValueError(
                        f"cannot drop {name!r}: CHECK constraint "
                        f"{cn!r} references it ({sql!r}); drop the "
                        "constraint first"
                    )
            for pc, expr in (prev_doc.get("generated") or {}).items():
                if token.search(expr):
                    raise ValueError(
                        f"cannot drop {name!r}: generated partition "
                        f"column {pc!r} derives from it ({expr!r})"
                    )
            doc = dict(prev_doc)
            doc.setdefault("partition_by", self.partition_by)
            doc.setdefault("partitions", {})
            doc["schema"] = [list(e) for e in sch if e[0] != name]
            defaults = dict(prev_doc.get("defaults") or {})
            defaults.pop(name, None)
            if defaults:
                doc["defaults"] = defaults
            else:
                doc.pop("defaults", None)
            dropped = list(prev_doc.get("dropped_columns") or [])
            if name not in dropped:
                dropped.append(name)
            doc["dropped_columns"] = dropped
            doc["commit"] = self._commit_info("drop_column", set())
            with open(os.path.join(vdir, "manifest.json"), "w") as fh:
                json.dump(doc, fh, sort_keys=True)
        except BaseException:
            self._abandon_claim(vdir)
            raise
        self._publish(vdir)
        return new_v

    def widen_column(self, name: str, ddl_type: str) -> int:
        """``ALTER TABLE ALTER COLUMN TYPE`` restricted to the lossless
        widenings `_widens` declares (int-chain, float→double, decimal
        growth) — Delta's type-widening feature as a METADATA-ONLY
        commit: files keep their narrower physical type and every read
        casts up, so no data moves.  Partition columns are refused
        (their values live in directory NAMES, not parquet — a type
        change would re-render paths); key columns are fine (the merge
        compares them post-alignment, and batch keys are conformed up
        before the join)."""
        import json

        norm = self._normalize_type(ddl_type)
        if name in self.partition_by:
            raise ValueError(
                f"cannot widen partition column {name!r}: partition "
                "values are directory names, not parquet data"
            )
        new_v, vdir = self._claim_version()
        try:
            prev_doc = self._manifest_doc()
            sch = prev_doc.get("schema")
            if not sch:
                raise ValueError(
                    "table has no committed schema to evolve — the "
                    "first write commit establishes it"
                )
            cur = {n: t for n, t in sch}
            if name not in cur:
                raise ValueError(
                    f"no column {name!r}; table columns: "
                    f"{sorted(cur)}"
                )
            if not self._widens(cur[name], norm):
                raise ValueError(
                    f"{cur[name]} -> {norm} is not a lossless widening "
                    f"for column {name!r} (allowed: tinyint<smallint<"
                    "int<bigint, float<double, decimal growth that "
                    "shrinks neither scale nor integer digits)"
                )
            doc = dict(prev_doc)
            doc.setdefault("partition_by", self.partition_by)
            doc.setdefault("partitions", {})
            doc["schema"] = [
                [n, norm if n == name else t] for n, t in sch
            ]
            doc["commit"] = self._commit_info("widen_column", set())
            with open(os.path.join(vdir, "manifest.json"), "w") as fh:
                json.dump(doc, fh, sort_keys=True)
        except BaseException:
            self._abandon_claim(vdir)
            raise
        self._publish(vdir)
        return new_v

    def _effective_generated(self, doc: dict) -> dict[str, str]:
        """Constructor-handle generation exprs ∪ the manifest-persisted
        ones (persisted wins collisions — the table's declared
        derivation outranks one writer's local opinion), mirroring
        `_effective_constraints`."""
        eff = dict(self.generated_partitions)
        eff.update(doc.get("generated") or {})
        return eff

    def _apply_generated(self, batch: DataFrame, doc: dict):
        """Derive generated partition columns the batch omits; for
        columns the batch DOES carry, attach one observe counter per
        column (mismatches between the provided value and the
        derivation, NULL-safe) riding the batch's first job — zero
        extra scans.  Returns ``(batch, observation | None)``; call
        `_raise_generated_violations` after the first action."""
        gen = self._effective_generated(doc)
        if not gen:
            return batch, None
        checks: list = []
        for c, sql in sorted(gen.items()):
            if c not in batch.columns:
                batch = batch.withColumn(c, F.expr(sql))
            else:
                checks.append(
                    F.sum(
                        F.when(
                            ~F.col(c).eqNullSafe(F.expr(sql)), F.lit(1)
                        ).otherwise(F.lit(0))
                    )
                    .cast("long")
                    .alias(c)
                )
        if not checks:
            return batch, None
        from pyspark.sql import Observation

        obs = Observation()
        return batch.observe(obs, *checks), obs

    @staticmethod
    def _raise_generated_violations(obs) -> None:
        if obs is None:
            return
        bad = {
            c: int(n)
            for c, n in obs.get.items()
            if n is not None and int(n) > 0
        }
        if bad:
            raise ValueError(
                "generated partition column(s) carry values that do "
                f"not match their declared derivation: {bad} (count "
                "of mismatching rows; commit refused, table unchanged)"
            )

    def _conform_batch(
        self,
        batch: DataFrame,
        prev_doc: dict,
        evolve: bool,
        allow_missing: bool = False,
    ) -> DataFrame:
        """Validate and align a write batch against the declared
        schema.  A batch must carry EVERY declared column — an upsert
        cannot partially specify a row (NULL-filling here would clobber
        matched rows' values; only reads of pre-evolution FILES fill
        NULL) — unless ``allow_missing`` (merge_into: `merge_clauses`
        documents slim sources, e.g. keys + condition fields for a
        delete-only merge, with source-side NULL fill).  Extra columns
        require ``schema_evolution=True`` and extend the schema
        additively; a batch column WIDER than the declared type
        requires the flag too and widens the declaration (the merge
        union coerces the carried rows up); a NARROWER batch column is
        always cast up losslessly; anything else is incompatible and
        refused."""
        sch = prev_doc.get("schema")
        if not sch:
            return batch
        declared = {n: t for n, t in sch}
        have = dict(batch.dtypes)
        missing = sorted(set(declared) - set(have))
        if missing and not allow_missing:
            raise ValueError(
                f"write batch lacks table columns {missing} — a batch "
                "must carry every declared column (reads NULL-fill "
                "only for files that predate an add_column)"
            )
        extra = [c for c in batch.columns if c not in declared]
        reserved = sorted(set(extra) & set(self._META_COLS))
        if reserved:
            raise ValueError(
                f"batch columns {reserved} are reserved for DV row "
                "addresses (mirrors add_column's reserved-name check; "
                "a physical __rel/__ri column would collide with the "
                "keep_pos address columns deletion-vector builds use)"
            )
        if extra and not evolve:
            raise ValueError(
                f"write batch adds columns {extra} not in the table "
                "schema; pass schema_evolution=True to extend it "
                "additively"
            )
        tombstoned = sorted(
            set(extra) & set(prev_doc.get("dropped_columns") or [])
        )
        if tombstoned:
            raise ValueError(
                f"columns {tombstoned} were dropped and pre-drop files "
                "still hold their bytes (re-adding would resurrect "
                "them); use fresh names, or compact() first"
            )
        cols: list[Column] = []
        for n, t in sch:
            if n not in have:
                continue  # allow_missing: merge_clauses NULL-fills
            bt = have[n]
            if bt == t:
                cols.append(F.col(n))
            elif self._widens(bt, t):
                cols.append(F.col(n).cast(t).alias(n))
            elif self._widens(t, bt):
                if not evolve:
                    raise ValueError(
                        f"batch column {n!r} is {bt}, wider than the "
                        f"declared {t}; pass schema_evolution=True to "
                        "widen the table type"
                    )
                cols.append(F.col(n))
            else:
                raise ValueError(
                    f"batch column {n!r} type {bt} is incompatible "
                    f"with the declared {t} (no lossless widening "
                    "either way)"
                )
        cols += [F.col(c) for c in extra]
        return batch.select(*cols)

    def _publish(self, vdir: str) -> None:
        """Publish a fully-written version: commit marker LAST (a crash
        before this leaves the dir invisible to ``versions()`` — readers
        still resolve the previous snapshot), then retention vacuum.
        MUST be called outside any try-block whose handler abandons the
        claim: once ``_SUCCESS`` lands the version is live, and a
        failure in vacuum must never trigger an abandon that rmtree's a
        published snapshot (with ``keep_versions=1`` that could leave
        ``versions()`` empty — an unreadable table)."""
        with open(os.path.join(vdir, "_SUCCESS"), "w"):
            pass
        if self.keep_versions is not None or self.keep_seconds is not None:
            self.vacuum()

    # -- write ----------------------------------------------------------
    def upsert(
        self, batch: DataFrame, schema_evolution: bool = False
    ) -> int:
        """Pruned MERGE commit: read ONLY the batch's partitions from
        their current holders, merge, write those partitions under the
        new version, inherit everything else via the manifest.

        ``schema_evolution``: with the declared schema in force a batch
        must carry exactly the declared columns (`_conform_batch`);
        passing True lets a batch ADD columns (appended to the
        declaration; pre-evolution files read NULL there) or carry a
        losslessly WIDER type (the declaration widens) — Delta's
        ``mergeSchema`` write option, as an explicit opt-in."""
        import json
        import shutil

        # generation defs are static table metadata (declared by the
        # first write, carried forever), so the unpinned read is safe
        batch, gen_obs = self._apply_generated(batch, self._manifest_doc())
        touched = [
            tuple(r)
            for r in batch.select(*self.partition_by).distinct().collect()
        ]
        self._raise_generated_violations(gen_obs)
        if not touched:
            vs = self.versions()
            return vs[-1] if vs else 0
        frags = {self._part_key(c) for c in touched}
        # claim the next version BEFORE reading the commit basis: the
        # claim freezes the version sequence (no peer can publish while
        # we hold it), so the manifest read below cannot go stale —
        # two writers can neither commit the same number nor lose each
        # other's updates (the loser of the claim gets
        # CommitConflictError inside _claim_version)
        new_v, vdir = self._claim_version()
        try:
            # one pinned manifest read: partitions + both stats tiers
            # come from the SAME doc (no torn basis)
            prev_doc = self._manifest_doc()
            prev = {
                k: int(v)
                for k, v in prev_doc.get("partitions", {}).items()
            }
            batch = self._conform_batch(batch, prev_doc, schema_evolution)
            # old holders of the touched partitions only, read LIVE
            # (deletion vectors applied — the rewrite materializes
            # them) and aligned to the declared schema, so the rewrite
            # also materializes any pending column add/widening
            target = self._read_fragments(
                    {frag: prev[frag] for frag in frags & set(prev)},
                    dv=self._dv_map(prev_doc), align=prev_doc,)
            merged = merge_by_key(
                target, batch, self.keys,
                [F.col(c).desc() for c in self.order_cols],
            )
            merged, checks = self._observe_constraints(merged, prev_doc)
            merged.write.partitionBy(*self.partition_by).parquet(
                self._data_dir(new_v)
            )
            self._raise_constraint_violations(checks)
            # the manifest is only sound if its fragments name the dirs
            # Spark ACTUALLY wrote — verify before committing, so a value
            # whose rendering diverges from _part_key fails loudly here
            # instead of wedging every later read with PATH_NOT_FOUND
            written = self._written_fragments(new_v)
            if written != frags:
                raise ValueError(
                    "partition dir names diverged from manifest fragments "
                    f"— written {sorted(written)} vs expected "
                    f"{sorted(frags)}; this partition value type/rendering "
                    "is unsupported"
                )
            manifest = {
                frag: v for frag, v in prev.items() if frag not in frags
            }
            manifest.update({frag: new_v for frag in frags})
            doc = {"partition_by": self.partition_by, "partitions": manifest}
            doc["commit"] = self._commit_info("upsert", frags)
            self._carry_meta(doc, prev_doc, frags)
            gen_eff = self._effective_generated(prev_doc)
            if gen_eff:
                doc["generated"] = gen_eff
            # the declared schema is what this commit actually wrote
            # (== carried unless the batch evolved it)
            doc["schema"] = self._frame_schema(merged)
            self._carry_dv(doc, prev_doc, frags)
            self._inherit_stats(doc, prev_doc, frags, new_v, vdir)
            self._write_blooms(new_v, vdir)
            with open(os.path.join(vdir, "manifest.json"), "w") as fh:
                json.dump(doc, fh, sort_keys=True)
        except BaseException:
            # abandon the claim: the table stays readable at its
            # current version, nothing partial is visible
            self._abandon_claim(vdir)
            raise
        self._publish(vdir)
        return new_v

    def merge_into(
        self,
        source: DataFrame,
        *,
        when_matched_update: Column | None = None,
        when_not_matched_insert: Column | None = None,
        when_matched_delete: Column | None = None,
        when_not_matched_by_source_delete: Column | None = None,
        schema_evolution: bool = False,
    ) -> int:
        """Conditional MERGE commit — `merge_clauses` semantics
        (``t.<col>`` / ``s.<col>`` condition references; see its
        docstring for the clause table) under the same pruned
        copy-on-write discipline as `upsert`: only the source batch's
        partitions are read, merged, and rewritten; everything else is
        inherited by reference.  Soundness rides the constructor's
        invariant (partition columns ⊆ keys, or the
        ``stable_partitions`` promise): a matched target row's
        partition values equal its source row's, so the source batch
        names every partition the merge can touch.  A partition the
        delete clause empties leaves the manifest (like `delete`); an
        insert into a brand-new partition creates its fragment.

        ``schema_evolution``: with the declared schema in force the
        source may omit declared columns (`merge_clauses`' slim-source
        contract — they read NULL on the source side), but ADDING
        columns or carrying a losslessly wider type requires the flag,
        exactly like `upsert` — a merge must not mutate the declared
        schema silently.

        ``when_not_matched_by_source_delete`` widens the touch set:
        the clause can reap target rows in partitions the source never
        names, so one column-pruned locate scan of the condition (a
        SUPERSET is sound — located-but-unmatched-and-false rows are
        kept verbatim by the clause logic) adds those partitions to
        the rewrite, exactly like `delete_where`'s locate.  Full-table
        WHEN NOT MATCHED BY SOURCE semantics, partition-pruned.

        Returns the committed version (current version unchanged on a
        no-op: empty source and nothing for the by-source clause to
        reap)."""
        import json

        new_v, vdir = self._claim_version()
        try:
            prev_doc = self._manifest_doc()
            prev = {
                k: int(v)
                for k, v in prev_doc.get("partitions", {}).items()
            }
            source, gen_obs = self._apply_generated(source, prev_doc)
            source = self._conform_batch(
                source, prev_doc, schema_evolution, allow_missing=True
            )
            touched = [
                tuple(r)
                for r in source.select(*self.partition_by)
                .distinct()
                .collect()
            ]
            self._raise_generated_violations(gen_obs)
            frags = {self._part_key(c) for c in touched}
            if when_not_matched_by_source_delete is not None and prev:
                hit = F.coalesce(
                    when_not_matched_by_source_delete, F.lit(False)
                )
                # evaluate the condition exactly as merge_clauses does
                # on a by-source-unmatched row: the source side is
                # all-NULL there, so cross-join ONE all-NULL row with
                # the source's schema aliased "s" — s.<col> references
                # (legal per merge_clauses' docstring, NULL → false,
                # and s.<col> IS NULL → true) resolve instead of
                # failing analysis, and the located set stays a sound
                # superset of the rows the clause can reap
                null_s = self.spark.range(1).select(
                    *[
                        F.lit(None).cast(f.dataType).alias(f.name)
                        for f in source.schema.fields
                    ]
                )
                located = (
                    self._read_fragments(
                            prev, dv=self._dv_map(prev_doc), align=prev_doc)
                    .alias("t")
                    .crossJoin(F.broadcast(null_s.alias("s")))
                    .filter(hit)
                    .select(*[F.col(f"t.{c}") for c in self.partition_by])
                    .distinct()
                    .collect()
                )
                frags |= {
                    self._part_key(tuple(r)) for r in located
                } & set(prev)
            if not frags:
                self._abandon_claim(vdir)
                vs = self.versions()
                return vs[-1] if vs else 0
            target = self._read_fragments(
                    {frag: prev[frag] for frag in frags & set(prev)},
                    dv=self._dv_map(prev_doc), align=prev_doc,)
            merged = merge_clauses(
                target,
                source,
                self.keys,
                [F.col(c).desc() for c in self.order_cols],
                when_matched_update=when_matched_update,
                when_not_matched_insert=when_not_matched_insert,
                when_matched_delete=when_matched_delete,
                when_not_matched_by_source_delete=(
                    when_not_matched_by_source_delete
                ),
            )
            merged, checks = self._observe_constraints(merged, prev_doc)
            merged.write.partitionBy(*self.partition_by).parquet(
                self._data_dir(new_v)
            )
            self._raise_constraint_violations(checks)
            # delete/insert clauses may empty a touched partition or
            # skip it entirely, so (unlike upsert) written ⊆ touched —
            # but never outside it
            written = self._written_fragments(new_v)
            if not written <= frags:
                raise ValueError(
                    "merge rewrote fragments outside its source's "
                    f"partitions — written {sorted(written)} vs touched "
                    f"{sorted(frags)}"
                )
            manifest = {
                frag: v for frag, v in prev.items() if frag not in frags
            }
            manifest.update({frag: new_v for frag in written})
            doc = {"partition_by": self.partition_by, "partitions": manifest}
            doc["commit"] = self._commit_info("merge", frags)
            self._carry_meta(doc, prev_doc, frags)
            gen_eff = self._effective_generated(prev_doc)
            if gen_eff:
                doc["generated"] = gen_eff
            doc["schema"] = self._frame_schema(merged)
            self._carry_dv(doc, prev_doc, frags)
            self._inherit_stats(doc, prev_doc, frags, new_v, vdir)
            self._write_blooms(new_v, vdir)
            with open(os.path.join(vdir, "manifest.json"), "w") as fh:
                json.dump(doc, fh, sort_keys=True)
        except BaseException:
            self._abandon_claim(vdir)
            raise
        self._publish(vdir)
        return new_v

    # -- delete ---------------------------------------------------------
    def delete(self, keys: DataFrame) -> int:
        """Keyed DELETE commit (the GDPR / right-to-erasure / retention
        shape a 100 TB fact table must support): remove every row whose
        key appears in ``keys``, rewriting ONLY the partitions those
        keys live in — the same copy-on-write pruning as `upsert`, so
        the cost tracks the delete batch, not the table.

        When partition columns ⊆ keys (the constructor's default
        soundness regime) the touched partitions come straight from the
        delete batch — no table scan at all.  Under
        ``stable_partitions=True`` the keys don't name their partitions,
        so one column-pruned semi-join scan locates them first.

        A partition whose rows are ALL deleted leaves the manifest
        entirely (readers never see an empty fragment); deleting the
        last row of the last partition leaves an empty table
        (``read()`` → None).  Returns the committed version, or the
        current version unchanged when no key matched a live partition.
        Replay-safe: deleting the same keys twice is a fixed point.
        `delete_dv` is the merge-on-read twin (sidecars, no rewrite —
        the small-scattered-erasure shape); `delete_auto` picks
        between them from manifest metadata."""
        missing = [c for c in self.keys if c not in keys.columns]
        if missing:
            raise ValueError(f"delete batch lacks key columns: {missing}")
        # claim before reading the basis (see upsert): a peer commit
        # between locate and rewrite would otherwise be silently undone
        new_v, vdir = self._claim_version()
        try:
            prev_doc = self._manifest_doc()
            prev = {
                k: int(v)
                for k, v in prev_doc.get("partitions", {}).items()
            }
            if not prev:
                self._abandon_claim(vdir)
                vs = self.versions()
                return vs[-1] if vs else 0
            keys = keys.select(*self.keys).distinct()
            if set(self.partition_by) <= set(self.keys):
                touched = [
                    tuple(r)
                    for r in keys.select(*self.partition_by)
                    .distinct()
                    .collect()
                ]
                frags = {self._part_key(c) for c in touched} & set(prev)
            else:
                scan_cols = sorted(set(self.keys) | set(self.partition_by))
                located = (
                    self._read_fragments(prev, dv=self._dv_map(prev_doc))
                    .select(*scan_cols)
                    .join(keys, on=self.keys, how="left_semi")
                    .select(*self.partition_by)
                    .distinct()
                    .collect()
                )
                frags = {self._part_key(tuple(r)) for r in located}
            v, committed = self._commit_delete(
                new_v,
                vdir,
                prev_doc,
                frags,
                lambda df: df.join(keys, on=self.keys, how="left_anti"),
            )
        except BaseException:
            self._abandon_claim(vdir)
            raise
        # publish outside the abandon scope (see _publish), mirroring
        # upsert()/merge_into()/compact()
        if committed:
            self._publish(vdir)
        return v

    def delete_where(self, condition: Column) -> int:
        """Predicate DELETE commit: remove rows where ``condition`` is
        TRUE (NULL keeps the row, matching SQL DELETE semantics),
        rewriting only the partitions that contain a matching row —
        located by a filter-pushdown scan of the partition columns.
        Same manifest/commit discipline as `delete`."""
        new_v, vdir = self._claim_version()
        try:
            prev_doc = self._manifest_doc()
            prev = {
                k: int(v)
                for k, v in prev_doc.get("partitions", {}).items()
            }
            if not prev:
                self._abandon_claim(vdir)
                vs = self.versions()
                return vs[-1] if vs else 0
            hit = F.coalesce(condition, F.lit(False))
            touched = [
                tuple(r)
                for r in self._read_fragments(
                        prev, dv=self._dv_map(prev_doc), align=prev_doc)
                .filter(hit)
                .select(*self.partition_by)
                .distinct()
                .collect()
            ]
            frags = {self._part_key(c) for c in touched} & set(prev)
            v, committed = self._commit_delete(
                new_v,
                vdir,
                prev_doc,
                frags,
                lambda df: df.filter(~hit),
                op="delete_where",
            )
        except BaseException:
            self._abandon_claim(vdir)
            raise
        if committed:
            self._publish(vdir)
        return v

    def _commit_delete(
        self, new_v, vdir, prev_doc, frags, keep_fn, op: str = "delete"
    ) -> tuple[int, bool]:
        """Shared delete commit: rewrite the touched fragments through
        ``keep_fn`` (which drops the doomed rows), drop fully-emptied
        fragments from the manifest, inherit everything else.  Runs
        under an already-held version claim (``new_v``/``vdir``) with
        ``prev_doc`` the basis manifest read under that claim; the
        callers' except-blocks abandon the claim on any failure.

        Stops BEFORE the commit marker — returns ``(version,
        committed)`` and the caller publishes via `_publish` outside
        its abandon scope, so an abandon can only ever hit an
        unpublished claim (a vacuum failure after ``_SUCCESS`` must
        not rmtree a live snapshot)."""
        import json

        if not frags:
            # nothing to delete: no-op, no new commit
            self._abandon_claim(vdir)
            return self.versions()[-1], False
        prev = {
            k: int(v) for k, v in prev_doc.get("partitions", {}).items()
        }
        # read the doomed fragments LIVE (a row already dv-deleted must
        # not be resurrected by the rewrite), aligned to the declared
        # schema so the rewrite materializes pending column evolution
        kept = keep_fn(
            self._read_fragments(
                    {f: prev[f] for f in frags},
                    dv=self._dv_map(prev_doc), align=prev_doc,)
        )
        kept.write.partitionBy(*self.partition_by).parquet(
            self._data_dir(new_v)
        )
        written = self._written_fragments(new_v)
        if not written <= frags:
            raise ValueError(
                "delete rewrote fragments outside its pruning set — "
                f"written {sorted(written)} vs touched {sorted(frags)}"
            )
        manifest = {f: v for f, v in prev.items() if f not in frags}
        manifest.update({f: new_v for f in written})
        doc = {"partition_by": self.partition_by, "partitions": manifest}
        doc["commit"] = self._commit_info(op, frags)
        self._carry_meta(doc, prev_doc, frags)
        doc["schema"] = self._frame_schema(kept)
        self._carry_dv(doc, prev_doc, frags)
        self._inherit_stats(doc, prev_doc, frags, new_v, vdir)
        self._write_blooms(new_v, vdir)
        with open(os.path.join(vdir, "manifest.json"), "w") as fh:
            json.dump(doc, fh, sort_keys=True)
        return new_v, True

    # -- update -----------------------------------------------------------
    def update_where(
        self,
        condition: Column,
        assignments: dict[str, Column | str],
    ) -> int:
        """Predicate UPDATE commit (SQL ``UPDATE t SET ... WHERE ...``)
        — the remaining DML verb beside `upsert`/`merge_into`/`delete*`:
        rows where ``condition`` is TRUE (NULL leaves the row unchanged,
        SQL UPDATE semantics) get each assignment expression evaluated
        against them, under the same partition-pruned copy-on-write
        discipline as `delete_where` — one column-pruned locate scan
        finds the partitions holding a matching row, only those are
        rewritten, everything else is inherited by reference, so commit
        cost tracks the updated data, not the table.

        ``assignments`` maps column name → Column (or SQL expression
        string), evaluated against the pre-update row — so a swap like
        ``{"a": F.col("b"), "b": F.col("a")}`` behaves as in SQL.
        Assignments may not touch KEY columns (rewriting identity is an
        erase+insert — `delete` + `upsert` keeps that explicit) or
        PARTITION columns (a moved row would leave its partition — the
        same invariant the constructor demands of keys).  Each updated
        column is cast back to its pre-update type, so an UPDATE can
        never drift the table schema (type changes are `widen_column`'s
        job).  CHECK constraints are enforced on every row of the
        rewritten partitions — an UPDATE, unlike a DELETE, can
        introduce a violation, and one abandons the whole commit.

        Returns the committed version — current version unchanged when
        no live row matches.  Updating through deletion vectors stays
        copy-on-write by design: a fragment's files are mapped to ONE
        holder version, so a merge-on-read update (DV + appended
        post-image files) has no representable layout here; the rewrite
        also materializes any live vectors on the touched partitions,
        shrinking the table's read tax as a side effect.
        """
        import json

        if not assignments:
            raise ValueError("update_where needs at least one assignment")
        exprs = {
            c: (F.expr(e) if isinstance(e, str) else e)
            for c, e in assignments.items()
        }
        frozen = sorted(
            c for c in exprs if c in self.keys or c in self.partition_by
        )
        if frozen:
            raise ValueError(
                f"update_where may not assign key/partition columns "
                f"{frozen}: a key rewrite is an erase+insert (use "
                "delete + upsert) and a partition move would leave the "
                "row's fragment"
            )
        new_v, vdir = self._claim_version()
        try:
            prev_doc = self._manifest_doc()
            prev = {
                k: int(v)
                for k, v in prev_doc.get("partitions", {}).items()
            }
            if not prev:
                self._abandon_claim(vdir)
                vs = self.versions()
                return vs[-1] if vs else 0
            hit = F.coalesce(condition, F.lit(False))
            located = (
                self._read_fragments(
                        prev, dv=self._dv_map(prev_doc), align=prev_doc)
                .filter(hit)
                .select(*self.partition_by)
                .distinct()
                .collect()
            )
            frags = {
                self._part_key(tuple(r)) for r in located
            } & set(prev)
            if not frags:
                self._abandon_claim(vdir)
                return self.versions()[-1]
            basis = self._read_fragments(
                    {f: prev[f] for f in frags},
                    dv=self._dv_map(prev_doc), align=prev_doc,)
            unknown = sorted(c for c in exprs if c not in basis.columns)
            if unknown:
                raise ValueError(
                    f"update_where assigns unknown columns {unknown}; "
                    f"table columns: {sorted(basis.columns)}"
                )
            types = {f.name: f.dataType for f in basis.schema.fields}
            updated = basis.select(
                *[
                    (
                        F.when(hit, exprs[c].cast(types[c]))
                        .otherwise(F.col(c))
                        .alias(c)
                        if c in exprs
                        else F.col(c)
                    )
                    for c in basis.columns
                ]
            )
            updated, checks = self._observe_constraints(updated, prev_doc)
            updated.write.partitionBy(*self.partition_by).parquet(
                self._data_dir(new_v)
            )
            self._raise_constraint_violations(checks)
            # an update never adds or empties a partition, so the
            # soundness gate is exact equality, like upsert()
            written = self._written_fragments(new_v)
            if written != frags:
                raise ValueError(
                    "update rewrote fragments outside its locate set — "
                    f"written {sorted(written)} vs located {sorted(frags)}"
                )
            manifest = {
                f: v for f, v in prev.items() if f not in frags
            }
            manifest.update({f: new_v for f in written})
            doc = {"partition_by": self.partition_by, "partitions": manifest}
            doc["commit"] = self._commit_info("update_where", frags)
            self._carry_meta(doc, prev_doc, frags)
            # an update never changes the schema (assignments cast
            # back), but it does materialize pending evolution on the
            # rewritten partitions
            doc["schema"] = self._frame_schema(basis)
            self._carry_dv(doc, prev_doc, frags)
            self._inherit_stats(doc, prev_doc, frags, new_v, vdir)
            self._write_blooms(new_v, vdir)
            with open(os.path.join(vdir, "manifest.json"), "w") as fh:
                json.dump(doc, fh, sort_keys=True)
        except BaseException:
            self._abandon_claim(vdir)
            raise
        self._publish(vdir)
        return new_v

    # -- merge-on-read delete (deletion vectors) --------------------------
    def delete_dv(self, keys: DataFrame) -> int:
        """Keyed DELETE as a deletion-vector commit (Delta deletion
        vectors / Iceberg v3 position deletes) — `delete`'s
        merge-on-read twin.  No data file is rewritten: the commit
        writes one (file, row_index) sidecar row per doomed row and the
        read path anti-joins them out, so erasing 100 scattered keys
        from a 100 TB table costs O(100 rows located + written), not
        O(their partitions rewritten).  The trade is a per-read
        anti-join on the affected fragments until some later commit
        rewrites them (any upsert/merge/delete touching the fragment
        materializes its vector) or `compact()` materializes
        everything.  Same pruning, claim and publish discipline as
        `delete`; a fragment whose every live row is deleted leaves the
        manifest.  Replay-safe: deleting the same keys twice is a
        no-op second time (returns the current version unchanged)."""
        missing = [c for c in self.keys if c not in keys.columns]
        if missing:
            raise ValueError(f"delete batch lacks key columns: {missing}")
        new_v, vdir = self._claim_version()
        try:
            prev_doc = self._manifest_doc()
            prev = {
                k: int(v)
                for k, v in prev_doc.get("partitions", {}).items()
            }
            if not prev:
                self._abandon_claim(vdir)
                vs = self.versions()
                return vs[-1] if vs else 0
            keys = keys.select(*self.keys).distinct()
            if set(self.partition_by) <= set(self.keys):
                touched = [
                    tuple(r)
                    for r in keys.select(*self.partition_by)
                    .distinct()
                    .collect()
                ]
                frags = {self._part_key(c) for c in touched} & set(prev)
            else:
                scan_cols = sorted(set(self.keys) | set(self.partition_by))
                located = (
                    self._read_fragments(prev, dv=self._dv_map(prev_doc))
                    .select(*scan_cols)
                    .join(keys, on=self.keys, how="left_semi")
                    .select(*self.partition_by)
                    .distinct()
                    .collect()
                )
                frags = {self._part_key(tuple(r)) for r in located}
            v, committed = self._commit_dv(
                new_v,
                vdir,
                prev_doc,
                frags,
                lambda df: df.join(keys, on=self.keys, how="left_semi"),
                op="delete_dv",
            )
        except BaseException:
            self._abandon_claim(vdir)
            raise
        if committed:
            self._publish(vdir)
        return v

    def delete_where_dv(self, condition: Column) -> int:
        """Predicate DELETE as a deletion-vector commit — see
        `delete_dv`.  SQL DELETE NULL semantics (NULL keeps the row),
        partitions located by a filter-pushdown scan like
        `delete_where`, but only sidecar rows are written."""
        new_v, vdir = self._claim_version()
        try:
            prev_doc = self._manifest_doc()
            prev = {
                k: int(v)
                for k, v in prev_doc.get("partitions", {}).items()
            }
            if not prev:
                self._abandon_claim(vdir)
                vs = self.versions()
                return vs[-1] if vs else 0
            hit = F.coalesce(condition, F.lit(False))
            touched = [
                tuple(r)
                for r in self._read_fragments(
                        prev, dv=self._dv_map(prev_doc), align=prev_doc)
                .filter(hit)
                .select(*self.partition_by)
                .distinct()
                .collect()
            ]
            frags = {self._part_key(c) for c in touched} & set(prev)
            v, committed = self._commit_dv(
                new_v,
                vdir,
                prev_doc,
                frags,
                lambda df: df.filter(hit),
                op="delete_where_dv",
            )
        except BaseException:
            self._abandon_claim(vdir)
            raise
        if committed:
            self._publish(vdir)
        return v

    def _commit_dv(
        self, new_v, vdir, prev_doc, frags, doom_fn, op: str
    ) -> tuple[int, bool]:
        """Shared deletion-vector commit: scan the touched fragments
        LIVE (existing vectors applied — a row cannot be doomed twice)
        with their (rel, row_index) addresses, select the doomed rows
        through ``doom_fn``, and write `old vector ∪ newly doomed` as
        the new sidecar.  Data files, zone maps and bloom sidecars are
        all inherited untouched (deletion only shrinks a file, so every
        recorded envelope/bitset stays a sound superset for pruning);
        `dv_rows` keeps `count_rows` metadata-only.  A fragment whose
        live rows all die leaves the manifest.  Runs under an
        already-held claim; stops before the commit marker like
        `_commit_delete` (caller publishes outside its abandon scope).
        Returns ``(version, committed)``."""
        import json

        if not frags:
            self._abandon_claim(vdir)
            return self.versions()[-1], False
        prev = {
            k: int(v) for k, v in prev_doc.get("partitions", {}).items()
        }
        dv_prev = self._dv_map(prev_doc)
        dvr_prev = {
            k: int(v) for k, v in (prev_doc.get("dv_rows") or {}).items()
        }
        live = self._read_fragments(
                {f: prev[f] for f in frags},
                dv={f: v for f, v in dv_prev.items() if f in frags},
                keep_pos=True, align=prev_doc,)
        doomed = doom_fn(live).select(
            F.regexp_extract(F.col("__rel"), r"^(.*)/[^/]+$", 1).alias(
                "frag"
            ),
            F.col("__rel").alias("rel"),
            F.col("__ri").alias("row_index"),
        )
        carried = self._read_dv(
            {f: v for f, v in dv_prev.items() if f in frags}
        )
        if carried is not None:
            doomed = doomed.unionByName(carried)
        doomed.write.parquet(self._dv_dir(new_v))
        # bounded control data: one (fragment, count) row per touched
        # fragment that has a vector
        cnt = {
            r["frag"]: int(r["n"])
            for r in self.spark.read.parquet(self._dv_dir(new_v))
            .groupBy("frag")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        if sum(cnt.values()) == sum(dvr_prev.get(f, 0) for f in frags):
            # nothing newly doomed (e.g. a replay of an applied
            # delete): no-op, no new commit
            self._abandon_claim(vdir)
            return self.versions()[-1], False
        # data-file row counts for the vectored fragments, to drop the
        # fully-emptied ones: fragment-tier manifest metadata where
        # recorded, one grouped count over the rest
        pst = prev_doc.get("stats", {})
        rk = self._ROWS_KEY
        data_rows: dict[str, int] = {}
        need_count = []
        for f in cnt:
            env = pst.get(f)
            if env and rk in env:
                data_rows[f] = int(env[rk])
            else:
                need_count.append(f)
        if need_count:
            grouped = (
                self._read_fragments({f: prev[f] for f in need_count})
                .groupBy(*self.partition_by)
                .count()
                .collect()
            )
            for r in grouped:
                f = self._part_key([r[c] for c in self.partition_by])
                data_rows[f] = int(r["count"])
        emptied = {f for f in cnt if data_rows[f] - cnt[f] <= 0}
        manifest = {f: v for f, v in prev.items() if f not in emptied}
        doc = {"partition_by": self.partition_by, "partitions": manifest}
        doc["commit"] = self._commit_info(op, frags)
        self._carry_meta(doc, prev_doc, set())
        if self.stats_cols:
            doc["stats"] = {
                f: s
                for f, s in prev_doc.get("stats", {}).items()
                if f not in emptied
            }
            fsv = {
                f: int(v)
                for f, v in (prev_doc.get("fstats_v") or {}).items()
                if f not in emptied
            }
            if fsv:
                doc["fstats_v"] = fsv
        dv_new = {
            f: v
            for f, v in dv_prev.items()
            if f not in frags and f not in emptied
        }
        dvr_new = {
            f: n
            for f, n in dvr_prev.items()
            if f not in frags and f not in emptied
        }
        for f, n in cnt.items():
            if f not in emptied:
                dv_new[f] = new_v
                dvr_new[f] = n
        if dv_new:
            doc["dv"] = dv_new
            doc["dv_rows"] = dvr_new
        with open(os.path.join(vdir, "manifest.json"), "w") as fh:
            json.dump(doc, fh, sort_keys=True)
        return new_v, True

    # -- change feed ------------------------------------------------------
    def changes(
        self,
        from_version: int,
        to_version: int,
        where: Sequence[tuple] | None = None,
        emit_update_preimages: bool = False,
    ) -> DataFrame | None:
        """Change data feed between two readable snapshots: one row per
        key whose state differs, tagged ``_change_type`` ∈ {'insert',
        'update_postimage', 'delete'} (deletes carry the pre-image, the
        others the post-image).  This is the Delta/Iceberg CDF read
        shape — the feed a downstream incremental consumer tails
        instead of re-diffing whole snapshots.

        Cost tracks the COMMITS, not the table: only fragments whose
        manifest entry differs between the versions are read (an
        unchanged partition is inherited by reference on both sides, so
        it provably holds no change); the keyed diff then joins just
        those fragments' rows.  Columns follow the to-version schema
        (rows from before an additive widening read NULL there, same as
        `read()`); change detection compares every non-key column
        null-safely.  Both endpoints must be readable snapshots —
        vacuum-demoted holders are refused, like `read(version=...)`.
        Returns None when both snapshots are empty.

        ``where`` (optional): a conjunction of inclusive ranges
        ``[(col, lo, hi), ...]`` — the feed of the RANGE-FILTERED
        table: both snapshot states are restricted to rows satisfying
        every range before diffing, so a consumer maintaining a
        filtered replica sees a row leave its range as a ``delete``
        and enter it as an ``insert`` (subset-CDF semantics).  The
        filter rides the same two-tier zone maps as `read_where_all`:
        inside the moved fragments, files whose recorded envelopes
        miss the range are skipped on manifest metadata alone (each
        side pinned to its own version's stats doc) — completing the
        "every read path prunes on metadata" story for the feed."""
        if to_version <= from_version:
            raise ValueError(
                f"need from_version < to_version, got "
                f"{from_version} >= {to_version}"
            )
        doc0 = self._manifest_doc(from_version)
        doc1 = self._manifest_doc(to_version)
        m0 = {k: int(v) for k, v in doc0.get("partitions", {}).items()}
        m1 = {k: int(v) for k, v in doc1.get("partitions", {}).items()}
        dv0 = self._dv_map(doc0)
        dv1 = self._dv_map(doc1)
        # a fragment's effective state is (data holder, dv holder):
        # a dv-only commit moves no data files but still changes what
        # the fragment's readers see, so it must enter the diff
        frags = {
            f
            for f in set(m0) | set(m1)
            if (m0.get(f), dv0.get(f)) != (m1.get(f), dv1.get(f))
        }
        if not m0 and not m1:
            return None
        if where:
            where = [tuple(c) for c in where]
            old, *_ = self._pruned_fragment_read(
                doc0, {f: m0[f] for f in frags & set(m0)}, where,
            )
            new, *_ = self._pruned_fragment_read(
                doc1, {f: m1[f] for f in frags & set(m1)}, where,
            )
        else:
            old = self._read_fragments(
                    {f: m0[f] for f in frags & set(m0)}, dv=dv0, align=doc0)
            new = self._read_fragments(
                    {f: m1[f] for f in frags & set(m1)}, dv=dv1, align=doc1)
        if old is None and new is None:
            # no fragment moved: an empty feed with the to-schema
            base = self.read(to_version) or self.read(from_version)
            return base.filter(F.lit(False)).withColumn(
                "_change_type", F.lit("")
            ).select("_change_type", *base.columns)
        # align both sides to the union schema (additive evolution)
        if old is None:
            old = new.filter(F.lit(False))
        if new is None:
            new = old.filter(F.lit(False))
        old = old.unionByName(new.limit(0), allowMissingColumns=True)
        new = new.unionByName(old.limit(0), allowMissingColumns=True)
        cols = new.columns
        data_cols = [c for c in cols if c not in self.keys]
        # explicit presence markers + null-safe key equality: a row
        # whose key carries a NULL (legal in non-partition key columns)
        # must pair its old and new copies instead of emitting a
        # phantom delete+insert on every fragment rewrite
        o = old.select(*cols).withColumn("__o", F.lit(1)).alias("o")
        n = new.select(*cols).withColumn("__n", F.lit(1)).alias("n")
        cond = None
        for k in self.keys:
            eq = F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}"))
            cond = eq if cond is None else cond & eq
        j = o.join(n, cond, "full_outer")
        o_here = F.col("o.__o").isNotNull()
        n_here = F.col("n.__n").isNotNull()
        differs = F.lit(False)
        for c in data_cols:
            differs = differs | ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
        ct = (
            F.when(~o_here, F.lit("insert"))
            .when(~n_here, F.lit("delete"))
            .when(differs, F.lit("update_postimage"))
        )
        out_cols = [
            F.when(ct == "delete", F.col(f"o.{c}"))
            .otherwise(F.col(f"n.{c}"))
            .alias(c)
            for c in cols
        ]
        feed = (
            j.withColumn("_change_type", ct)
            .filter(F.col("_change_type").isNotNull())
            .select("_change_type", *out_cols)
        )
        if emit_update_preimages:
            # Delta CDF's full update shape: each update additionally
            # emits its OLD row tagged 'update_preimage' — what a
            # retraction-based consumer (incremental view maintenance)
            # needs to subtract the old contribution.  Opt-in so the
            # default feed keeps its one-row-per-changed-key contract.
            pre = (
                j.withColumn("_change_type", ct)
                .filter(F.col("_change_type") == "update_postimage")
                .select(
                    F.lit("update_preimage").alias("_change_type"),
                    *[F.col(f"o.{c}").alias(c) for c in cols],
                )
            )
            feed = feed.unionByName(pre)
        return feed

    def tail_changes(
        self,
        since_version: int | None,
        where: Sequence[tuple] | None = None,
    ) -> tuple[DataFrame | None, int]:
        """Incremental-consumer cursor over the change feed: returns
        ``(feed, cursor)`` where ``feed`` is everything that changed
        since the caller's last cursor and ``cursor`` is the version to
        pass next time.  ``since_version=None`` is the initial load —
        the full current snapshot tagged ``'insert'``.  When nothing new
        committed, feed is None and the cursor is unchanged.  This is
        the polling half of a CDF subscription (the availableNow
        trigger's shape): consumers checkpoint the cursor, not offsets,
        and each poll costs the commits since the last one.

        ``where``: subscribe to the RANGE-FILTERED table (see
        `changes`); the initial load is then a zone-map-pruned
        `read_where_all` and every later poll prunes files inside the
        moved fragments — a subscriber to one key range never pays for
        the rest of the table."""
        vs = self.versions()
        if not vs:
            return None, 0
        latest = vs[-1]
        if since_version is None or since_version == 0:
            # 0 is the cursor this method itself hands out for an
            # empty table — the next poll is an initial load
            if where:
                snap = self.read_where_all(where, version=latest)[0]
            else:
                snap = self.read(latest)
            if snap is None:
                return None, latest
            return (
                snap.withColumn("_change_type", F.lit("insert")).select(
                    "_change_type", *snap.columns
                ),
                latest,
            )
        if since_version >= latest:
            return None, since_version
        return self.changes(since_version, latest, where=where), latest

    # -- maintenance ----------------------------------------------------
    # Z-order bucketing resolution: 8 bits (256 rank buckets) per
    # cluster column.  With k columns the interleaved key is 8k bits —
    # fine for the long arithmetic up to the 4-column cap below.
    _Z_BITS = 8

    def _metadata_bounds(
        self, doc: dict, col: str
    ) -> tuple[float, float] | None:
        """[min, max] for ``col`` folded from the manifest's fragment
        envelopes — None unless EVERY live fragment recorded one.  For
        LAYOUT bounds a dv'd fragment's superset envelope is fine (it
        only widens buckets, never misplaces a row), unlike the exact
        `metadata_min_max` contract."""
        m = doc.get("partitions", {})
        st = doc.get("stats", {})
        mn = mx = None
        for frag in m:
            env = (st.get(frag) or {}).get(col)
            if env is None:
                return None
            lo, hi = env
            if lo is not None and (mn is None or lo < mn):
                mn = lo
            if hi is not None and (mx is None or hi > mx):
                mx = hi
        if mn is None or mx is None:
            return None
        return float(mn), float(mx)

    def _zorder_key(
        self,
        src: DataFrame,
        cols: Sequence[str],
        doc: dict,
        bucketing: str = "uniform",
    ) -> Column:
        """Engine-side Z-order (Morton) key over ``cols``: each column
        is quantized to 2^8 uniform-width buckets between its min and
        max (folded from the manifest's zone-map envelopes when every
        live fragment recorded one — zero data scan — else one bounds
        aggregate; arithmetic only, no window, no UDF), then the bucket
        bits are interleaved so no column dominates the sort.  Both
        halves are the SHARED layout primitives
        (`sources.writers.scaled_bucket` / `morton_interleave` — the
        same code `write_zordered` runs, so the paths cannot drift).
        Sorting files by this key gives every cluster column locality
        at once: a predicate on ANY of them skips files via the
        per-file zone maps, where a linear (lexicographic) sort serves
        only its leading column.  NULLs bucket to 0 (NULLS FIRST);
        constant / all-NULL columns add no order.  Numeric columns
        only — uniform buckets need an arithmetic domain.

        ``bucketing="quantile"`` swaps the uniform-width grid for
        `operators.layout.quantile_bounds` / `quantile_bucket`
        (~equal-POPULATION buckets from a deterministic sample): on a
        skewed column the uniform grid collapses most rows into a few
        buckets — the Morton key then carries almost no information
        for that dimension and its file-skipping dies — while quantile
        buckets keep every z-cell comparably full.  Costs one bounded
        sample collect per column at layout time and a literal-array
        scan per row in the rewrite."""
        from ..sources.writers import morton_interleave, scaled_bucket

        if bucketing not in ("uniform", "quantile"):
            raise ValueError(
                "bucketing must be 'uniform' or 'quantile', "
                f"got {bucketing!r}"
            )
        if not 1 <= len(cols) <= 4:
            raise ValueError("zorder takes 1-4 cluster columns")
        dtypes = dict(src.dtypes)
        numeric = ("tinyint", "smallint", "int", "bigint", "float",
                   "double", "decimal")
        for c in cols:
            dt = dtypes.get(c)
            if dt is None or not dt.startswith(numeric):
                raise ValueError(
                    f"zorder column {c!r} must be numeric, got {dt}"
                )
        if bucketing == "quantile":
            from .layout import quantile_bounds, quantile_bucket

            buckets = []
            for c in cols:
                qb = quantile_bounds(src, c, bits=self._Z_BITS)
                if not qb:
                    buckets.append(F.lit(0).cast("long"))
                    continue
                buckets.append(quantile_bucket(F.col(c), qb))
            return morton_interleave(buckets, self._Z_BITS)
        bounds: dict[str, tuple] = {}
        need_agg = []
        for c in cols:
            meta = self._metadata_bounds(doc, c)
            if meta is not None:
                bounds[c] = meta
            else:
                need_agg.append(c)
        if need_agg:
            r = src.agg(
                *[
                    F.min(c).cast("double").alias(f"mn_{c}")
                    for c in need_agg
                ],
                *[
                    F.max(c).cast("double").alias(f"mx_{c}")
                    for c in need_agg
                ],
            ).first()
            for c in need_agg:
                bounds[c] = (r[f"mn_{c}"], r[f"mx_{c}"])
        buckets = [
            scaled_bucket(F.col(c), *bounds[c], self._Z_BITS)
            for c in cols
        ]
        return morton_interleave(buckets, self._Z_BITS)

    def compact(
        self,
        cluster_by: Sequence[str] | None = None,
        cluster_files: int = 8,
        cluster_method: str = "linear",
        cluster_bucketing: str = "uniform",
        partition_by: Sequence[str] | None = None,
        generated_partitions: dict[str, str] | None = None,
    ) -> int:
        """Checkpoint commit: rewrite EVERY live partition under one new
        version so the latest manifest references a single holder.

        ``cluster_by``: OPTIMIZE-with-clustering — instead of one file
        per partition, range-partition the rewrite on (partition cols,
        cluster cols) across ``cluster_files`` tasks and sort within
        each, so a fragment's files own DISJOINT cluster-column ranges.
        ``cluster_method="zorder"`` interleaves the cluster columns'
        rank-bucket bits into one Morton key instead (Delta's OPTIMIZE
        ZORDER BY): the lexicographic sort serves only its LEADING
        column's predicates, the Z-order layout serves every cluster
        column at once — multi-dimensional file skipping from the same
        zone maps (see `_zorder_key`; ``cluster_bucketing="quantile"``
        swaps the uniform grid for sample-quantile buckets when a
        cluster column is skewed).
        Combined with the per-file zone maps every stats commit records,
        `read_where` then skips individual files inside a surviving
        fragment (Delta's OPTIMIZE ZORDER BY, for one key family), and
        the in-file sort tightens parquet row-group min/max for the
        scan that remains.  Still observationally the identity.

        Incremental commits scatter a snapshot's files across version
        dirs (each partition lives wherever it was last rewritten), so
        reads open one scan per holder version and vacuum() must demote
        and keep every still-referenced older dir.  Compaction collapses
        the scatter: after ``compact()`` the latest snapshot is entirely
        self-contained, a following ``vacuum()`` can reclaim every older
        dir (retention permitting), and reads resolve one version.  It
        is observationally a no-op — ``read()`` returns the same rows
        before and after — and doubles as small-file bin-packing: the
        rewrite repartitions on the partition columns, so each hive
        partition's accumulated files land in one shuffle task's output
        (at cluster scale a single huge partition would need
        ``repartition(n, cols)`` instead — this table's shape is the
        reference's many-small-daily-indexes layout, where one task per
        day is the right packing).  Schema evolved across commits is
        materialized to the unified (union-by-name) schema.

        Already-compact tables (every manifest entry already points at
        the latest version) return the current version without writing.
        This is the OPTIMIZE/checkpoint half of the Delta/Iceberg
        maintenance pair, next to ``vacuum()``'s retention half.

        ``partition_by``: PARTITION EVOLUTION — rewrite the snapshot
        under a NEW partition scheme (day → month buckets, or adding a
        generated partition column to a table that predates it)
        WITHOUT rewriting history: old snapshots keep their manifests
        and layouts (each version's reads resolve through its own
        fragment names, so ``read(version=…)`` / ``read_as_of`` cross
        the boundary transparently), and only this one full rewrite —
        which compaction pays anyway — carries the transition.
        ``generated_partitions`` (only with ``partition_by``) REPLACES
        the table's generated-column derivations for the new scheme; a
        new partition column absent from the data MUST have one (the
        rewrite derives it), and later writes derive/validate it
        exactly like a creation-time declaration.  Handles built with
        the old scheme are refused at their next commit
        (`_check_scheme`); this handle adopts the new scheme on
        success.  The new scheme must keep the pruned-commit invariant
        (partition columns inside the key, or stable_partitions).
        """
        import json

        if cluster_method not in ("linear", "zorder"):
            raise ValueError(
                "cluster_method must be 'linear' or 'zorder', "
                f"got {cluster_method!r}"
            )
        if cluster_method == "zorder" and not cluster_by:
            raise ValueError("zorder takes 1-4 cluster columns, got none")
        if generated_partitions is not None and partition_by is None:
            raise ValueError(
                "generated_partitions requires partition_by (it "
                "declares derivations FOR the new scheme)"
            )
        pb = list(partition_by) if partition_by else list(self.partition_by)
        # passing generated_partitions alone is still an evolution (it
        # replaces the derivation set for the — unchanged — scheme)
        evolving = (
            pb != list(self.partition_by) or generated_partitions is not None
        )
        if not pb:
            raise ValueError("partition_by must name at least one column")
        if evolving and not (
            self.stable_partitions or set(pb) <= set(self.keys)
        ):
            raise ValueError(
                "the new scheme must keep partition columns inside the "
                "key (or the table must be stable_partitions=True) — "
                "a key that moved partitions would leave its stale row "
                "behind in the old partition on later pruned commits"
            )
        if evolving:
            gen_map = dict(generated_partitions or {})
        else:
            gen_map = None  # carried verbatim by _carry_meta
        if gen_map is not None:
            bad_gen = sorted(set(gen_map) - set(pb))
            if bad_gen:
                raise ValueError(
                    f"generated_partitions must target new partition "
                    f"columns; {bad_gen} are not in {pb}"
                )
        if not self.versions():
            return 0
        old_pb = list(self.partition_by)
        old_gen = dict(self.generated_partitions)
        new_v, vdir = self._claim_version()
        try:
            prev_doc = self._manifest_doc()
            prev = {
                k: int(v)
                for k, v in prev_doc.get("partitions", {}).items()
            }
            dv = self._dv_map(prev_doc)
            if not prev:
                self._abandon_claim(vdir)
                return self.versions()[-1]
            cur = new_v - 1
            if (
                set(prev.values()) == {cur}
                and not cluster_by
                and not dv
                and not evolving
            ):
                # already single-holder; with cluster_by the rewrite is
                # a LAYOUT change, wanted even when no scatter exists —
                # and live deletion vectors always compact (this is the
                # explicit materialize-everything path)
                self._abandon_claim(vdir)
                return cur
            src = self._read_fragments(prev, dv=dv, align=prev_doc)
            if evolving:
                for pc in pb:
                    if pc in src.columns:
                        if pc in gen_map:
                            raise ValueError(
                                f"generated partition column {pc!r} "
                                "already exists in the data — a new "
                                "derivation would be ambiguous against "
                                "stored values; pick a fresh name"
                            )
                        continue
                    if pc not in gen_map:
                        raise ValueError(
                            f"new partition column {pc!r} is not in the "
                            "data and has no generated_partitions "
                            "derivation"
                        )
                    src = src.withColumn(pc, F.expr(gen_map[pc]))
                # adopt the new scheme NOW: the write layout, fragment
                # walker, stats, and bloom builders below all render
                # through self.partition_by (restored on failure)
                self.partition_by = pb
                self.generated_partitions = dict(gen_map)
            if cluster_by and cluster_method == "zorder":
                if "__zkey" in src.columns:
                    raise ValueError(
                        "'__zkey' is reserved by zorder compaction; "
                        "rename the column"
                    )
                zkey = self._zorder_key(
                    src, list(cluster_by), prev_doc,
                    bucketing=cluster_bucketing,
                )
                lay = [
                    *[F.col(c) for c in self.partition_by],
                    F.col("__zkey"),
                ]
                out = (
                    src.withColumn("__zkey", zkey)
                    .repartitionByRange(cluster_files, *lay)
                    .sortWithinPartitions(*lay)
                    .drop("__zkey")
                )
            elif cluster_by:
                lay_cols = [
                    F.col(c) for c in (*self.partition_by, *cluster_by)
                ]
                out = src.repartitionByRange(
                    cluster_files, *lay_cols
                ).sortWithinPartitions(*lay_cols)
            else:
                out = src.repartition(
                    *[F.col(c) for c in self.partition_by]
                )
            out.write.partitionBy(*self.partition_by).parquet(
                self._data_dir(new_v)
            )
            # same commit soundness gate as upsert(): the manifest must
            # name exactly the dirs Spark wrote — a pure rewrite drops
            # no partition (merges never delete rows), so equality is
            # exact.  Under an evolving scheme the expectation comes
            # from the data itself (one column-pruned distinct over the
            # new partition columns, bounded by partition count — also
            # the NULL-partition-value gate, since _part_key refuses
            # NULLs that Spark would have written as a default dir).
            written = self._written_fragments(new_v)
            if evolving:
                expected = {
                    self._part_key([r[c] for c in pb], pb)
                    for r in src.select(*pb).distinct().collect()
                }
            else:
                expected = set(prev)
            if written != expected:
                raise ValueError(
                    "compaction rewrite diverged from the live manifest "
                    f"— written {sorted(written)} vs expected "
                    f"{sorted(expected)}"
                )
            doc = {
                "partition_by": list(pb),
                "partitions": {frag: new_v for frag in written},
            }
            doc["commit"] = self._commit_info("compact", set(prev))
            self._carry_meta(doc, prev_doc, set(prev))
            # the full rewrite physically shed every dropped column's
            # bytes — names become safe to reuse
            doc.pop("dropped_columns", None)
            if evolving:
                # derivations are per-scheme; generated_partitions
                # REPLACES them for the new scheme (old ones reference
                # columns that may no longer partition the table)
                if gen_map:
                    doc["generated"] = dict(gen_map)
                else:
                    doc.pop("generated", None)
            doc["schema"] = self._frame_schema(out)
            if self.stats_cols:
                # full rewrite: recompute every envelope, which also
                # backfills fragments committed before stats_cols was
                # set; the whole file tier lands in THIS version's
                # sidecar (and any inline legacy file_stats dies with
                # the rewrite)
                doc["stats"], new_ffs = self._compute_stats_both(new_v)
                if new_ffs:
                    self._write_fstats_sidecar(vdir, new_ffs)
                    doc["fstats_v"] = {f: new_v for f in new_ffs}
            self._write_blooms(new_v, vdir)
            with open(os.path.join(vdir, "manifest.json"), "w") as fh:
                json.dump(doc, fh, sort_keys=True)
        except BaseException:
            # a failed evolution must leave the handle on the OLD
            # scheme (the table's latest manifest still declares it)
            self.partition_by = old_pb
            self.generated_partitions = old_gen
            self._abandon_claim(vdir)
            raise
        self._publish(vdir)
        return new_v

    def maybe_compact(self, max_scatter: int) -> int | None:
        """Auto-OPTIMIZE policy for long-running sinks: compact when the
        live manifest references MORE than ``max_scatter`` distinct
        holder versions, else do nothing.  The check is one manifest
        read (bounded metadata, no data touched), so a streaming sink
        can afford it after every micro-batch commit; the compaction it
        occasionally triggers bounds read fan-out (scans per read ≤
        max_scatter + 1) and holder accumulation at any commit count.
        Returns the new version when it compacted, else None."""
        if max_scatter < 1:
            raise ValueError("max_scatter must be >= 1")
        m = self.manifest()
        if len(set(m.values())) > max_scatter:
            return self.compact()
        return None

    def rollback(self, version: int) -> None:
        """Drop snapshots newer than `version`, making it the latest.

        Refuses holder-only targets (their manifests may reference
        vacuumed versions — rolling back to one would wedge every later
        read/upsert with dangling fragment references) and, belt and
        braces, any target whose manifest names a version dir missing
        from disk.  Holder dirs the surviving snapshots no longer
        reference are swept so rollback cannot leak data dirs."""
        import shutil

        vs = self.versions()
        if version not in vs:
            if self._is_holder(version):
                raise ValueError(
                    f"cannot roll back to version {version}: it is a "
                    "data holder, not a complete snapshot (its manifest "
                    "may reference vacuumed versions); readable "
                    f"snapshots: {vs}"
                )
            raise ValueError(f"version {version} not in {vs}")
        tdoc = self._manifest_doc(version)
        needed = set(
            int(h) for h in tdoc.get("partitions", {}).values()
        ) | set(self._dv_map(tdoc).values())
        missing = {
            v
            for v in needed
            if not os.path.exists(
                os.path.join(self._vdir_of(v), "_SUCCESS")
            )
        }
        if missing:
            raise ValueError(
                f"cannot roll back to version {version}: its manifest "
                f"references missing version dirs {sorted(missing)}"
            )
        for v in vs:
            if v > version:
                shutil.rmtree(self._vdir(v), ignore_errors=True)
        self._sweep_unreferenced_holders()

    def restore(self, version: int) -> int:
        """Delta ``RESTORE TABLE ... VERSION AS OF`` — the
        history-PRESERVING undo: make ``version``'s state current
        again as a NEW commit whose manifest references the target
        snapshot's holders (and deletion vectors, schema, defaults,
        constraints) by reference — one metadata write, nothing
        deleted, nothing rewritten, so the bad commits stay auditable
        in `history()` and a later restore can even undo the undo.
        `rollback` is the destructive variant (drops the newer
        version dirs).  Refuses holder-only targets like
        `read(version=...)`, and any target whose referenced dirs a
        vacuum already removed.  Returns the committed version."""
        import json

        new_v, vdir = self._claim_version()
        try:
            tdoc = self._manifest_doc(version)  # validates readability
            needed = (
                {int(h) for h in tdoc.get("partitions", {}).values()}
                | set(self._dv_map(tdoc).values())
                | self._fstats_versions(tdoc)
            )
            missing = {
                v
                for v in needed
                if not os.path.exists(
                    os.path.join(self._vdir_of(v), "_SUCCESS")
                )
            }
            if missing:
                raise ValueError(
                    f"cannot restore version {version}: it references "
                    f"vacuumed version dirs {sorted(missing)}"
                )
            doc = dict(tdoc)
            doc["commit"] = self._commit_info("restore", set())
            with open(os.path.join(vdir, "manifest.json"), "w") as fh:
                json.dump(doc, fh, sort_keys=True)
        except BaseException:
            self._abandon_claim(vdir)
            raise
        self._publish(vdir)
        return new_v

    def backfill_stats(self) -> int:
        """ANALYZE-style zone-map backfill: record fragment + file
        envelopes (and exact row counts) for every fragment that lacks
        them — typically fragments committed before ``stats_cols`` was
        configured — WITHOUT rewriting any data file: one
        column-pruned scan of the uncovered fragments and a
        metadata-only commit (every fragment inherited by reference).
        This is the cheap alternative to paying a full ``compact()``
        rewrite just to earn data skipping and metadata-only
        COUNT/MIN/MAX on old data.  A stats column absent from a
        fragment's files is recorded as an all-NULL envelope
        ([None, None]) — exactly what schema alignment makes those
        values read as — so coverage converges instead of re-scanning
        forever.  Counts are raw file counts (deletion vectors are
        subtracted downstream, same as write-path stats).  Returns the
        committed version — unchanged when nothing lacks coverage."""
        import json

        if not self.stats_cols:
            raise ValueError(
                "backfill_stats needs stats_cols configured on this "
                "handle (the columns to record envelopes for)"
            )
        rk = self._ROWS_KEY
        new_v, vdir = self._claim_version()
        try:
            prev_doc = self._manifest_doc()
            prev = {
                k: int(v)
                for k, v in prev_doc.get("partitions", {}).items()
            }
            st = prev_doc.get("stats", {})
            # file-tier coverage = an fstats_v sidecar entry OR inline
            # legacy file_stats (presence only — no sidecar is opened)
            covered_files = set(prev_doc.get("fstats_v") or {}) | set(
                prev_doc.get("file_stats") or {}
            )
            need = {
                f: v
                for f, v in prev.items()
                if f not in st
                or f not in covered_files
                or rk not in st[f]
                or any(c not in st[f] for c in self.stats_cols)
            }
            if not need:
                self._abandon_claim(vdir)
                vs = self.versions()
                return vs[-1] if vs else 0
            new_fs: dict = {}
            new_ffs: dict = {}
            by_v: dict[int, list[str]] = {}
            for f, v in need.items():
                by_v.setdefault(v, []).append(f)
            for v, frags in sorted(by_v.items()):
                df = self.spark.read.option(
                    "basePath", self._data_dir(v)
                ).parquet(
                    *sorted(
                        os.path.join(self._data_dir(v), f) for f in frags
                    )
                )
                fs, ffs = self._stats_over(df)
                new_fs.update(fs)
                new_ffs.update(ffs)
            # mark configured columns absent from the files as all-NULL
            # envelopes so coverage converges
            for f in need:
                for c in self.stats_cols:
                    new_fs.setdefault(f, {rk: 0}).setdefault(
                        c, [None, None]
                    )
                    for envs in new_ffs.get(f, {}).values():
                        envs.setdefault(c, [None, None])
            doc = dict(prev_doc)
            doc["stats"] = {**st, **new_fs}
            if new_ffs:
                # the backfilled file envelopes land in THIS commit's
                # sidecar; fstats_v points the covered fragments here
                # (their DATA holder is unchanged — stats holder and
                # data holder are independent, exactly like dv)
                self._write_fstats_sidecar(vdir, new_ffs)
                doc["fstats_v"] = {
                    **(prev_doc.get("fstats_v") or {}),
                    **{f: new_v for f in new_ffs},
                }
            doc["commit"] = self._commit_info(
                "backfill_stats", set(need)
            )
            with open(os.path.join(vdir, "manifest.json"), "w") as fh:
                json.dump(doc, fh, sort_keys=True)
        except BaseException:
            self._abandon_claim(vdir)
            raise
        self._publish(vdir)
        return new_v

    def describe_detail(self) -> DataFrame:
        """Delta ``DESCRIBE DETAIL``: one metadata-only row describing
        the table — no data file is read (sizes come from filesystem
        listings of the current holders)."""
        import json

        from pyspark.sql.types import (
            IntegerType,
            LongType,
            StringType,
            StructField,
            StructType,
        )

        vs = self.versions()
        doc = self._manifest_doc() if vs else {}
        m = {k: int(v) for k, v in doc.get("partitions", {}).items()}
        num_files = 0
        size_bytes = 0
        for frag, v in m.items():
            frag_dir = os.path.join(self._data_dir(v), frag)
            for name in os.listdir(frag_dir):
                if name.endswith(".parquet"):
                    num_files += 1
                    size_bytes += os.path.getsize(
                        os.path.join(frag_dir, name)
                    )
        dv_rows = sum(
            int(n) for n in (doc.get("dv_rows") or {}).values()
        )
        schema = StructType(
            [
                StructField("format", StringType(), False),
                StructField("location", StringType(), False),
                StructField("partition_columns", StringType(), False),
                StructField("current_version", IntegerType(), True),
                StructField("num_versions", IntegerType(), False),
                StructField("num_fragments", IntegerType(), False),
                StructField("num_files", IntegerType(), False),
                StructField("size_bytes", LongType(), False),
                StructField("dv_rows", LongType(), False),
                StructField("schema_json", StringType(), True),
                StructField("cloned_from", StringType(), True),
            ]
        )
        base = doc.get("base") or {}
        row = (
            "parquet+manifest",
            self.path,
            ",".join(self.partition_by),
            vs[-1] if vs else None,
            len(vs),
            len(m),
            num_files,
            size_bytes,
            dv_rows,
            json.dumps(doc.get("schema")) if doc.get("schema") else None,
            ",".join(sorted(set(base.values()))) or None,
        )
        return self.spark.createDataFrame([row], schema)

    def clone_to(self, dest_path: str) -> "ManifestSnapshotTable":
        """SHALLOW CLONE (Delta ``CREATE TABLE ... SHALLOW CLONE``): a
        new, independently writable table whose first snapshot
        references this table's CURRENT data files by path — zero data
        copied at any table size, so a 100 TB dev/test sandbox costs
        one manifest write.  The clone's manifest carries a ``base``
        map (version → origin table root); reads resolve inherited
        fragments (and their deletion vectors and bloom sidecars)
        through it, while every NEW commit writes locally and detaches
        the fragments it rewrites.  ``compact()`` on the clone rewrites
        everything locally — the explicit deep-copy materialization
        that severs the last base reference.

        The clone inherits the declared schema, defaults, persisted
        CHECK constraints, zone maps, and dv/bloom metadata of the
        source's current snapshot, and this handle's table
        configuration (keys/order/partitioning/stats/bloom/retention).
        Its local version sequence starts ABOVE every referenced
        source version, so local commits never collide with base
        entries.

        Caveat (exactly Delta's): the clone borrows the source's
        files — a source-side ``vacuum``/``rollback`` that deletes a
        referenced version breaks the clone.  Clones are sandboxes;
        sever with ``compact()`` before relying on one past the
        source's retention window."""
        import json

        src_doc = self._manifest_doc()
        if not src_doc:
            raise ValueError("cannot clone an empty table")
        if os.path.isdir(dest_path) and os.listdir(dest_path):
            raise ValueError(f"clone destination {dest_path!r} is not empty")
        referenced = (
            {int(h) for h in src_doc.get("partitions", {}).values()}
            | set(self._dv_map(src_doc).values())
            | self._fstats_versions(src_doc)
        )
        src_base = {
            int(k): v for k, v in (src_doc.get("base") or {}).items()
        }
        src_root = os.path.abspath(self.path)
        # chained clones resolve transitively: a version the source
        # itself borrowed keeps pointing at ITS origin
        base = {
            str(v): src_base.get(v, src_root) for v in referenced
        }
        dest = ManifestSnapshotTable(
            self.spark,
            dest_path,
            keys=self.keys,
            order_cols=self.order_cols,
            partition_by=self.partition_by,
            stable_partitions=not (
                set(self.partition_by) <= set(self.keys)
            ),
            keep_versions=self.keep_versions,
            keep_seconds=self.keep_seconds,
            stats_cols=self.stats_cols or None,
            claim_ttl_seconds=self.claim_ttl_seconds,
            bloom_cols=self.bloom_cols or None,
            bloom_bits=self.bloom_bits,
            bloom_k=self.bloom_k,
        )
        clone_v = max(referenced, default=0) + 1
        vdir = dest._vdir(clone_v)
        os.makedirs(vdir)
        doc = dict(src_doc)
        doc["base"] = base
        doc["commit"] = self._commit_info("clone", set())
        with open(os.path.join(vdir, "manifest.json"), "w") as fh:
            json.dump(doc, fh, sort_keys=True)
        with open(os.path.join(vdir, "_SUCCESS"), "w"):
            pass
        return dest

    def _sweep_unreferenced_holders(self) -> None:
        """Delete holder-only dirs no remaining complete snapshot's
        manifest references."""
        import shutil

        referenced: set[int] = set()
        for v in self.versions():
            doc = self._manifest_doc(v)
            referenced.update(
                int(h) for h in doc.get("partitions", {}).values()
            )
            referenced.update(self._dv_map(doc).values())
            referenced.update(self._fstats_versions(doc))
        for v in self._committed_dirs():
            if self._is_holder(v) and v not in referenced:
                shutil.rmtree(self._vdir(v), ignore_errors=True)

    def vacuum(self) -> None:
        """Retain the UNION of both retention policies — the newest
        `keep_versions` complete snapshots, and (Delta's ``VACUUM ...
        RETAIN N HOURS``) every snapshot whose commit timestamp is
        younger than `keep_seconds` — always including the latest.
        Every older version dir still referenced by a retained
        manifest is DEMOTED to a data holder (`_HOLDER_ONLY` tombstone
        — its files survive for the manifests that inherit them, but
        it is no longer offered as a readable snapshot, because its
        own manifest may reference versions this vacuum deletes);
        everything else — including holders that have since become
        unreferenced — is deleted.  A snapshot without a recorded
        commit timestamp is kept under the time policy
        (conservative)."""
        import shutil
        import time

        if self.keep_versions is None and self.keep_seconds is None:
            return
        vs = self.versions()
        if not vs:
            return
        retained: set[int] = {vs[-1]}
        if self.keep_versions is not None:
            retained |= set(vs[-self.keep_versions:])
        if self.keep_seconds is not None:
            cut = time.time() - self.keep_seconds
            for v in vs:
                if v not in self._ts_cache:
                    info = self._manifest_doc(v).get("commit") or {}
                    raw = info.get("ts")
                    # sentinel keeps ts-less legacy commits from
                    # re-parsing their manifest every vacuum
                    self._ts_cache[v] = (
                        float(raw) if raw is not None else float("inf")
                    )
                if self._ts_cache[v] == float("inf") or (
                    self._ts_cache[v] >= cut
                ):
                    retained.add(v)
        referenced = set()
        for v in retained:
            doc = self._manifest_doc(v)
            referenced.update(
                int(h) for h in doc.get("partitions", {}).values()
            )
            # deletion-vector holders are live references too: a
            # fragment's current vector may be served by an older
            # version's dv/ dir — and so are file-stats sidecar
            # holders (a backfill commit's sidecar covers fragments
            # whose data lives elsewhere)
            referenced.update(self._dv_map(doc).values())
            referenced.update(self._fstats_versions(doc))
        for v in self._committed_dirs():
            if v in retained:
                continue
            if v in referenced:
                with open(
                    os.path.join(self._vdir(v), self._HOLDER_MARKER), "w"
                ):
                    pass
            else:
                shutil.rmtree(self._vdir(v), ignore_errors=True)
