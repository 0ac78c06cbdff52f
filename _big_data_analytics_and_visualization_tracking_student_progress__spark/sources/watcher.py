"""Drop-folder watcher with modified-file re-ingest (S2 parity).

Reference behavior (pro.py:94-108): a watchdog observer fires on BOTH
`on_created` and `on_modified` — an in-place overwrite of an already
-processed spreadsheet re-feeds the whole file, and the row-hash dict
(pro.py:18,46-55) suppresses the unchanged rows.

Spark's file stream source covers `on_created` but never re-reads a
modified path (sources/readers.py:129 documents the gap; VERDICT r5
item 5 closes it).  This module adds the missing half as a file-level
CDC layer — the file-granularity analog of operators/cdc.py's
`diff_snapshots`:

- `DropFolderMonitor` keeps a `{path: (size, mtime_ns, content_md5)}`
  snapshot (JSON, restart-safe).  `poll()` stats the folder, re-hashes
  only files whose cheap stat signature moved, and emits the paths
  whose CONTENT actually changed (mtime alone is not trusted — a
  touch without an edit re-emits nothing).
- `DropIngestor.process_once()` re-reads each emitted file
  (`read_excel`: .xlsx or .xls by magic), diffs its rows against the
  file's persisted row-hash snapshot (operators/cdc.py `with_row_hash`
  anti-join — byte-identical rows are suppressed, exactly the
  reference's semantics), appends the surviving rows to a parquet
  changed-rows log stamped with a monotonic `ingest_seq`, and MERGEs
  them into the keyed serving table.

Scale posture: the folder listing / file hashing is driver-side by
design — a drop folder is an operational inbox of small spreadsheets
(the reference's is a single directory of .xls files), not a data lake;
every row-level step (hash diff, merge) is a distributed DataFrame op,
and the changed-rows log is an append-only parquet audit feed that
downstream jobs can stream from.
"""

from __future__ import annotations

import hashlib
import json
import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.cdc import HASH_COL, with_row_hash
from ..operators.relational import anti_join
from ..operators.upsert import KeyedParquetTable

SEQ_COL = "ingest_seq"


class DropFolderMonitor:
    """File-level change detection over a drop folder.

    The snapshot maps path → (size, mtime_ns, md5).  A file is emitted
    when it is new or its content hash changed; the (size, mtime_ns)
    pair only gates which files get re-hashed, so an untouched 10k-file
    inbox costs one listdir + stats, no reads."""

    def __init__(
        self,
        folder: str,
        state_path: str,
        exts: Sequence[str] = (".xlsx", ".xls"),
        paranoid: bool = False,
    ):
        self.folder = folder
        self.state_path = state_path
        self.exts = tuple(exts)
        self.paranoid = paranoid
        self._state: dict[str, list] = {}
        if os.path.exists(state_path):
            with open(state_path) as fh:
                self._state = json.load(fh)

    def _persist(self) -> None:
        os.makedirs(os.path.dirname(self.state_path), exist_ok=True)
        tmp = self.state_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(self._state, fh)
        os.replace(tmp, self.state_path)

    @staticmethod
    def _md5(path: str) -> str:
        h = hashlib.md5()
        with open(path, "rb") as fh:
            for block in iter(lambda: fh.read(1 << 20), b""):
                h.update(block)
        return h.hexdigest()

    def scan(self) -> dict[str, list]:
        """Paths whose content is new or changed since the last commit,
        mapped to their fresh (size, mtime_ns, md5) signature.  Does NOT
        touch persisted state: a changed path only leaves the changed
        set once the caller has fully processed it and called
        `commit(path, sig)` — so a crash mid-ingest re-emits the file on
        the next scan instead of silently losing it.

        Known gate semantics (the rsync quick-check trade-off): a file
        whose size AND mtime_ns both match the committed signature is
        not re-hashed, so an in-place same-size overwrite within the
        filesystem's timestamp granularity goes undetected.  ext4/xfs
        report nanoseconds, where this is vanishing; on coarse-mtime
        filesystems construct the monitor with ``paranoid=True`` to
        hash every file on every scan."""
        changed: dict[str, list] = {}
        for name in sorted(os.listdir(self.folder)):
            if not name.lower().endswith(self.exts):
                continue
            path = os.path.join(self.folder, name)
            try:
                st = os.stat(path)
            except OSError:
                continue
            prev = self._state.get(path)
            if (
                not self.paranoid
                and prev is not None
                and prev[0] == st.st_size
                and prev[1] == st.st_mtime_ns
            ):
                continue  # stat signature unchanged: skip the re-hash
            digest = self._md5(path)
            if prev is None or prev[2] != digest:
                changed[path] = [st.st_size, st.st_mtime_ns, digest]
            elif prev[1] != st.st_mtime_ns:
                # touched but content-identical: refresh the cheap gate
                # immediately (nothing downstream depends on it)
                self._state[path] = [st.st_size, st.st_mtime_ns, digest]
                self._persist()
        return changed

    def commit(self, path: str, sig: list) -> None:
        """Record `path` as fully processed at signature `sig` — called
        only after the file's rows are durably ingested."""
        self._state[path] = sig
        self._persist()

    def poll(self) -> list[str]:
        """scan() + immediate commit of every changed path — for callers
        that only need change NOTIFICATION, not exactly-once ingest."""
        changed = self.scan()
        for path, sig in changed.items():
            self.commit(path, sig)
        return list(changed)


class DropIngestor:
    """created+modified spreadsheet ingest → row-hash CDC → keyed MERGE.

    One instance owns a drop folder, its file/row snapshots under
    `state_dir`, and the keyed serving table.  `process_once()` is the
    micro-batch: scan → per-file (row diff → changed-rows log → MERGE →
    snapshot replace → monitor commit).  Replay-idempotent:
    re-processing an unchanged folder is a no-op, re-feeding identical
    rows merges to the same table state, and a crash mid-file re-emits
    that file on the next scan (see `process_once`)."""

    def __init__(
        self,
        spark: SparkSession,
        folder: str,
        state_dir: str,
        table: KeyedParquetTable,
        cdc_cols: Sequence[str] | None = None,
    ):
        self.spark = spark
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)
        self.table = table
        self.cdc_cols = list(cdc_cols) if cdc_cols else None
        self.monitor = DropFolderMonitor(
            folder, os.path.join(state_dir, "files.json")
        )
        self.log_path = os.path.join(state_dir, "changed_rows")

    # -- per-file row-hash snapshots ------------------------------------
    def _rowhash_path(self, path: str) -> str:
        stem = hashlib.md5(path.encode()).hexdigest()
        return os.path.join(self.state_dir, "rowhash", stem)

    def _prev_hashes(self, path: str) -> DataFrame | None:
        p = self._rowhash_path(path)
        if not os.path.exists(os.path.join(p, "_SUCCESS")):
            return None
        return self.spark.read.parquet(p)

    def _seq(self) -> int:
        seq_path = os.path.join(self.state_dir, "seq")
        n = 0
        if os.path.exists(seq_path):
            with open(seq_path) as fh:
                n = int(fh.read().strip() or 0)
        with open(seq_path, "w") as fh:
            fh.write(str(n + 1))
        return n + 1

    def process_once(self) -> DataFrame | None:
        """One ingest micro-batch.  Returns the changed rows that flowed
        to the sink this batch (read back from the append-only log, so
        the result is stable after the snapshots move on), or None if
        nothing changed.

        Per-file order is crash-safe at-least-once with an idempotent
        sink: log append → keyed MERGE → row-hash snapshot replace →
        monitor commit.  A failure anywhere before the commit leaves the
        file's monitor state and row-hash snapshot untouched, so the
        next scan re-emits it and the diff reproduces the same rows —
        the log may then carry replay duplicates (distinguishable by
        `ingest_seq`), but the MERGE collapses them by key, so the
        serving table converges exactly-once."""
        from .readers import read_excel

        pending = self.monitor.scan()
        if not pending:
            return None
        seq = self._seq()
        wrote = False
        for path, sig in pending.items():
            df = read_excel(self.spark, path)
            cols = self.cdc_cols or df.columns
            hashed = with_row_hash(df, cols)
            prev = self._prev_hashes(path)
            changed = (
                hashed
                if prev is None
                else anti_join(hashed, prev.select(HASH_COL), [HASH_COL])
            )
            changed = changed.withColumn(SEQ_COL, F.lit(seq))
            # append survivors to the log FIRST (materializes the diff
            # while the old hash snapshot is still intact — the same
            # localize-before-overwrite rule as KeyedParquetTable)
            if changed.count():
                changed.write.mode("append").parquet(self.log_path)
                # MERGE before the snapshot moves: `changed` is lazy
                # over (file ⟕ old snapshot), both still unchanged here
                self.table.upsert(changed.drop(HASH_COL))
                wrote = True
            # full new snapshot replaces the old one
            tmp = self._rowhash_path(path) + ".new"
            hashed.select(HASH_COL).write.mode("overwrite").parquet(tmp)
            final = self._rowhash_path(path)
            if os.path.exists(final):
                import shutil

                shutil.rmtree(final)
            os.replace(tmp, final)
            # only now is the file durably ingested
            self.monitor.commit(path, sig)
        if not wrote:
            return None
        return (
            self.spark.read.parquet(self.log_path)
            .filter(F.col(SEQ_COL) == seq)
            .drop(HASH_COL)
        )
