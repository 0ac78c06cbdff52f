"""Incrementally-maintained materialized aggregate views over a
`ManifestSnapshotTable` — the continuous-rollup shape every large
fact-table deployment grows (TimescaleDB continuous aggregates,
Druid/Pinot rollup segments, Delta/Iceberg incremental MV refresh).

The reference serves its dashboards by re-aggregating the full
Elasticsearch index on every page load (app.py:58 reruns each
Streamlit interaction; Kibana re-queries the index per panel,
README.md:26-27).  At 100 TB a full re-aggregation per refresh is the
single most expensive recurring cost in the system, and it is almost
entirely redundant: a daily-partitioned fact table's commits touch a
handful of partitions, so only those partitions' contributions to the
rollup can have changed.

`IncrementalAggView` maintains per-partition-fragment PARTIAL
aggregates keyed by the base table's manifest:

- ``refresh()`` diffs the base's current manifest (fragment → holder
  version) against the fragment map recorded at the last refresh, and
  recomputes partials ONLY for fragments whose holder version moved —
  reading nothing else.  Refresh cost tracks the commits since the
  last refresh, not the table.
- ``read()`` merges the partials (sum of sums, sum of counts, min of
  mins, max of maxes) — a scan of the partials table, whose size is
  O(fragments × group cardinality), not O(base rows).

Soundness requirements (all checked or documented):

- Measures must be decomposable: sum / count / min / max (avg = sum ÷
  count at read time).  Holistic aggregates (exact quantiles, count
  distinct) don't merge from partials; use the sketch operators for
  those.
- The optional ``prepare`` transform runs per fragment before
  aggregation and must be ROW-LOCAL and deterministic (derive a day
  bucket, cast, filter) — anything that looks across rows would break
  partial recomputation.
- Each base key lives in exactly one fragment (the base table already
  enforces partition-stable keys), so per-fragment latest-state rows
  partition the merged snapshot and partials never double-count.

Snapshot discipline mirrors the base table: each refresh writes a new
self-contained version dir (``partials.parquet`` + ``state.json``,
``_SUCCESS`` marker last), so a crash mid-refresh leaves the previous
refresh readable; ``vacuum()`` retains the newest ``keep_versions``.
"""
from __future__ import annotations

import json
import os
import shutil
from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .upsert import ManifestSnapshotTable

#: measure kinds → (partial aggregate, merge aggregate)
_KINDS = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


class IncrementalAggView:
    """See module docstring.

    Parameters
    ----------
    base : ManifestSnapshotTable
        The fact table whose merged latest-state snapshot this view
        aggregates.
    group_cols : columns of the (prepared) base rows to group by.
    measures : sequence of ``(out_name, src_col, kind)`` with kind in
        ``{"sum", "count", "min", "max"}``; ``src_col=None`` with
        ``"count"`` counts rows.
    prepare : optional row-local DataFrame transform applied to each
        fragment's rows before aggregation (derive buckets, filter).
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        base: ManifestSnapshotTable,
        group_cols: Sequence[str],
        measures: Sequence[tuple[str, str | None, str]],
        prepare: Callable[[DataFrame], DataFrame] | None = None,
        keep_versions: int | None = 2,
    ):
        self.spark = spark
        self.path = path
        self.base = base
        self.group_cols = list(group_cols)
        self.measures = [tuple(m) for m in measures]
        self.prepare = prepare
        self.keep_versions = keep_versions
        #: refresh() outcomes in call order — observable evidence of
        #: incrementality for callers that drive refreshes indirectly
        #: (the streaming sink refreshes once per micro-batch commit)
        self.refresh_log: list[dict] = []
        if not self.measures:
            raise ValueError("IncrementalAggView requires measures")
        for name, _src, kind in self.measures:
            if kind not in _KINDS:
                raise ValueError(
                    f"measure {name!r}: kind {kind!r} not decomposable "
                    f"(supported: {sorted(_KINDS)})"
                )
        overlap = set(self.group_cols) & {m[0] for m in self.measures}
        if overlap:
            raise ValueError(f"measure names collide with group cols: {overlap}")

    # -- snapshot layout (self-contained versions, marker-gated) --------
    def _vdir(self, v: int) -> str:
        return os.path.join(self.path, f"v={v:05d}")

    def versions(self) -> list[int]:
        if not os.path.isdir(self.path):
            return []
        return sorted(
            int(name[2:])
            for name in os.listdir(self.path)
            if name.startswith("v=")
            and os.path.exists(os.path.join(self.path, name, "_SUCCESS"))
        )

    def _state(self, version: int | None = None) -> dict:
        vs = self.versions()
        if not vs:
            return {}
        v = vs[-1] if version is None else version
        if v not in vs:
            raise ValueError(f"version {v} not in {vs}")
        with open(os.path.join(self._vdir(v), "state.json")) as fh:
            return json.load(fh)

    def vacuum(self) -> None:
        if self.keep_versions is None:
            return
        vs = self.versions()
        for v in vs[: max(0, len(vs) - self.keep_versions)]:
            shutil.rmtree(self._vdir(v), ignore_errors=True)

    # -- refresh --------------------------------------------------------
    def _partials_for(self, frag_to_ver: dict[str, int]) -> DataFrame:
        df = self.base._read_fragments(frag_to_ver)
        if self.prepare is not None:
            df = self.prepare(df)
        # group ALSO by the base partition columns: one partial row
        # group per fragment, so a later refresh can replace exactly
        # the changed fragments' rows via a broadcast anti-join
        aggs = []
        for name, src, kind in self.measures:
            part, _merge = _KINDS[kind]
            aggs.append(
                part(F.lit(1) if src is None else F.col(src)).alias(
                    f"__p_{name}"
                )
            )
        return df.groupBy(
            *self.base.partition_by, *self.group_cols
        ).agg(*aggs)

    def refresh(self) -> dict:
        """Bring the view up to date with the base's latest snapshot.
        Returns ``{"version", "recomputed", "inherited", "total"}``
        (version = -1 on a no-op); also appended to ``refresh_log``."""
        info = self._refresh()
        self.refresh_log.append(info)
        return info

    def _refresh(self) -> dict:
        m = self.base.manifest()
        state = self._state()
        prev_frags: dict[str, int] = {
            k: int(v) for k, v in state.get("fragments", {}).items()
        }
        dropped = set(prev_frags) - set(m)
        if dropped:
            # the base never removes fragments today; if one vanishes
            # (manual surgery), stale partials can't be identified
            # row-wise — rebuild from scratch rather than serve wrong
            prev_frags = {}
        changed = {
            f: v for f, v in m.items() if prev_frags.get(f) != v
        }
        if not changed and prev_frags:
            return {
                "version": -1,
                "recomputed": 0,
                "inherited": len(m),
                "total": len(m),
            }
        if not m:
            return {"version": -1, "recomputed": 0, "inherited": 0, "total": 0}
        fresh = self._partials_for(changed)
        kept_frags = {f: v for f, v in m.items() if f not in changed}
        if kept_frags and prev_frags:
            old = self.spark.read.parquet(
                os.path.join(self._vdir(self.versions()[-1]), "partials.parquet")
            )
            # replace changed fragments' partial rows: anti-join on the
            # partition columns against the (small, broadcast) set of
            # recomputed fragment combos
            combos = fresh.select(*self.base.partition_by).distinct()
            kept = old.join(
                F.broadcast(combos), on=self.base.partition_by, how="left_anti"
            )
            partials = kept.unionByName(fresh, allowMissingColumns=True)
        else:
            partials = fresh
        new_v = (self.versions()[-1] + 1) if self.versions() else 1
        vdir = self._vdir(new_v)
        shutil.rmtree(vdir, ignore_errors=True)  # crashed attempt's debris
        partials.write.parquet(os.path.join(vdir, "partials.parquet"))
        with open(os.path.join(vdir, "state.json"), "w") as fh:
            json.dump(
                {
                    "fragments": m,
                    "group_cols": self.group_cols,
                    "measures": [list(t) for t in self.measures],
                },
                fh,
                sort_keys=True,
            )
        with open(os.path.join(vdir, "_SUCCESS"), "w"):
            pass
        if self.keep_versions is not None:
            self.vacuum()
        return {
            "version": new_v,
            "recomputed": len(changed),
            "inherited": len(kept_frags),
            "total": len(m),
        }

    # -- read -----------------------------------------------------------
    def read(self, version: int | None = None) -> DataFrame | None:
        """The materialized aggregate: merge per-fragment partials.
        Never touches the base table."""
        vs = self.versions()
        if not vs:
            return None
        v = vs[-1] if version is None else version
        if v not in vs:
            raise ValueError(f"version {v} not in {vs}")
        partials = self.spark.read.parquet(
            os.path.join(self._vdir(v), "partials.parquet")
        )
        merges = []
        for name, _src, kind in self.measures:
            _part, merge = _KINDS[kind]
            merges.append(merge(F.col(f"__p_{name}")).alias(name))
        return partials.groupBy(*self.group_cols).agg(*merges)
