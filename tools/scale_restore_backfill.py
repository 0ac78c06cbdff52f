"""RESTORE + ANALYZE-backfill at scale: on a FACTORx events replica,
show that (a) `backfill_stats` earns full zone-map coverage with ONE
scan and zero rewrites — against the full `compact()` rewrite that was
previously the only way — (b) metadata-only COUNT(*) covers the table
afterwards, and (c) `restore` undoes a bad commit in one manifest
write, flat in table size.

Phases, each timed with driver-RSS snapshots:

1. full-load commit WITHOUT stats_cols (no envelopes anywhere)
2. backfill_stats on a stats-configured handle (scan, NO rewrite)
3. metadata-only COUNT(*) (must scan 0 fragments)
4. bad commit: predicate UPDATE on one partition
5. restore to the pre-bad snapshot (metadata-only)
6. compact() for comparison — the rewrite the backfill avoided

Appends a `## FACTORx restore + stats backfill` section to SCALE.md.

Usage: python tools/scale_restore_backfill.py [sf_dir] [factor]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scale_smoke import build_scaled_dir, rss_snapshot_mb  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
FACTOR = int(sys.argv[2]) if len(sys.argv) > 2 else 1000


def main() -> None:
    import atexit
    import tempfile

    from pyspark.sql import functions as F

    from _big_data_analytics_and_visualization_tracking_student_progress__spark.datasets import (  # noqa: E501
        load_table,
    )
    from _big_data_analytics_and_visualization_tracking_student_progress__spark.operators.upsert import (  # noqa: E501
        ManifestSnapshotTable,
    )
    from _big_data_analytics_and_visualization_tracking_student_progress__spark.session import (  # noqa: E501
        get_spark,
    )

    spark = get_spark("scale-restore-backfill", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    scaled_dir = build_scaled_dir(SF_DIR, FACTOR, tables={"events"})
    atexit.register(shutil.rmtree, scaled_dir, ignore_errors=True)
    tdir = tempfile.mkdtemp(prefix="sparkgraft_rbscale_")
    atexit.register(shutil.rmtree, tdir, ignore_errors=True)

    kw = dict(
        keys=["user_id", "event_type"],
        order_cols=["ts_nanos", "event_id"],
        partition_by=["event_type"],
    )
    plain = ManifestSnapshotTable(spark, os.path.join(tdir, "t"), **kw)
    ev = load_table(spark, scaled_dir, "events").select(
        "user_id", "event_type", "event_id", "ts_nanos"
    )
    n_events = ev.count()

    timings: dict[str, float] = {}
    rss: dict[str, dict[str, float]] = {}

    def phase(label: str, fn) -> None:
        t0 = time.perf_counter()
        fn()
        timings[label] = round(time.perf_counter() - t0, 2)
        rss[label] = rss_snapshot_mb()

    phase("full_load_no_stats", lambda: plain.upsert(ev))
    if plain.fragment_stats():
        raise RuntimeError("expected a stats-free table")

    t = ManifestSnapshotTable(
        spark, os.path.join(tdir, "t"), stats_cols=["event_id"], **kw
    )
    phase("backfill_stats_one_scan", t.backfill_stats)
    bv = t.versions()[-1]
    if os.path.exists(t._data_dir(bv)):
        raise RuntimeError("backfill_stats rewrote data files")

    meta_counts: dict[str, int] = {}

    def metadata_count() -> None:
        n, meta, scanned = t.count_rows()
        meta_counts.update(n=n, meta=meta, scanned=scanned)

    phase("metadata_only_count", metadata_count)
    if meta_counts["scanned"] != 0:
        raise RuntimeError(
            f"COUNT(*) scanned {meta_counts['scanned']} fragments "
            "after backfill"
        )

    good_v = t.versions()[-1]
    phase(
        "bad_update_one_partition",
        lambda: t.update_where(
            (F.col("event_type") == "click"),
            {"event_id": "event_id + 1"},
        ),
    )
    phase("restore_metadata_only", lambda: t.restore(good_v))
    rv = t.versions()[-1]
    if os.path.exists(t._data_dir(rv)):
        raise RuntimeError("restore rewrote data files")

    phase("compact_full_rewrite_for_comparison", t.compact)

    def _fmt_rss(s: dict[str, float]) -> str:
        return (
            f"python {s['python_mb']:.0f} MB + "
            f"JVM tree {s['jvm_tree_mb']:.0f} MB"
        )

    lines = [
        f"## {FACTOR}x restore + stats backfill",
        "",
        f"{n_events:,} events ({FACTOR}x sf replica), "
        "`tools/scale_restore_backfill.py`, local[32]:",
        "",
    ]
    for label, secs in timings.items():
        lines.append(f"- {label}: {secs} s ({_fmt_rss(rss[label])})")
    lines += [
        "",
        "backfill_stats earns BOTH zone-map tiers with one scan and "
        "zero rewrites (no data dir, asserted) — vs the full compact() "
        "rewrite that was previously the only backfill path (its wall "
        "above, for comparison).  COUNT(*) is metadata-only afterwards "
        "(0 fragments scanned, asserted).  restore undoes the bad "
        "UPDATE in one manifest write — flat in table size — with the "
        "bad commit left auditable in history.",
        "",
    ]
    with open(os.path.join(ROOT, "SCALE.md"), "a") as fh:
        fh.write("\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
