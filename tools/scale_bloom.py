"""Bloom-filter equality skipping at scale: on a FACTORx events
replica, commit to a day-bucketed manifest table with event_id bloom
sidecars, cluster the layout on user_id (UNCORRELATED with event_id,
so every file's event_id envelope spans its fragment and zone maps
cannot skip a single file), then serve point lookups and report the
bloom tier's file counters plus the serve wall against a full-scan
filter of the same predicate.  Also reports the metadata-only
aggregates: COUNT(*)/MIN/MAX served from the manifest with zero data
reads at any table size.

Phases, each timed with driver-RSS snapshots:

1. day-bucketed commit with stats + blooms
2. clustered compact on user_id (multi-file fragments, event_id
   scattered per file)
3. bloom point read of a present event_id (tier counters)
4. bloom point read of an ABSENT event_id (every file pruned)
5. full-scan filter of the same present probe (the cost blooms avoid)
6. metadata-only count_rows + metadata_min_max (0 fragments scanned)

Appends a `## FACTORx bloom-filter equality skipping` section to
SCALE.md.

Usage: python tools/scale_bloom.py [sf_dir] [factor]
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

DAY_NS = 86_400_000_000_000


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

    spark = get_spark("scale-bloom", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    scaled_dir = build_scaled_dir(SF_DIR, FACTOR, tables={"events"})
    atexit.register(shutil.rmtree, scaled_dir, ignore_errors=True)
    tdir = tempfile.mkdtemp(prefix="sparkgraft_bloom_")
    atexit.register(shutil.rmtree, tdir, ignore_errors=True)

    e = load_table(spark, scaled_dir, "events").select(
        "user_id", "event_type", "event_id", "ts_nanos"
    )
    dmin = e.agg(F.min("ts_nanos")).first()[0]
    lohi = e.agg(F.min("event_id"), F.max("event_id")).first()
    emn, emx = int(lohi[0]), int(lohi[1])
    ev = e.withColumn(
        "day_bucket", F.expr(f"(ts_nanos - {dmin}) DIV {DAY_NS}")
    )
    n_events = ev.count()
    n_days = ev.select("day_bucket").distinct().count()

    # size the bitsets for the clustered layout below (~8 files per
    # fragment): the documented ~10 bits per expected distinct key per
    # file for ~1% false positives — an UNDERSIZED bloom saturates and
    # prunes nothing, so sizing rides the data, not a constant
    n_per_file = max(1, n_events // (n_days * 8))
    bloom_bits = 1 << max(13, (10 * n_per_file - 1).bit_length())

    table = ManifestSnapshotTable(
        spark,
        os.path.join(tdir, "table"),
        keys=["day_bucket", "user_id", "event_type", "event_id"],
        order_cols=["ts_nanos", "event_id"],
        partition_by=["day_bucket"],
        stats_cols=["ts_nanos"],
        bloom_cols=["event_id"],
        bloom_bits=bloom_bits,
        bloom_k=5,
    )

    timings: dict[str, float] = {}
    rss: dict[str, dict[str, float]] = {}

    def phase(label: str, fn) -> None:
        t0 = time.perf_counter()
        fn()
        timings[label] = round(time.perf_counter() - t0, 2)
        rss[label] = rss_snapshot_mb()

    phase("day_bucketed_commit", lambda: table.upsert(ev))
    n_frags = len(table.manifest())
    phase(
        "clustered_compact_on_user",
        lambda: table.compact(
            cluster_by=["user_id"], cluster_files=n_frags * 8
        ),
    )

    probe = (emn + emx) // 2
    counters: dict[str, int] = {}

    def point_read() -> None:
        df, fk, ftot, filek, filet = table.read_where_eq(
            [("event_id", probe)]
        )
        counters.update(
            frags_kept=fk, frags_total=ftot,
            files_kept=filek, files_total=filet,
            rows=df.count(),
        )

    phase("bloom_point_read", point_read)

    absent: dict[str, int] = {}

    def absent_read() -> None:
        df, _fk, _ft, filek, filet = table.read_where_eq(
            [("event_id", emx + FACTOR + 1)]
        )
        absent.update(files_kept=filek, files_total=filet, rows=df.count())

    phase("bloom_absent_read", absent_read)

    full: dict[str, int] = {}

    def full_scan() -> None:
        full["rows"] = (
            table.read().filter(F.col("event_id") == probe).count()
        )

    phase("full_scan_filter", full_scan)

    meta: dict[str, object] = {}

    def metadata_aggs() -> None:
        n, mfrag, scanned = table.count_rows()
        mn, mx, _m2, scanned2 = table.metadata_min_max("ts_nanos")
        meta.update(n=n, meta_frags=mfrag, scanned=scanned + scanned2,
                    mn=mn, mx=mx)

    phase("metadata_count_minmax", metadata_aggs)

    if counters["rows"] != full["rows"]:
        raise RuntimeError(
            f"bloom read diverged: {counters['rows']} vs {full['rows']}"
        )
    if absent["rows"] != 0 or absent["files_kept"] != 0:
        raise RuntimeError(f"absent probe not fully pruned: {absent}")
    if not (counters["files_kept"] * 4 <= counters["files_total"]):
        raise RuntimeError(f"bloom tier did not prune: {counters}")
    if meta["scanned"] or meta["n"] != n_events:
        raise RuntimeError(f"metadata aggregates wrong: {meta}")

    def _fmt_rss(s: dict[str, float]) -> str:
        return (
            f"python {s['python_mb']:.0f} MB + "
            f"JVM tree {s['jvm_tree_mb']:.0f} MB"
        )

    lines = [
        f"## {FACTOR}x bloom-filter equality skipping",
        "",
        f"Auto-generated by `python tools/scale_bloom.py {SF_DIR} "
        f"{FACTOR}`: events replicated {FACTOR}x ({n_events:,} rows), "
        f"committed day-bucketed ({n_frags} fragments) with event_id "
        f"bloom sidecars ({bloom_bits:,} bits/file, k=5, sized at ~10 "
        "bits per expected key per file), then clustered on user_id — "
        "a column "
        "uncorrelated with event_id, so every file's event_id envelope "
        "spans its fragment and zone maps keep 100% of files.  A point "
        f"lookup kept {counters['files_kept']}/{counters['files_total']} "
        "files on bloom metadata alone "
        f"({counters['rows']:,} rows returned, exactly equal to the "
        "full-scan filter); an absent-value probe kept "
        f"{absent['files_kept']}/{absent['files_total']}.  COUNT(*) and "
        "MIN/MAX(ts_nanos) were served from the manifest with 0 "
        "fragments scanned.",
        "",
        "| Phase | wall (s) | driver RSS after |",
        "|---|---|---|",
    ]
    for label, t in timings.items():
        lines.append(f"| {label} | {t} | {_fmt_rss(rss[label])} |")
    lines += [
        "",
        "At object-store scale the bloom tier turns a point lookup from "
        "every-file GETs into ~1 GET per fragment the probe can live "
        "in; the absent-value case (the common case for existence "
        "checks and CDC key probes) touches no data at all.  The "
        "sidecars ride the commit (word-chunked bit_or build, one Arrow transfer; "
        "inherited by reference like the data files), and the "
        "metadata-only aggregates answer COUNT/MIN/MAX with zero data "
        "reads at any table size.",
        "",
    ]
    with open(os.path.join(ROOT, "SCALE.md"), "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
