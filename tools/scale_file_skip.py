"""File-level data skipping at scale: on a FACTORx events replica,
commit to a day-bucketed manifest table with ts_nanos zone maps, run
OPTIMIZE-with-clustering (`compact(cluster_by=["ts_nanos"])`), then
serve a narrow 2-day range read and report BOTH pruning tiers:
fragments kept/total and files kept/total — plus the serve wall
against a full-scan filter of the same predicate.

Phases, each timed with driver-RSS snapshots:

1. day-bucketed commit with stats (every fragment enveloped)
2. clustered compact: files within each fragment own disjoint
   ts_nanos ranges (multiple files per fragment by construction)
3. pruned range read: fragment tier + file tier counters
4. full-scan filter of the same range (the cost pruning avoids)
5. exact equality: pruned read result == full-scan filter result

Appends a `## FACTORx file-level data skipping` section to SCALE.md.

Usage: python tools/scale_file_skip.py [sf_dir] [factor]
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

    spark = get_spark("scale-file-skip", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    scaled_dir = build_scaled_dir(SF_DIR, FACTOR, tables={"events"})
    atexit.register(shutil.rmtree, scaled_dir, ignore_errors=True)
    tdir = tempfile.mkdtemp(prefix="sparkgraft_fskip_")
    atexit.register(shutil.rmtree, tdir, ignore_errors=True)

    e = load_table(spark, scaled_dir, "events").select(
        "user_id", "event_type", "event_id", "ts_nanos"
    )
    dmin = e.agg(F.min("ts_nanos")).first()[0]
    ev = e.withColumn(
        "day_bucket", F.expr(f"(ts_nanos - {dmin}) DIV {DAY_NS}")
    )
    n_events = ev.count()

    table = ManifestSnapshotTable(
        spark,
        os.path.join(tdir, "table"),
        keys=["day_bucket", "user_id", "event_type", "event_id"],
        order_cols=["ts_nanos", "event_id"],
        partition_by=["day_bucket"],
        stats_cols=["ts_nanos"],
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
    # several files per fragment so the file tier has something to skip
    phase(
        "clustered_compact",
        lambda: table.compact(
            cluster_by=["ts_nanos"], cluster_files=n_frags * 4
        ),
    )

    lo = dmin + 5 * DAY_NS
    hi = lo + DAY_NS // 4 - 1  # quarter-day slice inside one fragment
    counters: dict[str, int] = {}

    from _big_data_analytics_and_visualization_tracking_student_progress__spark.plans.inspect import (  # noqa: E501
        scan_rows_read,
    )

    def pruned() -> None:
        df, fk, ftot, filek, filet = table.read_where("ts_nanos", lo, hi)
        # count through an aggregate over the SAME frame so the scan's
        # executed metrics expose the row-group tier: rows the parquet
        # reader MATERIALIZED (surviving row groups) vs rows kept
        agg = df.agg(F.count(F.lit(1)).alias("n"))
        counters.update(
            frags_kept=fk, frags_total=ftot,
            files_kept=filek, files_total=filet,
            rows=agg.collect()[0][0],
            rows_read=scan_rows_read(agg),
        )

    phase("pruned_range_read", pruned)

    full: dict[str, int] = {}

    def full_scan() -> None:
        agg = (
            table.read()
            .filter(
                (F.col("ts_nanos") >= lo) & (F.col("ts_nanos") <= hi)
            )
            .agg(F.count(F.lit(1)).alias("n"))
        )
        full["rows"] = agg.collect()[0][0]
        full["rows_read"] = scan_rows_read(agg)

    phase("full_scan_filter", full_scan)
    if counters["rows"] != full["rows"]:
        raise RuntimeError(
            f"pruned read diverged: {counters['rows']} vs {full['rows']}"
        )
    if not (counters["frags_kept"] < counters["frags_total"]):
        raise RuntimeError(f"fragment tier did not prune: {counters}")
    if not (0 < counters["files_kept"] < counters["files_total"]):
        raise RuntimeError(f"file tier did not prune: {counters}")
    # row-group tier: inside the kept files, the scan must materialize
    # a small multiple of the rows actually kept — the clustered
    # layout's in-file sort makes row-group min/max selective for the
    # pushed-down residual predicate
    frag_rows = max(n_events // max(counters["frags_total"], 1), 1)
    if not (
        counters["rows"]
        <= counters["rows_read"]
        < frag_rows // 2
    ):
        raise RuntimeError(f"row-group tier did not prune: {counters}")

    def _fmt_rss(s: dict[str, float]) -> str:
        return (
            f"python {s['python_mb']:.0f} MB + "
            f"JVM tree {s['jvm_tree_mb']:.0f} MB"
        )

    lines = [
        f"## {FACTOR}x file-level data skipping",
        "",
        f"Auto-generated by `python tools/scale_file_skip.py {SF_DIR} "
        f"{FACTOR}`: events replicated {FACTOR}x ({n_events:,} rows), "
        f"committed day-bucketed ({n_frags} fragments) with ts_nanos "
        "zone maps, then OPTIMIZE-with-clustering "
        "(`compact(cluster_by=[ts_nanos])`).  A quarter-day range read "
        f"kept {counters['frags_kept']}/{counters['frags_total']} "
        f"fragments and {counters['files_kept']}/"
        f"{counters['files_total']} files on manifest metadata alone "
        f"({counters['rows']:,} rows returned, exactly equal to the "
        "full-scan filter).  Inside the kept files the parquet reader "
        f"then row-group-pruned: the scan materialized "
        f"{counters['rows_read']:,} rows for {counters['rows']:,} kept "
        f"(vs {full['rows_read']:,} materialized by the full-scan "
        "filter's pushed predicate over every file) — the third "
        "skipping tier, engaged because `read_where`'s residual "
        "predicate reaches the scan as PushedFilters and the clustered "
        "rewrite's in-file sort tightens row-group min/max "
        "(pinned in tests/test_rowgroup_skip.py).",
        "",
        "| Phase | wall (s) | driver RSS after |",
        "|---|---|---|",
    ]
    for label, t in timings.items():
        lines.append(f"| {label} | {t} | {_fmt_rss(rss[label])} |")
    lines += [
        "",
        "The pruned read touches one fragment's intersecting files; the "
        "full-scan filter pays the whole table.  Clustered compaction "
        "is the one table-proportional cost (a deliberate OPTIMIZE "
        "rewrite, amortized across every narrow read after it), and "
        "the in-file sort additionally tightens parquet row-group "
        "min/max for whatever scan remains.",
        "",
    ]
    with open(os.path.join(ROOT, "SCALE.md"), "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
