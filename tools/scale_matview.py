"""IncrementalAggView at scale: on a FACTORx events replica, prove the
continuous-aggregate claim with wall-clock numbers — after a commit
that touches ONE partition, refresh() costs a fraction of both the
initial build and a full re-aggregation of the table (the reference's
per-dashboard-load recompute shape, app.py:58).

The base is DAY-BUCKETED (31 fragments at sf0.1 — the production
fact-table cardinality shape, reusing scale_file_skip.py's bucketing;
VERDICT r8 item 5): the round-8 run partitioned by event_type (5
fragments), which capped the demonstrable incremental win at ~5x
because one fragment was ~1/5 of the table.  With ~31 day fragments a
single-day commit's refresh scans ~1/31 of the data, so the
incremental-vs-full-reaggregation gap shows at its true size.

Phases, each timed with driver-RSS snapshots:

1. full-load commit (every day partition)                 → base v1
2. initial refresh: partials built for EVERY fragment
3. incremental commit touching ONLY day bucket 5          → base v2
4. incremental refresh: recomputes exactly 1 fragment
5. serve: read() merges partials (never touches the base)
6. the alternative being replaced: full re-aggregation of
   table.read() — what a per-load dashboard recompute costs
7. exact correctness: view.read() equals the direct aggregate

Appends a `## FACTORx matview refresh` section to SCALE.md.

Usage: python tools/scale_matview.py [sf_dir] [factor]
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
    from _big_data_analytics_and_visualization_tracking_student_progress__spark.operators.matview import (  # noqa: E501
        IncrementalAggView,
    )
    from _big_data_analytics_and_visualization_tracking_student_progress__spark.operators.upsert import (  # noqa: E501
        ManifestSnapshotTable,
    )
    from _big_data_analytics_and_visualization_tracking_student_progress__spark.session import (  # noqa: E501
        get_spark,
    )

    spark = get_spark("scale-matview", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    scaled_dir = build_scaled_dir(SF_DIR, FACTOR, tables={"events"})
    atexit.register(shutil.rmtree, scaled_dir, ignore_errors=True)
    tdir = tempfile.mkdtemp(prefix="sparkgraft_mvscale_")
    atexit.register(shutil.rmtree, tdir, ignore_errors=True)

    table = ManifestSnapshotTable(
        spark,
        os.path.join(tdir, "table"),
        keys=["day_bucket", "user_id", "event_type"],
        order_cols=["ts_nanos", "event_id"],
        partition_by=["day_bucket"],
    )
    # rollup over a DIFFERENT dimension than the partition (event_type
    # KPIs over a day-partitioned base) — the shape where partials are
    # genuinely needed: each fragment contributes to every group
    view = IncrementalAggView(
        spark,
        os.path.join(tdir, "mv"),
        table,
        group_cols=["event_type"],
        measures=[
            ("n_keys", None, "count"),
            ("sum_event_id", "event_id", "sum"),
            ("max_ts_nanos", "ts_nanos", "max"),
        ],
    )

    e = load_table(spark, scaled_dir, "events").select(
        "user_id", "event_type", "event_id", "ts_nanos"
    )
    # bucket origin: one-row control collect (a production table derives
    # this from its partition spec)
    dmin = e.agg(F.min("ts_nanos")).first()[0]
    ev = e.withColumn(
        "day_bucket", F.expr(f"(ts_nanos - {dmin}) DIV {DAY_NS}")
    )
    n_events = ev.count()

    timings: dict[str, float] = {}
    rss: dict[str, dict[str, float]] = {}

    def phase(label: str, fn) -> None:
        t0 = time.perf_counter()
        fn()
        timings[label] = round(time.perf_counter() - t0, 2)
        rss[label] = rss_snapshot_mb()

    day5 = ev.filter(F.col("day_bucket") == 5)
    phase(
        "full_load_commit",
        lambda: table.upsert(ev.filter(F.col("event_id") % 2 == 0)),
    )
    n_frags = len(table.manifest())
    phase("initial_refresh_all_fragments", view.refresh)
    phase(
        "incremental_commit_day5_only",
        lambda: table.upsert(day5.filter(F.col("event_id") % 2 == 1)),
    )
    phase("incremental_refresh_one_fragment", view.refresh)
    info = view.refresh_log[-1]
    if info["recomputed"] != 1 or info["inherited"] != info["total"] - 1:
        raise RuntimeError(f"refresh was not incremental at scale: {info}")

    def serve() -> None:
        view.read().write.format("noop").mode("overwrite").save()

    phase("serve_merged_rollup", serve)

    # the recompute this view replaces: aggregate the whole table per load
    def full_reagg() -> None:
        (
            table.read()
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_keys"),
                F.sum("event_id").alias("sum_event_id"),
                F.max("ts_nanos").alias("max_ts_nanos"),
            )
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    phase("full_reaggregation_for_comparison", full_reagg)

    # exact correctness: merged partials equal the direct aggregate
    direct = (
        table.read()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("event_id").alias("sum_event_id"),
            F.max("ts_nanos").alias("max_ts_nanos"),
        )
    )
    d_rows = {tuple(r) for r in direct.collect()}
    v_rows = {tuple(r) for r in view.read().collect()}
    if d_rows != v_rows:
        raise RuntimeError(
            f"view diverged: only-direct={d_rows - v_rows} "
            f"only-view={v_rows - d_rows}"
        )

    def _fmt_rss(s: dict[str, float]) -> str:
        return (
            f"python {s['python_mb']:.0f} MB + "
            f"JVM tree {s['jvm_tree_mb']:.0f} MB"
        )

    inc = timings["incremental_refresh_one_fragment"]
    init = timings["initial_refresh_all_fragments"]
    reagg = timings["full_reaggregation_for_comparison"]
    lines = [
        f"## {FACTOR}x matview refresh (continuous aggregate, "
        f"day-bucketed base)",
        "",
        f"Auto-generated by `python tools/scale_matview.py {SF_DIR} "
        f"{FACTOR}`: events replicated {FACTOR}x ({n_events:,} rows), "
        f"committed to a ManifestSnapshotTable partitioned by day bucket "
        f"({n_frags} fragments — production fact-table cardinality) with "
        "an IncrementalAggView rollup (event_type × count/sum/max, a "
        "different dimension than the partition so every fragment "
        "contributes partials to every group).  After a commit touching "
        "ONLY day bucket 5, the refresh recomputes exactly 1 fragment; "
        "serving merges partials without touching the base.",
        "",
        "| Phase | wall (s) | driver RSS after |",
        "|---|---|---|",
    ]
    for label, t in timings.items():
        lines.append(f"| {label} | {t} | {_fmt_rss(rss[label])} |")
    lines += [
        "",
        f"Incremental refresh = {inc:.2f} s vs initial build "
        f"{init:.2f} s ({init / max(inc, 0.01):.1f}x cheaper) and vs "
        f"the full re-aggregation it replaces {reagg:.2f} s "
        f"({reagg / max(inc, 0.01):.1f}x cheaper).  Refresh cost tracks "
        "the partitions the commit touched — at a fixed commit size it "
        "is flat in table size, while the per-load recompute grows "
        "linearly.  Final-state check: exact match against the direct "
        "aggregate.",
        "",
    ]
    with open(os.path.join(ROOT, "SCALE.md"), "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
