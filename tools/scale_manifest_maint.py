"""ManifestSnapshotTable MAINTENANCE at scale (VERDICT r7 item 6): the
1000x manifest smoke covers commit + replay; this exercises the
retention/recovery surface on the same 1000x events replica —
rollback → re-commit, and vacuum with manifest inheritance (older
versions demoted to data HOLDERS while retained manifests still
reference their files, then swept once unreferenced).

Phases, each timed with driver-RSS snapshots:

1. full-load commit (every event_type partition)        → v1
2. incremental commit touching ONE partition ('click')  → v2
3. second incremental commit on the same partition      → v3
4. vacuum (keep_versions=2): v1 must be DEMOTED to a holder — its
   files back every untouched partition of v2/v3's manifests — and
   excluded from versions(); reads must still resolve every partition
5. rollback(v2): drops v3, keeps the v1 holder, table readable
6. re-commit after rollback                             → v3'
7. compact(): every live partition rewritten under one version → v4,
   then vacuum(keep_versions=1) reclaims EVERY older dir
8. final correctness: latest-by-key counts equal a direct batch
   computation over the same replica (exact, not sampled)

Appends a `## 1000x manifest maintenance` section to SCALE.md.

Usage: python tools/scale_manifest_maint.py [sf_dir] [factor]
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

    spark = get_spark("scale-manifest-maint", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    scaled_dir = build_scaled_dir(SF_DIR, FACTOR, tables={"events"})
    import atexit

    atexit.register(shutil.rmtree, scaled_dir, ignore_errors=True)

    tdir = tempfile.mkdtemp(prefix="sparkgraft_maint_")
    atexit.register(shutil.rmtree, tdir, ignore_errors=True)

    table = ManifestSnapshotTable(
        spark,
        os.path.join(tdir, "table"),
        keys=["user_id", "event_type"],
        order_cols=["ts_nanos", "event_id"],
        partition_by=["event_type"],
        keep_versions=None,  # vacuum called explicitly in phase 4
    )

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

    click = ev.filter(F.col("event_type") == "click")
    phase("full_load_commit_v1", lambda: table.upsert(ev))
    phase(
        "incremental_commit_v2_click_only",
        lambda: table.upsert(click.filter(F.col("event_id") % 2 == 0)),
    )
    phase(
        "incremental_commit_v3_click_only",
        lambda: table.upsert(click.filter(F.col("event_id") % 2 == 1)),
    )

    # v2/v3 manifests inherit every non-click partition from v1
    m3 = table.manifest()
    inherited = sorted(k for k, v in m3.items() if v == 1)
    if not inherited or "event_type=click" in inherited:
        raise RuntimeError(f"inheritance shape unexpected: {m3}")

    def do_vacuum() -> None:
        table.keep_versions = 2
        table.vacuum()

    phase("vacuum_keep2_demotes_v1_to_holder", do_vacuum)
    if table.versions() != [2, 3]:
        raise RuntimeError(f"expected snapshots [2,3], got {table.versions()}")
    if not table._is_holder(1):
        raise RuntimeError("v1 should be a holder after vacuum")

    phase(
        "read_after_vacuum_resolves_holders",
        lambda: table.read()
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )

    phase("rollback_to_v2", lambda: table.rollback(2))
    if table.versions() != [2]:
        raise RuntimeError(f"expected snapshots [2], got {table.versions()}")
    if not os.path.isdir(table._vdir(1)):
        raise RuntimeError("rollback must keep the referenced v1 holder")

    phase(
        "recommit_after_rollback_v3",
        lambda: table.upsert(click.filter(F.col("event_id") % 2 == 1)),
    )

    # 8. compact: rewrite every live partition under ONE version — the
    # only maintenance op whose cost tracks the TABLE (a full rewrite,
    # run occasionally to collapse holder scatter), vs the incremental
    # commits above whose cost tracks the batch.  After it, retention
    # can reclaim every older dir.
    phase("compact_to_single_holder_v4", table.compact)
    m4 = table.manifest()
    if set(m4.values()) != {4}:
        raise RuntimeError(f"compaction left scatter: {m4}")

    def vacuum_keep1() -> None:
        table.keep_versions = 1
        table.vacuum()

    phase("vacuum_keep1_reclaims_all_older", vacuum_keep1)
    if table._committed_dirs() != [4]:
        raise RuntimeError(
            f"expected only v4 on disk, got {table._committed_dirs()}"
        )

    # exact final-state check: latest-by-key over (full ∪ click-evens ∪
    # click-odds) — identical input multiset to the committed batches
    from _big_data_analytics_and_visualization_tracking_student_progress__spark.operators.windows import (  # noqa: E501
        latest_by_key,
    )

    staged = ev.unionByName(
        click.filter(F.col("event_id") % 2 == 0)
    ).unionByName(click.filter(F.col("event_id") % 2 == 1))
    expect = (
        latest_by_key(
            staged,
            ["user_id", "event_type"],
            [F.col("ts_nanos").desc(), F.col("event_id").desc()],
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("event_id").cast("long").alias("s"),
        )
    )
    got = (
        table.read()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("event_id").cast("long").alias("s"),
        )
    )
    e_rows = {tuple(r) for r in expect.collect()}
    g_rows = {tuple(r) for r in got.collect()}
    if e_rows != g_rows:
        raise RuntimeError(
            f"final state diverged: only-expected={e_rows - g_rows} "
            f"only-got={g_rows - e_rows}"
        )

    def _fmt_rss(s: dict[str, float]) -> str:
        return (
            f"python {s['python_mb']:.0f} MB + "
            f"JVM tree {s['jvm_tree_mb']:.0f} MB"
        )

    lines = [
        f"## {FACTOR}x manifest maintenance "
        "(rollback → re-commit, vacuum with inheritance)",
        "",
        f"Auto-generated by `python tools/scale_manifest_maint.py {SF_DIR} "
        f"{FACTOR}`: events replicated {FACTOR}x "
        f"({n_events:,} rows), committed to a ManifestSnapshotTable "
        "partitioned by event_type, then the retention/recovery surface "
        "exercised end to end.  keep_versions=2 DEMOTES v1 to a data "
        "holder (its files back every partition v2/v3 didn't rewrite; it "
        "is excluded from versions() because its own manifest may "
        "reference vacuumed versions); rollback(2) keeps the referenced "
        "holder and the table accepts new commits; the final state is "
        "checked EXACTLY against a direct batch latest-by-key over the "
        "same replica.",
        "",
        "| Phase | wall (s) | driver RSS after |",
        "|---|---|---|",
    ]
    for label, t in timings.items():
        lines.append(f"| {label} | {t} | {_fmt_rss(rss[label])} |")
    lines += [
        "",
        f"Partitions inherited from v1 by the v3 manifest: "
        f"{len(inherited)} (every non-click event_type).  The two "
        "incremental commits and the re-commit each rewrite ONLY the "
        "click partition — their cost tracks the batch, not the "
        f"{n_events:,}-row table — and vacuum/rollback are manifest "
        "metadata operations plus bounded directory removals (no data "
        "rewrite at any size).  compact() is the one op whose cost "
        "tracks the TABLE (a deliberate full rewrite collapsing holder "
        "scatter so vacuum keep_versions=1 can reclaim every older "
        "dir — verified: only the compacted dir survives).  "
        "Final-state check: exact match.",
        "",
    ]
    with open(os.path.join(ROOT, "SCALE.md"), "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
