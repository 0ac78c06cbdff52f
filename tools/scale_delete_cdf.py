"""DELETE commits + change-feed reads at scale: on a FACTORx events
replica, show that (a) a keyed GDPR-style delete costs one partition
rewrite (located from the delete batch alone — no table scan), (b) a
predicate delete costs one pushed-filter partition-column scan plus the
touched partition's rewrite, and (c) a changes() read between versions
costs the moved fragments, not the table.

Phases, each timed with driver-RSS snapshots:

1. full-load commit (every event_type partition)            → v1
2. keyed delete: every (user_id % 1000 == 0, 'click') key   → v2
3. change feed v1→v2: counts by change type (1 fragment/side)
4. predicate delete: error rows with event_id % 97 == 0     → v3
5. exact final-state check vs a direct batch computation

Appends a `## FACTORx delete + change feed` section to SCALE.md.

Usage: python tools/scale_delete_cdf.py [sf_dir] [factor]
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
    from _big_data_analytics_and_visualization_tracking_student_progress__spark.operators.windows import (  # noqa: E501
        latest_by_key,
    )
    from _big_data_analytics_and_visualization_tracking_student_progress__spark.session import (  # noqa: E501
        get_spark,
    )

    spark = get_spark("scale-delete-cdf", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    scaled_dir = build_scaled_dir(SF_DIR, FACTOR, tables={"events"})
    atexit.register(shutil.rmtree, scaled_dir, ignore_errors=True)
    tdir = tempfile.mkdtemp(prefix="sparkgraft_delscale_")
    atexit.register(shutil.rmtree, tdir, ignore_errors=True)

    table = ManifestSnapshotTable(
        spark,
        os.path.join(tdir, "table"),
        keys=["user_id", "event_type"],
        order_cols=["ts_nanos", "event_id"],
        partition_by=["event_type"],
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

    phase("full_load_commit_v1", lambda: table.upsert(ev))

    doomed = (
        ev.select("user_id")
        .distinct()
        .filter(F.col("user_id") % 1000 == 0)
        .withColumn("event_type", F.lit("click"))
    )
    phase("keyed_delete_click_v2", lambda: table.delete(doomed))
    m2 = table.manifest()
    moved = [k for k, v in m2.items() if v == 2]
    if moved != ["event_type=click"]:
        raise RuntimeError(f"keyed delete rewrote unexpectedly: {m2}")

    feed_counts: dict[str, int] = {}

    def read_feed() -> None:
        for r in (
            table.changes(1, 2)
            .groupBy("_change_type")
            .count()
            .collect()
        ):
            feed_counts[r["_change_type"]] = r["count"]

    phase("change_feed_v1_v2", read_feed)
    if set(feed_counts) != {"delete"} or feed_counts["delete"] == 0:
        raise RuntimeError(f"unexpected feed shape: {feed_counts}")

    phase(
        "predicate_delete_error_v3",
        lambda: table.delete_where(
            (F.col("event_type") == "error")
            & (F.col("event_id") % 97 == 0)
        ),
    )
    m3 = table.manifest()
    if [k for k, v in m3.items() if v == 3] != ["event_type=error"]:
        raise RuntimeError(f"predicate delete rewrote unexpectedly: {m3}")

    # exact final-state check against a direct batch computation
    expect = (
        latest_by_key(
            ev,
            ["user_id", "event_type"],
            [F.col("ts_nanos").desc(), F.col("event_id").desc()],
        )
        .filter(
            ~(
                (F.col("event_type") == "click")
                & (F.col("user_id") % 1000 == 0)
            )
        )
        .filter(
            ~(
                (F.col("event_type") == "error")
                & (F.col("event_id") % 97 == 0)
            )
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
        f"## {FACTOR}x delete + change feed",
        "",
        f"Auto-generated by `python tools/scale_delete_cdf.py {SF_DIR} "
        f"{FACTOR}`: events replicated {FACTOR}x ({n_events:,} rows), "
        "committed to a ManifestSnapshotTable partitioned by event_type, "
        "then the erasure/feed surface exercised.  The keyed delete "
        "rewrote ONLY the click partition (located from the delete batch "
        "— no table scan), the predicate delete ONLY the error "
        "partition, and the v1→v2 change feed read one fragment per "
        f"side, emitting {feed_counts.get('delete', 0):,} delete rows "
        "and nothing else (manifest-verified, not sampled).",
        "",
        "| Phase | wall (s) | driver RSS after |",
        "|---|---|---|",
    ]
    for label, t in timings.items():
        lines.append(f"| {label} | {t} | {_fmt_rss(rss[label])} |")
    lines += [
        "",
        "Delete cost tracks the touched partition (one copy-on-write "
        "rewrite), never the table; the change feed's cost tracks the "
        "commits between the versions (unchanged partitions are "
        "inherited by reference on both sides, so they provably hold "
        "no change and are never scanned).  Final-state check: exact "
        "match against a direct batch merge-then-delete.",
        "",
    ]
    with open(os.path.join(ROOT, "SCALE.md"), "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
