"""Conditional MERGE INTO at scale: on a FACTORx events replica, load
a day-bucketed keyed table, then run (1) a conditional merge whose
source is ONE day's raw events — the CDC-batch shape — and (2) a
by-source sync merge that reaps the keys a "full desired state"
source no longer names.  Both commits must rewrite exactly one
fragment (proved from the manifest diff), their walls must track the
batch, not the table, and the final key counts must equal arithmetic
computed directly from the replica.  Metadata COUNT(*) is used as the
checker (0 fragments scanned), so the smoke also re-proves the
metadata tier over merge commits.

Phases, each timed with driver-RSS snapshots:

1. full-load commit (every day fragment)                       → v1
2. conditional merge, source = day D's raw rows:
   WHEN MATCHED AND s.user%10=0 DELETE,
   WHEN MATCHED AND s.ts>=t.ts UPDATE                          → v2
3. by-source sync merge, source = day D's even-user rows:
   WHEN NOT MATCHED BY SOURCE AND t.day=D DELETE (reaps odd
   users; deleted even %10 keys come back as inserts)          → v3
4. metadata count after each commit vs direct key arithmetic

Appends a `## FACTORx conditional MERGE INTO` section to SCALE.md.

Usage: python tools/scale_merge.py [sf_dir] [factor]
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
DAY = 5


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

    spark = get_spark("scale-merge", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    scaled_dir = build_scaled_dir(SF_DIR, FACTOR, tables={"events"})
    atexit.register(shutil.rmtree, scaled_dir, ignore_errors=True)
    tdir = tempfile.mkdtemp(prefix="sparkgraft_merge_")
    atexit.register(shutil.rmtree, tdir, ignore_errors=True)

    e = load_table(spark, scaled_dir, "events").select(
        "user_id", "event_type", "event_id", "ts_nanos"
    )
    dmin = e.agg(F.min("ts_nanos")).first()[0]
    ev = e.withColumn(
        "day_bucket", F.expr(f"(ts_nanos - {dmin}) DIV {DAY_NS}")
    )
    n_events = ev.count()

    # key arithmetic straight from the replica (bounded outputs)
    keys = ev.select("day_bucket", "user_id", "event_type").distinct()
    k_total = keys.count()
    day_keys = keys.filter(F.col("day_bucket") == DAY)
    k_day = day_keys.count()
    k_day_del = day_keys.filter(F.col("user_id") % 10 == 0).count()
    k_day_even = day_keys.filter(F.col("user_id") % 2 == 0).count()

    table = ManifestSnapshotTable(
        spark,
        os.path.join(tdir, "table"),
        keys=["day_bucket", "user_id", "event_type"],
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

    phase("full_load_commit_v1", lambda: table.upsert(ev))
    n_frags = len(table.manifest())

    def check_count(expected: int, where: str) -> None:
        n, _meta, scanned = table.count_rows()
        if scanned or n != expected:
            raise RuntimeError(
                f"{where}: count {n} (scanned {scanned}) != {expected}"
            )

    check_count(k_total, "after full load")

    src1 = ev.filter(F.col("day_bucket") == DAY)

    def merge_cdc() -> None:
        m_before = table.manifest()
        table.merge_into(
            src1,
            when_matched_delete=F.col("s.user_id") % 10 == 0,
            when_matched_update=(
                F.col("s.ts_nanos") >= F.col("t.ts_nanos")
            ),
        )
        m_after = table.manifest()
        moved = sorted(
            f
            for f in set(m_before) | set(m_after)
            if m_before.get(f) != m_after.get(f)
        )
        if moved != [f"day_bucket={DAY}"]:
            raise RuntimeError(f"CDC merge moved {moved}")

    phase("merge_cdc_one_partition_v2", merge_cdc)
    check_count(k_total - k_day_del, "after CDC merge")

    src2 = src1.filter(F.col("user_id") % 2 == 0)

    def merge_sync() -> None:
        m_before = table.manifest()
        table.merge_into(
            src2,
            when_not_matched_by_source_delete=(
                F.col("t.day_bucket") == DAY
            ),
        )
        m_after = table.manifest()
        moved = sorted(
            f
            for f in set(m_before) | set(m_after)
            if m_before.get(f) != m_after.get(f)
        )
        if moved != [f"day_bucket={DAY}"]:
            raise RuntimeError(f"sync merge moved {moved}")

    phase("merge_by_source_sync_v3", merge_sync)
    # odd users reaped; even %10 keys (deleted in v2) re-inserted
    check_count(k_total - k_day + k_day_even, "after sync merge")

    def _fmt_rss(s: dict[str, float]) -> str:
        return (
            f"python {s['python_mb']:.0f} MB + "
            f"JVM tree {s['jvm_tree_mb']:.0f} MB"
        )

    lines = [
        f"## {FACTOR}x conditional MERGE INTO",
        "",
        f"Auto-generated by `python tools/scale_merge.py {SF_DIR} "
        f"{FACTOR}`: events replicated {FACTOR}x ({n_events:,} rows, "
        f"{k_total:,} keys over {n_frags} day fragments).  A "
        "conditional CDC merge (matched-delete + matched-update) whose "
        f"source is one day's raw rows rewrote 1/{n_frags} fragments; "
        "a by-source sync merge (WHEN NOT MATCHED BY SOURCE DELETE) "
        f"reaped the day's odd-user keys, also 1/{n_frags} fragments — "
        "both proved from the manifest diff, with exact metadata "
        "COUNT(*) checks (0 fragments scanned) after every commit: "
        f"{k_total:,} → {k_total - k_day_del:,} → "
        f"{k_total - k_day + k_day_even:,} keys.",
        "",
        "| Phase | wall (s) | driver RSS after |",
        "|---|---|---|",
    ]
    for label, t in timings.items():
        lines.append(f"| {label} | {t} | {_fmt_rss(rss[label])} |")
    lines += [
        "",
        "Merge cost tracks the BATCH: both merges read and rewrite one "
        "touched fragment (the by-source locate scan is partition-"
        "pruned by its own condition), while the full load pays the "
        "whole table — the gap is the pruned-copy-on-write claim, "
        "measured.",
        "",
    ]
    with open(os.path.join(ROOT, "SCALE.md"), "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
