"""Deletion vectors vs copy-on-write DELETE at scale: on a FACTORx
events replica, erase a SCATTERED key set (keys in EVERY partition —
the worst case for copy-on-write, which must rewrite the whole table)
both ways and measure the asymmetry the merge-on-read design buys:

1. full-load commit (every event_type partition)              → v1
2. CoW delete of scattered key set A (rewrites ALL partitions) → v2
3. DV delete of scattered key set B (sidecar rows only)        → v3
4. read+aggregate with live vectors (the anti-join read tax)
   vs the same read before any vector existed
5. metadata-only COUNT(*) with live vectors (0 data GETs)
6. compact() — materialize the vectors away — then exact
   final-state check vs a direct batch computation

Appends a `## FACTORx deletion vectors vs copy-on-write` section to
SCALE.md.

Usage: python tools/scale_dv.py [sf_dir] [factor]
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

    spark = get_spark("scale-dv", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    scaled_dir = build_scaled_dir(SF_DIR, FACTOR, tables={"events"})
    atexit.register(shutil.rmtree, scaled_dir, ignore_errors=True)
    tdir = tempfile.mkdtemp(prefix="sparkgraft_dvscale_")
    atexit.register(shutil.rmtree, tdir, ignore_errors=True)

    # key on event_id (replica-shifted, globally distinct) so the
    # LIVE snapshot is the full row count — otherwise the keyed dedup
    # collapses the table and the CoW rewrite cost under-states what a
    # 100 TB fact table pays
    table = ManifestSnapshotTable(
        spark,
        os.path.join(tdir, "table"),
        keys=["event_id", "event_type"],
        order_cols=["ts_nanos"],
        partition_by=["event_type"],
        stats_cols=["event_id"],
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

    # two DISJOINT scattered key sets of equal construction: keys in
    # every event_type partition, so CoW must rewrite the whole table
    all_keys = ev.select("event_id", "event_type").distinct()
    set_a = all_keys.filter(F.col("event_id") % 20000 == 0)
    set_b = all_keys.filter(F.col("event_id") % 20000 == 10000)
    n_a, n_b = set_a.count(), set_b.count()

    phase("cow_delete_scattered_v2", lambda: table.delete(set_a))
    m2 = table.manifest()
    if set(m2.values()) != {2}:
        raise RuntimeError(
            f"scattered CoW delete should rewrite every partition: {m2}"
        )
    agg_cols = [
        F.count(F.lit(1)).alias("n"),
        F.sum("event_id").cast("long").alias("s"),
    ]
    res_plain: list = []
    phase(
        "read_agg_no_vectors",
        lambda: res_plain.extend(
            table.read().groupBy("event_type").agg(*agg_cols).collect()
        ),
    )

    phase("dv_delete_scattered_v3", lambda: table.delete_dv(set_b))
    v3 = table.versions()[-1]
    if os.path.exists(table._data_dir(v3)):
        raise RuntimeError("dv delete wrote data files")
    doc = table._manifest_doc()
    dv = table._dv_map(doc)
    if set(dv) != set(table.manifest()):
        raise RuntimeError(f"expected a vector on every fragment: {dv}")
    n_dv_rows = sum(int(x) for x in doc["dv_rows"].values())

    res_dv: list = []
    phase(
        "read_agg_with_vectors",
        lambda: res_dv.extend(
            table.read().groupBy("event_type").agg(*agg_cols).collect()
        ),
    )

    counts: list = []
    phase("metadata_count_with_vectors", lambda: counts.append(
        table.count_rows()
    ))
    rows_meta, meta_frags, scanned_frags = counts[0]
    if scanned_frags != 0:
        raise RuntimeError(
            f"COUNT(*) scanned {scanned_frags} fragments with vectors live"
        )

    phase("compact_materialize_v4", lambda: table.compact())
    if table._dv_map(table._manifest_doc()):
        raise RuntimeError("compact left vectors behind")

    res_final: list = []
    phase(
        "read_agg_after_compact",
        lambda: res_final.extend(
            table.read().groupBy("event_type").agg(*agg_cols).collect()
        ),
    )
    if {tuple(r) for r in res_dv} != {tuple(r) for r in res_final}:
        raise RuntimeError("compaction changed observable content")

    # exact final-state check vs a direct batch computation
    expect = (
        latest_by_key(
            ev,
            ["event_id", "event_type"],
            [F.col("ts_nanos").desc()],
        )
        .filter(~(F.col("event_id") % 20000 == 0))
        .filter(~(F.col("event_id") % 20000 == 10000))
        .groupBy("event_type")
        .agg(*agg_cols)
    )
    e_rows = {tuple(r) for r in expect.collect()}
    g_rows = {tuple(r) for r in res_final}
    if e_rows != g_rows:
        raise RuntimeError(
            f"final state diverged: only-expected={e_rows - g_rows} "
            f"only-got={g_rows - e_rows}"
        )
    if rows_meta != sum(r[1] for r in sorted(e_rows)):
        raise RuntimeError(
            f"metadata COUNT diverged: {rows_meta} vs expected total"
        )

    ratio = (
        timings["cow_delete_scattered_v2"] / timings["dv_delete_scattered_v3"]
        if timings["dv_delete_scattered_v3"] > 0
        else float("inf")
    )
    read_tax = (
        timings["read_agg_with_vectors"] - timings["read_agg_no_vectors"]
    )

    def _fmt_rss(s: dict[str, float]) -> str:
        return (
            f"python {s['python_mb']:.0f} MB + "
            f"JVM tree {s['jvm_tree_mb']:.0f} MB"
        )

    lines = [
        f"## {FACTOR}x deletion vectors vs copy-on-write",
        "",
        f"Auto-generated by `python tools/scale_dv.py {SF_DIR} {FACTOR}`: "
        f"events replicated {FACTOR}x ({n_events:,} rows), committed to "
        "a ManifestSnapshotTable partitioned by event_type, then two "
        "equal-construction SCATTERED key sets (keys in EVERY "
        f"partition; |A| = {n_a:,} CoW, |B| = {n_b:,} DV) erased each "
        "way.  The scattered shape is copy-on-write's worst case — "
        "partition pruning cannot help, the whole table rewrites — and "
        "exactly where merge-on-read wins: the DV commit wrote "
        f"{n_dv_rows:,} sidecar rows and zero data files "
        f"(**{ratio:.1f}x faster**).  The read tax until "
        f"materialization was {read_tax:+.2f} s on a full-table "
        "aggregate; COUNT(*) stayed metadata-only (0 fragments "
        "scanned) via the recorded vector cardinalities; compact() "
        "materialized the vectors away and the final state matched a "
        "direct batch computation exactly.",
        "",
        "| Phase | wall (s) | driver RSS after |",
        "|---|---|---|",
    ]
    for label, t in timings.items():
        lines.append(f"| {label} | {t} | {_fmt_rss(rss[label])} |")
    lines += [
        "",
        "At 100 TB the asymmetry grows with table size: the CoW wall "
        "tracks the touched partitions' bytes (here: all of them), the "
        "DV wall tracks the doomed rows located + written.  The policy "
        "split stands: vectors for small scattered erasure (GDPR), "
        "copy-on-write for mass deletes, compact() to re-zero the "
        "read tax on a maintenance schedule.",
        "",
    ]
    with open(os.path.join(ROOT, "SCALE.md"), "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
