"""Retraction-based IVM at scale: on a FACTORx events replica, compare
the three rollup-maintenance strategies after a TINY CDC commit
against a huge base — the shape where maintenance strategy dominates:

1. full re-aggregation (the reference's per-dashboard-load cost)
2. `IncrementalAggView.refresh()` — recompute moved fragments' partials
3. `DeltaAggView.refresh()` — diff the moved fragment into a net feed,
   fold signed deltas into the |groups|-row state
4. `DeltaAggView.apply_feed()` — fold a PRE-MATERIALIZED feed
   (produced once by the relay) without touching the base at all

All four must agree exactly with the declarative aggregate (checked),
and the walls tell the strategy story.  Appends a `## FACTORx
retraction-based IVM` section to SCALE.md.

Usage: python tools/scale_delta_view.py [sf_dir] [factor]
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
    from _big_data_analytics_and_visualization_tracking_student_progress__spark.operators.matview import (  # noqa: E501
        DeltaAggView,
        IncrementalAggView,
    )
    from _big_data_analytics_and_visualization_tracking_student_progress__spark.operators.upsert import (  # noqa: E501
        ManifestSnapshotTable,
    )
    from _big_data_analytics_and_visualization_tracking_student_progress__spark.session import (  # noqa: E501
        get_spark,
    )

    spark = get_spark("scale-dav", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    scaled_dir = build_scaled_dir(SF_DIR, FACTOR, tables={"events"})
    atexit.register(shutil.rmtree, scaled_dir, ignore_errors=True)
    tdir = tempfile.mkdtemp(prefix="sparkgraft_dav_")
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
        keys=["day_bucket", "user_id", "event_type"],
        order_cols=["ts_nanos", "event_id"],
        partition_by=["day_bucket"],
    )
    dav = DeltaAggView(
        spark, os.path.join(tdir, "dav"), table,
        group_cols=["event_type"], sum_cols=["user_id"],
    )
    iav = IncrementalAggView(
        spark, os.path.join(tdir, "iav"), table,
        group_cols=["event_type"],
        measures=[("n", None, "count"), ("sum_user", "user_id", "sum")],
    )

    timings: dict[str, float] = {}
    rss: dict[str, dict[str, float]] = {}

    def phase(label: str, fn) -> None:
        t0 = time.perf_counter()
        fn()
        timings[label] = round(time.perf_counter() - t0, 2)
        rss[label] = rss_snapshot_mb()

    phase("base_full_load", lambda: table.upsert(ev))
    n_frags = len(table.manifest())
    phase("delta_view_bootstrap", dav.refresh)
    phase("partial_view_bootstrap", iav.refresh)

    # the CDC batch: a few hundred keys of ONE day, bumped
    cdc = (
        ev.filter(
            (F.col("day_bucket") == DAY) & (F.col("user_id") % 997 == 0)
        )
        .withColumn("ts_nanos", F.col("ts_nanos") + F.lit(1))
        .localCheckpoint()
    )
    n_cdc = cdc.count()
    phase("tiny_cdc_commit", lambda: table.upsert(cdc))

    def full_reagg() -> None:
        table.read().groupBy("event_type").agg(
            F.count(F.lit(1)), F.sum("user_id")
        ).collect()

    phase("full_reaggregation", full_reagg)
    phase("partial_view_refresh", iav.refresh)
    phase("delta_view_refresh_diff", dav.refresh)

    # produce-once / apply-many: materialize the NEXT commit's feed
    # once, then fold it without touching the base
    cdc2 = cdc.withColumn("ts_nanos", F.col("ts_nanos") + F.lit(1))
    v_before = table.versions()[-1]
    table.upsert(cdc2)
    v_after = table.versions()[-1]
    feed_dir = os.path.join(tdir, "feed")
    table.changes(
        v_before, v_after, emit_update_preimages=True
    ).write.parquet(feed_dir)

    def apply_only() -> None:
        dav.apply_feed(spark.read.parquet(feed_dir), v_after)

    phase("delta_view_apply_feed_only", apply_only)

    # exactness: all strategies equal the declarative aggregate
    direct = {
        r.event_type: (r.n, int(r.s))
        for r in table.read()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("user_id").alias("s"),
        )
        .collect()
    }
    got_dav = {
        r.event_type: (r.n, int(r.sum_user_id))
        for r in dav.read().collect()
    }
    iav.refresh()
    got_iav = {
        r.event_type: (r.n, int(r.sum_user))
        for r in iav.read().collect()
    }
    if not (direct == got_dav == got_iav):
        raise RuntimeError(
            f"strategies diverged: direct={direct} dav={got_dav} "
            f"iav={got_iav}"
        )

    def _fmt_rss(s: dict[str, float]) -> str:
        return (
            f"python {s['python_mb']:.0f} MB + "
            f"JVM tree {s['jvm_tree_mb']:.0f} MB"
        )

    lines = [
        f"## {FACTOR}x retraction-based IVM",
        "",
        f"Auto-generated by `python tools/scale_delta_view.py {SF_DIR} "
        f"{FACTOR}`: events replicated {FACTOR}x ({n_events:,} rows, "
        f"{n_frags} day fragments), then a {n_cdc:,}-row CDC commit "
        "against one day.  Four maintenance strategies, all verified "
        "exactly equal to the declarative aggregate:",
        "",
        "| Phase | wall (s) | driver RSS after |",
        "|---|---|---|",
    ]
    for label, t in timings.items():
        lines.append(f"| {label} | {t} | {_fmt_rss(rss[label])} |")
    lines += [
        "",
        "The ordering is the architecture story: full re-aggregation "
        "pays the table; the fragment-partial view pays the touched "
        "partition; the delta view's diff refresh also reads the moved "
        "fragment pair but folds only net rows into a |groups|-row "
        "state; and `apply_feed` — the relay's produce-once feed folded "
        "directly — never touches the base at all, so N downstream "
        "rollups cost N folds of the same materialized feed.",
        "",
    ]
    with open(os.path.join(ROOT, "SCALE.md"), "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
