"""Render the static-HTML serving surface (the reference's Kibana
dashboards + Streamlit per-student UI as build artifacts).

    python tools/report.py [sf_dir] [out_dir] [custkey] [--serve]

Writes `report.html` (corpus dashboard: KPI tiles, monthly revenue
trend, grade histogram, quality-by-language, pricing table) and
`student_<custkey>.html` (per-student progress page) — each fully
self-contained (inline CSS/SVG/JS, no external resources), every
number produced by the verified query registry.  In production the
same two calls run in a `foreachBatch` sink or a cron so the
artifacts track the serving tables.

The rendering lives in the package
(`…/serving/report.py`) so tests and sinks share it; this file is the
CLI.

`--serve` is the closest honest analog to the reference's Streamlit
live loop without a web framework: keep the process up, poll the data
directory with `DropFolderMonitor` (content-hash change detection),
and rewrite both pages whenever a table file changes — open
`report.html` in a browser and refresh.
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def build_report(spark, sf_dir: str) -> str:
    """Corpus dashboard HTML (kept as the tool-level entry point)."""
    from _big_data_analytics_and_visualization_tracking_student_progress__spark.serving.report import (  # noqa: E501
        render_dashboard,
    )

    return render_dashboard(spark, sf_dir)


def render_once(spark, sf_dir: str, out_dir: str, custkey: int) -> list[str]:
    """One full render of both pages; returns the written paths."""
    from _big_data_analytics_and_visualization_tracking_student_progress__spark.serving.report import (  # noqa: E501
        render_student_report,
        write_report,
    )

    os.makedirs(out_dir, exist_ok=True)
    dash = os.path.join(out_dir, "report.html")
    stud = os.path.join(out_dir, f"student_{custkey}.html")
    write_report(dash, build_report(spark, sf_dir))
    write_report(stud, render_student_report(spark, sf_dir, custkey=custkey))
    return [dash, stud]


def serve(
    spark,
    sf_dir: str,
    out_dir: str,
    custkey: int,
    interval: float = 2.0,
    max_cycles: int | None = None,
) -> int:
    """Live-rebuild loop: render once up front, then rewrite both pages
    whenever a parquet file under `sf_dir` changes content (the
    Streamlit-rerun analog; reference app.py:12,58).  Returns the
    number of re-renders.  `max_cycles` bounds the loop for tests."""
    import tempfile
    import time

    from _big_data_analytics_and_visualization_tracking_student_progress__spark.sources.watcher import (  # noqa: E501
        DropFolderMonitor,
    )

    # monitor state is ephemeral (the baseline is re-established every
    # startup), so it lives in a TemporaryDirectory tied to this loop
    with tempfile.TemporaryDirectory(prefix="report_serve_") as td:
        monitor = DropFolderMonitor(
            sf_dir, os.path.join(td, "files.json"), exts=(".parquet",)
        )
        monitor.poll()  # baseline: current content is what we render now
        paths = render_once(spark, sf_dir, out_dir, custkey)
        print(f"serving {paths[0]} (+ {paths[1]}); watching {sf_dir}")
        rerenders = 0
        cycles = 0
        while max_cycles is None or cycles < max_cycles:
            cycles += 1
            time.sleep(interval)
            if monitor.poll():
                # registered loaders cache nothing across calls, but
                # Spark may have cached scans of the replaced files
                spark.catalog.clearCache()
                render_once(spark, sf_dir, out_dir, custkey)
                rerenders += 1
                print(f"re-rendered ({rerenders})")
        return rerenders


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    live = "--serve" in sys.argv[1:]
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.001"
    out_dir = args[1] if len(args) > 1 else "."
    custkey = int(args[2]) if len(args) > 2 else 1

    from _big_data_analytics_and_visualization_tracking_student_progress__spark.session import (  # noqa: E501
        get_spark,
    )

    spark = get_spark("report")
    spark.sparkContext.setLogLevel("ERROR")
    if live:
        try:
            serve(spark, sf_dir, out_dir, custkey)
        except KeyboardInterrupt:
            pass
    else:
        paths = render_once(spark, sf_dir, out_dir, custkey)
        print(f"wrote {paths[0]} and {paths[1]}")
    spark.stop()


if __name__ == "__main__":
    main()
