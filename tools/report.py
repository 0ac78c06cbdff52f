"""Render the static-HTML serving surface (the reference's Kibana
dashboards + Streamlit per-student UI as build artifacts).

    python tools/report.py [sf_dir] [out_dir] [custkey]

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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "."
    custkey = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    from _big_data_analytics_and_visualization_tracking_student_progress__spark.serving.report import (  # noqa: E501
        render_student_report,
        write_report,
    )
    from _big_data_analytics_and_visualization_tracking_student_progress__spark.session import (  # noqa: E501
        get_spark,
    )

    spark = get_spark("report")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)
    dash = os.path.join(out_dir, "report.html")
    stud = os.path.join(out_dir, f"student_{custkey}.html")
    write_report(dash, build_report(spark, sf_dir))
    write_report(stud, render_student_report(spark, sf_dir, custkey=custkey))
    print(f"wrote {dash} and {stud}")
    spark.stop()


if __name__ == "__main__":
    main()
