"""Capture `.explain("formatted")` for named registered queries into
plans/r15/<name>_<tag>.txt — the optimization round's plan evidence.

Usage: python tools/opt_explain.py <tag> <name> [<name> ...]
       python tools/opt_explain.py <tag> --headline   (bench.HEADLINE set)

Storage-lifecycle queries that end in `materialize_bounded` return a
driver-local frame whose top-level plan is a LocalTableScan; their
meaningful plans are captured per-operator in the profiling notes
instead (see OPTIMIZATION_r14.md).
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from _big_data_analytics_and_visualization_tracking_student_progress__spark.registry import (
        all_queries,
    )
    from _big_data_analytics_and_visualization_tracking_student_progress__spark.session import (
        get_spark,
    )

    tag = sys.argv[1]
    names = sys.argv[2:]
    registry = all_queries()
    if names == ["--headline"]:
        import bench

        names = [n for n in bench.HEADLINE if n in registry]
    outdir = os.path.join(ROOT, "plans", "r15")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("opt-explain", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = registry[name].fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
