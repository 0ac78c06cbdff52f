"""The driver imports __spark_entry__ from an arbitrary working
directory; Python workers only see the repo if nothing is pickled BY
REFERENCE to this package (module-level UDFs / DataSource classes would
need the package importable on executors).  Every Arrow UDF and custom
source must therefore be a self-contained closure / factory-built class.

This test runs the two queries that historically violated that rule
(applyInPandasWithState, Python DataSource) in a subprocess whose cwd is
a temp dir — the exact driver condition — and asserts they produce rows.
"""

from __future__ import annotations

import subprocess
import sys

REPO = "/root/repo"

_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false").getOrCreate())
from _big_data_analytics_and_visualization_tracking_student_progress__spark.registry import all_queries
qs = all_queries()
for name in ["pyds_synthetic_agg", "stream_stateful_running_totals"]:
    n = qs[name].fn(spark, "/root/testdata/sf0.001").count()
    print("OK", name, n)
"""


def test_pickled_udfs_and_sources_work_from_any_cwd(tmp_path):
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=REPO)],
        cwd=str(tmp_path),
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "OK pyds_synthetic_agg" in proc.stdout
    assert "OK stream_stateful_running_totals" in proc.stdout
