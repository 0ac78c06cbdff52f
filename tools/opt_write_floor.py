"""Interleaved A/B of the COW commit write distribution (round 15).

Times a bare `upsert` commit (the storage headliners' ~0.9 s/commit
floor: 600k events, 30 day_bucket partitions, stats_cols) with the
pre-write hash distribution ON vs OFF (monkeypatched to identity), in
alternating order within one session, and reports wall + files/commit.

Usage: python tools/opt_write_floor.py [reps]
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F

    from _big_data_analytics_and_visualization_tracking_student_progress__spark.datasets import (
        load_table,
    )
    from _big_data_analytics_and_visualization_tracking_student_progress__spark.operators.manifest_write import (
        _ManifestWriteMixin,
    )
    from _big_data_analytics_and_visualization_tracking_student_progress__spark.operators.upsert import (
        ManifestSnapshotTable,
    )
    from _big_data_analytics_and_visualization_tracking_student_progress__spark.session import (
        get_spark,
    )

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("opt_write_floor", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    day_ns = 86_400_000_000_000
    e = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_type", "event_id", "ts_nanos"
    )
    dmin = e.agg(F.min("ts_nanos")).first()[0]
    ev = e.withColumn(
        "day_bucket", F.expr(f"(ts_nanos - {dmin}) DIV {day_ns}")
    ).persist()
    ev.count()

    real = _ManifestWriteMixin._distribute_for_write

    def identity(self, df, n_frags):
        return df

    results: dict[str, list[tuple[float, int]]] = {"off": [], "on": []}

    def one_commit(label: str) -> None:
        _ManifestWriteMixin._distribute_for_write = (
            real if label == "on" else identity
        )
        path = tempfile.mkdtemp(prefix=f"wf_{label}_")
        shutil.rmtree(path)
        t = ManifestSnapshotTable(
            spark,
            path,
            keys=["day_bucket", "user_id", "event_type"],
            order_cols=["ts_nanos", "event_id"],
            partition_by=["day_bucket"],
            stats_cols=["ts_nanos"],
        )
        spark.sparkContext.setJobDescription(f"upsert[{label}]")
        t0 = time.perf_counter()
        t.upsert(ev)
        dt = time.perf_counter() - t0
        nf = len(glob.glob(os.path.join(path, "v*", "data", "*", "*.parquet")))
        results[label].append((dt, nf))
        shutil.rmtree(path, ignore_errors=True)

    # warmup one of each
    one_commit("off")
    one_commit("on")
    results = {"off": [], "on": []}
    for _ in range(reps):
        one_commit("off")
        one_commit("on")
    _ManifestWriteMixin._distribute_for_write = real

    for label, rs in results.items():
        walls = [w for w, _ in rs]
        files = [n for _, n in rs]
        print(
            f"{label:4s} files/commit={files[0]:4d} "
            f"wall min={min(walls):.3f} med={sorted(walls)[len(walls)//2]:.3f} "
            f"all={[round(w,3) for w in walls]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
