"""Sharded file-metadata smoke (VERDICT r10 item 3): prove that with
per-file zone maps and bloom bitsets sharded into per-version PARQUET
sidecars (fragment-filtered pyarrow reads) instead of a monolithic
manifest JSON, point-read metadata cost is FLAT in the table's total
file count — the property that keeps 10^5-10^6-file tables (true
100 TB cardinality) off the driver's heap.

Builds two tables with identical per-fragment shape (~41 clustered
files per day, disjoint key ranges per day) at two sizes:

- A: 24 fragments  → ~10^3 files
- B: 240 fragments → ~10^4 files

and measures

1. median `read_where_eq` point-probe wall on each (tier-1 prunes to
   ONE fragment; the sidecar fetch must touch only its rows) —
   asserted < 3x between A and B despite 10x the files,
2. the manifest JSON carries NO per-file payload (no `file_stats` key;
   `fstats_v` is O(fragments)),
3. a single-fragment upsert on B writes a sidecar covering ONLY the
   touched fragment (per-commit metadata cost tracks the commit, not
   the table).

Appends a `## sharded file-metadata sidecars` section to SCALE.md.

Usage: python tools/scale_metadata_sidecar.py
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

FILES_PER_DAY = 41
ROWS_PER_FILE = 100


def build(spark, path: str, n_days: int):
    from pyspark.sql import functions as F

    from _big_data_analytics_and_visualization_tracking_student_progress__spark.operators.upsert import (  # noqa: E501
        ManifestSnapshotTable,
    )

    t = ManifestSnapshotTable(
        spark,
        path,
        keys=["day", "k"],
        order_cols=["seq"],
        partition_by=["day"],
        stats_cols=["k"],
        bloom_cols=["k"],
    )
    rows_per_day = FILES_PER_DAY * ROWS_PER_FILE
    df = (
        spark.range(n_days * rows_per_day)
        .select(
            (F.col("id") / rows_per_day).cast("int").alias("day"),
            (
                (F.col("id") / rows_per_day).cast("long") * 100000
                + F.col("id") % rows_per_day
            ).alias("k"),
            F.lit(1).alias("seq"),
        )
    )
    t.upsert(df)
    t.compact(cluster_by=["k"], cluster_files=n_days * FILES_PER_DAY)
    return t


def count_files(t) -> int:
    n = 0
    for _d, _s, names in os.walk(t.path):
        n += sum(
            1 for x in names
            if x.endswith(".parquet")
            and x not in (t._FSTATS_SIDECAR, t._BLOOM_SIDECAR)
        )
    return n


def probe_walls(t, n_days: int, reps: int = 15) -> list[float]:
    walls = []
    for i in range(reps):
        day = (i * 7) % n_days
        k = day * 100000 + 5
        t0 = time.perf_counter()
        frame, fk, ft, flk, flt = t.read_where_eq([("k", k)])
        got = frame.collect()
        walls.append(time.perf_counter() - t0)
        if fk != 1 or len(got) != 1:
            raise RuntimeError(
                f"probe kept {fk} fragments / {len(got)} rows (want 1/1)"
            )
        if flk > 3:
            raise RuntimeError(f"file skipping kept {flk} files")
    return walls


def main() -> None:
    import atexit
    import tempfile

    from pyspark.sql import functions as F

    from _big_data_analytics_and_visualization_tracking_student_progress__spark.session import (  # noqa: E501
        get_spark,
    )

    spark = get_spark("scale-metadata-sidecar", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    tdir = tempfile.mkdtemp(prefix="sparkgraft_metascale_")
    atexit.register(shutil.rmtree, tdir, ignore_errors=True)

    t0 = time.perf_counter()
    ta = build(spark, os.path.join(tdir, "a"), 24)
    tb = build(spark, os.path.join(tdir, "b"), 240)
    build_s = time.perf_counter() - t0
    fa, fb = count_files(ta), count_files(tb)
    if fb < 8000:
        raise RuntimeError(f"B too small: {fb} files")

    # manifest JSON payload is O(fragments), never O(files)
    for t in (ta, tb):
        doc = t._manifest_doc()
        if "file_stats" in doc:
            raise RuntimeError("manifest still carries inline file_stats")
        if set(doc.get("fstats_v", {})) != set(doc["partitions"]):
            raise RuntimeError("fstats_v does not cover the fragments")
    msize_a = os.path.getsize(
        os.path.join(ta._vdir(ta.versions()[-1]), "manifest.json")
    )
    msize_b = os.path.getsize(
        os.path.join(tb._vdir(tb.versions()[-1]), "manifest.json")
    )

    wa = probe_walls(ta, 24)
    wb = probe_walls(tb, 240)
    med_a, med_b = statistics.median(wa), statistics.median(wb)
    ratio = med_b / med_a
    if ratio > 3.0:
        raise RuntimeError(
            f"probe wall scaled with file count: {med_a:.3f}s -> "
            f"{med_b:.3f}s ({ratio:.1f}x for 10x files)"
        )

    # a single-fragment commit's sidecar covers only the touched frag
    v = tb.upsert(
        spark.createDataFrame([(3, 300005, 2)], "day int, k long, seq int")
    )
    side = tb._read_fstats_sidecar(v, None)
    if set(side) != {"day=3"}:
        raise RuntimeError(
            f"commit sidecar covers {sorted(side)} (want just day=3)"
        )

    lines = [
        "## sharded file-metadata sidecars (10^4-file smoke)",
        "",
        "`tools/scale_metadata_sidecar.py`, local[32]: per-file zone "
        "maps + bloom bitsets live in per-version parquet sidecars, "
        "fragment-filtered at read time; the manifest JSON carries "
        "only O(fragments) metadata.",
        "",
        f"- table A: {fa:,} files / 24 fragments; "
        f"table B: {fb:,} files / 240 fragments "
        f"(build {build_s:.0f} s total)",
        f"- manifest.json size: A {msize_a:,} B — {msize_b:,} bytes "
        "(scales with fragments, not files; no file_stats key, "
        "asserted)",
        f"- point-probe median wall (read_where_eq, 1 fragment / "
        f"~1 file kept, collect included): A {med_a*1000:.0f} ms vs "
        f"B {med_b*1000:.0f} ms = {ratio:.2f}x for 10x the files "
        "(asserted < 3x — metadata cost tracks the SURVIVING "
        "fragment, not the table)",
        "- a single-fragment upsert's sidecar covers exactly the "
        "touched fragment (asserted) — per-commit metadata write "
        "cost tracks the commit, not the table",
        "",
    ]
    with open(os.path.join(ROOT, "SCALE.md"), "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    spark.stop()


if __name__ == "__main__":
    main()
