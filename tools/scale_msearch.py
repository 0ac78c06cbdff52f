"""Batched multi-query BM25 (`bm25_msearch`) vs N sequential
`bm25_search` jobs — the ES `_msearch` economics, measured.

Builds the inverted index once over a FACTORx documents replica, then
serves the SAME query batch two ways:

(a) sequentially: one bm25_search job per query (N index reads);
(b) batched: one bm25_msearch job (the term-bucket UNION is read once,
    the per-(doc, term) fixed-point score is computed once per posting,
    a broadcast (q_id, term) join fans postings to queries).

Asserts per-query result identity between the two paths, then appends
a `## FACTORx bm25 msearch` section to SCALE.md with the speedup.

Usage: python tools/scale_msearch.py [sf_dir] [factor] [n_queries]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scale_smoke import build_scaled_dir  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
FACTOR = int(sys.argv[2]) if len(sys.argv) > 2 else 10
N_QUERIES = int(sys.argv[3]) if len(sys.argv) > 3 else 32

# fixture-vocabulary terms (the corpus generator's word pool) — cycled
# into N distinct multi-term queries
_VOCAB = [
    "join", "hash", "row", "batch", "scan", "customer", "column",
    "filter", "small", "slow", "merge", "order", "vector", "line",
    "data", "table", "agg", "value", "key", "stream", "window",
    "spark", "group", "part",
]


def _queries(n: int) -> dict[int, list[str]]:
    return {
        q: [_VOCAB[(q + j) % len(_VOCAB)] for j in range(3)]
        for q in range(1, n + 1)
    }


def main() -> None:
    import atexit
    import tempfile

    from _big_data_analytics_and_visualization_tracking_student_progress__spark.datasets import (  # noqa: E501
        load_table,
    )
    from _big_data_analytics_and_visualization_tracking_student_progress__spark.operators.textindex import (  # noqa: E501
        bm25_msearch,
        bm25_search,
        build_inverted_index,
    )
    from _big_data_analytics_and_visualization_tracking_student_progress__spark.session import (  # noqa: E501
        get_spark,
    )

    spark = get_spark("scale-msearch", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    scaled_dir = build_scaled_dir(SF_DIR, FACTOR, tables={"documents"})
    atexit.register(shutil.rmtree, scaled_dir, ignore_errors=True)
    tdir = tempfile.mkdtemp(prefix="sparkgraft_msearch_")
    atexit.register(shutil.rmtree, tdir, ignore_errors=True)
    idx = os.path.join(tdir, "idx")

    docs = load_table(spark, scaled_dir, "documents")
    n_docs = docs.count()
    build_inverted_index(docs, idx)
    queries = _queries(N_QUERIES)

    # warm both paths once (JVM/codegen/footers), then measure
    bm25_search(spark, idx, queries[1], k=10).collect()
    bm25_msearch(spark, idx, {1: queries[1]}, k=10).collect()

    t0 = time.perf_counter()
    sequential = {
        q: [tuple(r) for r in bm25_search(spark, idx, ts, k=10).collect()]
        for q, ts in queries.items()
    }
    seq_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    batched_rows = bm25_msearch(spark, idx, queries, k=10).collect()
    batch_s = time.perf_counter() - t0

    batched: dict[int, list] = {}
    for r in sorted(batched_rows, key=lambda r: (r.q_id, r.rank)):
        batched.setdefault(r.q_id, []).append((r.doc_id, r.bm25))
    if batched != sequential:
        raise RuntimeError("msearch results diverge from the single path")

    speedup = seq_s / batch_s
    lines = [
        f"## {FACTOR}x bm25 msearch",
        "",
        f"{n_docs:,} documents ({FACTOR}x sf replica), {N_QUERIES} "
        "3-term queries; `tools/scale_msearch.py`, local[32]:",
        "",
        f"- sequential ({N_QUERIES} bm25_search jobs): {seq_s:.2f} s "
        f"({seq_s / N_QUERIES:.3f} s/query)",
        f"- batched (one bm25_msearch job): {batch_s:.2f} s "
        f"({batch_s / N_QUERIES:.3f} s/query)",
        f"- speedup: **{speedup:.1f}x**, per-query results verified "
        "identical",
        "",
        "The batch reads the UNION of the queries' term buckets once "
        "and computes each posting's fixed-point score once (it is "
        "query-independent); only the tiny (q_id, term) table and the "
        "per-query top-k window scale with the batch — so msearch cost "
        "approaches ONE search as queries share vocabulary, where "
        "sequential serving pays full job + scan overhead per query.",
        "",
    ]
    with open(os.path.join(ROOT, "SCALE.md"), "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    if speedup < 5:
        raise SystemExit(f"speedup {speedup:.1f}x below the 5x bar")


if __name__ == "__main__":
    main()
