"""Manifest-managed text index at scale: on a FACTORx documents
replica, show the lifecycle keeps its 100 TB contract:

(a) the bulk build is one bucket-partitioned MERGE commit,
(b) an APPEND of a small doc batch is a pruned commit — only the batch
    terms' buckets rewrite (for a 3-term-vocabulary batch that is ≤3
    of 64 fragments, manifest-asserted) at a small fraction of the
    bulk build's wall,
(c) right-to-erasure is a deletion-vector commit: no posting rewrite,
    queries exclude the docs immediately, BM25 stats stay pre-delete
    (Lucene) until
(d) `compact` materializes the vectors and re-exactifies stats in one
    amortized OPTIMIZE,
(e) snapshot time travel still serves the pre-erasure ranking.

Appends a `## FACTORx managed text index` section to SCALE.md.

Usage: python tools/scale_managed_text.py [sf_dir] [factor]
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


def main() -> None:
    import atexit
    import tempfile

    from pyspark.sql import functions as F

    from _big_data_analytics_and_visualization_tracking_student_progress__spark.datasets import (  # noqa: E501
        load_table,
    )
    from _big_data_analytics_and_visualization_tracking_student_progress__spark.operators.managed_text import (  # noqa: E501
        ManagedTextIndex,
    )
    from _big_data_analytics_and_visualization_tracking_student_progress__spark.session import (  # noqa: E501
        get_spark,
    )

    spark = get_spark("scale-managed-text", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    scaled_dir = build_scaled_dir(SF_DIR, FACTOR, tables={"documents"})
    atexit.register(shutil.rmtree, scaled_dir, ignore_errors=True)
    tdir = tempfile.mkdtemp(prefix="sparkgraft_mtxscale_")
    atexit.register(shutil.rmtree, tdir, ignore_errors=True)

    docs = load_table(spark, scaled_dir, "documents")
    n_docs = docs.count()
    max_id = docs.agg(F.max("doc_id")).head()[0]

    # the append batch: synthetic new docs whose vocabulary is exactly
    # the 3 query terms — the pruned commit must touch ≤3 buckets
    append = spark.createDataFrame(
        [(max_id + 1 + i, "spark merge window") for i in range(100)],
        "doc_id long, text string",
    )
    idx = ManagedTextIndex(spark, os.path.join(tdir, "index"))

    timings: dict[str, float] = {}
    rss: dict[str, dict[str, float]] = {}

    def phase(label: str, fn) -> None:
        t0 = time.perf_counter()
        fn()
        timings[label] = round(time.perf_counter() - t0, 2)
        rss[label] = rss_snapshot_mb()

    phase("bulk_build_v1", lambda: idx.upsert(docs))
    v1 = idx.table.versions()[-1]

    phase("append_100_docs_v2", lambda: idx.upsert(append))
    v2 = idx.table.versions()[-1]
    moved = [k for k, v in idx.table.manifest().items() if v == v2]
    if not 0 < len(moved) <= 3:
        raise RuntimeError(f"append moved {len(moved)} buckets, expected <=3")
    if not all(
        v == v1 for k, v in idx.table.manifest().items() if k not in moved
    ):
        raise RuntimeError("append failed to inherit untouched buckets")

    got: dict[str, list] = {}

    def bm25(key: str, version=None) -> None:
        got[key] = [
            tuple(r) for r in idx.bm25(TERMS, k=10, version=version).collect()
        ]

    phase("bm25_serve", lambda: bm25("before"))
    v_pre = idx.table.versions()[-1]

    doomed = [r[0] for r in got["before"][:3]]
    phase(
        "dv_erase_top3",
        lambda: idx.delete(doomed),
    )
    phase("bm25_with_dv", lambda: bm25("after"))
    if set(doomed) & {r[0] for r in got["after"]}:
        raise RuntimeError("erased doc still ranks")
    phase("bm25_time_travel_pre_erasure", lambda: bm25("then", version=v_pre))
    if not set(doomed) <= {r[0] for r in got["then"]}:
        raise RuntimeError("time travel lost the pre-erasure ranking")

    stale = idx._stats_at(None)["n_docs"]
    phase("compact_merge", lambda: idx.compact())
    exact = idx._stats_at(None)["n_docs"]
    if not (stale == n_docs + 100 and exact == stale - 3):
        raise RuntimeError(f"stats wrong: stale={stale} exact={exact}")
    phase("bm25_after_compact", lambda: bm25("final"))

    # round-14 serves: positional queries (phrase/proximity) ride the
    # same bucket-pruned snapshot reads as BM25; suggest is the
    # snapshot-consistent prefix-df aggregate (hash buckets can't
    # prune a prefix — measured honestly as the full-postings
    # aggregate), and materialize_dictionary freezes it into the
    # first-char-partitioned artifact for O(one partition) lookups.
    phase(
        "phrase_serve",
        lambda: got.__setitem__(
            "phrase",
            [tuple(r) for r in idx.phrase_search(["part", "filter"], k=10).collect()],
        ),
    )
    if not got["phrase"]:
        raise RuntimeError("phrase query found no matches at scale")
    phase(
        "proximity_serve",
        lambda: got.__setitem__(
            "prox",
            [
                tuple(r)
                for r in idx.proximity_search("part", "filter", slop=3, k=10).collect()
            ],
        ),
    )
    phase(
        "suggest_live",
        lambda: got.__setitem__(
            "sugg", [tuple(r) for r in idx.suggest("s", k=10).collect()]
        ),
    )
    dict_path = os.path.join(tdir, "dict")
    phase(
        "materialize_dictionary",
        lambda: got.__setitem__("dict_v", idx.materialize_dictionary(dict_path)),
    )

    def frozen_suggest() -> None:
        from _big_data_analytics_and_visualization_tracking_student_progress__spark.operators.textindex import (  # noqa: E501
            suggest_terms,
        )

        got["sugg_frozen"] = [
            tuple(r) for r in suggest_terms(spark, dict_path, "s", k=10).collect()
        ]

    phase("suggest_from_frozen_dict", frozen_suggest)
    if got["sugg_frozen"] != got["sugg"]:
        raise RuntimeError("frozen dictionary disagrees with live suggest")

    def _fmt_rss(s: dict[str, float]) -> str:
        return (
            f"python {s['python_mb']:.0f} MB + "
            f"JVM tree {s['jvm_tree_mb']:.0f} MB"
        )

    lines = [
        f"## {FACTOR}x managed text index",
        "",
        f"{n_docs:,} documents ({FACTOR}x sf replica), 64 term buckets, "
        "append batch = 100 docs / 3 distinct terms; "
        "`tools/scale_managed_text.py`, local[32]:",
        "",
    ]
    for label, secs in timings.items():
        lines.append(f"- {label}: {secs} s ({_fmt_rss(rss[label])})")
    ratio = timings["append_100_docs_v2"] / max(timings["bulk_build_v1"], 1e-9)
    lines += [
        "",
        f"The 100-doc append cost {ratio:.1%} of the bulk build and "
        f"rewrote {len(moved)}/64 bucket fragments (manifest-asserted; "
        "all others inherited by reference) — ingest cost tracks the "
        "batch's term vocabulary, not the corpus.  Erasure is a "
        f"deletion-vector commit ({timings['dv_erase_top3']} s, no "
        "posting rewrite): the erased docs vanish from the ranking "
        "immediately (asserted) while BM25 corpus stats stay "
        "pre-delete until the merge (Lucene), and the PRE-erasure "
        "ranking stays one `version=` away "
        f"({timings['bm25_time_travel_pre_erasure']} s).  `compact` "
        "materializes the vectors and re-exactifies stats in one "
        f"OPTIMIZE ({timings['compact_merge']} s — same order as the "
        "build, the Lucene merge), after which serve cost returns to "
        f"baseline ({timings['bm25_after_compact']} s vs "
        f"{timings['bm25_serve']} s).  Positional serves ride the same "
        f"bucket-pruned snapshot reads (phrase {timings['phrase_serve']} "
        f"s, proximity {timings['proximity_serve']} s — the postings "
        "carry Lucene position lists from round 14).  The snapshot-"
        f"consistent suggester costs {timings['suggest_live']} s as a "
        "live prefix-df aggregate (a term-hash bucket can never prune "
        "a prefix), which `materialize_dictionary` "
        f"({timings['materialize_dictionary']} s, one postings "
        "aggregate + first-char-partitioned write, derivation version "
        "recorded) amortizes to an O(one partition) frozen lookup "
        f"({timings['suggest_from_frozen_dict']} s, result equality "
        "asserted) — the documented rebuild cadence for high-QPS "
        "prefix serving.",
        "",
    ]
    with open(os.path.join(ROOT, "SCALE.md"), "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
