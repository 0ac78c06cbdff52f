"""Inverted text index — the build-once / query-many scale path for
full-text search (the ingest-time posting table that
`text.text_search`'s docstring promises at 100 TB).

Build: one tokenize + (term, doc) aggregate over the corpus, laid out
hive-partitioned by a portable hash bucket of the term.  Query: the
search terms' buckets are computed DRIVER-SIDE with the pure-Python
twin of the same hash, so the scan lists only |distinct term buckets|
directories (partition pruning) instead of touching the corpus — per
query cost is O(matching postings), independent of corpus size.

The bucket hash is `portable_hash64` (md5-prefix), not xxhash64, so
the driver / any engine can compute the same bucket without a Spark
round trip; `indexed_text_search` is DuckDB-oracle-checked against the
brute-force scan semantics (identical ranking and tie-breaks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import portable_hash64
from .similarity import _portable_hash_py
from .text import ws_tokens

N_BUCKETS = 64


def build_inverted_index(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
) -> None:
    """(term, doc_id, tf) postings, partitioned by term-hash bucket.
    One tokenize pass + one (term, doc) aggregate; `repartition` on the
    bucket gives one writer task per directory (no small-file spray).
    Incremental maintenance appends new docs' postings to the same
    bucket dirs."""
    postings = (
        df.select(F.col(id_col), F.explode(ws_tokens(F.col(text_col))).alias("term"))
        .groupBy("term", id_col)
        .agg(F.count(F.lit(1)).cast("int").alias("tf"))
        .withColumn("__b", F.pmod(portable_hash64(F.col("term")), F.lit(n_buckets)))
    )
    (
        postings.repartition(F.col("__b"))
        .write.mode("overwrite")
        .partitionBy("__b")
        .parquet(path)
    )


def search_inverted_index(
    spark: SparkSession,
    path: str,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Index-backed `match`: read only the query terms' bucket
    directories, filter to the terms, aggregate per doc — identical
    output contract to `text.text_search` ((distinct terms, total tf)
    ranking, same tie-breaks)."""
    buckets = sorted({_portable_hash_py(t) % n_buckets for t in query_terms})
    postings = (
        spark.read.parquet(path)
        .filter(F.col("__b").isin(buckets))
        .filter(F.col("term").isin(query_terms))
    )
    scored = postings.groupBy(id_col).agg(
        F.count_distinct(F.col("term")).cast("int").alias("n_terms_matched"),
        F.sum("tf").cast("int").alias("total_tf"),
    )
    return scored.orderBy(
        F.col("n_terms_matched").desc(),
        F.col("total_tf").desc(),
        F.col(id_col),
    ).limit(k)
