"""Corpus-level text statistics: term frequencies, TF-IDF, vocabulary,
and train/test contamination detection.

These are the aggregate cousins of operators/text.py's per-document
scores — the shapes every training-data pipeline runs before a tokenizer
or mixture decision.  All JVM-side (explode + hash aggregates); shuffles
carry (term, id) pairs or shingle hashes, never document payloads.

Determinism: the TF-IDF variant uses the *rational* inverse document
frequency N/df instead of log((N+1)/(df+1)) — products and quotients of
exact small integers are bit-identical on every IEEE engine, whereas
`ln` may differ in the last ulp between libm implementations, which a
hash-comparing oracle would flag.  Ranking (the actual use of the
score) is unaffected: x ↦ log is monotone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import portable_hash64, tokens, word_shingles


def doc_term_freqs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term, tf): one explode + one hash aggregate."""
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
        .filter(F.col("term") != "")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def doc_freqs(term_freqs: DataFrame, id_col: str) -> DataFrame:
    """(term, df): how many documents contain each term."""
    return term_freqs.groupBy("term").agg(
        F.count_distinct(F.col(id_col)).alias("df")
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Top-k most characteristic terms per document by tf·(N/df),
    ties broken lexicographically.  Two shuffles: (id, term) for TF and
    term for the DF join — the DF side is a vocabulary-sized aggregate,
    dwarfed by the corpus, so AQE broadcast-converts the join."""
    n_docs = df.filter(F.col(text_col).isNotNull()).count()
    tf = doc_term_freqs(df, id_col, text_col)
    dfreq = doc_freqs(tf, id_col)
    scored = tf.join(dfreq, "term").withColumn(
        "score",
        F.col("tf").cast("double") * F.lit(float(n_docs)) / F.col("df"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "score", "rank")
    )


def top_terms(df: DataFrame, text_col: str, k: int = 100) -> DataFrame:
    """Global vocabulary head: top-k terms by corpus frequency (ties
    lexicographic).  Partial aggregation makes the shuffle carry one row
    per distinct term per partition — at 100 TB the vocabulary, not the
    corpus, sizes the exchange."""
    counts = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.explode(tokens(F.col(text_col))).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        counts.orderBy(F.col("n").desc(), F.col("term").asc())
        .limit(k)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("n").desc(), F.col("term").asc())
            ),
        )
    )


def cross_split_contamination(
    df: DataFrame,
    id_col: str,
    text_col: str,
    split_col: str,
    train_split: str = "train",
    test_split: str = "test",
    shingle_k: int = 3,
) -> DataFrame:
    """Test documents sharing ≥1 word k-shingle with ANY train document
    — the benchmark-contamination scan run before an eval set is trusted.

    Returns (id, n_shared) for contaminated test docs.  Both sides
    explode to (shingle_hash, id) and meet in one shuffle on the 8-byte
    hash — shingle *strings* never shuffle (at 100 TB the exchange is
    keyed on fixed-width longs).  The hash is `portable_hash64`, so the
    DuckDB oracle joins on bit-identical keys; the train side is
    pre-deduplicated so the join's build input is the distinct shingle
    universe, not the corpus.

    Complement of `dedup.ngram_decontaminate`, which flags the
    opposite direction (training docs overlapping a small benchmark
    set) with the opposite scale posture (the benchmark n-gram set
    broadcasts, so the corpus-sized side never shuffles)."""
    sh = F.explode(
        F.transform(
            word_shingles(F.col(text_col), shingle_k),
            lambda s: portable_hash64(s),
        )
    ).alias("sh")
    train = (
        df.filter((F.col(split_col) == train_split) & F.col(text_col).isNotNull())
        .select(sh)
        .distinct()
    )
    test = df.filter(
        (F.col(split_col) == test_split) & F.col(text_col).isNotNull()
    ).select(F.col(id_col), sh)
    return (
        test.join(train, "sh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def pack_by_token_budget(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    part_col: str,
) -> DataFrame:
    """Concat-then-chunk context packing (the GPT-pretraining layout):
    stream documents in `id_col` order within each `part_col` partition,
    lay them end to end, and assign each doc the pack its first token
    lands in (`pack_seq` = start_offset div budget).

    One shuffle on `part_col`; the running sum streams inside the sorted
    partition.  Exact long arithmetic end to end — `div` integer
    division, never double `/` — so pack ids are engine-portable at any
    corpus size."""
    w = Window.partitionBy(part_col).orderBy(id_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum_before = F.coalesce(
        F.sum(F.col(token_col).cast("long")).over(w), F.lit(0).cast("long")
    )
    return df.withColumn("offset_tokens", cum_before).withColumn(
        "pack_seq", F.expr(f"offset_tokens div {int(budget)}")
    )


def pack_manifest(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    part_col: str,
) -> DataFrame:
    """The pack MANIFEST downstream consumers actually read: one row
    per (partition, pack) with the boundary doc ids — which documents
    to concatenate, in what id range, and how many tokens land in the
    pack.  `pack_by_token_budget` assigns docs to packs; this rolls the
    assignment up to (begin_doc_id, end_doc_id, n_docs, sum_tokens).

    Same single `part_col` shuffle as the assignment (the groupBy keys
    are a superset of the window partition key, so AQE reuses the
    exchange); exact long arithmetic throughout."""
    packed = pack_by_token_budget(df, id_col, token_col, budget, part_col)
    return packed.groupBy(part_col, "pack_seq").agg(
        F.min(id_col).alias("begin_doc_id"),
        F.max(id_col).alias("end_doc_id"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col(token_col).cast("long")).alias("sum_tokens"),
    )
