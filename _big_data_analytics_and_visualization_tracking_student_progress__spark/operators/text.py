"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All native Spark SQL expressions (no Python in the hot path) — each is a
narrow map-side projection that composes with any downstream
filter/groupBy, and each has an exact SQL mirror for oracle checking.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword-overlap
# heuristic.  Deliberately small and hardcoded: the operator's value is
# the *shape* (vectorized overlap scoring + argmax) — swap in real lists
# per deployment.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "zu"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "pour", "que"],
}


def ws_tokens(text: Column) -> Column:
    """Whitespace tokenization (lowercased)."""
    return F.split(F.lower(text), r"\s+")


def ws_token_count(text: Column) -> Column:
    return F.size(ws_tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish sub-word proxy: alpha runs, digit runs, and individual
    punctuation each count as one token — the standard cheap estimator
    for LLM token budgeting."""
    return F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))


def stopword_overlap(text: Column, words: list[str]) -> Column:
    """# distinct tokens ∈ stopword set."""
    toks = F.array_distinct(ws_tokens(text))
    return F.size(
        F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))
    )


def lang_id(text: Column) -> Column:
    """Argmax of stopword-overlap across STOPWORDS; 'unk' when no
    language scores > 0.  Ties break by language-code sort order
    (deterministic)."""
    scores = [(lang, stopword_overlap(text, ws)) for lang, ws in sorted(STOPWORDS.items())]
    best = F.greatest(*[s for _, s in scores]) if len(scores) > 1 else scores[0][1]
    expr = F.lit("unk")
    # reverse order so earlier languages win ties
    for lang, score in reversed(scores):
        expr = F.when((score == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality score: length, punctuation balance,
    stopword presence, alpha ratio — the usual cheap pre-filters before
    expensive model scoring."""
    n_chars = F.length(text)
    len_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    n_alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(F.lit(0.0))
    n_tokens = ws_token_count(text)
    sw = stopword_overlap(text, STOPWORDS["en"])
    sw_score = F.least(sw / F.lit(5.0), F.lit(1.0))
    avg_word_len = F.when(n_tokens > 0, n_chars / n_tokens).otherwise(F.lit(0.0))
    word_len_score = F.when(
        (avg_word_len >= 3.0) & (avg_word_len <= 10.0), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    return (
        len_score * 0.25 + alpha_ratio * 0.25 + sw_score * 0.25 + word_len_score * 0.25
    )


def doc_fingerprint(text: Column) -> Column:
    """Order-insensitive content fingerprint: md5 over the sorted distinct
    token set — robust to token reordering, the cheap canonical-content
    key used for clustering-level dedup."""
    return F.md5(
        F.concat_ws(" ", F.array_sort(F.array_distinct(ws_tokens(text))))
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprint (rolling k-gram hashes + sliding-window minima —
# the MOSS algorithm).  Guarantees: any shared substring of length
# >= w+k-1 between two documents produces at least one shared
# fingerprint, so plagiarism/near-copy detection reduces to a join on
# fingerprint values.  All native expressions: the char-gram hash array
# is materialized once per row, window minima are slices over it (the
# lambda touches only the bound array ref — no re-tokenization).
# ---------------------------------------------------------------------------
def gram_hashes(text: Column, k: int) -> Column:
    n = F.length(text) - (k - 1)
    grams = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.md5(F.substring(text, i, k)),
    )
    return F.when(n >= 1, grams).otherwise(
        F.array().cast("array<string>")
    )


def winnow_min_set(hashes: Column, w: int) -> Column:
    """Sorted distinct sliding-window minima (md5 hex ordering is plain
    lexicographic in every engine).  Fewer than w grams ⇒ one window."""
    m = F.size(hashes) - (w - 1)
    wins = F.transform(
        F.sequence(F.lit(1), m),
        lambda j: F.array_min(F.slice(hashes, j, w)),
    )
    picked = (
        F.when(m >= 1, wins)
        .when(F.size(hashes) > 0, F.array(F.array_min(hashes)))
        .otherwise(F.array().cast("array<string>"))
    )
    return F.array_sort(F.array_distinct(picked))


# ---------------------------------------------------------------------------
# PII-style scrubbing: regex redaction of emails / long digit runs /
# @handles before training-data use.  Plain regexp_replace — JVM-side,
# vectorized; patterns kept to the regex subset with identical semantics
# in Java regex and RE2 (no backrefs/lookaround) so the DuckDB oracle
# runs the same expressions.
# ---------------------------------------------------------------------------
SCRUB_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"[0-9][0-9 ()\-]{6,}[0-9]", "<PHONE>"),
    (r"@[A-Za-z0-9_]{2,}", "<HANDLE>"),
]


def scrub_text(text: Column) -> Column:
    out = text
    for pat, repl in SCRUB_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def word_bigrams(toks: Column) -> Column:
    """Adjacent word pairs from a token array — native transform over a
    slice, no explode until the caller needs counts."""
    n = F.size(toks)
    return F.when(
        n >= 2,
        F.transform(
            F.slice(toks, 1, n - 1),
            lambda x, i: F.concat_ws(" ", x, F.element_at(toks, i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_stats(df, id_col: str, text_col: str):
    """Gopher-style repetition quality signals per document:
    distinct-token fraction (unique/total words, map-side only) and
    top-bigram fraction (occurrences of the most frequent word pair /
    all pairs).  Highly repetitive machine-generated text scores low on
    the first and high on the second.

    The bigram mode needs a (doc, bigram) hash aggregate — the shuffle
    carries bigram strings, but only one row per *distinct* pair per doc
    after the map-side partial, which is what makes this viable at
    corpus scale."""
    base = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), ws_tokens(F.col(text_col)).alias("__toks")
    )
    per_doc = base.select(
        F.col(id_col),
        F.size("__toks").alias("n_tokens"),
        (
            F.size(F.array_distinct("__toks")).cast("double")
            / F.size("__toks")
        ).alias("distinct_token_frac"),
    )
    bi = base.select(
        F.col(id_col), F.explode(word_bigrams(F.col("__toks"))).alias("bg")
    )
    top = (
        bi.groupBy(id_col, "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg((F.max("c").cast("double") / F.sum("c")).alias("top_bigram_frac"))
    )
    return per_doc.join(top, id_col, "left").select(
        F.col(id_col),
        "n_tokens",
        "distinct_token_frac",
        F.coalesce(F.col("top_bigram_frac"), F.lit(0.0)).alias("top_bigram_frac"),
    )


def text_search(
    df,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
):
    """Tokenized full-text `match` (the analyzed-search analog of the
    reference's Elasticsearch `match` query, app.py:62-64): a document
    matches when it contains ANY analyzed query term; ranking is
    (distinct terms matched, total term occurrences) — the coordination
    + term-frequency core of practical relevance scoring, minus IDF.

    Map-side only per document (tokenize + two array intersections), then
    TakeOrdered for the top-k — no shuffle of text, no inverted index
    needed for a one-shot scan.  At 100 TB the same expressions compute
    an ingest-time (term → doc) posting table instead; this operator is
    the query-side semantics either way."""
    qt = F.array(*[F.lit(t) for t in query_terms])
    toks = ws_tokens(F.col(text_col))
    n_terms = F.size(F.array_intersect(F.array_distinct(toks), qt))
    tf = F.size(F.filter(toks, lambda t: F.array_contains(qt, t)))
    scored = df.select(
        F.col(id_col),
        n_terms.alias("n_terms_matched"),
        tf.alias("total_tf"),
    ).filter(F.col("n_terms_matched") > 0)
    return scored.orderBy(
        F.col("n_terms_matched").desc(),
        F.col("total_tf").desc(),
        F.col(id_col),
    ).limit(k)
