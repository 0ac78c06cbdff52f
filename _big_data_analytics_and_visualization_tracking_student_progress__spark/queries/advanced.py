"""Advanced analytics (round-4 additions) — every query fully
DuckDB-oracle-checked:

- iterative graph ranking (integer fixed-point PageRank)
- sequence analysis (Markov transitions, conversion latency, CUSUM
  change-point recurrence, behavioral bot scoring)
- LM corpus quality scoring (unigram + interpolated bigram, fixed-point
  folds), n-gram novelty, split-mixture KL drift
- product quantization (codes, ADC top-k, IVF-PQ composition)
- mergeable grid-histogram quantile sketch, exact-moment statistics
  (correlation matrix, closed-form OLS), A/B z-readout, RFM segments
- exact set-similarity joins (prefix-filter all-pairs, asymmetric
  containment), co-purchase top-k, skyline/Pareto front
- Z-order layout zone maps, delta-algebra incremental view maintenance,
  Efraimidis–Spirakis weighted sampling

Determinism patterns this registry standardizes on:
- integer/fixed-point arithmetic wherever a fold crosses rows (PageRank
  micro-units, 1e-4 LM quantization, CUSUM's shared IEEE sequence), so
  partition order can never move a result;
- exact DECIMAL moment sums for statistics;
- sample-trained quantizers via the shared `_lloyd` over the portable
  md5-hash-ordered sample, so Spark and the oracle embed bit-identical
  literal codebooks / centroids / ADC tables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..datasets import load_table
from ..functions.scalar import dround
from ..operators import similarity as S
from ..registry import register

# ---------------------------------------------------------------------------
# Iterative graph algorithm: PageRank over the customer↔supplier
# bipartite transaction graph (edge = customer bought from supplier,
# mirrored both ways).  3 damped iterations (d=0.85) in integer
# micro-units: contribution = rank div out_degree, new rank =
# 150000 + (85·Σcontrib) div 100 — all BIGINT ops, bit-identical on
# any engine and independent of partition/summation order.
#
# Scale posture: per iteration = one equi-join (edges ⋈ ranks on src,
# a stable key partitioning AQE reuses across iterations) + one
# groupBy(dst) with map-side partial sums; the rank/degree state is
# 2 longs per node.  Each iteration eagerly localCheckpoints the new
# rank table (2 longs/node, trivially materializable), so iteration
# i+1's plan starts from the checkpointed RDD instead of re-expanding
# the whole join lineage — the audited plan shows ~3 exchanges per
# iteration with reuse, not 9, which is the 100 TB form.
# ---------------------------------------------------------------------------
_PR_ITERS = 3


def _pagerank_iter_sql() -> str:
    steps = []
    prev = "r0"
    for i in range(1, _PR_ITERS + 1):
        steps.append(
            f"""
    c{i} AS (
        SELECT e.dst AS node, SUM({prev}.r // dg.d) AS s
        FROM edges e
        JOIN deg dg ON e.src = dg.src
        JOIN {prev} ON e.src = {prev}.node
        GROUP BY e.dst
    ),
    r{i} AS (SELECT node, 150000 + (85 * s) // 100 AS r FROM c{i})"""
        )
        prev = f"r{i}"
    return ",".join(steps)


def graph_edges_path(spark: SparkSession, sf_dir: str) -> str:
    """The symmetrized customer↔supplier transaction graph, materialized
    ONCE per fixture to parquet and shared by every graph query
    (graph_pagerank_topk, graph_bfs_layers) via the artifact cache: in
    production the edge list is a maintained table updated at ingest,
    not something each traversal re-derives from the fact tables.  A
    deterministic function of the fixture, so caching cannot change
    results; oracles keep deriving the identical edge set from
    lineitem⋈orders directly.

    The artifact carries each edge's source OUT-DEGREE ``d`` alongside
    the endpoints (degree is as static as the edge set — a maintained
    edge table updates both at ingest), and BOTH id encodings per
    endpoint: the display strings (src, dst) and packed LONG ids
    (sid, did; customer k → 2k, supplier k → 2k+1).  Traversals that
    shuffle/broadcast per iteration read only the long columns
    (parquet column pruning — integer keys hash, compare, and ship
    far cheaper than strings, the standard graph-engine layout);
    label reconstruction happens once at the top-k edge."""
    from .northstar import artifact

    def build() -> str:
        import tempfile

        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_suppkey"
        )
        o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
        e0 = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .select(
                (F.col("o_custkey").cast("long") * 2).alias("sid"),
                (F.col("l_suppkey").cast("long") * 2 + 1).alias("did"),
            )
            .distinct()
        )
        edges = e0.union(
            e0.select(F.col("did").alias("sid"), F.col("sid").alias("did"))
        )
        deg = edges.groupBy("sid").agg(F.count(F.lit(1)).alias("d"))
        ewd = edges.join(deg, "sid").select(
            "sid",
            "did",
            "d",
            _node_label(F.col("sid")).alias("src"),
            _node_label(F.col("did")).alias("dst"),
        )
        path = tempfile.mkdtemp(prefix="sparkgraft_graph_")
        ewd.write.mode("overwrite").parquet(path)
        return path

    return artifact("graph_edges", sf_dir, build)


def _node_label(col: Column) -> Column:
    """Packed long node id → display label ('c<k>' even, 's<k>' odd)."""
    return F.when(
        col % 2 == 0, F.concat(F.lit("c"), (col / 2).cast("long").cast("string"))
    ).otherwise(
        F.concat(F.lit("s"), ((col - 1) / 2).cast("long").cast("string"))
    )



@register(
    "graph_pagerank_topk",
    f"""
    WITH e0 AS (
        SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,
                        's' || CAST(l.l_suppkey AS VARCHAR) AS dst
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    edges AS (
        SELECT src, dst FROM e0
        UNION ALL
        SELECT dst AS src, src AS dst FROM e0
    ),
    deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
    r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg),
    {_pagerank_iter_sql()}
    SELECT node, CAST(r AS BIGINT) AS rank_micro
    FROM r{_PR_ITERS}
    ORDER BY rank_micro DESC, node
    LIMIT 100
    """,
    doc="PageRank (3 damped iterations, integer micro-unit fixed point) "
    "over the customer↔supplier transaction graph; top-100 hubs. "
    "Exact-integer arithmetic makes the iterative algorithm "
    "order-independent and fully oracle-checkable.",
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    # (sid, did, d) — long node ids and out-degree baked into the
    # maintained edge artifact; iterations never touch the string
    # labels (column pruning keeps them out of the scan entirely)
    ewd = (
        spark.read.parquet(graph_edges_path(spark, sf_dir))
        .select("sid", "did", "d")
        .persist()
    )
    ranks = (
        ewd.select(F.col("sid").alias("node"))
        .distinct()
        .select("node", F.lit(1000000).cast("long").alias("r"))
        .localCheckpoint(eager=True)  # materialize r0 once, like r1..rN
    )
    # Rank state is 2 longs per node.  When the node set fits a
    # broadcast (≤ ~5M nodes ≈ 80 MB), ship it to the edge partitions:
    # each iteration is then map-side join + partial agg + ONE shuffle
    # of ~|nodes| combined contributions — edges never move.  Above
    # that, fall back to the shuffle join (stable sid partitioning AQE
    # reuses across iterations) — the 1000×-node form.
    n_nodes = ranks.count()
    bcast = n_nodes <= 5_000_000
    for i in range(_PR_ITERS):
        r = F.broadcast(ranks) if bcast else ranks
        contrib = ewd.join(r, ewd.sid == r.node).select(
            F.col("did").alias("node"), F.expr("r div d").alias("c")
        )
        ranks = (
            contrib.groupBy("node")
            .agg(F.sum("c").alias("s"))
            .select(
                "node",
                (F.lit(150000) + F.expr("(85 * s) div 100"))
                .cast("long")
                .alias("r"),
            )
        )
        # Lineage bound, two regimes (r15): on the SHUFFLE path the
        # classic per-iteration eager checkpoint stands — without it
        # the join tree re-expands and re-executes each round.  On the
        # BROADCAST path nesting is already execution-safe: each
        # iteration's ranks live inside a BroadcastExchange that is
        # built exactly once per action, so per-iteration checkpoints
        # only added a materialization job + a Python round trip per
        # round; ONE eager checkpoint after the last iteration
        # materializes the whole 3-deep nest in a single action and
        # still lets the edge cache release before returning.  Depth
        # is bounded by _PR_ITERS, so plan size stays fixed.
        # Exact-integer ranks: checkpoint placement cannot change any
        # value.
        if not bcast or i == _PR_ITERS - 1:
            ranks = ranks.localCheckpoint(eager=True)
    # the eager checkpoints materialized every dependent plan, so the
    # persisted edge+degree table can be released before returning —
    # long bench/serving sessions otherwise accumulate its blocks
    ewd.unpersist()
    return (
        ranks.select(_node_label(F.col("node")).alias("node"), "r")
        .orderBy(F.col("r").desc(), "node")
        .limit(100)
        .select("node", F.col("r").alias("rank_micro"))
    )


# ---------------------------------------------------------------------------
# Markov transition matrix over per-user event sequences: P(next=dst |
# cur=src) from lead() pairs ordered by (event time, event_id).  The
# training-sequence statistic behind next-action models and funnel
# anomaly detection.  One window shuffle on user_id + one (src,dst)
# aggregate; probabilities are exact int/int divisions quantized at the
# edge.
# ---------------------------------------------------------------------------
@register(
    "event_transition_probs",
    """
    WITH seq AS (
        SELECT event_type AS src,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
               ) AS dst
        FROM events
    ),
    pairs AS (
        SELECT src, dst, COUNT(*) AS n FROM seq
        WHERE dst IS NOT NULL GROUP BY src, dst
    )
    SELECT src, dst, CAST(n AS BIGINT) AS n,
           FLOOR(n * 1000000.0 / SUM(n) OVER (PARTITION BY src) + 0.5)
               / 1000000.0 AS p
    FROM pairs
    """,
    doc="Markov next-event transition matrix (counts + row-normalized "
    "probabilities) over (ts, event_id)-ordered per-user sequences",
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts_nanos", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts_nanos", "event_id")
    seq = e.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    pairs = seq.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    tot = Window.partitionBy("src")
    return pairs.select(
        "src",
        "dst",
        F.col("n").cast("bigint").alias("n"),
        (
            F.floor(F.col("n") * F.lit(1000000.0) / F.sum("n").over(tot) + F.lit(0.5))
            / F.lit(1000000.0)
        ).alias("p"),
    )


# ---------------------------------------------------------------------------
# Unigram-LM log-probability scoring — the CCNet/KenLM-style corpus
# quality filter: score every document by the mean log-probability of
# its tokens under the corpus's own unigram distribution (low = rare
# junk tokens, the filtered tail in LLM data curation).
#
# Determinism: per-token lp = floor((ln n_t − ln N)·1e4 + 0.5) as
# BIGINT (ln evaluated at integer counts only), summed exactly; the
# division by token count happens once at the edge.  Scale posture:
# token→count join keys on the token string (hash-partitionable;
# ride-as-hash optional), corpus total is one broadcast scalar — the
# whole query is two aggregates and one equi-join, no driver loops.
# ---------------------------------------------------------------------------
@register(
    "doc_lm_logprob",
    """
    WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(string_split(lower(text), ' '),
                                  t -> t <> '')) AS tok
        FROM documents
    ),
    counts AS (SELECT tok, COUNT(*) AS n_t FROM toks GROUP BY tok),
    tot AS (SELECT SUM(n_t) AS n FROM counts),
    per AS (
        SELECT t.doc_id,
               CAST(FLOOR((ln(c.n_t) - ln(tot.n)) * 10000.0 + 0.5)
                    AS BIGINT) AS lp
        FROM toks t JOIN counts c USING (tok) CROSS JOIN tot
    ),
    agg AS (
        SELECT doc_id, COUNT(*) AS n_tok, SUM(lp) AS slp
        FROM per GROUP BY doc_id
    )
    SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
           FLOOR(slp / (n_tok * 10000.0) * 1000000.0 + 0.5) / 1000000.0
               AS avg_logprob
    FROM agg
    """,
    doc="unigram-LM mean token log-probability per document (CCNet-style "
    "perplexity quality filter) — fixed-point per-token quantization "
    "makes the float fold exact and order-free",
)
def q_doc_lm_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), " "), lambda t: t != F.lit("")
            )
        ).alias("tok"),
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n_t"))
    total = counts.agg(F.sum("n_t").alias("n"))
    per = (
        toks.join(counts, "tok")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.floor(
                (F.log(F.col("n_t")) - F.log(F.col("n"))) * F.lit(10000.0)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("lp"),
        )
    )
    agg = per.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tok"), F.sum("lp").alias("slp")
    )
    return agg.select(
        "doc_id",
        F.col("n_tok").cast("bigint").alias("n_tok"),
        dround(F.col("slp") / (F.col("n_tok") * F.lit(10000.0)), 6).alias(
            "avg_logprob"
        ),
    )


# ---------------------------------------------------------------------------
# Product quantization — codes + ADC top-k (see operators/similarity.py
# PQ section).  Both queries train the m per-subspace codebooks on the
# portable bounded sample; the lazy oracles retrain bit-identical
# codebooks from a DuckDB read of the same parquet and embed them (and
# the ADC tables) as literals, the ann_ivf_topk pattern.
# ---------------------------------------------------------------------------
# m=8 subspaces × k=64 codes: 256 B float32 → 8 B codes (32×), ~7/10
# exact-top-10 recall on the fixture embeddings (vs 2/10 at m=4,k=16 —
# near-uniform vectors are the PQ worst case, so the codebook is sized
# up; real embedding manifolds quantize far better at equal budget).
_PQ_M, _PQ_K, _PQ_ITERS, _PQ_SAMPLE = 8, 64, 8, 256


def _pq_books_cached(spark: SparkSession, sf_dir: str) -> list[list[list[float]]]:
    """PQ codebooks for this fixture — trained once per (sf_dir) via the
    shared artifact cache and reused by every PQ-family query
    (embedding_pq_codes, ann_pq_adc_topk, ann_ivfpq_topk): codebook
    training is an offline job, not a per-query cost."""
    from .northstar import artifact

    return artifact(
        "pq_codebooks",
        sf_dir,
        lambda: S.train_pq_codebooks_portable(
            load_table(spark, sf_dir, "embeddings"), "embedding", "vec_id",
            m=_PQ_M, k=_PQ_K, iters=_PQ_ITERS, sample_size=_PQ_SAMPLE,
        ),
    )


def _pq_codebooks_oracle(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        "SELECT vec_id, CAST(embedding AS DOUBLE[]) FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchall()
    con.close()
    books = S.train_pq_codebooks_rows(
        rows, m=_PQ_M, k=_PQ_K, iters=_PQ_ITERS, sample_size=_PQ_SAMPLE
    )
    qv = [float(x) for x in next(v for i, v in rows if i == 0)]
    return books, qv


def _pq_common_sql(books, src: str = "e", extra_cte: str = "") -> str:
    """Shared CTE block: literal codebooks, per-subspace slices, best
    (code, residual-sqdist) per (vec, subspace) — mirrors `pq_encode`
    (same sequential sqdist fold, same d-then-code tie-break).  `src`
    names the (vec_id, v) CTE to encode (`e` = full corpus; pass a
    restricted CTE, appended via `extra_cte`, for IVF-PQ)."""
    offs = S.pq_subspace_offsets(books)
    cb_values = ", ".join(
        f"({j}, {c}, {off}, {len(cb[0])}, {cv!r}::DOUBLE[])"
        for j, (cb, off) in enumerate(zip(books, offs))
        for c, cv in enumerate(cb)
    )
    sqd = (
        "list_dot_product("
        "[sv[i] - cb.cv[i] FOR i IN generate_series(1, len(sv))], "
        "[sv[i] - cb.cv[i] FOR i IN generate_series(1, len(sv))])"
    )
    return f"""
    cb(j, c, off, ds, cv) AS (VALUES {cb_values}),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),{extra_cte}
    scored AS (
        SELECT s.vec_id, cb.j, cb.c,
               {sqd.replace('sv', 's.v[cb.off : cb.off + cb.ds - 1]')} AS d
        FROM {src} s CROSS JOIN cb
    ),
    best AS (
        SELECT vec_id, j, c, d,
               ROW_NUMBER() OVER (
                   PARTITION BY vec_id, j ORDER BY d ASC, c ASC
               ) AS rn
        FROM scored
    )"""


def _pq_codes_oracle_sql(sf_dir: str) -> str:
    books, _ = _pq_codebooks_oracle(sf_dir)
    return f"""
    WITH {_pq_common_sql(books)}
    SELECT vec_id,
           array_to_string(list(c ORDER BY j), '|') AS codes,
           FLOOR(list_reduce(list(d ORDER BY j), (a, x) -> a + x)
                 * 1000000.0 + 0.5) / 1000000.0 AS recon_err
    FROM best WHERE rn = 1 GROUP BY vec_id
    """


@register(
    "embedding_pq_codes",
    _pq_codes_oracle_sql,
    doc="product-quantization encoding of every embedding (m=8 "
    "subspaces × k=64 codes: 256 B float32 → 8 B) + total residual "
    "squared error — map-side-only native expressions, sample-trained "
    "codebooks, fully oracle-checked via literal-codebook retraining",
)
def q_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    books = _pq_books_cached(spark, sf_dir)
    enc = S.pq_encode(emb, "embedding", books)
    code_cols = [F.col(f"__pq{j}")["i"] for j in range(len(books))]
    err = F.col("__pq0")["d"]
    for j in range(1, len(books)):
        err = err + F.col(f"__pq{j}")["d"]  # fixed left-to-right fold
    return enc.select(
        "vec_id",
        F.concat_ws("|", *[c.cast("string") for c in code_cols]).alias("codes"),
        dround(err, 6).alias("recon_err"),
    )


def _pq_adc_oracle_sql(sf_dir: str) -> str:
    books, qv = _pq_codebooks_oracle(sf_dir)
    tabs = S.pq_adc_tables(books, qv)
    tab_values = ", ".join(
        f"({j}, {c}, {t!r})"
        for j, tab in enumerate(tabs)
        for c, t in enumerate(tab)
    )
    return f"""
    WITH {_pq_common_sql(books)},
    tab(j, c, t) AS (VALUES {tab_values}),
    adc AS (
        SELECT b.vec_id,
               list_reduce(list(tab.t ORDER BY b.j), (a, x) -> a + x) AS d2
        FROM best b JOIN tab ON tab.j = b.j AND tab.c = b.c
        WHERE b.rn = 1
        GROUP BY b.vec_id
    )
    SELECT vec_id, FLOOR(d2 * 1000000.0 + 0.5) / 1000000.0 AS approx_d2
    FROM adc
    ORDER BY d2 ASC, vec_id ASC
    LIMIT 10
    """


@register(
    "ann_pq_adc_topk",
    _pq_adc_oracle_sql,
    doc="PQ asymmetric-distance (ADC) top-k: per-row distance to the "
    "query is m literal-table lookups + sequential adds over the codes "
    "— no vector math against the corpus at query time; the 100 TB "
    "memory-bound ANN leg completing the IVF / int8 / PQ trio",
)
def q_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..queries.northstar import _query_vec

    emb = load_table(spark, sf_dir, "embeddings")
    books = _pq_books_cached(spark, sf_dir)
    qv = _query_vec(spark, sf_dir, 0)
    tabs = S.pq_adc_tables(books, qv)
    enc = S.pq_encode(emb, "embedding", books)
    d2 = None
    for j, tab in enumerate(tabs):
        term = F.element_at(
            F.expr(S.double_array_sql(tab)),  # one parsed literal, not k py4j lits
            F.col(f"__pq{j}")["i"] + F.lit(1),
        )
        d2 = term if d2 is None else d2 + term  # fixed left-to-right fold
    scored = enc.select("vec_id", d2.alias("__d2"))
    return (
        scored.orderBy(F.col("__d2").asc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id", dround(F.col("__d2"), 6).alias("approx_d2"))
    )


# ---------------------------------------------------------------------------
# Mergeable grid-histogram quantile sketch — the deterministic sibling
# of approx_percentile: one (min,max,count) pass fixes a 1024-bin grid,
# a second pass bins every value (map-side partial counts — the
# "sketch" is 1024 mergeable integers per group, SUM-combinable across
# partitions/days exactly like the HLL/CMS registers), and quantile
# estimates walk the cumulative histogram.  Error is bounded by one bin
# width; every step is integer or IEEE-pure double math, so unlike
# t-digest/KLL the sketch is bit-reproducible and fully oracle-checked.
# ---------------------------------------------------------------------------
_HQ_BINS = 1024


@register(
    "histogram_quantile_sketch",
    f"""
    WITH v AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
    bounds AS (
        SELECT event_type, MIN(value) AS lo, MAX(value) AS hi,
               COUNT(*) AS n
        FROM v GROUP BY event_type
    ),
    binned AS (
        SELECT v.event_type,
               CASE WHEN b.hi = b.lo THEN 0
                    ELSE CAST(LEAST({_HQ_BINS - 1},
                         FLOOR((v.value - b.lo) /
                               ((b.hi - b.lo) / {float(_HQ_BINS)})))
                         AS INT) END AS bin
        FROM v JOIN bounds b USING (event_type)
    ),
    hist AS (
        SELECT event_type, bin, COUNT(*) AS c
        FROM binned GROUP BY event_type, bin
    ),
    cum AS (
        SELECT event_type, bin, c,
               SUM(c) OVER (PARTITION BY event_type ORDER BY bin
                            ROWS UNBOUNDED PRECEDING) AS cm
        FROM hist
    ),
    picked AS (
        SELECT event_type,
               MIN(CASE WHEN cm >= 0.5 * n THEN bin END) AS b50,
               MIN(CASE WHEN cm >= 0.9 * n THEN bin END) AS b90,
               MIN(CASE WHEN cm >= 0.99 * n THEN bin END) AS b99
        FROM cum JOIN bounds USING (event_type)
        GROUP BY event_type
    )
    SELECT p.event_type,
           FLOOR((b.lo + p.b50 * ((b.hi - b.lo) / {float(_HQ_BINS)}))
                 * 1e6 + 0.5) / 1e6 AS p50_est,
           FLOOR((b.lo + p.b90 * ((b.hi - b.lo) / {float(_HQ_BINS)}))
                 * 1e6 + 0.5) / 1e6 AS p90_est,
           FLOOR((b.lo + p.b99 * ((b.hi - b.lo) / {float(_HQ_BINS)}))
                 * 1e6 + 0.5) / 1e6 AS p99_est
    FROM picked p JOIN bounds b USING (event_type)
    """,
    doc="deterministic mergeable 1024-bin histogram quantile sketch per "
    "event type (p50/p90/p99 left-edge estimates, error ≤ one bin "
    "width) — the bit-reproducible, SUM-mergeable alternative to "
    "t-digest/approx_percentile, fully oracle-checked",
)
def q_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    nb = float(_HQ_BINS)
    v = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "value")
        .filter(F.col("value").isNotNull())
    )
    bounds = v.groupBy("event_type").agg(
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    width = (F.col("hi") - F.col("lo")) / F.lit(nb)
    binned = v.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        F.when(F.col("hi") == F.col("lo"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(_HQ_BINS - 1),
                F.floor((F.col("value") - F.col("lo")) / width),
            )
        )
        .cast("int")
        .alias("bin"),
    )
    hist = binned.groupBy("event_type", "bin").agg(F.count(F.lit(1)).alias("c"))
    wc = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cm", F.sum("c").over(wc)).join(
        F.broadcast(bounds.select("event_type", "n")), "event_type"
    )
    picked = cum.groupBy("event_type").agg(
        *[
            F.min(
                F.when(F.col("cm") >= F.lit(q) * F.col("n"), F.col("bin"))
            ).alias(f"b{tag}")
            for q, tag in [(0.5, "50"), (0.9, "90"), (0.99, "99")]
        ]
    )
    out = picked.join(F.broadcast(bounds), "event_type")
    est = lambda b: dround(F.col("lo") + F.col(b) * width, 6)  # noqa: E731
    return out.select(
        "event_type",
        est("b50").alias("p50_est"),
        est("b90").alias("p90_est"),
        est("b99").alias("p99_est"),
    )


# ---------------------------------------------------------------------------
# Z-order (Morton) layout statistics — the OPTIMIZE ZORDER BY decision
# computed as a query (see operators/layout.py for the writer +
# prefix-pruned reader).  Orders are bucketized on (o_custkey,
# order-day) with exact-integer grids, bit-interleaved to a 16-bit
# Morton code, and grouped by the top-8-bit "file"; the per-file
# min/max of BOTH dimensions is the zone-map a scan planner prunes
# with.  Narrow ranges on both axes == data skipping works for
# predicates on either column — the locality property is pinned in
# tests, the arithmetic is oracle-checked here.
# ---------------------------------------------------------------------------
def _zorder_stats_sql() -> str:
    from ..operators.layout import morton_sql

    return f"""
    WITH o AS (
        SELECT o_custkey,
               CAST(date_diff('day', DATE '1970-01-01',
                              CAST(o_orderdate AS DATE)) AS BIGINT) AS day
        FROM orders
    ),
    b AS (
        SELECT MIN(o_custkey) AS xlo, MAX(o_custkey) AS xhi,
               MIN(day) AS ylo, MAX(day) AS yhi
        FROM o
    ),
    bk AS (
        SELECT o.o_custkey, o.day,
               (o.o_custkey - b.xlo) // ((b.xhi - b.xlo) // 256 + 1) AS xb,
               (o.day - b.ylo) // ((b.yhi - b.ylo) // 256 + 1) AS yb
        FROM o CROSS JOIN b
    ),
    z AS (
        SELECT o_custkey, day, {morton_sql('xb', 'yb', 8)} AS zv FROM bk
    )
    SELECT zv // 256 AS zfile, CAST(COUNT(*) AS BIGINT) AS n,
           MIN(o_custkey) AS min_cust, MAX(o_custkey) AS max_cust,
           MIN(day) AS min_day, MAX(day) AS max_day
    FROM z GROUP BY zv // 256
    """


@register(
    "zorder_layout_stats",
    _zorder_stats_sql(),
    doc="Morton/z-order layout zone map: orders bucketized on "
    "(o_custkey, order-day) 8 bits each, interleaved, grouped by "
    "top-8-bit file cell with per-file min/max of BOTH dimensions — "
    "exact-integer bucketing + bit interleave, fully oracle-checked; "
    "locality (both ranges narrow ⇒ 2-D data skipping) pinned in tests",
)
def q_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.layout import morton

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01"))
        .cast("long")
        .alias("day"),
    )
    b = o.agg(
        F.min("o_custkey").alias("xlo"),
        F.max("o_custkey").alias("xhi"),
        F.min("day").alias("ylo"),
        F.max("day").alias("yhi"),
    )
    bk = o.crossJoin(F.broadcast(b))
    wx = F.floor((F.col("xhi") - F.col("xlo")) / F.lit(256)) + F.lit(1)
    wy = F.floor((F.col("yhi") - F.col("ylo")) / F.lit(256)) + F.lit(1)
    xb = F.floor((F.col("o_custkey") - F.col("xlo")) / wx).cast("long")
    yb = F.floor((F.col("day") - F.col("ylo")) / wy).cast("long")
    z = bk.select(
        "o_custkey", "day", morton(xb, yb, 8).alias("zv")
    )
    return (
        z.groupBy(F.floor(F.col("zv") / F.lit(256)).cast("long").alias("zfile"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("o_custkey").alias("min_cust"),
            F.max("o_custkey").alias("max_cust"),
            F.min("day").alias("min_day"),
            F.max("day").alias("max_day"),
        )
    )


# ---------------------------------------------------------------------------
# IVF-PQ — the full FAISS composition: the IVF coarse quantizer prunes
# the corpus to nprobe cells, then PQ-ADC scores only the candidates
# with literal-table lookups.  Per-query work = nprobe/n_cells of the
# corpus × O(m) lookups per row, memory = m bytes per vector — the
# billion-scale ANN serving shape.  Both quantizers train on the same
# portable bounded sample, so the oracle retrains bit-identical
# centroids AND codebooks and replays the exact two-stage plan.
# ---------------------------------------------------------------------------
def _ivfpq_adc_ctes(sf_dir: str, corpus_pred: str = "TRUE") -> str:
    """WITH-body CTE chain ending in ``adc(vec_id, d2)`` — the
    literal-trained IVF-PQ replay shared by ``_ivfpq_oracle_sql`` and
    the managed hybrid oracle.  ``corpus_pred``: which vectors are IN
    the index (the managed-PQ erasure twin deletes a slice); both
    quantizers still train on the FULL corpus — the frozen
    offline-quantizer model."""
    import duckdb

    from .northstar import _IVF_ITERS, _IVF_K, _IVF_NPROBE, _IVF_SAMPLE

    con = duckdb.connect()
    rows = con.execute(
        "SELECT vec_id, CAST(embedding AS DOUBLE[]) FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchall()
    con.close()
    cent = S.train_ivf_centroids_rows(
        rows, k=_IVF_K, iters=_IVF_ITERS, sample_size=_IVF_SAMPLE
    )
    books = S.train_pq_codebooks_rows(
        rows, m=_PQ_M, k=_PQ_K, iters=_PQ_ITERS, sample_size=_PQ_SAMPLE
    )
    qv = [float(x) for x in next(v for i, v in rows if i == 0)]
    probes = S.nearest_clusters(cent, qv, _IVF_NPROBE)
    tabs = S.pq_adc_tables(books, qv)
    cent_values = ", ".join(
        f"({i}, {c!r}::DOUBLE[])" for i, c in enumerate(cent)
    )
    probe_list = ", ".join(str(p) for p in probes)
    csqd = (
        "list_dot_product("
        "[e.v[i] - ccv[i] FOR i IN generate_series(1, len(e.v))], "
        "[e.v[i] - ccv[i] FOR i IN generate_series(1, len(e.v))])"
    )
    extra = f"""
    cent(cc, ccv) AS (VALUES {cent_values}),
    assigned AS (
        SELECT e.vec_id, e.v,
               (SELECT cc FROM cent ORDER BY {csqd} ASC, cc ASC LIMIT 1)
                   AS cl
        FROM e
    ),
    cand AS (SELECT vec_id, v FROM assigned
             WHERE cl IN ({probe_list}) AND ({corpus_pred})),"""
    tab_values = ", ".join(
        f"({j}, {c}, {t!r})"
        for j, tab in enumerate(tabs)
        for c, t in enumerate(tab)
    )
    return f"""{_pq_common_sql(books, src="cand", extra_cte=extra)},
    tab(j, c, t) AS (VALUES {tab_values}),
    adc AS (
        SELECT b.vec_id,
               list_reduce(list(tab.t ORDER BY b.j), (a, x) -> a + x) AS d2
        FROM best b JOIN tab ON tab.j = b.j AND tab.c = b.c
        WHERE b.rn = 1
        GROUP BY b.vec_id
    )"""


def _ivfpq_oracle_sql(sf_dir: str, corpus_pred: str = "TRUE") -> str:
    return f"""
    WITH {_ivfpq_adc_ctes(sf_dir, corpus_pred)}
    SELECT vec_id, FLOOR(d2 * 1000000.0 + 0.5) / 1000000.0 AS approx_d2
    FROM adc
    ORDER BY d2 ASC, vec_id ASC
    LIMIT 10
    """


def _managed_hybrid_oracle_sql(sf_dir: str) -> str:
    """From-scratch replay of BOTH legs of the managed hybrid serve:
    the literal-trained IVF-PQ ADC ranking (full corpus — the managed
    PQ index's content) and full-corpus fixed-point BM25 (the managed
    text index's pinned pre-erasure snapshot), fused by RRF."""
    from .northstar import _NE_TOKS, _SEARCH_TERMS

    return f"""
    WITH {_ivfpq_adc_ctes(sf_dir)},
    v_rank AS (
        SELECT vec_id AS doc_id,
               CAST(ROW_NUMBER() OVER (ORDER BY d2 ASC, vec_id ASC)
                    AS INT) AS rank
        FROM adc ORDER BY d2 ASC, vec_id ASC LIMIT 20
    ),
    ttoks AS (
        SELECT doc_id, unnest({_NE_TOKS}) AS term,
               len({_NE_TOKS}) AS dl
        FROM documents
    ),
    tmeta AS (
        SELECT COUNT(*) AS n, SUM(len({_NE_TOKS})) AS t FROM documents
    ),
    tp AS (
        SELECT term, doc_id, CAST(COUNT(*) AS INT) AS tf,
               CAST(any_value(dl) AS INT) AS dl
        FROM ttoks WHERE list_contains({_SEARCH_TERMS!r}, term)
        GROUP BY term, doc_id
    ),
    td AS (SELECT term, COUNT(*) AS df FROM tp GROUP BY term),
    t_scored AS (
        SELECT tp.doc_id,
               CAST(FLOOR(
                   (ln((CAST(tmeta.n AS DOUBLE) - CAST(td.df AS DOUBLE) + 0.5)
                       / (CAST(td.df AS DOUBLE) + 0.5) + 1.0)
                    * (CAST(tp.tf AS DOUBLE) * 2.2
                       / (CAST(tp.tf AS DOUBLE)
                          + 1.2 * (0.25 + (0.75 * CAST(tp.dl AS DOUBLE))
                                   / (CAST(tmeta.t AS DOUBLE)
                                      / CAST(tmeta.n AS DOUBLE))))))
                   * 10000.0 + 0.5) AS BIGINT) AS s_fp
        FROM tp JOIN td USING (term) CROSS JOIN tmeta
    ),
    t_rank AS (
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (ORDER BY SUM(s_fp) DESC, doc_id)
                    AS INT) AS rank
        FROM t_scored GROUP BY doc_id
        ORDER BY SUM(s_fp) DESC, doc_id
        LIMIT 20
    ),
    fused AS (
        SELECT COALESCE(t.doc_id, v.doc_id) AS doc_id,
               COALESCE(1.0 / (60.0 + CAST(t.rank AS DOUBLE)), 0.0)
             + COALESCE(1.0 / (60.0 + CAST(v.rank AS DOUBLE)), 0.0) AS rrf
        FROM t_rank t FULL OUTER JOIN v_rank v ON t.doc_id = v.doc_id
    )
    SELECT doc_id, FLOOR(rrf * 1000000000.0 + 0.5) / 1000000000.0 AS rrf
    FROM fused ORDER BY rrf DESC, doc_id
    LIMIT 10
    """


@register(
    "ann_ivfpq_topk",
    _ivfpq_oracle_sql,
    doc="IVF-PQ top-k — the full FAISS composition: coarse-quantizer "
    "cell probe (nprobe/n_cells of the corpus) then PQ asymmetric-"
    "distance scoring (m table lookups/row, m bytes/vector); both "
    "quantizers sample-trained and embedded as literals in the DuckDB "
    "oracle, fully hash-checked",
)
def q_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .northstar import _IVF_NPROBE, _query_vec, ivf_centroids_cached

    emb = load_table(spark, sf_dir, "embeddings")
    cent = ivf_centroids_cached(spark, sf_dir)
    books = _pq_books_cached(spark, sf_dir)
    qv = _query_vec(spark, sf_dir, 0)
    probes = S.nearest_clusters(cent, qv, _IVF_NPROBE)
    cand = (
        S.with_cluster(emb, "embedding", cent)
        .filter(F.col("__c").isin(probes))
        .drop("__c")
    )
    tabs = S.pq_adc_tables(books, qv)
    enc = S.pq_encode(cand, "embedding", books)
    d2 = None
    for j, tab in enumerate(tabs):
        term = F.element_at(
            F.expr(S.double_array_sql(tab)),  # one parsed literal, not k py4j lits
            F.col(f"__pq{j}")["i"] + F.lit(1),
        )
        d2 = term if d2 is None else d2 + term
    scored = enc.select("vec_id", d2.alias("__d2"))
    return (
        scored.orderBy(F.col("__d2").asc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id", dround(F.col("__d2"), 6).alias("approx_d2"))
    )


# ---------------------------------------------------------------------------
# Managed IVF-PQ index (round 13): the memory-bound tier of the managed
# ANN family — PQ codes (not raw vectors) routed through the manifest
# lifecycle.  Built INCREMENTALLY like managed_ivf_index (bulk + pruned
# append + same-cell re-upsert + compaction); final content = the full
# corpus's codes, so the ADC probe shares ann_ivfpq_topk's
# dual-retrained-literal oracle.
# ---------------------------------------------------------------------------
def managed_pq_index(spark: SparkSession, sf_dir: str):
    def build():
        import tempfile

        from ..operators.ann_index import ManagedPqIndex
        from .northstar import ivf_centroids_cached

        emb = load_table(spark, sf_dir, "embeddings")
        idx = ManagedPqIndex(
            spark,
            tempfile.mkdtemp(prefix="sparkgraft_pqmgd_"),
            ivf_centroids_cached(spark, sf_dir),
            _pq_books_cached(spark, sf_dir),
        )
        idx.upsert(emb.filter(F.col("vec_id") % 5 != 0))   # bulk build
        idx.upsert(emb.filter(F.col("vec_id") % 5 == 0))   # pruned append
        idx.upsert(emb.filter(F.col("vec_id") % 10 == 1))  # re-upsert
        idx.maybe_compact(max_scatter=2)
        return idx

    from .northstar import artifact

    return artifact("pq_index_managed", sf_dir, build)


@register(
    "ann_pq_index_topk",
    _ivfpq_oracle_sql,
    doc="IVF-PQ over the MANAGED index (ManagedPqIndex): m-byte PQ "
    "codes — not raw vectors — routed through the manifest lifecycle "
    "(pruned appends, same-cell re-upsert, compaction, snapshot "
    "isolation), then an ADC probe that reads only the nprobe cell "
    "fragments of CODES: per-candidate cost is m table lookups, "
    "per-query I/O is nprobe/n_cells of an already-32x-smaller index. "
    "Final content equals the full corpus, so it shares "
    "ann_ivfpq_topk's dual-retrained-literal oracle.",
)
def q_pq_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .northstar import _IVF_NPROBE, _query_vec

    idx = managed_pq_index(spark, sf_dir)
    qv = _query_vec(spark, sf_dir, 0)
    out = idx.probe(qv, k=10, nprobe=_IVF_NPROBE)
    return out.select(
        "vec_id", dround(F.col("approx_d2"), 6).alias("approx_d2")
    )


# erasure twin: delete vec_id % 13 == 2 (never vec 0, the query vector)
_PQ_ERASE_PRED = "vec_id % 13 <> 2"


def managed_pq_index_erased(spark: SparkSession, sf_dir: str):
    """Full corpus indexed, then a slice keyed-deleted by id (the
    bloom-located copy-on-write manifest delete, not a deletion
    vector) — a separate artifact path so `managed_pq_index` stays
    full-corpus."""

    def build():
        import tempfile

        from ..operators.ann_index import ManagedPqIndex
        from .northstar import ivf_centroids_cached

        emb = load_table(spark, sf_dir, "embeddings")
        idx = ManagedPqIndex(
            spark,
            tempfile.mkdtemp(prefix="sparkgraft_pqmgd_erased_"),
            ivf_centroids_cached(spark, sf_dir),
            _pq_books_cached(spark, sf_dir),
        )
        idx.upsert(emb)
        idx.delete(emb.filter(~F.expr(_PQ_ERASE_PRED)).select("vec_id"))
        return idx

    from .northstar import artifact

    return artifact("pq_index_managed_erased", sf_dir, build)


@register(
    "ann_pq_index_erasure",
    lambda sf_dir: _ivfpq_oracle_sql(sf_dir, corpus_pred=_PQ_ERASE_PRED),
    doc="right-to-erasure on the managed PQ index: ids removed through "
    "the bloom-located keyed delete, ADC probe excludes them "
    "immediately; oracle = the same dual-retrained-literal IVF-PQ "
    "computation over the corpus minus the erased slice (quantizers "
    "still full-corpus — the frozen offline-quantizer model)",
)
def q_pq_index_erasure(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .northstar import _IVF_NPROBE, _query_vec

    idx = managed_pq_index_erased(spark, sf_dir)
    qv = _query_vec(spark, sf_dir, 0)
    out = idx.probe(qv, k=10, nprobe=_IVF_NPROBE)
    return out.select(
        "vec_id", dround(F.col("approx_d2"), 6).alias("approx_d2")
    )


@register(
    "managed_hybrid_rrf",
    _managed_hybrid_oracle_sql,
    doc="hybrid retrieval served END-TO-END from the two MANAGED index "
    "tiers (the ES 8 `rrf` retriever over one live cluster): BM25 "
    "top-20 from ManagedTextIndex pinned at its pre-erasure snapshot "
    "(version= time travel — search and fusion see ONE consistent "
    "corpus) fused by reciprocal ranks with the ADC top-20 probe of "
    "ManagedPqIndex (full-corpus content, nprobe cell fragments of "
    "m-byte codes).  Per-query I/O: the text leg reads only the query "
    "terms' postings buckets, the ANN leg only the probed cells' code "
    "fragments, and the fusion joins two 20-row lists — all three "
    "independent of corpus size.  Oracle retrains the quantizer "
    "literals and replays BM25, ADC, and the fusion from scratch.",
)
def q_managed_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.textindex import rrf_fuse
    from .northstar import (
        _IVF_NPROBE,
        _SEARCH_TERMS,
        _query_vec,
        managed_text_index,
    )

    tidx, v_full = managed_text_index(spark, sf_dir)
    text = tidx.bm25(_SEARCH_TERMS, k=20, version=v_full).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("bm25").desc(), F.col("doc_id")))
        .cast("int")
        .alias("rank"),
    )
    pidx = managed_pq_index(spark, sf_dir)
    qv = _query_vec(spark, sf_dir, 0)
    vec = pidx.probe(qv, k=20, nprobe=_IVF_NPROBE).select(
        F.col("vec_id").alias("doc_id"),
        F.row_number()
        .over(Window.orderBy(F.col("approx_d2").asc(), F.col("vec_id").asc()))
        .cast("int")
        .alias("rank"),
    )
    fused = rrf_fuse([text, vec], "doc_id", k=10)
    return fused.select("doc_id", dround(F.col("rrf"), 9).alias("rrf"))


# ---------------------------------------------------------------------------
# EXACT all-pairs set-similarity join via prefix filtering (the
# AllPairs/PPJoin family) — the deterministic complement to MinHash/LSH
# near-dup candidates: no recall loss, no probabilistic argument.
#
# Lemma (global token order, per-doc prefix p = n − ⌈τ·n⌉ + 1): if
# J(A,B) ≥ τ then |A∩B| ≥ ⌈τ·|A|⌉, so A's globally-smallest common
# token sits inside A's prefix (otherwise ≥ p tokens of A\B precede it,
# contradicting the bound) — and symmetrically for B.  Hence every
# qualifying pair shares ≥1 PREFIX token and the candidate set from the
# prefix-token equi-join is complete.  Tokens are ordered rarest-first
# (ascending document frequency), which makes prefixes maximally
# selective: candidate volume ≈ Σ_t df_prefix(t)² over rare tokens only.
#
# Scale posture: one df-count aggregate, one per-doc window to rank
# tokens, one equi-join keyed on the 64-bit token hash (strings stay in
# the per-doc side table), then exact-Jaccard verification of the
# candidates.  Completeness is externally proven: the DuckDB oracle is
# the brute-force O(n²) join, so a hash match IS the no-missed-pair
# certificate.
# ---------------------------------------------------------------------------
_PF_TAU = 0.8


@register(
    "jaccard_join_prefix_filter",
    f"""
    WITH d AS (
        SELECT doc_id, list_distinct(string_split(lower(text), ' ')) AS toks
        FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
               / len(list_distinct(list_concat(a.toks, b.toks))) AS jac
    FROM d a JOIN d b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
              / len(list_distinct(list_concat(a.toks, b.toks))) >= {_PF_TAU}
    """,
    doc="exact all-pairs Jaccard≥0.8 set-similarity join via "
    "rarest-first prefix filtering (AllPairs/PPJoin) — complete by the "
    "prefix lemma, verified candidates only; oracle = the brute-force "
    "O(n²) join, so the hash match certifies zero missed pairs",
)
def q_prefix_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import portable_hash64

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_distinct(F.split(F.lower(F.col("text")), " ")).alias("toks"),
    )
    side = docs.persist()  # (doc_id, toks) — joined back for the verify
    toks = side.select(
        "doc_id",
        F.size("toks").alias("n"),
        F.explode("toks").alias("tok"),
    )
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    ranked = toks.join(dfreq, "tok").select(
        "doc_id",
        "n",
        portable_hash64(F.col("tok")).alias("h"),
        F.row_number()
        .over(
            Window.partitionBy("doc_id").orderBy("df", "tok")
        )
        .alias("pos"),
    )
    # p = n − ⌈τ·n⌉ + 1, in exact integers for τ = 4/5
    prefix = ranked.filter(
        F.col("pos") <= F.col("n") - F.expr("(4 * n + 4) div 5") + F.lit(1)
    ).select("doc_id", "h")
    cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), "h")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )
    verified = (
        cand.join(side.select(F.col("doc_id").alias("id_a"),
                              F.col("toks").alias("ta")), "id_a")
        .join(side.select(F.col("doc_id").alias("id_b"),
                          F.col("toks").alias("tb")), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("ta", "tb")).cast("double")
                / F.size(F.array_union("ta", "tb"))
            ).alias("jac"),
        )
        .filter(F.col("jac") >= F.lit(_PF_TAU))
    )
    return verified


# ---------------------------------------------------------------------------
# Distributed statistics on exact-decimal moments — the descriptive-ML
# family (correlation matrices, closed-form OLS).  All first- and
# second-order sums go through DECIMAL(38,6): exact, partition-order
# independent, and overflow-safe to ~1e31 (a 100 TB fact table's Σx²
# stays ≤ ~1e20), so the classic single-pass moment formulas become
# bit-reproducible.  Products are computed in double first (IEEE —
# identical on both engines) and quantized by the decimal cast; the
# final normalization runs in double at the edge.  One map-side-partial
# aggregate total; no second pass, no centering pass.
# ---------------------------------------------------------------------------
def _moment_sums_sql(x: str, y: str) -> str:
    return f"""
        CAST(COUNT(*) AS DOUBLE) AS n,
        CAST(SUM(CAST({x} AS DECIMAL(38,6))) AS DOUBLE) AS sx,
        CAST(SUM(CAST({y} AS DECIMAL(38,6))) AS DOUBLE) AS sy,
        CAST(SUM(CAST({x} * {y} AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
        CAST(SUM(CAST({x} * {x} AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
        CAST(SUM(CAST({y} * {y} AS DECIMAL(38,6))) AS DOUBLE) AS syy"""


def _moment_sums(x, y):
    d = "decimal(38,6)"
    return [
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x.cast(d)).cast("double").alias("sx"),
        F.sum(y.cast(d)).cast("double").alias("sy"),
        F.sum((x * y).cast(d)).cast("double").alias("sxy"),
        F.sum((x * x).cast(d)).cast("double").alias("sxx"),
        F.sum((y * y).cast(d)).cast("double").alias("syy"),
    ]


_CORR_SQL = (
    "(n * sxy - sx * sy) / "
    "(sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))"
)


def _corr_col():
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )


_CORR_PAIRS = [
    ("l_quantity", "l_extendedprice"),
    ("l_quantity", "l_discount"),
    ("l_extendedprice", "l_discount"),
]


@register(
    "numeric_corr_matrix",
    " UNION ALL ".join(
        f"""
    SELECT '{x}' AS col_x, '{y}' AS col_y,
           FLOOR(({_CORR_SQL}) * 1e6 + 0.5) / 1e6 AS corr
    FROM (SELECT {_moment_sums_sql(x, y)} FROM lineitem)"""
        for x, y in _CORR_PAIRS
    ),
    doc="Pearson correlation matrix over lineitem numeric columns from "
    "one exact-decimal moments pass per pair — bit-reproducible "
    "distributed statistics (no two-pass centering, no float "
    "accumulation drift)",
)
def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    out = None
    for x, y in _CORR_PAIRS:
        a = li.agg(*_moment_sums(F.col(x), F.col(y))).select(
            F.lit(x).alias("col_x"),
            F.lit(y).alias("col_y"),
            dround(_corr_col(), 6).alias("corr"),
        )
        out = a if out is None else out.union(a)
    return out


@register(
    "ols_price_vs_qty",
    f"""
    WITH m AS (
        SELECT l_returnflag, {_moment_sums_sql('l_quantity', 'l_extendedprice')}
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           FLOOR(((n * sxy - sx * sy) / (n * sxx - sx * sx)) * 1e6 + 0.5)
               / 1e6 AS slope,
           FLOOR(((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
                  / n) * 1e6 + 0.5) / 1e6 AS intercept,
           FLOOR(({_CORR_SQL}) * ({_CORR_SQL}) * 1e6 + 0.5) / 1e6 AS r2
    FROM m
    """,
    doc="closed-form OLS (extendedprice ~ quantity) per returnflag from "
    "the same exact-decimal moments — slope, intercept, R²; the "
    "single-pass distributed regression shape (X'X normal equations "
    "degenerate to moments for one regressor)",
)
def q_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    m = li.groupBy("l_returnflag").agg(
        *_moment_sums(F.col("l_quantity"), F.col("l_extendedprice"))
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx = F.col("sxy"), F.col("sxx")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return m.select(
        "l_returnflag",
        dround(slope, 6).alias("slope"),
        dround((sy - slope * sx) / n, 6).alias("intercept"),
        dround(_corr_col() * _corr_col(), 6).alias("r2"),
    )


# ---------------------------------------------------------------------------
# Item co-occurrence ("customers who bought X also bought Y") — the
# collaborative-filtering counting core.  One self-join co-located on
# the order key (pairs never leave their order's partition before the
# count) with the p_a < p_b triangle filter, then a per-item top-3 via
# WindowGroupLimit so only k rows per item survive the rank shuffle.
# Pair volume is Σ_orders (items/order choose 2) — bounded by basket
# size, never corpus-quadratic.
# ---------------------------------------------------------------------------
@register(
    "copurchase_topk",
    """
    WITH pp AS (
        SELECT a.l_partkey AS p_a, b.l_partkey AS p_b, COUNT(*) AS n
        FROM lineitem a
        JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
    ),
    sym AS (
        SELECT p_a AS part, p_b AS partner, n FROM pp
        UNION ALL
        SELECT p_b AS part, p_a AS partner, n FROM pp
    )
    SELECT part, partner, CAST(n AS BIGINT) AS n, CAST(rank AS INT) AS rank
    FROM (
        SELECT part, partner, n,
               ROW_NUMBER() OVER (
                   PARTITION BY part ORDER BY n DESC, partner
               ) AS rank
        FROM sym
    )
    WHERE rank <= 3
    """,
    doc="co-purchase top-3 partners per part (basket self-join co-located "
    "on the order key, symmetric pair counts, WindowGroupLimit rank) — "
    "the collaborative-filtering co-occurrence statistic",
)
def q_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("p_a"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("p_b"))
    pp = (
        a.join(b, "k")
        .filter(F.col("p_a") < F.col("p_b"))
        .groupBy("p_a", "p_b")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    sym = pp.select(
        F.col("p_a").alias("part"), F.col("p_b").alias("partner"), "n"
    ).union(
        pp.select(
            F.col("p_b").alias("part"), F.col("p_a").alias("partner"), "n"
        )
    )
    w = Window.partitionBy("part").orderBy(F.col("n").desc(), "partner")
    return (
        sym.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "part",
            "partner",
            F.col("n").cast("bigint").alias("n"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
# each row draws u ∈ (0,1] from the portable hash of its id and ranks
# by key = u^(1/w); the top-k keys ARE a weight-proportional sample
# without replacement.  Ranking by ln(u)/w (monotone in the key, one
# less libm call) and quantizing to a 1e-9 fixed-point BIGINT makes the
# order engine-portable.  u is EXACT: (hash+1)/2^60 — a dyadic
# rational, bit-identical everywhere.  Map-side keys + TakeOrdered:
# one pass, no shuffle of payloads, deterministic and replayable (the
# property Bernoulli samplers lose the moment you need exactly k).
# ---------------------------------------------------------------------------
_WRS_K = 50


@register(
    "weighted_sample_topk",
    f"""
    WITH keyed AS (
        SELECT doc_id, n_chars,
               CAST(FLOOR(
                   ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                           ::BIGINT + 1) / 1152921504606846976.0)
                   / n_chars * 1e9 + 0.5) AS BIGINT) AS qk
        FROM documents
    )
    SELECT doc_id, CAST(n_chars AS BIGINT) AS weight
    FROM keyed
    ORDER BY qk DESC, doc_id
    LIMIT {_WRS_K}
    """,
    doc="Efraimidis–Spirakis weighted sampling without replacement "
    "(weight = n_chars, k = 50): exact dyadic-rational uniforms from "
    "the portable id hash, ln(u)/w keys quantized to fixed point — "
    "deterministic, replayable, exactly-k; fully oracle-checked",
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import portable_hash64

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    u = (portable_hash64(F.col("doc_id").cast("string")) + F.lit(1)) / F.lit(
        float(1 << 60)
    )
    qk = F.floor(F.log(u) / F.col("n_chars") * F.lit(1e9) + F.lit(0.5)).cast(
        "long"
    )
    return (
        docs.withColumn("qk", qk)
        .orderBy(F.col("qk").desc(), "doc_id")
        .limit(_WRS_K)
        .select("doc_id", F.col("n_chars").cast("bigint").alias("weight"))
    )


# ---------------------------------------------------------------------------
# Split-drift monitoring: per-language KL-divergence terms between the
# deterministic train and val splits — the standing data-quality check
# that a hash split didn't skew the language mixture (and, run over
# snapshots, that the corpus mixture isn't drifting).  Add-one-smoothed
# probabilities are exact rational→double divisions; each term
# p·(ln p − ln q) is emitted per language (no cross-language float
# fold to order), quantized at the edge.  Two tiny aggregates over a
# map-side split label — nothing here scales with corpus size except
# the one counting pass.
# ---------------------------------------------------------------------------
@register(
    "split_lang_drift",
    """
    WITH labeled AS (
        SELECT lang,
               CASE WHEN (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                1, 15)) AS BIGINT) % 10000) < 8000
                    THEN 'train'
                    WHEN (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                1, 15)) AS BIGINT) % 10000) < 9000
                    THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    ),
    c AS (
        SELECT lang,
               COUNT(*) FILTER (WHERE split = 'train') AS n_tr,
               COUNT(*) FILTER (WHERE split = 'val') AS n_va
        FROM labeled GROUP BY lang
    ),
    t AS (SELECT SUM(n_tr) AS tot_tr, SUM(n_va) AS tot_va,
                 COUNT(*) AS n_langs FROM c)
    SELECT c.lang,
           FLOOR(((c.n_tr + 1) / CAST(t.tot_tr + t.n_langs AS DOUBLE))
                 * 1e6 + 0.5) / 1e6 AS p_train,
           FLOOR(((c.n_va + 1) / CAST(t.tot_va + t.n_langs AS DOUBLE))
                 * 1e6 + 0.5) / 1e6 AS p_val,
           FLOOR(((c.n_tr + 1) / CAST(t.tot_tr + t.n_langs AS DOUBLE))
                 * (ln((c.n_tr + 1) / CAST(t.tot_tr + t.n_langs AS DOUBLE))
                    - ln((c.n_va + 1) / CAST(t.tot_va + t.n_langs AS DOUBLE)))
                 * 1e9 + 0.5) / 1e9 AS kl_term
    FROM c CROSS JOIN t
    """,
    doc="per-language KL-divergence terms between the deterministic "
    "train and val hash splits (add-one smoothing) — split/mixture "
    "drift monitoring for LLM data curation, fully oracle-checked",
)
def q_split_lang_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import sampling as SA

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    labeled = SA.hash_split(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    c = labeled.groupBy("lang").agg(
        F.count(F.when(F.col("split") == "train", 1)).alias("n_tr"),
        F.count(F.when(F.col("split") == "val", 1)).alias("n_va"),
    )
    t = c.agg(
        F.sum("n_tr").alias("tot_tr"),
        F.sum("n_va").alias("tot_va"),
        F.count(F.lit(1)).alias("n_langs"),
    )
    j = c.crossJoin(F.broadcast(t))
    p = (F.col("n_tr") + F.lit(1)) / (F.col("tot_tr") + F.col("n_langs")).cast(
        "double"
    )
    q = (F.col("n_va") + F.lit(1)) / (F.col("tot_va") + F.col("n_langs")).cast(
        "double"
    )
    return j.select(
        "lang",
        dround(p, 6).alias("p_train"),
        dround(q, 6).alias("p_val"),
        dround(p * (F.log(p) - F.log(q)), 9).alias("kl_term"),
    )


# ---------------------------------------------------------------------------
# Asymmetric containment pairs: |A∩B| / |A| ≥ 0.9 with |A| ≤ |B| — the
# "document A is quoted/embedded inside document B" detector, which
# symmetric Jaccard misses entirely (a 50-word quote inside a 5000-word
# page has Jaccard ≈ 0.01 but containment 1.0).  Block-bounded like the
# other dedup ops (lang blocks here; IVF cells / LSH bands at corpus
# scale — containment also admits prefix filtering on the SMALL side
# only, since |A∩B| ≥ ⌈t·|A|⌉ bounds A's prefix).  Deduplication policy
# downstream: drop A, keep the superset document.
# ---------------------------------------------------------------------------
@register(
    "containment_pairs",
    """
    WITH d AS (
        SELECT doc_id, lang,
               list_distinct(string_split(lower(text), ' ')) AS toks
        FROM documents
    )
    SELECT a.doc_id AS id_small, b.doc_id AS id_big,
           CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
               / len(a.toks) AS containment
    FROM d a JOIN d b
      ON a.lang = b.lang AND a.doc_id <> b.doc_id
     AND (len(a.toks) < len(b.toks)
          OR (len(a.toks) = len(b.toks) AND a.doc_id < b.doc_id))
    WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
              / len(a.toks) >= 0.9
    """,
    doc="asymmetric containment pairs (|A∩B|/|A| ≥ 0.9, small-into-big) "
    "— quote/substring-level duplication that symmetric Jaccard "
    "cannot see; block-bounded candidates, exact int/int containment",
)
def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.array_distinct(F.split(F.lower(F.col("text")), " ")).alias("toks"),
    )
    a = docs.select(
        F.col("lang"),
        F.col("doc_id").alias("id_small"),
        F.col("toks").alias("ta"),
        F.size("toks").alias("na"),
    )
    b = docs.select(
        F.col("lang"),
        F.col("doc_id").alias("id_big"),
        F.col("toks").alias("tb"),
        F.size("toks").alias("nb"),
    )
    pairs = a.join(b, "lang").filter(
        (F.col("id_small") != F.col("id_big"))
        & (
            (F.col("na") < F.col("nb"))
            | ((F.col("na") == F.col("nb")) & (F.col("id_small") < F.col("id_big")))
        )
    )
    return pairs.select(
        "id_small",
        "id_big",
        (
            F.size(F.array_intersect("ta", "tb")).cast("double") / F.col("na")
        ).alias("containment"),
    ).filter(F.col("containment") >= F.lit(0.9))


# ---------------------------------------------------------------------------
# Incremental view maintenance (IVM) by delta algebra: for a
# join-aggregate view V = γ(A ⋈ B), an insert batch (ΔA, ΔB) changes
# the join by exactly ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB — so the view is refreshed
# by aggregating THREE delta-sized joins and merging partial sums with
# the old per-group state, never rescanning A⋈B.  The registered query
# computes the refreshed view THROUGH the delta algebra while the
# oracle recomputes it from scratch — the hash match proves the
# incremental refresh equals full recomputation (the Materialize /
# DBSP correctness contract).  Partial aggregates ride as exact
# DECIMALs, so merge order can't move the result.
# ---------------------------------------------------------------------------
@register(
    "ivm_join_delta",
    """
    SELECT c.c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           FLOOR(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(22,4))) AS DOUBLE)
                 * 10000.0 + 0.5) / 10000.0 AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_nationkey
    """,
    doc="incremental view maintenance of a join-aggregate view: base "
    "state + three delta-sized joins (ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB) merged via "
    "exact-decimal partial sums; the full-recompute oracle certifies "
    "incremental ≡ from-scratch",
)
def q_ivm_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    # simulate an initial load + an insert batch arriving on BOTH sides
    a1 = orders.filter(F.col("o_orderkey") % 2 == 0)
    da = orders.filter(F.col("o_orderkey") % 2 == 1)
    b1 = cust.filter(F.col("c_custkey") % 2 == 0)
    db = cust.filter(F.col("c_custkey") % 2 == 1)

    def partial(o, c):
        return (
            o.join(c, o.o_custkey == c.c_custkey)
            .groupBy("c_nationkey")
            .agg(
                F.count(F.lit(1)).alias("pn"),
                F.sum(F.col("o_totalprice").cast("decimal(22,4)")).alias("ps"),
            )
        )

    base = partial(a1, b1)  # the materialized view's stored state
    deltas = partial(da, b1).union(partial(a1, db)).union(partial(da, db))
    merged = base.union(deltas).groupBy("c_nationkey").agg(
        F.sum("pn").cast("bigint").alias("n_orders"),
        F.sum("ps").alias("s"),
    )
    return merged.select(
        "c_nationkey",
        "n_orders",
        dround(F.col("s").cast("double"), 4).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# A/B experiment readout: users are assigned arms by the deterministic
# portable hash (the same stable-assignment property the samplers use —
# a user keeps their arm across sessions and replays), conversion =
# "user emitted a purchase event", and the readout is the two-prop
# z-statistic.  Counts are exact integers; the z arithmetic is a fixed
# IEEE expression quantized at the edge.  One events aggregate + one
# tiny arm rollup — dashboard-cheap at any corpus size.
# ---------------------------------------------------------------------------
@register(
    "ab_test_conversion",
    """
    WITH users AS (
        SELECT user_id,
               CASE WHEN (('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                          ::BIGINT % 2) = 0 THEN 'A' ELSE 'B' END AS arm,
               MAX(CASE WHEN event_type = 'purchase' AND value > 150.0
                        THEN 1 ELSE 0 END) AS converted
        FROM events GROUP BY user_id
    ),
    arms AS (
        SELECT arm, COUNT(*) AS n, SUM(converted) AS conv
        FROM users GROUP BY arm
    ),
    w AS (
        SELECT MAX(CASE WHEN arm = 'A' THEN n END) AS na,
               MAX(CASE WHEN arm = 'A' THEN conv END) AS ca,
               MAX(CASE WHEN arm = 'B' THEN n END) AS nb,
               MAX(CASE WHEN arm = 'B' THEN conv END) AS cb
        FROM arms
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(ca AS BIGINT) AS conv_a,
           CAST(nb AS BIGINT) AS n_b, CAST(cb AS BIGINT) AS conv_b,
           FLOOR(ca / CAST(na AS DOUBLE) * 1e6 + 0.5) / 1e6 AS p_a,
           FLOOR(cb / CAST(nb AS DOUBLE) * 1e6 + 0.5) / 1e6 AS p_b,
           FLOOR((ca / CAST(na AS DOUBLE) - cb / CAST(nb AS DOUBLE))
                 / sqrt(((ca + cb) / CAST(na + nb AS DOUBLE))
                        * (1.0 - (ca + cb) / CAST(na + nb AS DOUBLE))
                        * (1.0 / na + 1.0 / nb))
                 * 1e6 + 0.5) / 1e6 AS z
    FROM w
    """,
    doc="A/B experiment readout: deterministic hash-assigned arms "
    "(stable across replays), per-arm conversion (= a high-value "
    "purchase) rates, pooled two-proportion z-statistic — exact "
    "counts, IEEE-pure edge math",
)
def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import portable_hash64

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value"
    )
    users = e.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 150.0),
                1,
            ).otherwise(0)
        ).alias("converted")
    ).select(
        F.when(
            F.pmod(portable_hash64(F.col("user_id").cast("string")), F.lit(2))
            == 0,
            "A",
        )
        .otherwise("B")
        .alias("arm"),
        "converted",
    )
    arms = users.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("conv")
    )
    w = arms.agg(
        F.max(F.when(F.col("arm") == "A", F.col("n"))).alias("na"),
        F.max(F.when(F.col("arm") == "A", F.col("conv"))).alias("ca"),
        F.max(F.when(F.col("arm") == "B", F.col("n"))).alias("nb"),
        F.max(F.when(F.col("arm") == "B", F.col("conv"))).alias("cb"),
    )
    na, ca = F.col("na").cast("double"), F.col("ca").cast("double")
    nb, cb = F.col("nb").cast("double"), F.col("cb").cast("double")
    pa, pb = ca / na, cb / nb
    pool = (ca + cb) / (na + nb)
    z = (pa - pb) / F.sqrt(
        pool * (F.lit(1.0) - pool) * (F.lit(1.0) / na + F.lit(1.0) / nb)
    )
    return w.select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("ca").cast("bigint").alias("conv_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.col("cb").cast("bigint").alias("conv_b"),
        dround(pa, 6).alias("p_a"),
        dround(pb, 6).alias("p_b"),
        dround(z, 6).alias("z"),
    )


# ---------------------------------------------------------------------------
# N-gram novelty score: the share of a document's distinct word
# 5-shingles that appear in NO other document — the memorization-risk /
# boilerplate dual (novelty ≈ 0 ⇒ the doc is assembled from corpus-wide
# n-grams; ≈ 1 ⇒ unique prose).  Counting rides on 64-bit portable
# shingle hashes, so exchanges never carry shingle strings (the dedup
# modules' no-text-shuffle discipline); the oracle hashes identically.
# ---------------------------------------------------------------------------
def _novelty_sql() -> str:
    h64 = "CAST(('0x' || substr(md5({s}),1,15)) AS BIGINT)"
    return f"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t
        FROM documents WHERE text IS NOT NULL
    ), sh_t AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, len(t) - 3),
                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                        || ' ' || t[i+3] || ' ' || t[i+4])) AS sh
        FROM toks
    ), g AS (
        SELECT doc_id, {h64.format(s='unnest(sh)')} AS h
        FROM sh_t WHERE len(sh) > 0
    ), cnt AS (SELECT h, COUNT(*) AS df FROM g GROUP BY h),
    per AS (
        SELECT g.doc_id, COUNT(*) AS n_grams,
               COUNT(*) FILTER (WHERE cnt.df = 1) AS uniq
        FROM g JOIN cnt USING (h) GROUP BY g.doc_id
    )
    SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
           FLOOR(uniq / CAST(n_grams AS DOUBLE) * 1e6 + 0.5) / 1e6 AS novelty
    FROM per
    """


@register(
    "doc_novelty_scores",
    _novelty_sql(),
    doc="per-document novelty: share of distinct word 5-shingles unique "
    "to the document corpus-wide (memorization-risk / boilerplate "
    "signal) — 64-bit hashed shingles only in the exchanges",
)
def q_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import portable_hash64, word_shingles

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    sh = docs.select(
        "doc_id", word_shingles(F.col("text"), 5).alias("sh")
    ).filter(F.size("sh") > 0)
    g = sh.select("doc_id", F.explode(F.col("sh")).alias("s")).select(
        "doc_id", portable_hash64(F.col("s")).alias("h")
    )
    cnt = g.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    per = g.join(cnt, "h").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.count(F.when(F.col("df") == 1, 1)).alias("uniq"),
    )
    return per.select(
        "doc_id",
        F.col("n_grams").cast("bigint").alias("n_grams"),
        dround(F.col("uniq") / F.col("n_grams").cast("double"), 6).alias(
            "novelty"
        ),
    )


# ---------------------------------------------------------------------------
# Interpolated bigram-LM scoring — the KenLM-shaped upgrade of
# doc_lm_logprob: p(w|prev) = 0.75·c(prev,w)/c(prev) + 0.25·c(w)/N,
# mean per-token log-prob per document.  Same fixed-point discipline
# (per-token lp quantized to a 1e-4 BIGINT before the order-free sum;
# ln evaluated at identically-computed rationals).  Corpus model =
# two count aggregates; scoring = three equi-joins on token keys
# (hash-partitionable; ride-as-hash at 100 TB as in doc_novelty).
# ---------------------------------------------------------------------------
@register(
    "doc_bigram_logprob",
    """
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           w -> w <> '') AS t
        FROM documents WHERE text IS NOT NULL
    ),
    uni AS (
        SELECT w, COUNT(*) AS c FROM (SELECT unnest(t) AS w FROM toks)
        GROUP BY w
    ),
    tot AS (SELECT SUM(c) AS n FROM uni),
    big AS (
        SELECT doc_id,
               unnest([{'p': t[i-1], 'w': t[i]}
                       FOR i IN generate_series(2, len(t))]) AS u
        FROM toks
    ),
    bc AS (
        SELECT u['p'] AS p, u['w'] AS w, COUNT(*) AS c2 FROM big
        GROUP BY u['p'], u['w']
    ),
    scored AS (
        SELECT b.doc_id,
               CAST(FLOOR(ln(0.75 * bc.c2 / CAST(c1.c AS DOUBLE)
                             + 0.25 * cw.c / CAST(tot.n AS DOUBLE))
                          * 10000.0 + 0.5) AS BIGINT) AS lp
        FROM big b
        JOIN bc ON bc.p = b.u['p'] AND bc.w = b.u['w']
        JOIN uni c1 ON c1.w = b.u['p']
        JOIN uni cw ON cw.w = b.u['w']
        CROSS JOIN tot
    ),
    agg AS (
        SELECT doc_id, COUNT(*) AS n_bigrams, SUM(lp) AS slp
        FROM scored GROUP BY doc_id
    )
    SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
           FLOOR(slp / (n_bigrams * 10000.0) * 1e6 + 0.5) / 1e6
               AS avg_logprob
    FROM agg
    """,
    doc="interpolated bigram-LM mean log-probability per document "
    "(0.75·bigram MLE + 0.25·unigram backoff) — the KenLM-shaped "
    "quality filter; fixed-point per-token quantization keeps the "
    "fold exact and order-free",
)
def q_doc_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    toks = docs.select(
        "doc_id",
        F.posexplode(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"),
                lambda t: t != F.lit(""),
            )
        ).alias("pos", "w"),
    )
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    tot = uni.agg(F.sum("c").alias("n"))
    wd = Window.partitionBy("doc_id").orderBy("pos")
    big = toks.withColumn("p", F.lag("w").over(wd)).filter(
        F.col("p").isNotNull()
    )
    bc = big.groupBy("p", "w").agg(F.count(F.lit(1)).alias("c2"))
    c1 = uni.select(F.col("w").alias("p"), F.col("c").alias("cp"))
    cw = uni.select("w", F.col("c").alias("cw"))
    scored = (
        big.join(bc, ["p", "w"])
        .join(c1, "p")
        .join(cw, "w")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.floor(
                F.log(
                    F.lit(0.75) * F.col("c2") / F.col("cp").cast("double")
                    + F.lit(0.25) * F.col("cw") / F.col("n").cast("double")
                )
                * F.lit(10000.0)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("lp"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"), F.sum("lp").alias("slp")
    )
    return agg.select(
        "doc_id",
        F.col("n_bigrams").cast("bigint").alias("n_bigrams"),
        dround(
            F.col("slp") / (F.col("n_bigrams") * F.lit(10000.0)), 6
        ).alias("avg_logprob"),
    )


# ---------------------------------------------------------------------------
# Skyline (Pareto front) over (o_totalprice ↑, order recency ↑): orders
# not dominated by any other on both axes.  O(n log n) sort-scan form:
# in (price DESC, day DESC, key) order an order is dominated iff the
# running max of day over STRICTLY-PRECEDING rows reaches its own day
# (preceding ⇒ price ≥, and an equal-(price,day) tie keeps only its
# first key — the "distinct skyline" convention, mirrored exactly in
# SQL).  The single global window is the verification-scale form; at
# 100 TB skyline is distributive — per-bucket local skylines then a
# final pass over the (tiny) survivor union — same expression, one
# extra groupBy.
# ---------------------------------------------------------------------------
@register(
    "pareto_front_orders",
    """
    WITH o AS (
        SELECT o_orderkey, o_totalprice,
               CAST(date_diff('day', DATE '1970-01-01',
                              CAST(o_orderdate AS DATE)) AS BIGINT) AS day
        FROM orders
    ),
    m AS (
        SELECT o_orderkey, o_totalprice, day,
               MAX(day) OVER (
                   ORDER BY o_totalprice DESC, day DESC, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS prevmax
        FROM o
    )
    SELECT o_orderkey, o_totalprice, day
    FROM m WHERE prevmax IS NULL OR prevmax < day
    """,
    doc="skyline / Pareto front over (price, recency): sort-scan cummax "
    "formulation, O(n log n), distinct-skyline tie convention — "
    "distributive to per-bucket local skylines + survivor merge at "
    "scale; fully oracle-checked",
)
def q_pareto_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01"))
        .cast("long")
        .alias("day"),
    )
    w = (
        Window.orderBy(
            F.col("o_totalprice").desc(), F.col("day").desc(), "o_orderkey"
        )
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    m = o.withColumn("prevmax", F.max("day").over(w))
    return m.filter(
        F.col("prevmax").isNull() | (F.col("prevmax") < F.col("day"))
    ).select("o_orderkey", "o_totalprice", "day")


# ---------------------------------------------------------------------------
# Conversion latency: per user, seconds from FIRST view to FIRST
# subsequent purchase (users who never convert are excluded by the
# strict > join), summarized as exact p50/p90 over converting users —
# the time-to-convert funnel metric next to funnel_view_click_purchase's
# step counts.  Two thin per-user aggregates + one exact percentile;
# latencies are exact integer nanosecond differences scaled to seconds.
# ---------------------------------------------------------------------------
@register(
    "conversion_latency_percentiles",
    """
    WITH v AS (
        SELECT user_id, MIN(epoch_ns(ts)) AS t_view
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    p AS (
        SELECT e.user_id, MIN(epoch_ns(e.ts)) AS t_buy
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) > v.t_view
        GROUP BY e.user_id
    ),
    lat AS (
        SELECT p.user_id, (p.t_buy - v.t_view) / 1e9 AS sec
        FROM p JOIN v ON p.user_id = v.user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
           FLOOR(quantile_cont(sec, 0.5) * 1e6 + 0.5) / 1e6 AS p50_sec,
           FLOOR(quantile_cont(sec, 0.9) * 1e6 + 0.5) / 1e6 AS p90_sec
    FROM lat
    """,
    doc="time-to-convert funnel metric: per-user first-view → first-"
    "subsequent-purchase latency, exact p50/p90 over converting users "
    "(exact integer ns diffs scaled to seconds)",
)
def q_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts_nanos"
    )
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_nanos").alias("t_view"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts_nanos") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts_nanos").alias("t_buy"), F.first("t_view").alias("tv"))
    )
    lat = p.select(((F.col("t_buy") - F.col("tv")) / F.lit(1e9)).alias("sec"))
    return lat.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_converted"),
        dround(F.percentile(F.col("sec"), F.lit(0.5)), 6).alias("p50_sec"),
        dround(F.percentile(F.col("sec"), F.lit(0.9)), 6).alias("p90_sec"),
    )


# ---------------------------------------------------------------------------
# RFM customer segmentation — recency (days since last order),
# frequency (order count), monetary (exact-decimal revenue) per
# customer, each scored into quintiles by NTILE over a fully
# deterministic (metric, custkey) order, concatenated into the classic
# 3-digit RFM cell.  One orders aggregate + three rank windows; the
# downstream "champions / at-risk" tiers are just predicates over the
# cell.  Quintile edges follow NTILE's floor-division split, identical
# on both engines given the pinned tiebreak.
# ---------------------------------------------------------------------------
@register(
    "rfm_customer_segments",
    """
    WITH m AS (
        SELECT o_custkey,
               MAX(CAST(date_diff('day', DATE '1970-01-01',
                                  CAST(o_orderdate AS DATE)) AS BIGINT))
                   AS last_day,
               COUNT(*) AS freq,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(22,4))) AS DOUBLE)
                   AS monetary
        FROM orders GROUP BY o_custkey
    ),
    s AS (
        SELECT o_custkey, last_day, freq, monetary,
               NTILE(5) OVER (ORDER BY last_day DESC, o_custkey) AS r,
               NTILE(5) OVER (ORDER BY freq DESC, o_custkey) AS f,
               NTILE(5) OVER (ORDER BY monetary DESC, o_custkey) AS mo
        FROM m
    )
    SELECT o_custkey, CAST(freq AS BIGINT) AS freq,
           FLOOR(monetary * 100.0 + 0.5) / 100.0 AS monetary,
           CAST(r AS INT) AS r, CAST(f AS INT) AS f, CAST(mo AS INT) AS m,
           CAST(r AS VARCHAR) || CAST(f AS VARCHAR) || CAST(mo AS VARCHAR)
               AS rfm_cell
    FROM s
    """,
    doc="RFM segmentation: per-customer recency/frequency/monetary "
    "quintiles (NTILE with pinned tiebreaks, exact-decimal revenue) "
    "concatenated into the classic RFM cell — the marketing-analytics "
    "segmentation staple",
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy("o_custkey").agg(
        F.max(
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01"))
            .cast("long")
        ).alias("last_day"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(F.col("o_totalprice").cast("decimal(22,4)"))
        .cast("double")
        .alias("monetary"),
    )
    r = F.ntile(5).over(Window.orderBy(F.col("last_day").desc(), "o_custkey"))
    f = F.ntile(5).over(Window.orderBy(F.col("freq").desc(), "o_custkey"))
    mo = F.ntile(5).over(Window.orderBy(F.col("monetary").desc(), "o_custkey"))
    s = m.select(
        "o_custkey",
        F.col("freq").cast("bigint").alias("freq"),
        dround(F.col("monetary"), 2).alias("monetary"),
        r.cast("int").alias("r"),
        f.cast("int").alias("f"),
        mo.cast("int").alias("m"),
    )
    return s.withColumn(
        "rfm_cell",
        F.concat(
            F.col("r").cast("string"),
            F.col("f").cast("string"),
            F.col("m").cast("string"),
        ),
    )


# ---------------------------------------------------------------------------
# Behavioral bot detection: the coefficient of variation of a user's
# inter-event gaps.  Human activity is bursty (CV ≳ 1); schedulers and
# scripts fire at near-constant intervals (CV → 0).  Gaps are exact
# integer seconds (ns diff, floor-divided), so Σx and Σx² are exact
# BIGINTs and the single-pass variance (n·Σx² − (Σx)²)/n² is
# bit-reproducible to the double edge — the numeric_corr_matrix moment
# discipline applied to behavioral features.  One user-window shuffle +
# one per-user aggregate.
# ---------------------------------------------------------------------------
@register(
    "bot_score_users",
    """
    WITH seq AS (
        SELECT user_id,
               (LEAD(epoch_ns(ts)) OVER (
                    PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
                ) - epoch_ns(ts)) // 1000000000 AS gap_s
        FROM events
    ),
    g AS (
        SELECT user_id, COUNT(*) AS n, SUM(gap_s) AS sx,
               SUM(gap_s * gap_s) AS sxx
        FROM seq WHERE gap_s IS NOT NULL GROUP BY user_id
        HAVING COUNT(*) >= 5 AND SUM(gap_s) > 0
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_gaps,
           FLOOR(sx / CAST(n AS DOUBLE) * 1e6 + 0.5) / 1e6 AS mean_gap_s,
           FLOOR(sqrt((n * sxx - sx * sx) / (CAST(n AS DOUBLE) * n))
                 / (sx / CAST(n AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS cv,
           (sqrt((n * sxx - sx * sx) / (CAST(n AS DOUBLE) * n))
            / (sx / CAST(n AS DOUBLE))) < 0.3 AS bot_flag
    FROM g
    """,
    doc="behavioral bot detection: coefficient of variation of per-user "
    "inter-event gaps (exact integer-second moments, single-pass "
    "variance) — near-constant cadence flags automation",
)
def q_bot_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts_nanos", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts_nanos", "event_id")
    seq = e.select(
        "user_id",
        F.expr(
            "(lead(ts_nanos) over (partition by user_id "
            "order by ts_nanos, event_id) - ts_nanos) div 1000000000"
        ).alias("gap_s"),
    ).filter(F.col("gap_s").isNotNull())
    g = (
        seq.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("gap_s").alias("sx"),
            F.sum(F.col("gap_s") * F.col("gap_s")).alias("sxx"),
        )
        .filter((F.col("n") >= 5) & (F.col("sx") > 0))
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    mean = sx / n.cast("double")
    sd = F.sqrt((n * sxx - sx * sx) / (n.cast("double") * n))
    return g.select(
        "user_id",
        n.cast("bigint").alias("n_gaps"),
        dround(mean, 6).alias("mean_gap_s"),
        dround(sd / mean, 6).alias("cv"),
        ((sd / mean) < F.lit(0.3)).alias("bot_flag"),
    )


# ---------------------------------------------------------------------------
# CUSUM change-point detection over the daily event-count series:
# cusum_t = max(0, cusum_{t-1} + (x_t − μ)) with alarm at 2σ — a TRUE
# recurrence (not window-expressible), folded sequentially over the
# day-ordered series.  The state is bounded by the TIMELINE length
# (days), never the corpus: the per-day counts are a full map-side
# aggregate first, and only that tiny series is collected into the
# fold.  μ and σ come from exact integer moments; the Spark
# array-aggregate fold and the DuckDB recursive CTE execute the
# identical IEEE sequence, so the recurrence is hash-checked.
# ---------------------------------------------------------------------------
@register(
    "cusum_daily_events",
    """
    WITH RECURSIVE d AS (
        SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                    AS BIGINT) AS day, COUNT(*) AS n
        FROM events GROUP BY 1
    ),
    idx AS (
        SELECT day, n, ROW_NUMBER() OVER (ORDER BY day) AS i FROM d
    ),
    st AS (
        SELECT COUNT(*) AS cnt, SUM(n) AS s, SUM(n * n) AS ss FROM d
    ),
    c AS (
        SELECT i, day, n,
               GREATEST(0.0, n - (SELECT s / CAST(cnt AS DOUBLE) FROM st))
                   AS cu
        FROM idx WHERE i = 1
        UNION ALL
        SELECT idx.i, idx.day, idx.n,
               GREATEST(0.0, c.cu + (idx.n
                   - (SELECT s / CAST(cnt AS DOUBLE) FROM st)))
        FROM c JOIN idx ON idx.i = c.i + 1
    )
    SELECT c.day, CAST(c.n AS BIGINT) AS n,
           FLOOR(c.cu * 1e6 + 0.5) / 1e6 AS cusum,
           c.cu > 2.0 * sqrt((st.cnt * st.ss - st.s * st.s)
                             / (CAST(st.cnt AS DOUBLE) * st.cnt)) AS alarm
    FROM c CROSS JOIN st
    """,
    doc="CUSUM change-point detection over daily event counts: "
    "sequential max(0, prev + deviation) recurrence folded over the "
    "day-ordered series (state bounded by timeline length, not corpus "
    "size), 2σ alarm from exact integer moments — recursive-CTE oracle "
    "replays the identical IEEE sequence",
)
def q_cusum_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01"))
        .cast("long")
        .alias("day")
    )
    d = e.groupBy("day").agg(F.count(F.lit(1)).alias("n"))
    st = d.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("n").alias("s"),
        F.sum(F.col("n") * F.col("n")).alias("ss"),
    )
    j = d.crossJoin(F.broadcast(st))
    mean = F.col("s") / F.col("cnt").cast("double")
    sd = F.sqrt(
        (F.col("cnt") * F.col("ss") - F.col("s") * F.col("s"))
        / (F.col("cnt").cast("double") * F.col("cnt"))
    )
    # fold the day-ordered (day, n) series: accumulator carries the
    # running cusum plus the emitted rows
    series = j.groupBy("cnt", "s", "ss").agg(
        F.array_sort(F.collect_list(F.struct("day", "n"))).alias("xs")
    ).select(
        F.col("cnt"),
        F.col("s"),
        F.col("ss"),
        F.aggregate(
            F.col("xs"),
            F.struct(
                F.lit(0.0).alias("cu"),
                F.array().cast(
                    "array<struct<day:long,n:long,cu:double>>"
                ).alias("out"),
            ),
            lambda acc, x: F.struct(
                F.greatest(
                    F.lit(0.0),
                    acc["cu"]
                    + (
                        x["n"]
                        - F.col("s") / F.col("cnt").cast("double")
                    ),
                ).alias("cu"),
                F.concat(
                    acc["out"],
                    F.array(
                        F.struct(
                            x["day"].alias("day"),
                            x["n"].alias("n"),
                            F.greatest(
                                F.lit(0.0),
                                acc["cu"]
                                + (
                                    x["n"]
                                    - F.col("s")
                                    / F.col("cnt").cast("double")
                                ),
                            ).alias("cu"),
                        )
                    ),
                ).alias("out"),
            ),
        )["out"].alias("out"),
    )
    rows = series.select(
        "cnt", "s", "ss", F.explode("out").alias("r")
    )
    sd2 = F.sqrt(
        (F.col("cnt") * F.col("ss") - F.col("s") * F.col("s"))
        / (F.col("cnt").cast("double") * F.col("cnt"))
    )
    return rows.select(
        F.col("r.day").alias("day"),
        F.col("r.n").cast("bigint").alias("n"),
        dround(F.col("r.cu"), 6).alias("cusum"),
        (F.col("r.cu") > F.lit(2.0) * sd2).alias("alarm"),
    )


# ---------------------------------------------------------------------------
# Collocation extraction by pointwise mutual information: PMI(a,b) =
# ln(c(a,b)·N / (c(a)·c(b))) over adjacent word pairs with a minimum
# pair count — the corpus-linguistics statistic behind multi-word-
# expression detection and tokenizer-merge candidates (the same
# count ratio BPE maximizes).  Counts are exact integers; PMI is one
# ln at a rational point quantized at the edge.  Top-20 by (PMI, pair).
# ---------------------------------------------------------------------------
@register(
    "pmi_collocations_topk",
    """
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           w -> w <> '') AS t
        FROM documents WHERE text IS NOT NULL
    ),
    uni AS (
        SELECT w, COUNT(*) AS c FROM (SELECT unnest(t) AS w FROM toks)
        GROUP BY w
    ),
    tot AS (SELECT SUM(c) AS n FROM uni),
    big AS (
        SELECT u['p'] AS a, u['w'] AS b, COUNT(*) AS c2
        FROM (
            SELECT unnest([{'p': t[i-1], 'w': t[i]}
                           FOR i IN generate_series(2, len(t))]) AS u
            FROM toks
        ) GROUP BY u['p'], u['w']
        HAVING COUNT(*) >= 5
    )
    SELECT big.a, big.b, CAST(big.c2 AS BIGINT) AS n_pair,
           FLOOR(ln(big.c2 * CAST(tot.n AS DOUBLE)
                    / (ca.c * CAST(cb.c AS DOUBLE)))
                 * 1e6 + 0.5) / 1e6 AS pmi
    FROM big
    JOIN uni ca ON ca.w = big.a
    JOIN uni cb ON cb.w = big.b
    CROSS JOIN tot
    ORDER BY pmi DESC, big.a, big.b
    LIMIT 20
    """,
    doc="PMI collocations: top-20 adjacent word pairs by pointwise "
    "mutual information (min pair count 5) — multi-word-expression / "
    "BPE-merge-candidate detection from exact integer counts",
)
def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    toks = docs.select(
        "doc_id",
        F.posexplode(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"),
                lambda t: t != F.lit(""),
            )
        ).alias("pos", "w"),
    )
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    tot = uni.agg(F.sum("c").alias("n"))
    wd = Window.partitionBy("doc_id").orderBy("pos")
    big = (
        toks.withColumn("a", F.lag("w").over(wd))
        .filter(F.col("a").isNotNull())
        .groupBy("a", F.col("w").alias("b"))
        .agg(F.count(F.lit(1)).alias("c2"))
        .filter(F.col("c2") >= 5)
    )
    ca = uni.select(F.col("w").alias("a"), F.col("c").alias("ca"))
    cb = uni.select(F.col("w").alias("b"), F.col("c").alias("cb"))
    scored = (
        big.join(ca, "a")
        .join(cb, "b")
        .crossJoin(F.broadcast(tot))
        .select(
            "a",
            "b",
            F.col("c2").cast("bigint").alias("n_pair"),
            dround(
                F.log(
                    F.col("c2")
                    * F.col("n").cast("double")
                    / (F.col("ca") * F.col("cb").cast("double"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.col("pmi").desc(), "a", "b").limit(20)


# ---------------------------------------------------------------------------
# Tokenizer phrase-merge training (word2phrase / word-level-BPE): three
# greedy merge steps, each taking the corpus-wide most frequent
# adjacent token pair and fusing it into one token before the next
# count — the iterative vocabulary-construction loop behind phrase
# embeddings and (at character level) BPE tokenizers.  FULLY
# DECLARATIVE: each step's winning rule is a one-row aggregate
# broadcast back into a left-to-right all-occurrence string replace
# (' a b ' → ' a_b '), so no driver collect touches data and both
# engines replay the identical greedy sequence.  Emits the learned
# merge table (step, left, right, n_pair).
# ---------------------------------------------------------------------------
_BPE_STEPS = 3


def _bpe_oracle_sql() -> str:
    toks = (
        "' ' || array_to_string(list_filter("
        "string_split_regex(lower(text), '\\s+'), w -> w <> ''), ' ') || ' '"
    )
    parts = [
        f"""
    s1 AS (SELECT doc_id, {toks} AS s FROM documents WHERE text IS NOT NULL)"""
    ]
    for i in range(1, _BPE_STEPS + 1):
        parts.append(f"""
    p{i} AS (
        SELECT t[j] AS l, t[j+1] AS r, COUNT(*) AS c
        FROM (SELECT string_split(trim(s), ' ') AS t FROM s{i}),
             LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS j)
        GROUP BY t[j], t[j+1]
    ),
    r{i} AS (SELECT l, r, c FROM p{i} ORDER BY c DESC, l, r LIMIT 1)""")
        if i < _BPE_STEPS:
            parts.append(f"""
    s{i + 1} AS (
        SELECT doc_id,
               replace(s, ' ' || r{i}.l || ' ' || r{i}.r || ' ',
                       ' ' || r{i}.l || '_' || r{i}.r || ' ') AS s
        FROM s{i} CROSS JOIN r{i}
    )""")
    selects = " UNION ALL ".join(
        f"SELECT {i} AS step, l AS left_tok, r AS right_tok, "
        f"CAST(c AS BIGINT) AS n_pair FROM r{i}"
        for i in range(1, _BPE_STEPS + 1)
    )
    return "WITH " + ",".join(parts) + " " + selects


@register(
    "bpe_phrase_merges",
    _bpe_oracle_sql(),
    doc="word2phrase/BPE-style greedy merge training: 3 steps of "
    "most-frequent-adjacent-pair fusion, each rule a one-row broadcast "
    "applied as a left-to-right string replace — the iterative "
    "vocabulary-construction loop, fully declarative (zero driver "
    "collects) and oracle-checked step for step",
)
def q_bpe_phrase_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    s = docs.select(
        "doc_id",
        F.concat(
            F.lit(" "),
            F.concat_ws(
                " ",
                F.filter(
                    F.split(F.lower(F.col("text")), r"\s+"),
                    lambda t: t != F.lit(""),
                ),
            ),
            F.lit(" "),
        ).alias("s"),
    )
    outs = []
    for step in range(1, _BPE_STEPS + 1):
        t = F.split(F.trim(F.col("s")), " ")
        pairs = s.select(
            F.explode(
                F.arrays_zip(
                    F.slice(t, 1, F.size(t) - 1).alias("l"),
                    F.slice(t, 2, F.size(t) - 1).alias("r"),
                )
            ).alias("p")
        ).select(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        rule = (
            pairs.groupBy("l", "r")
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.col("c").desc(), "l", "r")
            .limit(1)
            # materialize the 1-row rule once: it is consumed TWICE (as
            # an output row and broadcast into the next step's replace),
            # and without this each consumer — and every deeper step's
            # chain — re-executed the whole tokenize+explode+aggregate
            # pass (5 heavy passes for 3 steps instead of 3; guide §1.2
            # "don't compute things you throw away").  The final union
            # is then three trivial scans of checkpointed rows, and the
            # heavy work runs exactly once per step inside this eager
            # materialization.  Still zero driver collects: the rule
            # stays a (checkpointed) DataFrame.
            .localCheckpoint(eager=True)
        )
        outs.append(
            rule.select(
                F.lit(step).alias("step"),
                F.col("l").alias("left_tok"),
                F.col("r").alias("right_tok"),
                F.col("c").cast("bigint").alias("n_pair"),
            )
        )
        if step < _BPE_STEPS:
            s = s.crossJoin(F.broadcast(rule)).select(
                "doc_id",
                F.expr(
                    "replace(s, ' ' || l || ' ' || r || ' ', "
                    "' ' || l || '_' || r || ' ')"
                ).alias("s"),
            )
    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out


# ---------------------------------------------------------------------------
# Class-based TF-IDF (the BERTopic c-TF-IDF formula): W(t,c) =
# tf_{t,c} · ln(1 + A / f_t), where A is the average token count per
# class and f_t the corpus frequency of t — the topic/cluster LABELING
# statistic (top terms that characterize a class against the corpus).
# Classes here are languages; over IVF cells it labels embedding
# clusters.  Counts are exact integers, ln at one rational point per
# term, top-5 per class with pinned tiebreaks.
# ---------------------------------------------------------------------------
@register(
    "ctfidf_terms_by_lang",
    """
    WITH toks AS (
        SELECT lang,
               unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                  w -> w <> '')) AS w
        FROM documents WHERE text IS NOT NULL
    ),
    tfc AS (SELECT lang, w, COUNT(*) AS tf FROM toks GROUP BY lang, w),
    ft AS (SELECT w, COUNT(*) AS f FROM toks GROUP BY w),
    a AS (SELECT COUNT(*) / CAST((SELECT COUNT(DISTINCT lang) FROM toks)
                                 AS DOUBLE) AS avg_class FROM toks),
    scored AS (
        SELECT tfc.lang, tfc.w,
               FLOOR(tfc.tf * ln(1.0 + a.avg_class / ft.f) * 1e6 + 0.5)
                   / 1e6 AS score
        FROM tfc JOIN ft ON ft.w = tfc.w CROSS JOIN a
    )
    SELECT lang, w AS term, score, CAST(rn AS INT) AS rank
    FROM (
        SELECT lang, w, score,
               ROW_NUMBER() OVER (
                   PARTITION BY lang ORDER BY score DESC, w
               ) AS rn
        FROM scored
    )
    WHERE rn <= 5
    """,
    doc="class-based TF-IDF (BERTopic c-TF-IDF): top-5 characterizing "
    "terms per language — tf_class · ln(1 + avg_class_tokens/corpus_f) "
    "from exact integer counts; the cluster/topic labeling statistic",
)
def q_ctfidf_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    toks = docs.select(
        "lang",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"),
                lambda t: t != F.lit(""),
            )
        ).alias("w"),
    )
    tfc = toks.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("tf"))
    ft = toks.groupBy("w").agg(F.count(F.lit(1)).alias("f"))
    a = toks.agg(
        (
            F.count(F.lit(1))
            / F.count_distinct(F.col("lang")).cast("double")
        ).alias("avg_class")
    )
    scored = (
        tfc.join(ft, "w")
        .crossJoin(F.broadcast(a))
        .select(
            "lang",
            "w",
            dround(
                F.col("tf")
                * F.log(F.lit(1.0) + F.col("avg_class") / F.col("f")),
                6,
            ).alias("score"),
        )
    )
    wr = Window.partitionBy("lang").orderBy(F.col("score").desc(), "w")
    return (
        scored.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= 5)
        .select(
            "lang",
            F.col("w").alias("term"),
            "score",
            F.col("rn").cast("int").alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# BFS shortest-path layers from a seed over the same customer↔supplier
# transaction graph PageRank uses: 3 frontier expansions, each one
# equi-join + distinct + anti-join against the visited set, with the
# frontier/visited state localCheckpointed per hop exactly like the
# PageRank ranks (state = 1 string + 1 int per node; lineage stays one
# hop deep).  Oracle = bounded recursive CTE taking MIN(depth) per
# node — the textbook shortest-path fixpoint.
# ---------------------------------------------------------------------------
_BFS_SEED, _BFS_HOPS = "c1", 3


@register(
    "graph_bfs_layers",
    f"""
    WITH RECURSIVE e0 AS (
        SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS s,
                        's' || CAST(l.l_suppkey AS VARCHAR) AS t
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    sym AS (SELECT s, t FROM e0 UNION ALL SELECT t, s FROM e0),
    walk(node, d) AS (
        SELECT '{_BFS_SEED}', 0
        UNION
        SELECT sym.t, walk.d + 1 FROM walk JOIN sym ON sym.s = walk.node
        WHERE walk.d < {_BFS_HOPS}
    ),
    lv AS (SELECT node, MIN(d) AS level FROM walk GROUP BY node)
    SELECT CAST(level AS INT) AS level,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           MIN(node) AS first_node
    FROM lv GROUP BY level
    """,
    doc="BFS shortest-path layers (3 hops) from a seed customer over "
    "the customer↔supplier graph: per-hop frontier expansion with "
    "visited-set anti-join and per-hop localCheckpoint — the iterative "
    "traversal complement to PageRank; oracle is a depth-bounded "
    "recursive CTE with MIN(depth) per node",
)
def q_bfs_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import anti_join

    edges = spark.read.parquet(graph_edges_path(spark, sf_dir)).select(
        "src", "dst"
    )
    visited = spark.createDataFrame(
        [(_BFS_SEED, 0)], "node string, level int"
    ).localCheckpoint(eager=True)
    frontier = visited.select("node")
    for lvl in range(1, _BFS_HOPS + 1):
        nxt = (
            edges.join(frontier, edges.src == frontier.node)
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        nxt = (
            anti_join(nxt, visited.select("node"), ["node"])
            .withColumn("level", F.lit(lvl))
            .localCheckpoint(eager=True)
        )
        visited = visited.union(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("node")
    return visited.groupBy("level").agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.min("node").alias("first_node"),
    )


# ---------------------------------------------------------------------------
# Gini coefficient of order value per nation — the inequality statistic
# behind data-mixture and spend-concentration monitoring.  Exact
# integer/DECIMAL core: rank via ROW_NUMBER over (value, orderkey),
# Σv and Σ(v·i) as exact DECIMAL folds, the classic closed form
# G = (2·Σ(i·v_i) − (n+1)·Σv) / (n·Σv) evaluated as one double
# division at the edge.  One window shuffle + one aggregate.
# ---------------------------------------------------------------------------
@register(
    "gini_order_value_by_nation",
    """
    WITH x AS (
        SELECT n.n_name,
               CAST(o.o_totalprice AS DECIMAL(22,6)) AS v,
               o.o_orderkey
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
    ),
    r AS (
        SELECT n_name, v,
               ROW_NUMBER() OVER (PARTITION BY n_name
                                  ORDER BY v, o_orderkey) AS i
        FROM x
    ),
    s AS (
        SELECT n_name, COUNT(*) AS n, SUM(v) AS sv, SUM(v * i) AS svi
        FROM r GROUP BY n_name
    )
    SELECT n_name, CAST(n AS BIGINT) AS n_orders,
           FLOOR(CAST(2 * svi - (n + 1) * sv AS DOUBLE)
                 / CAST(n * sv AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
               AS gini
    FROM s
    """,
    doc="Gini coefficient of order value per nation: closed-form "
    "G = (2·Σ(i·v_i) − (n+1)·Σv)/(n·Σv) with exact DECIMAL rank-"
    "weighted sums and a single IEEE-pure double division at the edge; "
    "one window shuffle + one aggregate",
)
def q_gini_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey",
        F.col("o_totalprice").cast("decimal(22,6)").alias("v"),
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    x = o.join(c, o.o_custkey == c.c_custkey).join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    )
    w = Window.partitionBy("n_name").orderBy("v", "o_orderkey")
    r = x.select("n_name", "v", F.row_number().over(w).alias("i"))
    s = r.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("sv"),
        F.sum(F.col("v") * F.col("i")).alias("svi"),
    )
    num = (F.lit(2) * F.col("svi") - (F.col("n") + 1) * F.col("sv")).cast("double")
    den = (F.col("n") * F.col("sv")).cast("double")
    return s.select(
        "n_name",
        F.col("n").cast("bigint").alias("n_orders"),
        dround(num / den, 6).alias("gini"),
    )


# ---------------------------------------------------------------------------
# Longest consecutive-day activity streak per user (gaps-and-islands on
# calendar days): distinct (user, day) → per-user day rank → island
# anchor = day − rank·1d → longest island.  The engagement-streak
# statistic every activity dashboard wants; two key-partitioned window
# passes, no self-join.  Top-20 by streak with (user) tiebreaker.
# ---------------------------------------------------------------------------
@register(
    "user_activity_streaks",
    """
    WITH days AS (
        SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events
    ),
    ranked AS (
        SELECT user_id, d,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS rn
        FROM days
    ),
    islands AS (
        SELECT user_id, d - to_days(CAST(rn AS INT)) AS anchor,
               COUNT(*) AS streak
        FROM ranked GROUP BY user_id, anchor
    )
    SELECT user_id, CAST(MAX(streak) AS BIGINT) AS longest_streak
    FROM islands GROUP BY user_id
    ORDER BY longest_streak DESC, user_id LIMIT 20
    """,
    doc="longest consecutive-day activity streak per user via "
    "gaps-and-islands (day − row_number·1d anchor), no self-join; "
    "top-20 with user tiebreaker",
)
def q_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    ranked = e.withColumn("rn", F.row_number().over(w))
    islands = (
        ranked.select(
            "user_id",
            F.expr("d - make_dt_interval(rn, 0, 0, 0)").alias("anchor"),
        )
        .groupBy("user_id", "anchor")
        .agg(F.count(F.lit(1)).alias("streak"))
    )
    return (
        islands.groupBy("user_id")
        .agg(F.max("streak").cast("bigint").alias("longest_streak"))
        .orderBy(F.col("longest_streak").desc(), "user_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Time-weighted average value per user (TWAP): each observation holds
# until the user's next event, so the average weights each value by its
# holding duration — the financial/metrics-correct mean for irregular
# sampling (an unweighted AVG over-counts burst periods).  Exact core:
# value quantized to 1e-6 fixed-point BIGINT (IEEE-pure), durations as
# integer microseconds from the ns-precision event time, Σ(v·dt) folded
# in exact wide-integer arithmetic (Spark DECIMAL(38,0) ⇔ DuckDB
# HUGEINT), one double division at the edge.  One (user_id) window
# shuffle reused by the final aggregate.
# ---------------------------------------------------------------------------
@register(
    "twap_user_values",
    """
    WITH seq AS (
        SELECT user_id, value, ts, event_id,
               LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS nts
        FROM events
    ),
    d AS (
        SELECT user_id,
               CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT) AS vmu,
               (epoch_ns(nts) - epoch_ns(ts)) // 1000 AS dt_us
        FROM seq WHERE nts IS NOT NULL
    )
    SELECT user_id,
           FLOOR(CAST(SUM(CAST(vmu AS HUGEINT) * dt_us) AS DOUBLE)
                 / CAST(SUM(dt_us) AS DOUBLE) / 1e6 * 1000000.0 + 0.5)
               / 1000000.0 AS twap,
           CAST(SUM(dt_us) // 1000000 AS BIGINT) AS span_s
    FROM d GROUP BY user_id
    ORDER BY twap DESC, user_id LIMIT 20
    """,
    doc="time-weighted average value per user (TWAP): values weighted "
    "by holding duration until the next event; 1e-6 fixed-point values "
    "× integer-microsecond durations folded exactly (DECIMAL(38,0) ⇔ "
    "HUGEINT), one double division at the edge; top-20 with user "
    "tiebreaker",
)
def q_twap_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "value", "ts", "event_id", "ts_nanos"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.withColumn("nns", F.lead("ts_nanos").over(w)).filter(
        F.col("nns").isNotNull()
    )
    d = seq.select(
        "user_id",
        F.floor(F.col("value") * F.lit(1e6) + F.lit(0.5))
        .cast("bigint")
        .alias("vmu"),
        F.expr("(nns - ts_nanos) div 1000").alias("dt_us"),
    )
    agg = d.groupBy("user_id").agg(
        F.sum(F.col("vmu").cast("decimal(38,0)") * F.col("dt_us")).alias("num"),
        F.sum("dt_us").alias("den"),
    )
    return (
        agg.select(
            "user_id",
            dround(
                F.col("num").cast("double") / F.col("den").cast("double")
                / F.lit(1e6),
                6,
            ).alias("twap"),
            F.expr("den div 1000000").cast("bigint").alias("span_s"),
        )
        .orderBy(F.col("twap").desc(), "user_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Vocabulary growth curve (the Heaps'-law statistic): after each
# document, the cumulative token count and cumulative distinct
# vocabulary — the curve whose log-log slope is the Heaps exponent,
# watched to detect corpus saturation (new data stops adding words).
# Exact integers only, so fully hash-checkable.
#
# The cumulative sums use the SCALABLE two-phase prefix pattern, not a
# single global window: running sums are computed within doc-id blocks
# (parallel, partitioned by block), block totals are prefix-summed on
# the tiny block table, and the block offset joins back by block id —
# O(N/B) rows ever see a single-partition window.  The oracle uses the
# plain global window (it doesn't need to scale).
# ---------------------------------------------------------------------------
_VG_BLOCK, _VG_EVERY = 256, 100


@register(
    "vocab_growth_curve",
    f"""
    WITH d AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           w -> w <> '') AS ws
        FROM documents
    ),
    ntok AS (SELECT doc_id, len(ws) AS n FROM d),
    tok AS (
        SELECT DISTINCT doc_id, t.tok
        FROM d, UNNEST(d.ws) AS t(tok)
    ),
    first_doc AS (SELECT tok, MIN(doc_id) AS fd FROM tok GROUP BY tok),
    newv AS (SELECT fd AS doc_id, COUNT(*) AS nv FROM first_doc GROUP BY fd),
    base AS (
        SELECT ntok.doc_id, ntok.n, COALESCE(newv.nv, 0) AS nv
        FROM ntok LEFT JOIN newv ON ntok.doc_id = newv.doc_id
    )
    SELECT doc_id,
           CAST(SUM(n) OVER (ORDER BY doc_id) AS BIGINT) AS cum_tokens,
           CAST(SUM(nv) OVER (ORDER BY doc_id) AS BIGINT) AS cum_vocab
    FROM base
    QUALIFY doc_id % {_VG_EVERY} = 0
    """,
    doc="vocabulary growth curve (Heaps'-law points): cumulative tokens "
    "vs cumulative distinct vocabulary after each document, sampled "
    "every 100 docs — exact integers via a two-phase (block-partial + "
    "block-offset) prefix sum, never a full-corpus single-partition "
    "window",
)
def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ws = F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda w: w != ""
    )
    d = docs.select("doc_id", ws.alias("ws"))
    ntok = d.select("doc_id", F.size("ws").alias("n"))
    tok = d.select(
        "doc_id", F.explode(F.array_distinct("ws")).alias("tok")
    )
    first_doc = tok.groupBy("tok").agg(F.min("doc_id").alias("fd"))
    newv = first_doc.groupBy(F.col("fd").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("nv")
    )
    base = ntok.join(newv, "doc_id", "left").select(
        "doc_id",
        "n",
        F.coalesce(F.col("nv"), F.lit(0)).alias("nv"),
        (F.col("doc_id") / _VG_BLOCK).cast("bigint").alias("blk"),
    )
    # phase 1: running sums WITHIN each block (parallel across blocks)
    wb = (
        Window.partitionBy("blk")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    part = base.select(
        "doc_id", "blk",
        F.sum("n").over(wb).alias("run_n"),
        F.sum("nv").over(wb).alias("run_nv"),
    )
    # phase 2: per-block totals → exclusive prefix offsets (the ONLY
    # single-partition window, over N/B tiny rows)
    totals = base.groupBy("blk").agg(
        F.sum("n").alias("tn"), F.sum("nv").alias("tnv")
    )
    wo = Window.orderBy("blk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "blk",
        F.coalesce(F.sum("tn").over(wo), F.lit(0)).alias("off_n"),
        F.coalesce(F.sum("tnv").over(wo), F.lit(0)).alias("off_nv"),
    )
    return (
        part.join(F.broadcast(offsets), "blk")
        .filter(F.col("doc_id") % _VG_EVERY == 0)
        .select(
            "doc_id",
            (F.col("run_n") + F.col("off_n")).cast("bigint").alias("cum_tokens"),
            (F.col("run_nv") + F.col("off_nv")).cast("bigint").alias("cum_vocab"),
        )
    )
