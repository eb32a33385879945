"""BM25 text retrieval: inverted-index-style scoring as DataFrame ops.

The reference framework has no retrieval surface (it is an ingestion
library; see SURVEY.md §0) — this is a north-star extension operator for
training-data curation: given a small set of keyword queries, rank the
corpus by Okapi BM25 and keep the top-k hits per query.

Shape (the part that must survive 100 TB):

- the corpus side is ``explode → (doc, term) tf`` + a doc-length table —
  two partial-aggregated shuffles over the token stream, the same shape a
  distributed inverted-index build uses;
- the query side (a handful of terms) and the document-frequency table
  (|vocab| rows) are **broadcast** — the big tf table is never shuffled by
  anything but its own aggregation keys;
- per-term score contributions are rounded to fixed-point **before** the
  per-(query, doc) sum, so the sum is integer arithmetic — associative,
  order-independent, and bit-identical in any engine (the same trick the
  TPC-H money sums use; see q9 in queries_tpch.py);
- top-k per query is a ``row_number`` window over (score desc, doc_id),
  which Spark executes with a partial WindowGroupLimit before the final
  exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from arcane_framework_spark.operators.cache import scoped_persist
from arcane_framework_spark.operators.text import tokens_expr

#: Okapi BM25 defaults.
BM25_K1 = 1.2
BM25_B = 0.75

#: Shared pool depth for the literal-query rankers: the RRF fusion pool
#: (Cormack et al. 2009) and the single-ranker entries all rank against
#: this depth and filter their own k on top, so the pooled subtrees are
#: byte-identical and session prep can persist each ranking ONCE for
#: every consumer. Top-k of a deterministic total order is a prefix of
#: top-POOL, so the smaller-k entries' rows are unchanged.
RETRIEVAL_POOL_K = 20


def _literal_qterms(spark: SparkSession,
                    queries: dict[int, list[str]]) -> DataFrame:
    """(query_id, term) rows built from LITERAL expressions, not
    ``createDataFrame``: a parallelized local collection plans as an
    ExistingRDD whose canonicalized form embeds the RDD id — never equal
    across two calls — which silently defeats CacheManager plan matching
    for every consumer above it (the connected-components gotcha, hit
    here by the pooled-ranking prep sharing). A Range+explode(array(...))
    plan canonicalizes identically on every call; same rows either way."""
    pairs = [
        F.struct(
            F.lit(qid).cast("int").alias("query_id"),
            F.lit(t).alias("term"),
        )
        for qid, terms in sorted(queries.items())
        for t in terms
    ]
    return (
        spark.range(1)
        .select(F.explode(F.array(*pairs)).alias("qt"))
        .select("qt.query_id", "qt.term")
    )
#: Fixed-point scale for per-term contributions (6 decimal places).
BM25_FP = 1_000_000

#: Keyword queries evaluated by the ``bm25_topk_documents`` catalog entry.
BM25_QUERIES: dict[int, list[str]] = {
    1: ["hash", "join", "dup"],
    2: ["scan", "filter", "vector"],
    3: ["spark", "window", "group"],
    4: ["sort", "order", "key"],
}


def term_frequencies(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(id, term, tf) for every non-empty whitespace token."""
    terms = docs.select(
        id_col, F.explode(tokens_expr(text_col)).alias("term")
    ).filter(F.col("term") != "")
    return terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))


def bm25_topk(spark: SparkSession, docs: DataFrame,
              queries: dict[int, list[str]] | None = None,
              k: int = 5, k1: float = BM25_K1, b: float = BM25_B,
              id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Top-k documents per keyword query under Okapi BM25.

    ``idf = ln((N - df + 0.5) / (df + 0.5) + 1)`` (the Lucene-style
    always-positive variant); ``N`` and ``avgdl`` are both taken over the
    *indexed* documents (≥1 token) and stay IN-PLAN as a broadcast 1-row
    aggregate — the whole ranking is a single job with no driver action.

    Returns ``(query_id, doc_id, score, rank)`` with rank 1..k per query.
    """
    queries = queries if queries is not None else BM25_QUERIES
    qterms = _literal_qterms(spark, queries)
    return bm25_rank(docs, qterms, k, k1, b, id_col, text_col)


def bm25_rank(docs: DataFrame, qterms: DataFrame, k: int = 5,
              k1: float = BM25_K1, b: float = BM25_B,
              id_col: str = "doc_id",
              text_col: str = "text",
              broadcast_queries: bool = True) -> DataFrame:
    """BM25 core over a (query_id, term) DataFrame — shared by the
    literal-query entry point and the corpus-derived self-retrieval
    evaluation. ``broadcast_queries`` fits the literal path (a handful
    of terms); corpus-derived query tables grow with the corpus and
    MUST pass False so the term join shuffles instead of forcing a
    driver-collected broadcast."""
    from arcane_framework_spark.operators.scale import with_broadcast_scalar

    # tf feeds three consumers (dl, df, the scored join) — persist it so the
    # tokenize+explode+aggregate lineage runs once, not three times.
    tf = scoped_persist(term_frequencies(docs, id_col, text_col))
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    df_tbl = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    scalars = dl.agg(
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("__avgdl"),
        F.count(F.lit(1)).cast("double").alias("__n_docs"),
    )

    idf = F.log(
        (F.col("__n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    tf_d = F.col("tf").cast("double")
    denom = tf_d + F.lit(k1) * (
        F.lit(1.0 - b)
        + F.lit(b) * F.col("dl").cast("double") / F.col("__avgdl")
    )
    contrib = idf * (tf_d * F.lit(k1 + 1.0)) / denom

    q_side = F.broadcast(qterms) if broadcast_queries else qterms
    # The term-df broadcast must be QUERY-bounded, not vocabulary-
    # bounded: df_tbl has one row per distinct corpus term, which grows
    # with the corpus — hard-broadcasting it is a driver-collect bomb at
    # scale. Semi-join it to the query terms FIRST (the surviving rows
    # are bounded by the query vocabulary; semi-join needs no distinct),
    # then broadcast only on the literal-query path where that bound is
    # a handful of terms; corpus-derived query tables keep the
    # relational join and let AQE decide (round-13 verdict #1).
    q_term_set = qterms.select("term")
    df_q = df_tbl.join(
        F.broadcast(q_term_set) if broadcast_queries else q_term_set,
        "term", "left_semi",
    )
    # NOTE (r14 opt): computing contrib_fp per (term, doc) BEFORE the
    # query join (it is query-independent) was tried and measured
    # consistently SLOWER (3-pass A/B at sf0.1: 2.3-3.6s this shape vs
    # 3.9-4.6s restructured, outputs identical) — the extra projection
    # barrier between the broadcast joins costs more than moving the
    # ln/divide off the 4M-row path saves. Keep the single fused chain.
    scored = with_broadcast_scalar(
        tf.join(q_side, "term")
        .join(dl, id_col)
        .join(F.broadcast(df_q) if broadcast_queries else df_q, "term"),
        scalars,
    ).select(
        "query_id",
        id_col,
        F.floor(contrib * F.lit(float(BM25_FP)) + F.lit(0.5))
        .cast("long")
        .alias("contrib_fp"),
    )
    totals = scored.groupBy("query_id", id_col).agg(
        F.sum("contrib_fp").alias("score_fp")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_fp").desc(), F.col(id_col)
    )
    return (
        totals.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            id_col,
            F.round(F.col("score_fp").cast("double") / F.lit(float(BM25_FP)), 6)
            .alias("score"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# Inverted-index posting lists
# ---------------------------------------------------------------------------

#: Cap on docs listed per token: hot tokens (stopwords) would otherwise
#: make single posting rows unboundedly wide. n_docs still reports the
#: TRUE document frequency before the cap.
MAX_POSTINGS = 8


def posting_lists(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text",
                  max_postings: int = MAX_POSTINGS) -> DataFrame:
    """Mini inverted index: (token, n_docs, postings) where postings is
    the flattened string ``doc:pos|pos;doc:pos`` for the ``max_postings``
    lowest-id documents containing the token (positions ascending,
    0-based).

    The indexing kernel of distributed retrieval: token positions are
    emitted map-side (posexplode); per-(token, doc) position runs are
    ONE aggregation. The true document frequency comes from a separate
    map-side-combinable count (joined back on the token-type-scale
    result), which leaves the cap as a BARE rank window + filter — the
    shape Spark rewrites into a partial map-side WindowGroupLimit, so a
    stopword token's millions of posting rows are trimmed to
    ``max_postings`` per map task BEFORE the window exchange instead of
    funnelling through one partition (plan-guarded in
    tests/test_plans.py). The output is token-TYPE scale with bounded
    row width — safe to broadcast or hash-join against query terms at
    any corpus size. Postings serialize as deterministic strings
    (sorted positions, doc-id order) rather than nested arrays so
    downstream hashing / engine comparison is byte-stable.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens_expr(text_col)).alias("pos", "token"),
    ).filter(F.col("token") != "")
    per_doc = toks.groupBy("token", "doc_id").agg(
        F.concat_ws(
            "|",
            F.transform(
                F.array_sort(F.collect_list("pos")),
                lambda p: p.cast("string"),
            ),
        ).alias("__positions"),
    ).transform(scoped_persist)
    df_counts = per_doc.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    w_rank = Window.partitionBy("token").orderBy("doc_id")
    ranked = per_doc.withColumn("__rk", F.row_number().over(w_rank))
    return (
        ranked.filter(F.col("__rk") <= max_postings)
        .groupBy("token")
        .agg(
            F.concat_ws(
                ";",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("doc_id"),
                                F.col("__positions").alias("positions"),
                            )
                        )
                    ),
                    lambda s: F.concat_ws(
                        ":", s.doc_id.cast("string"), s.positions
                    ),
                ),
            ).alias("postings"),
        )
        .join(df_counts, "token")
        .select("token", "n_docs", "postings")
    )


def bm25_core_sql(q_cte: str, tail: str,
                  k1: float = BM25_K1, b: float = BM25_B) -> str:
    """DuckDB spelling of the BM25 core, parameterized on the query CTE
    and the final select — ONE copy of the scoring math for both the
    literal-query oracle and the self-retrieval oracle (mirrors how the
    Spark side shares ``bm25_rank``). Float literals are rendered from
    the same Python doubles the Spark plan embeds."""
    k1s = repr(float(k1))
    k1p1 = repr(float(k1 + 1.0))
    one_minus_b = repr(float(1.0 - b))
    bs = repr(float(b))
    return rf"""
WITH terms AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM terms WHERE term <> ''
  GROUP BY doc_id, term
),
dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY doc_id),
dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
stats AS (
  SELECT count(*)::DOUBLE AS n_docs,
         sum(dl)::DOUBLE / count(*)::DOUBLE AS avgdl
  FROM dl
),
{q_cte},
contrib AS (
  SELECT q.query_id, tf.doc_id,
         CAST(floor(
           ln((n_docs - df::DOUBLE + 0.5::DOUBLE) / (df::DOUBLE + 0.5::DOUBLE)
              + 1.0::DOUBLE)
           * (tf::DOUBLE * {k1p1}::DOUBLE)
           / (tf::DOUBLE + {k1s}::DOUBLE
              * ({one_minus_b}::DOUBLE
                 + {bs}::DOUBLE * dl::DOUBLE / avgdl))
           * {float(BM25_FP)!r}::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS contrib_fp
  FROM tf JOIN q USING (term) JOIN dl USING (doc_id) JOIN dfs USING (term)
  CROSS JOIN stats
),
totals AS (
  SELECT query_id, doc_id, sum(contrib_fp)::BIGINT AS score_fp
  FROM contrib GROUP BY query_id, doc_id
),
ranked AS (
  SELECT query_id, doc_id, score_fp,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score_fp DESC, doc_id) AS rank
  FROM totals
)
{tail}
"""


# ---------------------------------------------------------------------------
# Self-retrieval evaluation (MRR@k)
# ---------------------------------------------------------------------------

SELF_RETRIEVAL_MOD = 25
SELF_RETRIEVAL_QTOKENS = 6
SELF_RETRIEVAL_K = 10
#: Governed mode's fixed query budget: the sample modulus is derived
#: in-plan as ``max(1, n_docs // TARGET)`` so the eval stays ~TARGET
#: queries at ANY corpus size.
SELF_RETRIEVAL_TARGET = 200


def bm25_self_retrieval(docs: DataFrame,
                        sample_mod: int | None = SELF_RETRIEVAL_MOD,
                        q_tokens: int = SELF_RETRIEVAL_QTOKENS,
                        k: int = SELF_RETRIEVAL_K,
                        id_col: str = "doc_id",
                        text_col: str = "text",
                        target_queries: int | None = None) -> DataFrame:
    """Retrieval-quality evaluation without labels: every ``sample_mod``-th
    document's first ``q_tokens`` tokens become a query whose ONLY
    relevant document is its own source; report
    (n_queries, n_hits, mrr) at cutoff ``k``.

    The standard proxy eval for a corpus index (chunk->source recall).
    The query table is corpus-DERIVED and distributed (no driver-side
    literals); MRR is averaged over fixed-point reciprocal ranks
    (floor(1e6/rank) integers) so the aggregate is exact in both
    engines. Queries that miss entirely contribute 0 (counted in
    n_queries via a separate tiny aggregate).

    **Scale governance**: with a FIXED ``sample_mod`` the query count
    grows with the corpus while each query's candidate set also grows —
    quadratic total work (measured: 42x time at 10x corpus in
    tools/stress.py before this mode existed). Pass
    ``target_queries=T`` (and ``sample_mod=None``) to derive the
    modulus IN-PLAN as ``max(1, n_docs // T)`` from a broadcast 1-row
    count — the evaluation stays ~T queries at any corpus size, so
    total cost is linear in the corpus: the same broadcast-scalar
    governance pattern as lsh_recall's sample and semantic_dedup's
    cell count.
    """
    if (sample_mod is None) == (target_queries is None):
        raise ValueError("exactly one of sample_mod / target_queries")
    if target_queries is not None:
        from arcane_framework_spark.operators.scale import (
            with_broadcast_scalar,
        )

        mod_df = docs.agg(F.count(F.lit(1)).alias("__n")).select(
            F.greatest(
                F.lit(1).cast("long"),
                F.floor(F.col("__n") / target_queries).cast("long"),
            ).alias("__mod")
        )
        sampled = (
            with_broadcast_scalar(docs, mod_df)
            .filter(F.col(id_col) % F.col("__mod") == 0)
            .select(*docs.columns)
        )
    else:
        sampled = docs.filter(F.col(id_col) % sample_mod == 0)
    # persisted: feeds both the scored join and the n_queries count —
    # the sample+tokenize+distinct lineage runs once.
    qterms = scoped_persist(
        sampled.select(
            F.col(id_col).alias("query_id"),
            F.explode(
                F.slice(tokens_expr(text_col), 1, q_tokens)
            ).alias("term"),
        )
        .filter(F.col("term") != "")
        .distinct()
    )
    ranked = bm25_rank(docs, qterms, k=k, id_col=id_col,
                       text_col=text_col, broadcast_queries=False)
    hits = (
        ranked.filter(F.col(id_col) == F.col("query_id"))
        .groupBy("query_id")
        .agg(F.min("rank").alias("__r"))
        .select(
            "query_id",
            F.floor(F.lit(1_000_000) / F.col("__r")).cast("long").alias(
                "__m"
            ),
        )
    )
    n_q = qterms.select("query_id").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_queries")
    )
    from arcane_framework_spark.operators.scale import (
        with_broadcast_scalar,
    )

    agg = hits.agg(
        F.count(F.lit(1)).cast("long").alias("n_hits"),
        F.coalesce(F.sum("__m"), F.lit(0)).cast("long").alias("__sm"),
    )
    return with_broadcast_scalar(agg, n_q).select(
        "n_queries",
        "n_hits",
        # 0-query corpora: 0/0 is NULL in both engines; report 0.0.
        F.when(F.col("n_queries") == 0, F.lit(0.0)).otherwise(
            F.floor(F.col("__sm") / F.col("n_queries") + F.lit(0.5)) / 1e6
        ).alias("mrr"),
    )


# ---------------------------------------------------------------------------
# Dirichlet-smoothed query likelihood (LM retrieval)
# ---------------------------------------------------------------------------

#: Dirichlet prior mass. The classic default is 2000; the catalog entry
#: passes 50 because the synthetic docs average ~54 tokens — 2000 would
#: drown every document signal in the collection model.
QL_MU = 2000.0


def query_likelihood_topk(spark: SparkSession, docs: DataFrame,
                          queries: dict[int, list[str]] | None = None,
                          k: int = 5, mu: float = QL_MU,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Top-k docs per query under the Dirichlet-smoothed query-likelihood
    language model (Zhai & Lafferty 2001): ``score(q,d) = Σ_t ln((tf +
    μ·p(t|C)) / (dl + μ))`` — the standard LM alternative to BM25.

    Sparse decomposition keeps the plan inverted-index shaped: only docs
    containing ≥1 query term are candidates (pure background-prior docs
    are not retrieval hits), and for those ``score = Σ_{t∈q∩d}(A_t−B_t)
    + qconst − |q|·C(d)`` where ``A = ln(tf + μp_t)``, ``B = ln(μp_t)``,
    ``qconst = Σ_{t∈q} B_t`` and ``C = ln(dl + μ)``. Every log is
    fixed-pointed to micro-nats the instant it is computed (the repo's
    standard cross-engine trick — sums of longs are order-independent),
    and out-of-vocabulary query terms are dropped on BOTH engines (the
    Dirichlet model is undefined at cf=0).

    Scale shape: the query table and the per-query constants broadcast;
    the only shuffles are the shared tf aggregate, dl, and the final
    per-(query, doc) sum — identical to BM25. Returns (query_id,
    doc_id, score, rank).
    """
    from arcane_framework_spark.operators.scale import with_broadcast_scalar

    queries = queries if queries is not None else BM25_QUERIES
    qterms = _literal_qterms(spark, queries)

    tf = scoped_persist(term_frequencies(docs, id_col, text_col))
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    cf = tf.groupBy("term").agg(F.sum("tf").alias("cf"))
    total = cf.agg(F.sum("cf").cast("double").alias("__T"))

    mu_lit = F.lit(float(mu))
    # μ·p(t|C) evaluated left-associatively ((μ*cf)/T) — the oracle spells
    # the identical order so the doubles agree bit-for-bit.
    qtab = (
        with_broadcast_scalar(qterms.join(cf, "term"), total)
        .select(
            "query_id",
            "term",
            (mu_lit * F.col("cf").cast("double") / F.col("__T")).alias("mu_p"),
        )
        .withColumn(
            "b_fp",
            F.floor(F.lit(1e6) * F.log(F.col("mu_p")) + F.lit(0.5))
            .cast("long"),
        )
    )
    qstats = qtab.groupBy("query_id").agg(
        F.sum("b_fp").alias("qconst"),
        F.count(F.lit(1)).cast("long").alias("nq"),
    )

    matched = tf.join(F.broadcast(qtab), "term").select(
        "query_id",
        id_col,
        (
            F.floor(
                F.lit(1e6)
                * F.log(F.col("tf").cast("double") + F.col("mu_p"))
                + F.lit(0.5)
            ).cast("long")
            - F.col("b_fp")
        ).alias("gain_fp"),
    )
    msum = matched.groupBy("query_id", id_col).agg(
        F.sum("gain_fp").alias("msum")
    )
    scored = (
        msum.join(dl, id_col)
        .join(F.broadcast(qstats), "query_id")
        .select(
            "query_id",
            id_col,
            (
                F.col("msum")
                + F.col("qconst")
                - F.col("nq")
                * F.floor(
                    F.lit(1e6)
                    * F.log(F.col("dl").cast("double") + mu_lit)
                    + F.lit(0.5)
                ).cast("long")
            ).alias("score_fp"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_fp").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            id_col,
            F.round(
                F.col("score_fp").cast("double") / F.lit(1e6), 6
            ).alias("score"),
            F.col("rank").cast("int").alias("rank"),
        )
    )
