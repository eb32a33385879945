"""Evaluation / entity-resolution extension queries (round-8 wave 2):
edit-distance near-dup, query-likelihood retrieval, model-eval metrics
(ROC-AUC, calibration/ECE), fixed-iteration PageRank, robust MAD
outliers, blocked sorted-neighborhood dedup.

Same contract as queries.py: every Spark query has a DuckDB oracle with
identical column names, rounding, and hash/fixed-point arithmetic, so the
driver's value-hash compare is exact. Near-dup entries plant deterministic
positives (the synthetic corpus has none) identically in both engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arcane_framework_spark.session import load_tables

#: Planted edit-variant offsets (distinct from the MinHash family's
#: 100_000 so cross-entry corpora never alias).
EDIT_NEAR_OFFSET = 300_000
EDIT_FAR_OFFSET = 400_000

#: Suffixes appended to planted variants: the near one is 3 edits after
#: whitespace normalization (space + 2 chars — at/below EDIT_MAX_DIST),
#: the far one is 12 (must be rejected by the verify step).
EDIT_NEAR_SUFFIX = " ab"
EDIT_FAR_SUFFIX = " qz7 vx9 kj3"


def _planted_edit_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus with planted typo-level variants: every 13th doc re-inserted
    with a 3-edit suffix (a true near-dup under EDIT_MAX_DIST=3) and every
    17th with a 12-edit suffix (a blocking candidate the verify must
    reject)."""
    t = load_tables(spark, sf_dir, "documents")
    docs = t["documents"].select("doc_id", "text")
    near = docs.filter(F.col("doc_id") % 13 == 0).select(
        (F.col("doc_id") + F.lit(EDIT_NEAR_OFFSET)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(EDIT_NEAR_SUFFIX)).alias("text"),
    )
    far = docs.filter(F.col("doc_id") % 17 == 0).select(
        (F.col("doc_id") + F.lit(EDIT_FAR_OFFSET)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(EDIT_FAR_SUFFIX)).alias("text"),
    )
    return docs.unionByName(near).unionByName(far)


def edit_neardup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo-tolerant near-dup: bottom-k gram-sketch blocking + banded
    Levenshtein verify (operators/dedup.py ``edit_distance_pairs``)."""
    from arcane_framework_spark.operators.dedup import edit_distance_pairs

    return edit_distance_pairs(_planted_edit_docs(spark, sf_dir))


def _edit_neardup_sql() -> str:
    from arcane_framework_spark.operators.dedup import (
        CHAR_NGRAM,
        EDIT_MAX_DIST,
        NGRAM_MAX_BLOCK,
        NGRAM_SKETCH_K,
    )

    k = CHAR_NGRAM
    return rf"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {EDIT_NEAR_OFFSET}, text || '{EDIT_NEAR_SUFFIX}'
  FROM documents WHERE doc_id % 13 = 0
  UNION ALL
  SELECT doc_id + {EDIT_FAR_OFFSET}, text || '{EDIT_FAR_SUFFIX}'
  FROM documents WHERE doc_id % 17 = 0
),
norm AS (
  SELECT doc_id AS id,
         regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS s
  FROM corpus
),
grams AS (
  SELECT id, s,
         list_distinct(CASE WHEN len(s) >= {k}
           THEN list_transform(range(1, len(s) - {k - 2}),
                               i -> substr(s, i::INT, {k}))
           ELSE [s] END) AS g
  FROM norm
),
keyed AS (
  SELECT id, s, unnest(list_sort(list_transform(g, x -> md5(x)))
                       [1:{NGRAM_SKETCH_K}]) AS bk
  FROM grams
),
ok AS (
  SELECT id, s, bk
  FROM (SELECT *, count(*) OVER (PARTITION BY bk) AS blk FROM keyed)
  WHERE blk <= {NGRAM_MAX_BLOCK}
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.s AS sa, b.s AS sb
  FROM ok a JOIN ok b ON a.bk = b.bk AND a.id < b.id
  WHERE abs(len(a.s) - len(b.s)) <= {EDIT_MAX_DIST}
)
SELECT id_a, id_b, levenshtein(sa, sb)::BIGINT AS edit_distance
FROM cand
WHERE levenshtein(sa, sb) <= {EDIT_MAX_DIST}
"""


#: Dirichlet prior for the catalog entry — sized to the synthetic docs'
#: ~54-token average length (see operators/retrieval.py QL_MU).
QL_ENTRY_MU = 50.0
QL_ENTRY_K = 5


def query_likelihood_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirichlet-smoothed LM retrieval over the BM25 keyword-query set
    (operators/retrieval.py ``query_likelihood_topk``) — the standard
    language-modeling alternative ranking to ``bm25_topk_documents``."""
    from arcane_framework_spark.operators.retrieval import (
        RETRIEVAL_POOL_K,
        query_likelihood_topk,
    )

    t = load_tables(spark, sf_dir, "documents")
    # Pool-then-cut (see bm25_topk_documents): identical rows, and the
    # pooled subtree matches the RRF fusion's QL arm so prep persists it
    # once for both consumers.
    return query_likelihood_topk(
        spark, t["documents"].select("doc_id", "text"),
        k=RETRIEVAL_POOL_K, mu=QL_ENTRY_MU,
    ).filter(F.col("rank") <= QL_ENTRY_K)


def _query_likelihood_sql(k: int = QL_ENTRY_K,
                          mu_val: float = QL_ENTRY_MU,
                          tail: str | None = None) -> str:
    """DuckDB spelling of the Dirichlet query-likelihood ranking,
    parameterized on cutoff/μ/final-select so the RRF fusion oracle
    (queries_wave3.py) composes the SAME scoring math instead of
    duplicating it (mirrors bm25_core_sql's q_cte/tail design)."""
    from arcane_framework_spark.operators.retrieval import BM25_QUERIES

    mu = repr(float(mu_val))
    vals = ", ".join(
        f"({qid}, '{t}')"
        for qid, terms in sorted(BM25_QUERIES.items())
        for t in terms
    )
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
cf AS (SELECT term, sum(tf)::BIGINT AS cf FROM tf GROUP BY term),
tot AS (SELECT sum(cf)::DOUBLE AS T FROM cf),
q(query_id, term) AS (VALUES {vals}),
qtab AS (
  SELECT query_id, term,
         {mu}::DOUBLE * cf::DOUBLE / T AS mu_p,
         CAST(floor(1e6 * ln({mu}::DOUBLE * cf::DOUBLE / T) + 0.5)
              AS BIGINT) AS b_fp
  FROM q JOIN cf USING (term) CROSS JOIN tot
),
qstats AS (
  SELECT query_id, sum(b_fp)::BIGINT AS qconst, count(*)::BIGINT AS nq
  FROM qtab GROUP BY query_id
),
msum AS (
  SELECT query_id, doc_id,
         sum(CAST(floor(1e6 * ln(tf::DOUBLE + mu_p) + 0.5) AS BIGINT)
             - b_fp)::BIGINT AS msum
  FROM tf JOIN qtab USING (term)
  GROUP BY query_id, doc_id
),
scored AS (
  SELECT query_id, doc_id,
         msum + qconst
           - nq * CAST(floor(1e6 * ln(dl::DOUBLE + {mu}::DOUBLE) + 0.5)
                       AS BIGINT) AS score_fp
  FROM msum JOIN dl USING (doc_id) JOIN qstats USING (query_id)
),
ranked AS (
  SELECT query_id, doc_id, score_fp,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score_fp DESC, doc_id) AS rank
  FROM scored
)
{tail if tail is not None else f'''
SELECT query_id, doc_id,
       round(score_fp::DOUBLE / 1e6, 6) AS score, rank::INT AS rank
FROM ranked WHERE rank <= {k}'''}
"""


def auc_scores_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tie-corrected ROC-AUC of three deterministic embedding
    scoring functions (component 0, component 4, max component) against
    the parity-of-label binary target (operators/evalmetrics.py
    ``roc_auc``). Raw stored floats as scores — zero cross-engine float
    arithmetic before the integer pair counting."""
    from arcane_framework_spark.operators.evalmetrics import roc_auc

    t = load_tables(spark, sf_dir, "embeddings")
    y = (F.col("label") % 2).cast("long").alias("y")
    scored = (
        t["embeddings"]
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("dim0").alias("score_name"),
                        F.element_at("embedding", 1)
                        .cast("double")
                        .alias("score"),
                    ),
                    F.struct(
                        F.lit("dim4").alias("score_name"),
                        F.element_at("embedding", 5)
                        .cast("double")
                        .alias("score"),
                    ),
                    F.struct(
                        F.lit("maxdim").alias("score_name"),
                        F.array_max("embedding").cast("double").alias("score"),
                    ),
                )
            ).alias("sc"),
            y,
        )
        .select(
            F.col("sc.score_name").alias("score_name"),
            F.col("sc.score").alias("score"),
            "y",
        )
    )
    return roc_auc(scored)


_AUC_SQL = r"""
WITH sc AS (
  SELECT 'dim0' AS score_name, embedding[1]::DOUBLE AS score,
         (label % 2)::BIGINT AS y FROM embeddings
  UNION ALL
  SELECT 'dim4', embedding[5]::DOUBLE, (label % 2)::BIGINT FROM embeddings
  UNION ALL
  SELECT 'maxdim', list_max(embedding)::DOUBLE, (label % 2)::BIGINT
  FROM embeddings
),
g AS (
  SELECT score_name, score, sum(y)::BIGINT AS n_pos,
         sum(1 - y)::BIGINT AS n_neg
  FROM sc GROUP BY 1, 2
),
cum AS (
  SELECT *, coalesce(sum(n_neg) OVER (
      PARTITION BY score_name ORDER BY score
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cum_neg
  FROM g
),
agg AS (
  SELECT score_name, sum(n_pos)::BIGINT AS n_pos, sum(n_neg)::BIGINT AS n_neg,
         sum(n_pos * cum_neg)::BIGINT AS pairs,
         sum(n_pos * n_neg)::BIGINT AS ties
  FROM cum GROUP BY 1
)
SELECT score_name, n_pos, n_neg,
       CASE WHEN n_pos > 0 AND n_neg > 0 THEN
         floor((2.0 * pairs::DOUBLE + ties::DOUBLE)
               / (2.0 * n_pos::DOUBLE * n_neg::DOUBLE) * 1e6 + 0.5) / 1e6
       END AS auc
FROM agg
"""


def calibration_ece_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + ECE for a min-max-normalized embedding
    score against the label-parity target (operators/evalmetrics.py
    ``calibration_bins``). The normalizing min/max stay in-plan as a
    broadcast 1-row aggregate."""
    from arcane_framework_spark.operators.evalmetrics import (
        calibration_bins,
    )
    from arcane_framework_spark.operators.scale import with_broadcast_scalar

    t = load_tables(spark, sf_dir, "embeddings")
    e = t["embeddings"].select(
        F.element_at("embedding", 1).cast("double").alias("x"),
        (F.col("label") % 2).cast("long").alias("y"),
    )
    rng = e.agg(F.min("x").alias("__mn"), F.max("x").alias("__mx"))
    scored = with_broadcast_scalar(e, rng).select(
        ((F.col("x") - F.col("__mn")) / (F.col("__mx") - F.col("__mn")))
        .alias("p"),
        "y",
    )
    return calibration_bins(scored)


_CALIBRATION_SQL = r"""
WITH e AS (
  SELECT embedding[1]::DOUBLE AS x, (label % 2)::BIGINT AS y FROM embeddings
),
rng AS (SELECT min(x) AS mn, max(x) AS mx FROM e),
sc AS (SELECT (x - mn) / (mx - mn) AS p, y FROM e CROSS JOIN rng),
rws AS (
  SELECT least(9, floor(p * 10.0)::INT) AS bin,
         CAST(floor(p * 1e6 + 0.5) AS BIGINT) AS p_fp, y
  FROM sc
),
bins AS (
  SELECT bin, count(*)::BIGINT AS n, sum(p_fp)::BIGINT AS sp,
         sum(y)::BIGINT AS pos
  FROM rws GROUP BY 1
),
wg AS (
  SELECT bin, n,
         floor(sp::DOUBLE / n::DOUBLE + 0.5) / 1e6 AS mean_score,
         floor(pos::DOUBLE * 1e6 / n::DOUBLE + 0.5) / 1e6 AS frac_pos
  FROM bins
),
wg2 AS (
  SELECT *, CAST(floor(abs(frac_pos - mean_score) * 1e6 + 0.5) AS BIGINT)
            AS gap_fp
  FROM wg
),
ece AS (
  SELECT floor(sum(n * gap_fp)::DOUBLE / sum(n)::DOUBLE + 0.5) / 1e6 AS ece
  FROM wg2
)
SELECT bin, n, mean_score, frac_pos, gap_fp::DOUBLE / 1e6 AS abs_gap, ece
FROM wg2 CROSS JOIN ece
"""


def pagerank_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration integer-arithmetic PageRank over the MinHash
    near-dup pair graph (operators/graph.py ``pagerank``) — connectivity
    ranking of duplicate-cluster members. Shares the planted corpus /
    pair subtree with the dedup family (plan-cache substituted by the
    session prep)."""
    from arcane_framework_spark.operators.dedup import minhash_lsh_pairs
    from arcane_framework_spark.operators.graph import pagerank
    from arcane_framework_spark.queries import _planted_neardup_docs

    pairs = minhash_lsh_pairs(_planted_neardup_docs(spark, sf_dir))
    return pagerank(pairs)


def _pagerank_sql(minhash_pairs_sql: str) -> str:
    """Oracle: the identical integer-arithmetic iteration unrolled as
    CTE stages (registered from queries.py after ``_minhash_sql``
    exists, the ``_dedup_clusters_sql`` pattern). DuckDB ``//`` and
    Spark ``div`` agree on the all-positive operands."""
    from arcane_framework_spark.operators.graph import (
        PR_DAMP_DEN,
        PR_DAMP_NUM,
        PR_ITERATIONS,
        PR_SCALE,
    )

    stages = []
    prev = "r0"
    for i in range(1, PR_ITERATIONS + 1):
        stages.append(f"""
it{i} AS (
  SELECT e.dst AS id,
         sum((p.r * {PR_DAMP_NUM}) // (p.deg * {PR_DAMP_DEN}))::BIGINT AS s
  FROM edges e JOIN {prev} p ON e.src = p.id
  GROUP BY 1
),
r{i} AS (
  SELECT n.id, n.deg, (n.base + coalesce(it{i}.s, 0))::BIGINT AS r
  FROM nodes n LEFT JOIN it{i} USING (id)
),""")
        prev = f"r{i}"
    unrolled = "".join(stages).rstrip(",\n").rstrip(",")
    return f"""
WITH pairs AS (
  SELECT id_a, id_b FROM ({minhash_pairs_sql}) mh
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
deg AS (SELECT src, count(*)::BIGINT AS deg FROM edges GROUP BY 1),
nn AS (SELECT count(*)::BIGINT AS n FROM deg),
nodes AS (
  SELECT src AS id, deg,
         ({PR_SCALE} // n)::BIGINT AS r0,
         (({PR_SCALE} * {PR_DAMP_DEN - PR_DAMP_NUM})
          // ({PR_DAMP_DEN} * n))::BIGINT AS base
  FROM deg CROSS JOIN nn
),
r0 AS (SELECT id, deg, r0 AS r FROM nodes),
{unrolled}
SELECT id AS doc_id, r AS rank_fp, r::DOUBLE / 1e12 AS pagerank
FROM {prev}
"""


def mad_outliers_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-event-type outliers: modified z-score (median/MAD)
    with the Iglewicz–Hoaglin 3.5 cutoff (operators/drift.py
    ``mad_outliers``)."""
    from arcane_framework_spark.operators.drift import mad_outliers

    t = load_tables(spark, sf_dir, "events")
    return mad_outliers(t["events"])


def _mad_outliers_sql() -> str:
    from arcane_framework_spark.operators.drift import (
        MAD_CONSISTENCY,
        MAD_CUTOFF,
    )

    c = repr(float(MAD_CONSISTENCY))
    cut = repr(float(MAD_CUTOFF))
    return rf"""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med FROM events GROUP BY 1
),
dev AS (
  SELECT e.event_id, e.event_type, e.value, m.med
  FROM events e JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, quantile_cont(abs(value - med), 0.5) AS mad
  FROM dev GROUP BY 1
)
SELECT d.event_id, d.event_type, d.value,
       floor({c}::DOUBLE * (d.value - d.med) / a.mad * 1e6 + 0.5) / 1e6 AS z
FROM dev d JOIN mad a USING (event_type)
WHERE a.mad > 0
  AND abs({c}::DOUBLE * (d.value - d.med) / a.mad) > {cut}::DOUBLE
"""



def sorted_neighborhood_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked sorted-neighborhood near-dup pairs (operators/dedup.py
    ``sorted_neighborhood_pairs``) over the shared planted corpus — the
    third classic blocking strategy next to LSH and sketch blocking."""
    from arcane_framework_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )
    from arcane_framework_spark.queries import _planted_neardup_docs

    return sorted_neighborhood_pairs(_planted_neardup_docs(spark, sf_dir))


def _sorted_neighborhood_sql() -> str:
    from arcane_framework_spark.operators.dedup import (
        CHAR_NGRAM,
        SNM_MIN_JACCARD,
        SNM_PREFIX,
        SNM_WINDOW,
    )

    k = CHAR_NGRAM
    leads = ",\n         ".join(
        f"lead(id, {j}) OVER w AS nid{j}, lead(g, {j}) OVER w AS ng{j}"
        for j in range(1, SNM_WINDOW + 1)
    )
    cand = "\n  UNION ALL ".join(
        f"SELECT id, g, nid{j} AS nid, ng{j} AS ng FROM neighbors "
        f"WHERE nid{j} IS NOT NULL"
        for j in range(1, SNM_WINDOW + 1)
    )
    jac = "round(ni::DOUBLE / (na + nbsz - ni)::DOUBLE, 6)"
    return rf"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text || ' ' || text
  FROM documents WHERE doc_id % 7 = 0
),
norm AS (
  SELECT doc_id AS id,
         regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS s
  FROM corpus
),
keyed AS (
  SELECT id, s,
         list_distinct(CASE WHEN len(s) >= {k}
           THEN list_transform(range(1, len(s) - {k - 2}),
                               i -> substr(s, i::INT, {k}))
           ELSE [s] END) AS g,
         substr(s, 1, {SNM_PREFIX}) AS block
  FROM norm
),
neighbors AS (
  SELECT id, g,
         {leads}
  FROM keyed
  WINDOW w AS (PARTITION BY block ORDER BY s, id)
),
cand AS (
  {cand}
),
sized AS (
  SELECT least(id, nid) AS id_a, greatest(id, nid) AS id_b,
         len(g) AS na, len(ng) AS nbsz, len(list_intersect(g, ng)) AS ni
  FROM cand
)
SELECT id_a, id_b, {jac} AS jaccard
FROM sized
WHERE {jac} >= {SNM_MIN_JACCARD}
"""



def streaming_cms_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min registers maintained BY a custom stateful streaming
    operator (streaming/stateful.py ``cms_stream``): events replay
    through ``readStream``; the state key is the CMS hash-row index and
    the state is that row\'s bounded counter array. The oracle
    recomputes the batch counter table in SQL — streaming state ≡ batch
    ``cms_counts`` ≡ DuckDB, counter-for-counter."""
    from pyspark.sql import Window

    from arcane_framework_spark.queries_ext import stream_conf
    from arcane_framework_spark.streaming.stateful import cms_stream

    t = load_tables(spark, sf_dir, "events")
    schema = t["events"].schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    items = stream.select(F.col("user_id").cast("string").alias("uid"))
    sk = cms_stream(items)
    name = "streaming_cms_users_sink"
    with stream_conf(spark):
        q = (
            sk.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    sink = spark.table(name)
    w = Window.partitionBy("row")
    return (
        sink.withColumn("__maxv", F.max("ver").over(w))
        .filter(F.col("ver") == F.col("__maxv"))
        .select("row", "bucket", "cnt")
    )


def _streaming_cms_sql() -> str:
    from arcane_framework_spark.operators.sketches import CMS_D, CMS_W

    return f"""
WITH items AS (
  SELECT CAST(user_id AS VARCHAR) AS v FROM events
),
exploded AS (
  SELECT v, r.range AS row FROM items CROSS JOIN range({CMS_D}) r
)
SELECT row,
       CAST(concat('0x', substring(
            md5(concat_ws('|', CAST(row AS VARCHAR), v)), 1, 15))
            AS BIGINT) % {CMS_W} AS bucket,
       CAST(count(*) AS BIGINT) AS cnt
FROM exploded GROUP BY 1, 2
"""



def triangle_stats_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counts + local clustering coefficient over the MinHash
    near-dup pair graph (operators/graph.py ``triangle_stats``) — the
    cluster-cohesion diagnostic next to ``pagerank_documents``."""
    from arcane_framework_spark.operators.dedup import minhash_lsh_pairs
    from arcane_framework_spark.operators.graph import triangle_stats
    from arcane_framework_spark.queries import _planted_neardup_docs

    pairs = minhash_lsh_pairs(_planted_neardup_docs(spark, sf_dir))
    return triangle_stats(pairs)


def _triangle_stats_sql(minhash_pairs_sql: str) -> str:
    """Oracle: identical ordered-wedge join (registered from queries.py
    after ``_minhash_sql`` exists, the ``_dedup_clusters_sql``
    pattern)."""
    return f"""
WITH e AS (
  SELECT id_a AS a, id_b AS b FROM ({minhash_pairs_sql}) mh
),
tris AS (
  SELECT e1.a, e1.b, e2.b AS c
  FROM e e1 JOIN e e2 ON e1.b = e2.a
  JOIN e e3 ON e1.a = e3.a AND e2.b = e3.b
),
per_node AS (
  SELECT id, count(*)::BIGINT AS triangles FROM (
    SELECT a AS id FROM tris
    UNION ALL SELECT b FROM tris
    UNION ALL SELECT c FROM tris
  ) GROUP BY id
),
deg AS (
  SELECT id, count(*)::BIGINT AS degree FROM (
    SELECT a AS id FROM e UNION ALL SELECT b FROM e
  ) GROUP BY id
)
SELECT deg.id AS doc_id, deg.degree,
       coalesce(per_node.triangles, 0)::BIGINT AS triangles,
       CASE WHEN deg.degree >= 2 THEN
         floor(2.0 * coalesce(per_node.triangles, 0)::DOUBLE
               / (deg.degree::DOUBLE * (deg.degree - 1)::DOUBLE)
               * 1e6 + 0.5) / 1e6
       ELSE 0.0 END AS clustering
FROM deg LEFT JOIN per_node USING (id)
"""



def bigram_nll_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc mean NLL under a Jelinek-Mercer interpolated bigram LM
    (operators/text.py ``bigram_nll``) — the transition-aware quality
    score next to ``unigram_nll_documents``."""
    from arcane_framework_spark.operators.text import bigram_nll

    t = load_tables(spark, sf_dir, "documents")
    return bigram_nll(t["documents"].select("doc_id", "text"))


def _bigram_nll_sql() -> str:
    from arcane_framework_spark.operators.text import (
        BIGRAM_LAMBDA,
        BIGRAM_START,
    )

    lam = repr(float(BIGRAM_LAMBDA))
    one_m = repr(float(1.0 - BIGRAM_LAMBDA))
    return rf"""
WITH tok AS (
  SELECT doc_id, tok, pos FROM (
    SELECT doc_id, unnest(w) AS tok, generate_subscripts(w, 1) AS pos
    FROM (SELECT doc_id,
                 string_split_regex(lower(trim(text)), '\s+') AS w
          FROM documents)
  ) WHERE tok <> ''
),
big AS (
  SELECT doc_id,
         coalesce(lag(tok) OVER (PARTITION BY doc_id ORDER BY pos),
                  '{BIGRAM_START}') AS prev,
         tok AS w
  FROM tok
),
inst AS (
  SELECT doc_id, prev, w, count(*)::BIGINT AS c_inst
  FROM big GROUP BY 1, 2, 3
),
c2 AS (SELECT prev, w, sum(c_inst)::BIGINT AS c2 FROM inst GROUP BY 1, 2),
c1 AS (SELECT prev, sum(c2)::BIGINT AS c1 FROM c2 GROUP BY 1),
uni AS (SELECT tok AS w, count(*)::BIGINT AS cw FROM tok GROUP BY 1),
tot AS (SELECT sum(cw)::BIGINT AS T FROM uni),
lp AS (
  SELECT c2.prev, c2.w,
         CAST(floor(-1e6 * ln(
             {lam} * (c2.c2::DOUBLE / c1.c1::DOUBLE)
             + {one_m} * (uni.cw::DOUBLE / T::DOUBLE)) + 0.5)
           AS BIGINT) AS lp_micro
  FROM c2 JOIN c1 USING (prev) JOIN uni USING (w) CROSS JOIN tot
)
SELECT doc_id, sum(c_inst)::BIGINT AS n_bigrams,
       sum(c_inst * lp_micro)::BIGINT AS sum_nll_micro,
       floor(sum(c_inst * lp_micro)::DOUBLE / sum(c_inst) / 100.0 + 0.5)
         / 1e4 AS mean_nll
FROM inst JOIN lp USING (prev, w)
GROUP BY doc_id
"""



def winsorized_stats_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type raw vs winsorized mean at the exact [p01, p99]
    clip (operators/drift.py ``winsorized_stats``)."""
    from arcane_framework_spark.operators.drift import winsorized_stats

    t = load_tables(spark, sf_dir, "events")
    return winsorized_stats(t["events"])


def _winsorized_sql() -> str:
    from arcane_framework_spark.operators.drift import WINSOR_HI, WINSOR_LO

    lo, hi = repr(float(WINSOR_LO)), repr(float(WINSOR_HI))
    return rf"""
WITH cuts AS (
  SELECT event_type,
         quantile_cont(value, {lo}) AS lo_v,
         quantile_cont(value, {hi}) AS hi_v
  FROM events GROUP BY 1
),
j AS (
  SELECT e.event_type, e.value, c.lo_v, c.hi_v,
         least(greatest(e.value, c.lo_v), c.hi_v) AS w
  FROM events e JOIN cuts c USING (event_type)
)
SELECT event_type,
       count(*)::BIGINT AS n,
       floor(min(lo_v) * 1e6 + 0.5) / 1e6 AS lo,
       floor(min(hi_v) * 1e6 + 0.5) / 1e6 AS hi,
       sum(CASE WHEN value < lo_v OR value > hi_v THEN 1 ELSE 0 END)::BIGINT
         AS n_clipped,
       floor(sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT))::DOUBLE
             / count(*)::DOUBLE + 0.5) / 1e6 AS mean_raw,
       floor(sum(CAST(floor(w * 1e6 + 0.5) AS BIGINT))::DOUBLE
             / count(*)::DOUBLE + 0.5) / 1e6 AS mean_winsorized
FROM j
GROUP BY event_type
"""



def classifier_eval_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision/recall/F1 of the nearest-prototype classifier
    (operators/evalmetrics.py ``prototype_classifier_eval``): stride
    prototypes (the IVF centroid convention), everything else
    classified by max-cosine prototype."""
    from arcane_framework_spark.operators.evalmetrics import (
        prototype_classifier_eval,
    )
    from arcane_framework_spark.queries_ext import IVF_STRIDE

    t = load_tables(spark, sf_dir, "embeddings")
    return prototype_classifier_eval(t["embeddings"], stride=IVF_STRIDE)


def _classifier_eval_sql() -> str:
    from arcane_framework_spark.queries_ext import IVF_STRIDE

    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings
),
cent AS (
  SELECT vec_id AS cid, v AS cv, label AS clabel
  FROM e WHERE vec_id % {IVF_STRIDE} = 0
),
test AS (SELECT * FROM e WHERE vec_id % {IVF_STRIDE} <> 0),
scored AS (
  SELECT test.vec_id, test.label, cent.cid, cent.clabel,
         list_dot_product(test.v, cent.cv)
           / (sqrt(list_dot_product(test.v, test.v))
              * sqrt(list_dot_product(cent.cv, cent.cv))) AS cos
  FROM test CROSS JOIN cent
),
assigned AS (
  SELECT vec_id, label, clabel FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY cos DESC, cid) AS rn
    FROM scored) WHERE rn = 1
),
nt AS (SELECT label, count(*)::BIGINT AS n_true FROM assigned GROUP BY 1),
np AS (SELECT clabel AS label, count(*)::BIGINT AS n_pred
       FROM assigned GROUP BY 1),
tpc AS (SELECT label, count(*)::BIGINT AS tp FROM assigned
        WHERE label = clabel GROUP BY 1),
base AS (
  SELECT coalesce(nt.label, np.label) AS label,
         coalesce(nt.n_true, 0)::BIGINT AS n_true,
         coalesce(np.n_pred, 0)::BIGINT AS n_pred
  FROM nt FULL OUTER JOIN np ON nt.label = np.label
)
SELECT base.label, base.n_true, base.n_pred,
       coalesce(tpc.tp, 0)::BIGINT AS tp,
       CASE WHEN base.n_pred > 0 THEN
         floor(coalesce(tpc.tp, 0)::DOUBLE * 1e6 / base.n_pred::DOUBLE
               + 0.5) / 1e6 END AS precision,
       CASE WHEN base.n_true > 0 THEN
         floor(coalesce(tpc.tp, 0)::DOUBLE * 1e6 / base.n_true::DOUBLE
               + 0.5) / 1e6 END AS recall,
       floor(2.0 * coalesce(tpc.tp, 0) * 1e6
             / (base.n_pred + base.n_true)::DOUBLE + 0.5) / 1e6 AS f1
FROM base LEFT JOIN tpc ON base.label = tpc.label
"""



def profile_columns_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan schema/content profile of lineitem (operators/audit.py
    ``profile_columns``): per-column nulls, exact distinct counts,
    engine-safe min/max strings."""
    from arcane_framework_spark.operators.audit import profile_columns

    t = load_tables(spark, sf_dir, "lineitem")
    return profile_columns(t["lineitem"])


def _profile_columns_sql() -> str:
    cols = {
        "l_orderkey": "int", "l_partkey": "int", "l_suppkey": "int",
        "l_linenumber": "int", "l_quantity": "dbl",
        "l_extendedprice": "dbl", "l_discount": "dbl", "l_tax": "dbl",
        "l_returnflag": "str", "l_linestatus": "str",
        "l_shipdate": "ts",
    }
    parts = []
    for c, t in cols.items():
        if t in ("int", "str"):
            mn, mx = f"min({c})::VARCHAR", f"max({c})::VARCHAR"
        elif t == "ts":
            mn = f"strftime(min({c}), '%Y-%m-%d %H:%M:%S')"
            mx = f"strftime(max({c}), '%Y-%m-%d %H:%M:%S')"
        else:
            mn = mx = "NULL::VARCHAR"
        parts.append(
            f"SELECT '{c}' AS col_name,\n"
            f"  sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,\n"
            f"  count(DISTINCT {c})::BIGINT AS n_distinct,\n"
            f"  {mn} AS min_val, {mx} AS max_val\nFROM lineitem"
        )
    return "\nUNION ALL\n".join(parts)



def event_transitions_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of per-user event journeys
    (operators/temporal.py ``event_transitions``)."""
    from arcane_framework_spark.operators.temporal import event_transitions
    from arcane_framework_spark.session import ts_micros

    t = load_tables(spark, sf_dir, "events")
    ev = t["events"].withColumn("__tsm", ts_micros(t["events"]))
    return event_transitions(ev, ts_col="__tsm")


_EVENT_TRANSITIONS_SQL = r"""
WITH seq AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type,
         event_type AS next_type
  FROM events
),
counts AS (
  SELECT prev_type, next_type, count(*)::BIGINT AS cnt
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
),
tot AS (SELECT prev_type, sum(cnt)::BIGINT AS t FROM counts GROUP BY 1)
SELECT c.prev_type, c.next_type, c.cnt,
       floor(c.cnt::DOUBLE * 1e6 / t.t::DOUBLE + 0.5) / 1e6 AS prob
FROM counts c JOIN tot t USING (prev_type)
"""


def ab_test_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test of per-user purchase conversion between
    the user_id-parity cohorts (operators/evalmetrics.py
    ``two_proportion_ztest``) — unit of analysis is the USER (the unit
    of randomization), not the event."""
    from arcane_framework_spark.operators.evalmetrics import (
        two_proportion_ztest,
    )

    t = load_tables(spark, sf_dir, "events")
    units = (
        t["events"]
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("converted")
        )
        .select((F.col("user_id") % 2).alias("cohort"), "converted")
    )
    return two_proportion_ztest(units)


_AB_TEST_SQL = r"""
WITH units AS (
  SELECT user_id % 2 AS cohort,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id
),
agg AS (
  SELECT sum(CASE WHEN cohort = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
         sum(CASE WHEN cohort = 0 THEN conv ELSE 0 END)::BIGINT AS x_a,
         sum(CASE WHEN cohort = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b,
         sum(CASE WHEN cohort = 1 THEN conv ELSE 0 END)::BIGINT AS x_b
  FROM units
)
SELECT n_a, x_a, n_b, x_b,
       floor(x_a::DOUBLE / n_a::DOUBLE * 1e6 + 0.5) / 1e6 AS rate_a,
       floor(x_b::DOUBLE / n_b::DOUBLE * 1e6 + 0.5) / 1e6 AS rate_b,
       CASE WHEN n_a > 0 AND n_b > 0 AND x_a + x_b > 0
                 AND x_a + x_b < n_a + n_b THEN
         floor((x_a::DOUBLE / n_a::DOUBLE - x_b::DOUBLE / n_b::DOUBLE)
               / sqrt((x_a + x_b)::DOUBLE / (n_a + n_b)::DOUBLE
                      * (1.0 - (x_a + x_b)::DOUBLE / (n_a + n_b)::DOUBLE)
                      * (1.0 / n_a::DOUBLE + 1.0 / n_b::DOUBLE))
               * 1e6 + 0.5) / 1e6
       END AS z
FROM agg
"""



#: Survival-entry day length in epoch micros.
_DAY_US = 86_400_000_000


def survival_signup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier time-to-conversion: days from each user's first
    signup to their first subsequent purchase, right-censored at the
    stream's end for users who never convert (operators/temporal.py
    ``kaplan_meier``). ``S(t) = exp(-cum_lp_micro/1e6)`` — the hazard
    stays in engine-exact integer micro-nats."""
    from arcane_framework_spark.operators.scale import with_broadcast_scalar
    from arcane_framework_spark.operators.temporal import kaplan_meier
    from arcane_framework_spark.session import ts_micros

    t = load_tables(spark, sf_dir, "events")
    ev = t["events"].select(
        "user_id", "event_type", ts_micros(t["events"]).alias("tsm")
    )
    signup = ev.filter(F.col("event_type") == "signup").groupBy(
        "user_id"
    ).agg(F.min("tsm").alias("t0"))
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .join(signup, "user_id")
        .filter(F.col("tsm") >= F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("tsm").alias("t1"))
    )
    mx = ev.agg(F.max("tsm").alias("__mx"))
    units = with_broadcast_scalar(
        signup.join(conv, "user_id", "left"), mx
    ).select(
        F.expr(
            f"(coalesce(t1, __mx) - t0) div {_DAY_US}"
        ).alias("duration"),
        F.col("t1").isNotNull().cast("int").alias("event"),
    )
    return kaplan_meier(units)


_SURVIVAL_SQL = rf"""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS tsm FROM events
),
signup AS (
  SELECT user_id, min(tsm) AS t0 FROM ev
  WHERE event_type = 'signup' GROUP BY 1
),
conv AS (
  SELECT e.user_id, min(e.tsm) AS t1
  FROM ev e JOIN signup s USING (user_id)
  WHERE e.event_type = 'purchase' AND e.tsm >= s.t0
  GROUP BY 1
),
mx AS (SELECT max(tsm) AS mxts FROM ev),
units AS (
  SELECT (coalesce(c.t1, mx.mxts) - s.t0) // {_DAY_US} AS duration,
         CASE WHEN c.t1 IS NOT NULL THEN 1 ELSE 0 END AS event
  FROM signup s LEFT JOIN conv c USING (user_id) CROSS JOIN mx
),
counts AS (
  SELECT duration AS t, sum(event)::BIGINT AS d,
         sum(1 - event)::BIGINT AS c
  FROM units GROUP BY 1
),
tot AS (SELECT sum(d + c)::BIGINT AS total FROM counts),
risked AS (
  SELECT t, d, c,
         total - coalesce(sum(d + c) OVER (
             ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0)::BIGINT AS n_risk
  FROM counts CROSS JOIN tot
),
stepped AS (
  SELECT *,
         CASE WHEN d = 0 THEN 0
              WHEN d < n_risk THEN
                CAST(floor(-1e6 * ln(1.0 - d::DOUBLE / n_risk::DOUBLE)
                           + 0.5) AS BIGINT)
         END AS step,
         max(CASE WHEN d = n_risk THEN 1 ELSE 0 END) OVER (
             ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS dead
  FROM risked
)
SELECT t, n_risk, d, c,
       CASE WHEN dead = 0 THEN
         sum(step) OVER (ORDER BY t
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       END::BIGINT AS cum_lp_micro
FROM stepped
"""



def k_anonymity_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity release audit of events under the quasi-identifier
    (event_type, event date, floor(value)) (operators/audit.py
    ``k_anonymity_report``, k=5)."""
    from arcane_framework_spark.operators.audit import k_anonymity_report
    from arcane_framework_spark.session import ts_timestamp

    t = load_tables(spark, sf_dir, "events")
    ev = t["events"].select(
        "event_type",
        F.to_date(ts_timestamp(t["events"])).alias("__d"),
        F.floor("value").alias("__v"),
    )
    return k_anonymity_report(
        ev, [F.col("event_type"), F.col("__d"), F.col("__v")]
    )


_K_ANONYMITY_SQL = r"""
WITH classes AS (
  SELECT event_type, CAST(ts AS DATE) AS d, floor(value) AS v,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2, 3
)
SELECT sum(n)::BIGINT AS n_rows,
       count(*)::BIGINT AS n_classes,
       min(n)::BIGINT AS min_class_size,
       sum(CASE WHEN n < 5 THEN 1 ELSE 0 END)::BIGINT AS classes_below_k,
       sum(CASE WHEN n < 5 THEN n ELSE 0 END)::BIGINT AS rows_below_k
FROM classes
"""



MMR_ENTRY_QUERIES = 10
MMR_ENTRY_K = 5


def mmr_topk_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified top-5 retrieval for the standard query set
    (operators/similarity.py ``mmr_topk``): relevance top-20 pool, then
    five unrolled greedy diversity steps."""
    from arcane_framework_spark.operators.similarity import mmr_topk

    t = load_tables(spark, sf_dir, "embeddings")
    emb = t["embeddings"]
    return mmr_topk(
        emb, emb.filter(F.col("vec_id") < MMR_ENTRY_QUERIES), k=MMR_ENTRY_K
    )


def _mmr_sql() -> str:
    from arcane_framework_spark.operators.similarity import (
        MMR_LAMBDA,
        MMR_POOL,
    )

    lam = repr(float(MMR_LAMBDA))
    lam_d = repr(float(1.0 - MMR_LAMBDA))
    cos = ("list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
           " * sqrt(list_dot_product({b}, {b})))")
    steps = []
    for i in range(2, MMR_ENTRY_K + 1):
        sim = cos.format(a="c.v", b="s.v")
        steps.append(f"""
cand{i} AS (
  SELECT c.* FROM cand c
  ANTI JOIN acc{i - 1} a ON c.query_id = a.query_id AND c.id = a.id
),
msim{i} AS (
  SELECT c.query_id, c.id, c.v, c.rel, max({sim}) AS ms
  FROM cand{i} c JOIN acc{i - 1} s USING (query_id)
  GROUP BY c.query_id, c.id, c.v, c.rel
),
sel{i} AS (
  SELECT query_id, id, v, rel, {i} AS rank, score AS mmr_score FROM (
    SELECT *, {lam} * rel - {lam_d} * ms AS score,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY ({lam} * rel - {lam_d} * ms) DESC,
                                       id) AS rn
    FROM msim{i}) WHERE rn = 1
),
acc{i} AS (
  SELECT * FROM acc{i - 1}
  UNION ALL
  SELECT query_id, id, v, rel, rank, mmr_score FROM sel{i}
),""")
    unrolled = "".join(steps).rstrip(",\n").rstrip(",")
    qcos = cos.format(a="q.qv", b="e.v")
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, v AS qv FROM e
  WHERE vec_id < {MMR_ENTRY_QUERIES}
),
scored AS (
  SELECT q.query_id, e.vec_id AS id, e.v, {qcos} AS rel
  FROM q CROSS JOIN e WHERE q.query_id <> e.vec_id
),
cand AS (
  SELECT query_id, id, v, rel FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY rel DESC, id) AS rn
    FROM scored) WHERE rn <= {MMR_POOL}
),
sel1 AS (
  SELECT query_id, id, v, rel, 1 AS rank, rel AS mmr_score FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY rel DESC, id) AS rn
    FROM cand) WHERE rn = 1
),
acc1 AS (SELECT * FROM sel1),
{unrolled}
SELECT query_id, id AS vec_id, rank::INT AS rank,
       round(rel, 6) AS relevance, round(mmr_score, 6) AS mmr_score
FROM acc{MMR_ENTRY_K}
"""



#: Incident threshold: hours with count > 1.5x the hourly average,
#: compared by exact integer cross-multiplication (2*cnt*H > 3*total).
_HOUR_US = 3_600_000_000


def incident_overlap_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Impact analysis: which user sessions overlap anomalous-traffic
    hours, and for how long. Sessions are the lag-gap intervals of
    ``events_sessionize``; incidents are hours whose event count
    exceeds 1.5x the hourly average (exact integer cross-multiply);
    the overlap is operators/rangejoin.py ``interval_overlap`` with the
    incident set broadcast. Returns one row per overlapping session:
    (user_id, sess_no, s_us, e_us, n_incidents, overlap_us)."""
    from pyspark.sql import Window

    from arcane_framework_spark.operators.rangejoin import interval_overlap
    from arcane_framework_spark.operators.scale import with_broadcast_scalar
    from arcane_framework_spark.queries_tpch import SESSION_GAP_US
    from arcane_framework_spark.session import ts_micros

    t = load_tables(spark, sf_dir, "events")
    ev = t["events"].select(
        "user_id", "event_id", ts_micros(t["events"]).alias("ts_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    w_run = Window.partitionBy("user_id").orderBy("ts_us", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    marked = ev.withColumn("__prev", F.lag("ts_us").over(w)).withColumn(
        "__new",
        (
            F.col("__prev").isNull()
            | (F.col("ts_us") - F.col("__prev") > SESSION_GAP_US)
        ).cast("int"),
    )
    sessions = (
        marked.withColumn("sess_no", F.sum("__new").over(w_run))
        .groupBy("user_id", "sess_no")
        .agg(F.min("ts_us").alias("s_us"), F.max("ts_us").alias("e_us"))
    )
    hourly = ev.groupBy(
        (F.expr(f"ts_us div {_HOUR_US}") * F.lit(_HOUR_US)).alias("h_us")
    ).agg(F.count(F.lit(1)).alias("__cnt"))
    stats = hourly.agg(
        F.sum("__cnt").alias("__total"), F.count(F.lit(1)).alias("__h")
    )
    incidents = (
        with_broadcast_scalar(hourly, stats)
        .filter(
            F.lit(2) * F.col("__cnt") * F.col("__h")
            > F.lit(3) * F.col("__total")
        )
        .select("h_us", (F.col("h_us") + F.lit(_HOUR_US)).alias("hend_us"))
    )
    return (
        interval_overlap(sessions, incidents)
        .groupBy("user_id", "sess_no", "s_us", "e_us")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_incidents"),
            F.sum("overlap_us").cast("long").alias("overlap_us"),
        )
    )


def _incident_overlap_sql() -> str:
    from arcane_framework_spark.queries_tpch import SESSION_GAP_US

    return rf"""
WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
),
marked AS (
  SELECT user_id, ts_us,
         CASE WHEN lag(ts_us) OVER w IS NULL
                OR ts_us - lag(ts_us) OVER w > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
sess AS (
  SELECT user_id, sess_no::BIGINT AS sess_no,
         min(ts_us) AS s_us, max(ts_us) AS e_us FROM (
    SELECT user_id, ts_us,
           sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS sess_no
    FROM marked
  ) GROUP BY 1, 2
),
hourly AS (
  SELECT (ts_us // {_HOUR_US}) * {_HOUR_US} AS h_us,
         count(*)::BIGINT AS cnt
  FROM ev GROUP BY 1
),
stats AS (SELECT sum(cnt)::BIGINT AS total, count(*)::BIGINT AS h FROM hourly),
incidents AS (
  SELECT h_us, h_us + {_HOUR_US} AS hend_us
  FROM hourly CROSS JOIN stats
  WHERE 2 * cnt * h > 3 * total
)
SELECT s.user_id, s.sess_no, s.s_us, s.e_us,
       count(*)::BIGINT AS n_incidents,
       sum(greatest(0, least(s.e_us, i.hend_us - 1)
                       - greatest(s.s_us, i.h_us) + 1))::BIGINT AS overlap_us
FROM sess s JOIN incidents i
  ON s.s_us < i.hend_us AND s.e_us >= i.h_us
GROUP BY 1, 2, 3, 4
"""



def decayed_engagement_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-decayed engagement: Σ value · 2^(−age_days), the
    recency-weighted activity score feeding retention/churn models. The
    half-life-one-day decay base is 2 ON PURPOSE: 2^(−k) is an exact
    binary double (computed as an integer shift — never ``pow``, whose
    last-ulp behavior differs across libms), and division by it is
    exact scaling, so per-row contributions are bit-identical in both
    engines before the fixed-point rounding; ages > 62 days contribute
    exactly 0 (sub-micro decay, shift-overflow guard).

    One scan + one broadcast max-ts scalar + one per-user aggregate.
    Returns (user_id, n_events, score)."""
    from arcane_framework_spark.operators.scale import with_broadcast_scalar
    from arcane_framework_spark.session import ts_micros

    t = load_tables(spark, sf_dir, "events")
    ev = t["events"].select(
        "user_id", "value", ts_micros(t["events"]).alias("tsm")
    )
    mx = ev.agg(F.max("tsm").alias("__mx"))
    aged = with_broadcast_scalar(ev, mx).withColumn(
        "__age", F.expr("(__mx - tsm) div 86400000000")
    )
    # shiftleft's bit-count arg must be a Column-typed expression — the
    # python API only takes a literal int, so this one goes through expr.
    contrib = F.when(
        F.col("__age") <= 62,
        F.col("value")
        / F.expr(
            "CAST(shiftleft(CAST(1 AS BIGINT), CAST(__age AS INT)) "
            "AS DOUBLE)"
        ),
    ).otherwise(F.lit(0.0))
    return (
        aged.withColumn(
            "__c_fp",
            F.floor(contrib * F.lit(1e6) + F.lit(0.5)).cast("long"),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            (F.sum("__c_fp").cast("double") / 1e6).alias("score"),
        )
    )


_DECAYED_ENGAGEMENT_SQL = r"""
WITH ev AS (
  SELECT user_id, value, epoch_us(ts) AS tsm FROM events
),
mx AS (SELECT max(tsm) AS mxts FROM ev),
aged AS (
  SELECT user_id, value, (mxts - tsm) // 86400000000 AS age
  FROM ev CROSS JOIN mx
)
SELECT user_id, count(*)::BIGINT AS n_events,
       sum(CAST(floor(
             CASE WHEN age <= 62
                  THEN value / ((1::BIGINT << age::INT))::DOUBLE
                  ELSE 0.0 END * 1e6 + 0.5) AS BIGINT))::DOUBLE / 1e6
         AS score
FROM aged
GROUP BY user_id
"""



def streaming_transitions_users(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Per-user transition counts maintained BY custom scalar streaming
    state (streaming/stateful.py ``transitions_stream``): the state is
    each user's last event only; micro-batches emit additive increments
    and the consumer sums them — streaming totals ≡ batch
    ``event_transitions`` counts ≡ DuckDB."""
    from arcane_framework_spark.queries_ext import stream_conf
    from arcane_framework_spark.session import ts_micros
    from arcane_framework_spark.streaming.stateful import transitions_stream

    t = load_tables(spark, sf_dir, "events")
    schema = t["events"].schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ev = stream.select(
        "user_id",
        "event_type",
        "event_id",
        ts_micros(stream).alias("ts_us"),
    )
    inc = transitions_stream(ev)
    name = "streaming_transitions_sink"
    with stream_conf(spark):
        q = (
            inc.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.table(name)
        .groupBy("prev_type", "next_type")
        .agg(F.sum("inc").cast("long").alias("cnt"))
    )


_STREAMING_TRANSITIONS_SQL = r"""
WITH seq AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type,
         event_type AS next_type
  FROM events
)
SELECT prev_type, next_type, count(*)::BIGINT AS cnt
FROM seq WHERE prev_type IS NOT NULL
GROUP BY 1, 2
"""



def rake_keyphrases_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 RAKE keyphrases over the corpus
    (operators/text.py ``rake_keyphrases``)."""
    from arcane_framework_spark.operators.text import rake_keyphrases

    t = load_tables(spark, sf_dir, "documents")
    return rake_keyphrases(t["documents"].select("doc_id", "text"))


def _rake_sql() -> str:
    from arcane_framework_spark.operators.text import (
        RAKE_MAX_PHRASE,
        RAKE_STOPWORDS,
        RAKE_TOP_K,
    )

    stops = ", ".join(f"'{w}'" for w in RAKE_STOPWORDS)
    return rf"""
WITH tok AS (
  SELECT doc_id, tok, pos FROM (
    SELECT doc_id, unnest(w) AS tok, generate_subscripts(w, 1) AS pos
    FROM (SELECT doc_id,
                 string_split_regex(lower(trim(text)), '\s+') AS w
          FROM documents)
  ) WHERE tok <> ''
),
runs AS (
  SELECT doc_id, tok, pos, stp,
         sum(stp) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS run
  FROM (SELECT *, CASE WHEN tok IN ({stops}) THEN 1 ELSE 0 END AS stp
        FROM tok)
),
phr0 AS (
  SELECT doc_id, run,
         string_agg(tok, ' ' ORDER BY pos) AS phrase,
         count(*)::BIGINT AS len
  FROM runs WHERE stp = 0
  GROUP BY 1, 2
),
phr AS (SELECT phrase, len FROM phr0 WHERE len <= {RAKE_MAX_PHRASE}),
ws AS (
  SELECT w,
         CAST(floor(sum(len)::DOUBLE * 1e6 / count(*)::DOUBLE + 0.5)
              AS BIGINT) AS ws_fp
  FROM (SELECT unnest(string_split(phrase, ' ')) AS w, len FROM phr)
  GROUP BY w
),
psum AS (
  SELECT phrase, sum(ws_fp)::BIGINT AS sum_fp
  FROM (SELECT phrase, unnest(string_split(phrase, ' ')) AS w FROM phr)
  JOIN ws USING (w)
  GROUP BY phrase
),
occ AS (SELECT phrase, count(*)::BIGINT AS n_occurrences FROM phr GROUP BY 1),
scored AS (
  SELECT p.phrase, o.n_occurrences,
         (p.sum_fp // o.n_occurrences)::BIGINT AS rank_fp
  FROM psum p JOIN occ o USING (phrase)
)
SELECT phrase, n_occurrences, rank_fp::DOUBLE / 1e6 AS score FROM (
  SELECT *, row_number() OVER (ORDER BY rank_fp DESC, phrase) AS rn
  FROM scored
) WHERE rn <= {RAKE_TOP_K}
"""



def prefix_filter_pairs_documents(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """EXACT all-pairs shingle-set Jaccard >= 3/5 via prefix filtering
    (operators/dedup.py ``prefix_filter_pairs``) — the recall-guaranteed
    complement to the LSH family, over the shared planted corpus."""
    from arcane_framework_spark.operators.dedup import prefix_filter_pairs
    from arcane_framework_spark.queries import _planted_neardup_docs

    return prefix_filter_pairs(_planted_neardup_docs(spark, sf_dir))


def _prefix_filter_sql() -> str:
    from arcane_framework_spark.operators.dedup import (
        PREFIX_JACCARD_DEN,
        PREFIX_JACCARD_NUM,
    )

    num, den = PREFIX_JACCARD_NUM, PREFIX_JACCARD_DEN
    t = repr(float(num) / float(den))
    return rf"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text || ' ' || text
  FROM documents WHERE doc_id % 7 = 0
),
tw AS (
  SELECT doc_id AS id,
         string_split_regex(lower(trim(text)), '\s+') AS w
  FROM corpus
),
toks AS (
  SELECT id,
         unnest(list_distinct(
           CASE WHEN len(w) >= 3
                THEN list_transform(range(1, len(w) - 1),
                                    i -> w[i] || ' ' || w[i+1] || ' '
                                         || w[i+2])
                ELSE [array_to_string(w, ' ')] END)) AS tok
  FROM tw
),
dfreq AS (SELECT tok, count(*)::BIGINT AS df FROM toks GROUP BY 1),
sizes AS (SELECT id, count(*)::BIGINT AS n FROM toks GROUP BY 1),
ranked AS (
  SELECT t.id, t.tok, s.n,
         row_number() OVER (PARTITION BY t.id ORDER BY d.df, t.tok) AS rn
  FROM toks t JOIN dfreq d USING (tok) JOIN sizes s USING (id)
),
pref AS (
  SELECT id, tok, n FROM ranked
  WHERE rn <= n - ceil({t} * n) + 1
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.n AS na, b.n AS nb
  FROM pref a JOIN pref b ON a.tok = b.tok AND a.id < b.id
  WHERE least(a.n, b.n) * {den} >= greatest(a.n, b.n) * {num}
),
inter AS (
  SELECT c.id_a, c.id_b, c.na, c.nb, count(*)::BIGINT AS ni
  FROM cand c JOIN toks ta ON ta.id = c.id_a
              JOIN toks tb ON tb.id = c.id_b AND tb.tok = ta.tok
  GROUP BY 1, 2, 3, 4
)
SELECT id_a, id_b,
       round(ni::DOUBLE / (na + nb - ni)::DOUBLE, 6) AS jaccard
FROM inter WHERE ni * {den} >= {num} * (na + nb - ni)
"""



#: Vocabulary-growth diagnostic bucket count.
VOCAB_GROWTH_BUCKETS = 10


def vocab_growth_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary-growth diagnostic: the corpus in 10 doc-id
    buckets, per bucket the token volume and the NEW types first seen
    there, with cumulative curves — the sanity check that a corpus
    keeps contributing vocabulary (a flattening curve means new data is
    rehashing old text). All integer counts; the bucket boundary is an
    exact integer expression from a broadcast min/max."""
    from pyspark.sql import Window

    from arcane_framework_spark.operators.scale import with_broadcast_scalar
    from arcane_framework_spark.operators.text import tokens_expr

    B = VOCAB_GROWTH_BUCKETS
    t = load_tables(spark, sf_dir, "documents")
    docs = t["documents"].select("doc_id", "text")
    rng = docs.agg(
        F.min("doc_id").alias("__mn"), F.max("doc_id").alias("__mx")
    )
    toks = with_broadcast_scalar(docs, rng).select(
        # integer `div`, not `/`: double division + int-cast truncation
        # can disagree with DuckDB's integer floor at precision edges
        F.least(
            F.lit(B - 1),
            F.expr(f"((doc_id - __mn) * {B}) div (__mx - __mn + 1)"),
        ).cast("int").alias("bucket"),
        F.explode(tokens_expr("text")).alias("tok"),
    ).filter(F.col("tok") != "")
    vol = toks.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_tokens"))
    first = toks.groupBy("tok").agg(F.min("bucket").alias("bucket"))
    news = first.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("new_types")
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        vol.join(news, "bucket", "left")
        .withColumn("new_types", F.coalesce("new_types", F.lit(0)))
        .select(
            "bucket",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("new_types").cast("long").alias("new_types"),
        )
        .withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("long"))
        .withColumn("cum_types", F.sum("new_types").over(w).cast("long"))
    )


def _vocab_growth_sql() -> str:
    B = VOCAB_GROWTH_BUCKETS
    return rf"""
WITH rng AS (SELECT min(doc_id) AS mn, max(doc_id) AS mx FROM documents),
toks AS (
  SELECT least({B - 1},
               ((doc_id - mn) * {B} // (mx - mn + 1)))::INT AS bucket,
         unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
  FROM documents CROSS JOIN rng
),
tk AS (SELECT * FROM toks WHERE tok <> ''),
vol AS (SELECT bucket, count(*)::BIGINT AS n_tokens FROM tk GROUP BY 1),
first AS (SELECT tok, min(bucket) AS bucket FROM tk GROUP BY 1),
news AS (SELECT bucket, count(*)::BIGINT AS new_types FROM first GROUP BY 1)
SELECT bucket, n_tokens,
       coalesce(new_types, 0)::BIGINT AS new_types,
       sum(n_tokens) OVER (ORDER BY bucket
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                          )::BIGINT AS cum_tokens,
       sum(coalesce(new_types, 0)) OVER (
           ORDER BY bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       )::BIGINT AS cum_types
FROM vol LEFT JOIN news USING (bucket)
"""



EVENT_PATHS_TOP_K = 20


def event_paths_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 three-step user journey paths (the depth-2 extension of
    ``event_transitions_users``): per-user double-lag windows build
    (t1, t2, t3) path instances, counted and ranked globally — the
    funnel-discovery query behind 'what do users actually do'."""
    from pyspark.sql import Window

    from arcane_framework_spark.session import ts_micros

    t = load_tables(spark, sf_dir, "events")
    ev = t["events"].select(
        "user_id", "event_id", "event_type",
        ts_micros(t["events"]).alias("tsm"),
    )
    w = Window.partitionBy("user_id").orderBy("tsm", "event_id")
    paths = (
        ev.select(
            F.lag("event_type", 2).over(w).alias("t1"),
            F.lag("event_type", 1).over(w).alias("t2"),
            F.col("event_type").alias("t3"),
        )
        .filter(F.col("t1").isNotNull())
        .groupBy("t1", "t2", "t3")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_top = Window.orderBy(F.col("cnt").desc(), "t1", "t2", "t3")
    return (
        paths.withColumn("__rn", F.row_number().over(w_top))
        .filter(F.col("__rn") <= EVENT_PATHS_TOP_K)
        .select("t1", "t2", "t3", "cnt")
    )


_EVENT_PATHS_SQL = rf"""
WITH seq AS (
  SELECT lag(event_type, 2) OVER w AS t1,
         lag(event_type, 1) OVER w AS t2,
         event_type AS t3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
counts AS (
  SELECT t1, t2, t3, count(*)::BIGINT AS cnt
  FROM seq WHERE t1 IS NOT NULL
  GROUP BY 1, 2, 3
)
SELECT t1, t2, t3, cnt FROM (
  SELECT *, row_number() OVER (ORDER BY cnt DESC, t1, t2, t3) AS rn
  FROM counts
) WHERE rn <= 20
"""


def containment_pairs_documents(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """EXACT asymmetric containment join (operators/dedup.py
    ``containment_pairs``): quote detection over a corpus where every
    13th document is pasted together with its successor into a synthetic
    "container" — the constituent docs have containment 1.0 against it
    while their Jaccard vs the container is ~1/2 (union dominated by the
    other half), i.e. exactly the pairs the symmetric dedup family
    cannot see."""
    from arcane_framework_spark.operators.dedup import containment_pairs

    t = load_tables(spark, sf_dir, "documents")
    d = t["documents"].select("doc_id", "text")
    nxt = d.select(
        F.col("doc_id").alias("__nid"), F.col("text").alias("__ntext")
    )
    quotes = (
        d.filter(F.col("doc_id") % 13 == 0)
        .join(nxt, F.col("__nid") == F.col("doc_id") + 1)
        .select(
            (F.col("doc_id") + F.lit(200000)).alias("doc_id"),
            F.concat_ws(" ", "text", "__ntext").alias("text"),
        )
    )
    return containment_pairs(d.unionByName(quotes))


def _containment_sql() -> str:
    from arcane_framework_spark.operators.dedup import (
        CONTAIN_DEN,
        CONTAIN_NUM,
    )

    num, den = CONTAIN_NUM, CONTAIN_DEN
    t = repr(float(num) / float(den))
    return rf"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT a.doc_id + 200000, a.text || ' ' || b.text
  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
  WHERE a.doc_id % 13 = 0
),
tw AS (
  SELECT doc_id AS id,
         string_split_regex(lower(trim(text)), '\s+') AS w
  FROM corpus
),
toks AS (
  SELECT id,
         unnest(list_distinct(
           CASE WHEN len(w) >= 3
                THEN list_transform(range(1, len(w) - 1),
                                    i -> w[i] || ' ' || w[i+1] || ' '
                                         || w[i+2])
                ELSE [array_to_string(w, ' ')] END)) AS tok
  FROM tw
),
dfreq AS (SELECT tok, count(*)::BIGINT AS df FROM toks GROUP BY 1),
sizes AS (SELECT id, count(*)::BIGINT AS n FROM toks GROUP BY 1),
ranked AS (
  SELECT t.id, t.tok, s.n,
         row_number() OVER (PARTITION BY t.id ORDER BY d.df, t.tok) AS rn
  FROM toks t JOIN dfreq d USING (tok) JOIN sizes s USING (id)
),
pref AS (
  SELECT id AS id_a, n AS na, tok FROM ranked
  WHERE rn <= n - ceil({t} * n) + 1
),
cand AS (
  SELECT DISTINCT p.id_a, q.id AS id_b, p.na
  FROM pref p
  JOIN (SELECT t.id, t.tok, s.n AS nb
        FROM toks t JOIN sizes s USING (id)) q USING (tok)
  WHERE p.id_a <> q.id AND q.nb * {den} >= {num} * p.na
),
inter AS (
  SELECT c.id_a, c.id_b, c.na, count(*)::BIGINT AS ni
  FROM cand c JOIN toks ta ON ta.id = c.id_a
              JOIN toks tb ON tb.id = c.id_b AND tb.tok = ta.tok
  GROUP BY 1, 2, 3
)
SELECT id_a AS contained_id, id_b AS container_id,
       round(ni::DOUBLE / na::DOUBLE, 6) AS containment
FROM inter WHERE ni * {den} >= {num} * na
"""


def ks_drift_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic per event type
    between the early and late halves of the time range: the max ECDF
    gap ``D = max_x |F_early(x) - F_late(x)|`` — the distribution-drift
    test that, unlike the binned-TVD drift report, is sensitive at EVERY
    threshold and needs no bin tuning. The split point is the integer
    midpoint of a broadcast (min, max); the ECDF compare is the integer
    cross-multiply ``|cum0*n1 - cum1*n0|`` over per-distinct-value
    cumulative counts (one value-sorted window per event-type
    partition); the single division happens once per type at the end."""
    from pyspark.sql import Window

    from arcane_framework_spark.operators.scale import with_broadcast_scalar
    from arcane_framework_spark.session import ts_micros

    t = load_tables(spark, sf_dir, "events")
    ev = t["events"].select(
        "event_type", "value", ts_micros(t["events"]).alias("ts_us")
    )
    rng = ev.agg(F.min("ts_us").alias("__mn"), F.max("ts_us").alias("__mx"))
    sided = with_broadcast_scalar(ev, rng).select(
        "event_type",
        "value",
        # ts*2 <= mn+mx is the halfway test without any division
        (F.col("ts_us") * 2 <= F.col("__mn") + F.col("__mx"))
        .cast("int")
        .alias("__early"),
    )
    g = sided.groupBy("event_type", "value").agg(
        F.sum("__early").alias("c0"),
        F.sum(F.lit(1) - F.col("__early")).alias("c1"),
    )
    w = Window.partitionBy("event_type").orderBy("value").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wt = Window.partitionBy("event_type")
    cum = g.select(
        "event_type",
        F.sum("c0").over(w).alias("cum0"),
        F.sum("c1").over(w).alias("cum1"),
        F.sum("c0").over(wt).alias("n0"),
        F.sum("c1").over(wt).alias("n1"),
    )
    d = cum.withColumn(
        "__d",
        F.abs(F.col("cum0") * F.col("n1") - F.col("cum1") * F.col("n0")),
    )
    return d.groupBy("event_type").agg(
        F.max("n0").cast("long").alias("n_early"),
        F.max("n1").cast("long").alias("n_late"),
        F.round(
            F.max("__d").cast("double")
            / (F.max("n0").cast("double") * F.max("n1").cast("double")),
            6,
        ).alias("ks"),
    )


_KS_DRIFT_SQL = r"""
WITH ev AS (
  SELECT event_type, value, epoch_us(ts) AS ts_us FROM events
),
rng AS (SELECT min(ts_us) AS mn, max(ts_us) AS mx FROM ev),
sided AS (
  SELECT event_type, value,
         CASE WHEN ts_us * 2 <= mn + mx THEN 1 ELSE 0 END AS early
  FROM ev CROSS JOIN rng
),
g AS (
  SELECT event_type, value,
         sum(early)::BIGINT AS c0, sum(1 - early)::BIGINT AS c1
  FROM sided GROUP BY 1, 2
),
cum AS (
  SELECT event_type,
         (sum(c0) OVER w)::BIGINT AS cum0,
         (sum(c1) OVER w)::BIGINT AS cum1,
         (sum(c0) OVER wt)::BIGINT AS n0,
         (sum(c1) OVER wt)::BIGINT AS n1
  FROM g
  WINDOW w AS (PARTITION BY event_type ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wt AS (PARTITION BY event_type)
)
SELECT event_type, max(n0)::BIGINT AS n_early, max(n1)::BIGINT AS n_late,
       round(max(abs(cum0*n1 - cum1*n0))::DOUBLE
             / (max(n0)::DOUBLE * max(n1)::DOUBLE), 6) AS ks
FROM cum GROUP BY 1
"""


def activity_gini_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration of user activity per event type — the
    training-data-balance diagnostic ("is the corpus dominated by a few
    heavy users?"). Computed WITHOUT sorting users: group per-user
    counts into distinct activity LEVELS (far fewer than users — the
    window sorts levels, never users, per the repo's metadata-scale
    window rule), then the sorted-index sum folds in closed form per
    level: users at level x with multiplicity m occupying positions
    cum_prev+1..cum_prev+m contribute ``x*(m*cum_prev + m(m+1)/2)`` to
    ``sum(i*x_i)``. Gini = (2*S2 - (n+1)*S1) / (n*S1), exact integers
    until one final division."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir, "events")
    cnts = t["events"].groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("x")
    )
    levels = cnts.groupBy("event_type", "x").agg(
        F.count(F.lit(1)).alias("m")
    )
    w = Window.partitionBy("event_type").orderBy("x").rowsBetween(
        Window.unboundedPreceding, 0
    )
    lv = levels.withColumn("cum", F.sum("m").over(w))
    agg = lv.groupBy("event_type").agg(
        F.sum(F.col("x") * F.col("m")).alias("s1"),
        F.sum(
            F.expr("x * (m*(cum - m) + (m*(m+1)) div 2)")
        ).alias("s2"),
        F.sum("m").alias("n"),
    )
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n_users"),
        F.col("s1").cast("long").alias("n_events"),
        F.round(
            (2 * F.col("s2") - (F.col("n") + 1) * F.col("s1")).cast("double")
            / (F.col("n") * F.col("s1")).cast("double"),
            6,
        ).alias("gini"),
    )


_ACTIVITY_GINI_SQL = r"""
WITH cnts AS (
  SELECT event_type, user_id, count(*)::BIGINT AS x FROM events GROUP BY 1, 2
),
lv AS (SELECT event_type, x, count(*)::BIGINT AS m FROM cnts GROUP BY 1, 2),
c AS (
  SELECT event_type, x, m,
         (sum(m) OVER (PARTITION BY event_type ORDER BY x
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         )::BIGINT AS cum
  FROM lv
),
a AS (
  SELECT event_type,
         sum(x*m)::BIGINT AS s1,
         sum(x * (m*(cum - m) + (m*(m+1)) // 2))::BIGINT AS s2,
         sum(m)::BIGINT AS n
  FROM c GROUP BY 1
)
SELECT event_type, n AS n_users, s1 AS n_events,
       round((2*s2 - (n+1)*s1)::DOUBLE / (n*s1)::DOUBLE, 6) AS gini
FROM a
"""


def cusum_changepoint_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact CUSUM changepoint per event type over hourly counts: the
    hour t maximizing ``|sum_{i<=t}(x_i - mean)|`` — where the event
    rate shifted. Division-free: the cumulative deviation is scaled by
    n_hours (``S_t = n*cum_t - t*total``, exact integers), the argmax is
    a deterministic (|S| desc, hour asc) rank over per-type HOURLY rows
    (metadata-scale windows — hours, never events)."""
    from pyspark.sql import Window

    from arcane_framework_spark.session import ts_micros

    t = load_tables(spark, sf_dir, "events")
    ev = t["events"].select(
        "event_type", ts_micros(t["events"]).alias("ts_us")
    )
    hourly = ev.groupBy(
        "event_type",
        (F.expr(f"ts_us div {_HOUR_US}") * F.lit(_HOUR_US)).alias("h_us"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("event_type").orderBy("h_us").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wo = Window.partitionBy("event_type").orderBy("h_us")
    wt = Window.partitionBy("event_type")
    s = (
        hourly.withColumn("cum", F.sum("cnt").over(w))
        .withColumn("idx", F.row_number().over(wo))
        .withColumn("tot", F.sum("cnt").over(wt))
        .withColumn("nh", F.count(F.lit(1)).over(wt))
        .withColumn(
            "__s",
            F.abs(F.col("nh") * F.col("cum") - F.col("idx") * F.col("tot")),
        )
    )
    pick = Window.partitionBy("event_type").orderBy(
        F.col("__s").desc(), "h_us"
    )
    return (
        s.withColumn("__rn", F.row_number().over(pick))
        .filter(F.col("__rn") == 1)
        .select(
            "event_type",
            F.col("h_us").alias("change_hour_us"),
            F.col("__s").cast("long").alias("cusum_scaled"),
            F.col("nh").cast("long").alias("n_hours"),
            F.col("tot").cast("long").alias("n_events"),
        )
    )


_CUSUM_SQL = rf"""
WITH hourly AS (
  SELECT event_type,
         (epoch_us(ts) // {_HOUR_US}) * {_HOUR_US} AS h_us,
         count(*)::BIGINT AS cnt
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT event_type, h_us,
         (sum(cnt) OVER (PARTITION BY event_type ORDER BY h_us
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         )::BIGINT AS cum,
         row_number() OVER (PARTITION BY event_type ORDER BY h_us) AS idx,
         (sum(cnt) OVER (PARTITION BY event_type))::BIGINT AS tot,
         (count(*) OVER (PARTITION BY event_type))::BIGINT AS nh
  FROM hourly
)
SELECT event_type, h_us AS change_hour_us,
       abs(nh*cum - idx*tot)::BIGINT AS cusum_scaled,
       nh AS n_hours, tot AS n_events
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY event_type
      ORDER BY abs(nh*cum - idx*tot) DESC, h_us) AS rn
  FROM s
) WHERE rn = 1
"""


#: Kappa quality filters: length gate (chars) and low-repetition gate
#: (distinct tokens at least half the tokens).
KAPPA_MIN_CHARS = 200


def kappa_filters_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa agreement between two independent document quality
    filters — the eval-suite question "do my cheap filters agree beyond
    chance, or is one redundant / one broken?". Filter A: length gate
    (n_chars >= 200). Filter B: low-repetition gate (distinct tokens >=
    half the tokens). One scan builds the 2x2 contingency table as four
    conditional sums; kappa = (N*(n11+n00) - (a1*b1 + a0*b0)) /
    (N^2 - (a1*b1 + a0*b0)) — exact integers until one division."""
    from arcane_framework_spark.operators.text import tokens_expr

    t = load_tables(spark, sf_dir, "documents")
    d = t["documents"].select("n_chars", "text")
    # explode(array(...)) materializes the token array once (Generate
    # barrier) — it is referenced twice below (size + distinct size).
    feats = d.select(
        "n_chars", F.explode(F.array(tokens_expr("text"))).alias("tk")
    ).select(
        (F.col("n_chars") >= KAPPA_MIN_CHARS).cast("int").alias("a"),
        (F.size(F.array_distinct("tk")) * 2 >= F.size("tk"))
        .cast("int")
        .alias("b"),
    )
    agg = feats.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("a * b")).alias("n11"),
        F.sum(F.expr("a * (1 - b)")).alias("n10"),
        F.sum(F.expr("(1 - a) * b")).alias("n01"),
        F.sum(F.expr("(1 - a) * (1 - b)")).alias("n00"),
    )
    pe_num = (F.col("n11") + F.col("n10")) * (F.col("n11") + F.col("n01")) + (
        F.col("n01") + F.col("n00")
    ) * (F.col("n10") + F.col("n00"))
    return agg.select(
        F.col("n").cast("long").alias("n_docs"),
        F.col("n11").cast("long").alias("n_both"),
        F.col("n10").cast("long").alias("n_len_only"),
        F.col("n01").cast("long").alias("n_rep_only"),
        F.col("n00").cast("long").alias("n_neither"),
        F.round(
            (F.col("n11") + F.col("n00")).cast("double")
            / F.col("n").cast("double"),
            6,
        ).alias("agree_rate"),
        F.round(
            (F.col("n") * (F.col("n11") + F.col("n00")) - pe_num).cast(
                "double"
            )
            / (F.col("n") * F.col("n") - pe_num).cast("double"),
            6,
        ).alias("kappa"),
    )


_KAPPA_SQL = rf"""
WITH feats AS (
  SELECT CASE WHEN n_chars >= {KAPPA_MIN_CHARS} THEN 1 ELSE 0 END AS a,
         CASE WHEN len(list_distinct(tk)) * 2 >= len(tk)
              THEN 1 ELSE 0 END AS b
  FROM (SELECT n_chars,
               string_split_regex(lower(trim(text)), '\s+') AS tk
        FROM documents)
),
agg AS (
  SELECT count(*)::BIGINT AS n,
         sum(a * b)::BIGINT AS n11,
         sum(a * (1 - b))::BIGINT AS n10,
         sum((1 - a) * b)::BIGINT AS n01,
         sum((1 - a) * (1 - b))::BIGINT AS n00
  FROM feats
)
SELECT n AS n_docs, n11 AS n_both, n10 AS n_len_only,
       n01 AS n_rep_only, n00 AS n_neither,
       round((n11 + n00)::DOUBLE / n::DOUBLE, 6) AS agree_rate,
       round((n*(n11 + n00) - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00))
             )::DOUBLE
             / (n*n - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00)))::DOUBLE,
             6) AS kappa
FROM agg
"""


def session_copairs_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-session event-type co-occurrence with lift: sessionize by
    the 30-minute gap rule, reduce each session to its distinct type
    set, count unordered type pairs across sessions, and score lift =
    S*c_xy/(c_x*c_y) — the episode-mining primitive behind "which
    behaviors cluster in a sitting". The pair join is per-session over
    distinct TYPES (bounded by the type vocabulary, not events); the
    final rank runs over pair-TYPE rows (metadata scale)."""
    from pyspark.sql import Window

    from arcane_framework_spark.operators.scale import with_broadcast_scalar
    from arcane_framework_spark.queries_tpch import SESSION_GAP_US
    from arcane_framework_spark.session import ts_micros

    t = load_tables(spark, sf_dir, "events")
    ev = t["events"].select(
        "user_id", "event_id", "event_type",
        ts_micros(t["events"]).alias("ts_us"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    w_run = Window.partitionBy("user_id").orderBy(
        "ts_us", "event_id"
    ).rowsBetween(Window.unboundedPreceding, 0)
    marked = ev.withColumn("__prev", F.lag("ts_us").over(w)).withColumn(
        "__new",
        (
            F.col("__prev").isNull()
            | (F.col("ts_us") - F.col("__prev") > SESSION_GAP_US)
        ).cast("int"),
    )
    st = (
        marked.withColumn("sess_no", F.sum("__new").over(w_run))
        .select("user_id", "sess_no", "event_type")
        .distinct()
    )
    from arcane_framework_spark.operators.cache import scoped_persist

    st = scoped_persist(st)
    n_sess = st.select("user_id", "sess_no").distinct().agg(
        F.count(F.lit(1)).alias("__s")
    )
    cx = st.groupBy("event_type").agg(F.count(F.lit(1)).alias("c"))
    a = st.select("user_id", "sess_no", F.col("event_type").alias("type_a"))
    b = st.select("user_id", "sess_no", F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, ["user_id", "sess_no"])
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_sessions_both"))
    )
    # per-type totals are a type-cardinality table — genuinely broadcast
    scored = (
        with_broadcast_scalar(pairs, n_sess)
        .join(
            F.broadcast(cx.select(F.col("event_type").alias("type_a"),
                                  F.col("c").alias("__ca"))),
            "type_a",
        )
        .join(
            F.broadcast(cx.select(F.col("event_type").alias("type_b"),
                                  F.col("c").alias("__cb"))),
            "type_b",
        )
        .select(
            "type_a", "type_b",
            F.col("n_sessions_both").cast("long").alias("n_sessions_both"),
            F.round(
                (F.col("__s") * F.col("n_sessions_both")).cast("double")
                / (F.col("__ca") * F.col("__cb")).cast("double"),
                6,
            ).alias("lift"),
        )
    )
    w_top = Window.orderBy(F.col("lift").desc(), "type_a", "type_b")
    return (
        scored.withColumn("__rn", F.row_number().over(w_top))
        .filter(F.col("__rn") <= 20)
        .drop("__rn")
    )


def _session_copairs_sql() -> str:
    from arcane_framework_spark.queries_tpch import SESSION_GAP_US

    return rf"""
WITH ev AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events
),
marked AS (
  SELECT user_id, event_type, ts_us,
         CASE WHEN lag(ts_us) OVER w IS NULL
                OR ts_us - lag(ts_us) OVER w > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
st AS (
  SELECT DISTINCT user_id, sess_no, event_type FROM (
    SELECT user_id, event_type,
           sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS sess_no
    FROM marked
  )
),
s AS (SELECT count(*)::BIGINT AS n_s
      FROM (SELECT DISTINCT user_id, sess_no FROM st)),
cx AS (SELECT event_type, count(*)::BIGINT AS c FROM st GROUP BY 1),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         count(*)::BIGINT AS n_sessions_both
  FROM st a JOIN st b
    ON a.user_id = b.user_id AND a.sess_no = b.sess_no
   AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, n_sessions_both, lift FROM (
  SELECT p.type_a, p.type_b, p.n_sessions_both,
         round((s.n_s * p.n_sessions_both)::DOUBLE
               / (ca.c * cb.c)::DOUBLE, 6) AS lift,
         row_number() OVER (
             ORDER BY round((s.n_s * p.n_sessions_both)::DOUBLE
                            / (ca.c * cb.c)::DOUBLE, 6) DESC,
                      p.type_a, p.type_b) AS rn
  FROM pairs p CROSS JOIN s
  JOIN cx ca ON ca.event_type = p.type_a
  JOIN cx cb ON cb.event_type = p.type_b
) WHERE rn <= 20
"""


def bucketed_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exchange-free BIG-BIG join through storage: orders and lineitem
    are both written as bucketed+sorted managed tables on the join key
    (16 buckets, ``operators/scale.py write_bucketed``), then joined
    bucket-aligned — the physical plan has NO Exchange between either
    scan and the SortMergeJoin (asserted in tests/test_plans.py). This
    is the recurring-fact-join answer at 100 TB: pay the shuffle once at
    write time, every subsequent join of the two tables is co-located.
    Revenue is summed in exact integer cents (floor(x*100 + 0.5)) so the
    big-sum result is order-independent and engine-exact."""
    from arcane_framework_spark.operators.scale import (
        bucketed_join,
        gc_stale_side_tables,
        session_scoped_table,
        write_bucketed,
    )

    t = load_tables(spark, sf_dir, "orders", "lineitem")
    ot = session_scoped_table(spark, "bj_orders")
    lt = session_scoped_table(spark, "bj_lineitem")
    gc_stale_side_tables(spark, "bj_orders")
    gc_stale_side_tables(spark, "bj_lineitem")
    write_bucketed(
        t["orders"].select(
            F.col("o_orderkey").alias("orderkey"), "o_orderpriority"
        ),
        ot, ["orderkey"], num_buckets=16, sort_cols=["orderkey"],
    )
    write_bucketed(
        t["lineitem"].select(
            F.col("l_orderkey").alias("orderkey"),
            F.expr(
                "CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)"
                " AS BIGINT)"
            ).alias("cents"),
        ),
        lt, ["orderkey"], num_buckets=16, sort_cols=["orderkey"],
    )
    return (
        bucketed_join(spark, ot, lt, ["orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.round(F.sum("cents").cast("double") / 100.0, 2).alias(
                "revenue"
            ),
        )
    )


_BUCKETED_JOIN_SQL = r"""
SELECT o_orderpriority, count(*)::BIGINT AS n_items,
       round(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                      AS BIGINT))::DOUBLE / 100.0, 2) AS revenue
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY 1
"""


EVAL_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "edit_neardup_documents": edit_neardup_documents,
    "query_likelihood_documents": query_likelihood_documents,
    "auc_scores_embeddings": auc_scores_embeddings,
    "calibration_ece_embeddings": calibration_ece_embeddings,
    "pagerank_documents": pagerank_documents,
    "mad_outliers_events": mad_outliers_events,
    "sorted_neighborhood_documents": sorted_neighborhood_documents,
    "streaming_cms_users": streaming_cms_users,
    "triangle_stats_documents": triangle_stats_documents,
    "bigram_nll_documents": bigram_nll_documents,
    "winsorized_stats_events": winsorized_stats_events,
    "classifier_eval_embeddings": classifier_eval_embeddings,
    "profile_columns_lineitem": profile_columns_lineitem,
    "event_transitions_users": event_transitions_users,
    "ab_test_events": ab_test_events,
    "survival_signup_purchase": survival_signup_purchase,
    "k_anonymity_events": k_anonymity_events,
    "mmr_topk_embeddings": mmr_topk_embeddings,
    "incident_overlap_sessions": incident_overlap_sessions,
    "decayed_engagement_users": decayed_engagement_users,
    "streaming_transitions_users": streaming_transitions_users,
    "rake_keyphrases_documents": rake_keyphrases_documents,
    "prefix_filter_pairs_documents": prefix_filter_pairs_documents,
    "vocab_growth_documents": vocab_growth_documents,
    "event_paths_users": event_paths_users,
    "containment_pairs_documents": containment_pairs_documents,
    "ks_drift_events": ks_drift_events,
    "activity_gini_events": activity_gini_events,
    "cusum_changepoint_events": cusum_changepoint_events,
    "kappa_filters_documents": kappa_filters_documents,
    "session_copairs_events": session_copairs_events,
    "bucketed_join_orders": bucketed_join_orders,
}

EVAL_ORACLE_SQL: dict[str, str] = {
    "edit_neardup_documents": _edit_neardup_sql(),
    "query_likelihood_documents": _query_likelihood_sql(),
    "auc_scores_embeddings": _AUC_SQL,
    "calibration_ece_embeddings": _CALIBRATION_SQL,
    "mad_outliers_events": _mad_outliers_sql(),
    "sorted_neighborhood_documents": _sorted_neighborhood_sql(),
    "streaming_cms_users": _streaming_cms_sql(),
    "bigram_nll_documents": _bigram_nll_sql(),
    "winsorized_stats_events": _winsorized_sql(),
    "classifier_eval_embeddings": _classifier_eval_sql(),
    "profile_columns_lineitem": _profile_columns_sql(),
    "event_transitions_users": _EVENT_TRANSITIONS_SQL,
    "ab_test_events": _AB_TEST_SQL,
    "survival_signup_purchase": _SURVIVAL_SQL,
    "k_anonymity_events": _K_ANONYMITY_SQL,
    "mmr_topk_embeddings": _mmr_sql(),
    "incident_overlap_sessions": _incident_overlap_sql(),
    "decayed_engagement_users": _DECAYED_ENGAGEMENT_SQL,
    "streaming_transitions_users": _STREAMING_TRANSITIONS_SQL,
    "rake_keyphrases_documents": _rake_sql(),
    "prefix_filter_pairs_documents": _prefix_filter_sql(),
    "vocab_growth_documents": _vocab_growth_sql(),
    "event_paths_users": _EVENT_PATHS_SQL,
    "containment_pairs_documents": _containment_sql(),
    "ks_drift_events": _KS_DRIFT_SQL,
    "activity_gini_events": _ACTIVITY_GINI_SQL,
    "cusum_changepoint_events": _CUSUM_SQL,
    "kappa_filters_documents": _KAPPA_SQL,
    "session_copairs_events": _session_copairs_sql(),
    "bucketed_join_orders": _BUCKETED_JOIN_SQL,
}
