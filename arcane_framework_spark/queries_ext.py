"""Extension-operator queries: n-gram Jaccard dedup, embedding near-dup,
IVF ANN, multimodal features, BPE-ish token accounting.

Same contract as queries.py: every Spark query has a DuckDB oracle with
identical column names, rounding, and hash functions. Near-dup queries plant
deterministic positives (the synthetic corpus has none) identically in both
engines, mirroring the MinHash query's planting scheme.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arcane_framework_spark.operators.dedup import (
    CHAR_NGRAM,
    NGRAM_MAX_BLOCK,
    NGRAM_SKETCH_K,
    ngram_jaccard_pairs,
)
from arcane_framework_spark.operators.multimodal import (
    documents_as_assets,
    extract_features,
)
from arcane_framework_spark.operators.similarity import (
    ann_banded_pairs,
    hyperplane_weights,
    ivf_topk,
)
from arcane_framework_spark.operators.text import (
    BPE_TOKEN_RE,
    bpe_token_count_expr,
    token_count_expr,
)
from arcane_framework_spark.session import load_tables, ts_micros, ts_timestamp
from contextlib import contextmanager


#: State partitions for the catalog's streaming twins. Streaming state
#: lives per shuffle partition and every micro-batch commits every
#: partition's store, so the partition count should track stream VOLUME —
#: at catalog scale the batch default (32) just multiplies state-commit
#: overhead ~4x. Production streams set spark.sql.shuffle.partitions per
#: job before start (the knob is fixed at stream start by the checkpoint).
STREAM_STATE_PARTITIONS = 8


@contextmanager
def stream_conf(spark: SparkSession,
                partitions: int = STREAM_STATE_PARTITIONS):
    """Scope spark.sql.shuffle.partitions around starting a streaming
    query; the batch value is restored afterwards (the stream keeps the
    value it started with)."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)

_DUP_OFFSET = 100_000

#: n-gram Jaccard: keep pairs at or above this similarity.
NGRAM_MIN_JACCARD = 0.5

#: Embedding near-dup planting/threshold parameters.
NEARDUP_EVERY = 20
NEARDUP_DELTA = 0.5
NEARDUP_MIN_COSINE = 0.8
NEARDUP_PLANES = 8
NEARDUP_BAND = 4

#: IVF parameters: centroid stride and k.
IVF_STRIDE = 25
IVF_K = 5
IVF_NUM_QUERIES = 10

from arcane_framework_spark.operators.similarity import (  # noqa: E402
    EMBEDDING_DIM,
)


# ---------------------------------------------------------------------------
# n-gram Jaccard dedup
# ---------------------------------------------------------------------------


def ngram_jaccard_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-4-gram Jaccard near-dup pairs (bottom-3-sketch blocking)."""
    from arcane_framework_spark.queries import _planted_neardup_docs

    return ngram_jaccard_pairs(
        _planted_neardup_docs(spark, sf_dir), min_jaccard=NGRAM_MIN_JACCARD
    )


def _ngram_jaccard_sql() -> str:
    k = CHAR_NGRAM
    return rf"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {_DUP_OFFSET}, text || ' ' || text
  FROM documents WHERE doc_id % 7 = 0
),
norm AS (
  SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS s
  FROM corpus
),
grams AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(s) >= {k}
           THEN list_transform(range(1, len(s) - {k - 2}),
                               i -> substr(s, i::INT, {k}))
           ELSE [s] END) AS g
  FROM norm
),
keyed0 AS (
  SELECT doc_id, g,
         array_to_string(
           list_sort(list_transform(g, x -> md5(x)))[1:{NGRAM_SKETCH_K}],
           '|') AS bk
  FROM grams
),
keyed AS (
  SELECT k.* FROM keyed0 k
  JOIN (SELECT bk, count(*) AS cnt FROM keyed0 GROUP BY bk) s USING (bk)
  WHERE s.cnt <= {NGRAM_MAX_BLOCK}
),
sized AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(a.g) AS na, len(b.g) AS nb,
         len(list_intersect(a.g, b.g)) AS ni
  FROM keyed a JOIN keyed b ON a.bk = b.bk AND a.doc_id < b.doc_id
  WHERE least(len(a.g), len(b.g))::DOUBLE
        >= ({NGRAM_MIN_JACCARD} - 1e-6)
           * greatest(len(a.g), len(b.g))::DOUBLE
)
SELECT id_a, id_b,
       round(ni::DOUBLE / (na + nb - ni)::DOUBLE, 6) AS jaccard
FROM sized
WHERE round(ni::DOUBLE / (na + nb - ni)::DOUBLE, 6) >= {NGRAM_MIN_JACCARD}
"""


#: Sample-size target for the cap-recall measurement (mod-based sample,
#: same in-plan scheme as lsh_recall_documents).
NGRAM_RECALL_TARGET = 128

#: Planted boilerplate-cluster size. Strictly above NGRAM_MAX_BLOCK so the
#: degenerate block is guaranteed to be dropped by the capped path — the
#: cohort whose recall the cap zeroes out by design.
NGRAM_BOILER_COPIES = 80

# The boilerplate-cluster id offset is NOT a constant: it is derived
# in-plan as max(doc_id) + _DUP_OFFSET + 1 (strictly above every corpus
# id and every _DUP_OFFSET-planted twin id) in BOTH engines, so no scale
# factor can make boiler ids collide with real ids and silently mislabel
# cohorts. Ids never appear in this entry's output, only cohort labels,
# so the derivation costs one 1-row broadcast aggregate per engine.


def ngram_cap_recall_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What the NGRAM_MAX_BLOCK degenerate-block guard actually costs:
    capped-path pairs vs EXACT all-pairs char-4-gram Jaccard ground truth
    on a deterministic sample, reported per cohort.

    Sample = every ``mod``-th doc (``mod = greatest(1, n_docs //
    NGRAM_RECALL_TARGET)``, computed in-plan) + their planted doubled-text
    twins + a planted boilerplate cluster: the corpus's min-doc_id text
    replicated ``NGRAM_BOILER_COPIES`` (> NGRAM_MAX_BLOCK) times, so one
    block is GUARANTEED degenerate. Ground truth is quadratic in the
    FIXED sample size only (broadcast non-equi join, never the corpus);
    at 100x the corpus the modulus grows 100x and the measurement stays
    ~TARGET² while the production path stays blocked+capped.

    Output: (cohort, n_true, n_found, n_missed, recall) — the
    'boilerplate' cohort (any pair touching the planted cluster) shows
    the cap dropping a degenerate block entirely (recall 0 there is the
    DESIGNED trade: b²/2 verifications saved per pathological key); the
    'corpus' cohort is the honest recall of the capped blocked path on
    real corpus text — at 10x stress scale 20,240/50,000 doc-block
    memberships land in capped blocks, which is the drift this entry and
    the stress harness's ngram_block_stats watch round-over-round.
    """
    from arcane_framework_spark.operators.dedup import _ngram_keyed
    from arcane_framework_spark.operators.scale import with_broadcast_scalar

    t = load_tables(spark, sf_dir, "documents")
    docs = t["documents"].select("doc_id", "text")
    mod_df = docs.agg(F.count(F.lit(1)).alias("__n")).select(
        F.greatest(
            F.lit(1).cast("long"),
            F.floor(F.col("__n") / NGRAM_RECALL_TARGET).cast("long"),
        ).alias("__mod")
    )
    sampled = with_broadcast_scalar(docs, mod_df)
    base = sampled.filter(F.col("doc_id") % F.col("__mod") == 0).select(
        "doc_id", "text"
    )
    planted = sampled.filter(
        (F.col("doc_id") % 7 == 0) & (F.col("doc_id") % F.col("__mod") == 0)
    ).select(
        (F.col("doc_id") + F.lit(_DUP_OFFSET)).alias("doc_id"),
        F.concat_ws(" ", "text", "text").alias("text"),
    )
    boff_df = docs.agg(
        (F.max("doc_id") + F.lit(_DUP_OFFSET) + F.lit(1))
        .cast("long")
        .alias("__boff")
    )
    boiler = (
        with_broadcast_scalar(docs.orderBy("doc_id").limit(1), boff_df)
        .select(
            F.explode(
                F.sequence(F.lit(0), F.lit(NGRAM_BOILER_COPIES - 1))
            ).alias("__i"),
            "text",
            "__boff",
        )
        .select(
            (F.col("__boff") + F.col("__i")).cast("long").alias("doc_id"),
            "text",
        )
    )
    sample = base.unionByName(planted).unionByName(boiler)

    grams = _ngram_keyed(sample, "text", "doc_id").select("id", "grams")
    a = grams.select(
        F.col("id").alias("id_a"), F.col("grams").alias("ga"),
        F.size("grams").alias("__sa"),
    )
    b = grams.select(
        F.col("id").alias("id_b"), F.col("grams").alias("gb"),
        F.size("grams").alias("__sb"),
    )
    # Size-ratio prefilter INSIDE the quadratic join condition (same
    # 1e-6-slack bound ngram_jaccard_pairs applies on the capped path:
    # jaccard <= min/max of the set sizes, so pairs failing it cannot
    # reach NGRAM_MIN_JACCARD even after 6dp rounding) — the nested-loop
    # join then skips the O(|A|+|B|) array_intersect and never surfaces
    # the array-carrying row for the overwhelming non-pair majority.
    exact = (
        a.join(
            F.broadcast(b),
            (F.col("id_a") < F.col("id_b"))
            & (
                F.least("__sa", "__sb").cast("double")
                >= (NGRAM_MIN_JACCARD - 1e-6)
                * F.greatest("__sa", "__sb").cast("double")
            ),
        )
        .select(
            "id_a",
            "id_b",
            F.col("__sa").alias("__na"),
            F.col("__sb").alias("__nb"),
            F.size(F.array_intersect("ga", "gb")).alias("__ni"),
        )
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("__ni").cast("double")
                / (F.col("__na") + F.col("__nb") - F.col("__ni")).cast(
                    "double"
                ),
                6,
            ).alias("__j"),
        )
        .filter(F.col("__j") >= NGRAM_MIN_JACCARD)
    )
    from arcane_framework_spark.operators.cache import scoped_persist

    # Persisted: the ground-truth pair set feeds BOTH the per-cohort
    # n_true aggregate and the semi join against the capped path —
    # without it the quadratic exact-verify arm runs twice.
    truth = with_broadcast_scalar(exact, boff_df).select(
        "id_a",
        "id_b",
        F.when(
            (F.col("id_a") >= F.col("__boff"))
            | (F.col("id_b") >= F.col("__boff")),
            F.lit("boilerplate"),
        ).otherwise(F.lit("corpus")).alias("cohort"),
    ).transform(scoped_persist)
    found = ngram_jaccard_pairs(
        sample, min_jaccard=NGRAM_MIN_JACCARD
    ).select("id_a", "id_b")
    hit = truth.join(found, ["id_a", "id_b"], "semi")
    tr = truth.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("long").alias("n_true")
    )
    fo = hit.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("long").alias("n_found")
    )
    return tr.join(fo, "cohort", "left").select(
        "cohort",
        "n_true",
        F.coalesce(F.col("n_found"), F.lit(0).cast("long")).alias("n_found"),
        (F.col("n_true") - F.coalesce(F.col("n_found"), F.lit(0)))
        .cast("long")
        .alias("n_missed"),
        F.round(
            F.coalesce(F.col("n_found"), F.lit(0)).cast("double")
            / F.col("n_true").cast("double"),
            6,
        ).alias("recall"),
    )


def _ngram_cap_recall_sql() -> str:
    k = CHAR_NGRAM
    mod = f"(SELECT greatest(1, count(*) // {NGRAM_RECALL_TARGET}) FROM documents)"
    boff = f"(SELECT max(doc_id) + {_DUP_OFFSET} + 1 FROM documents)"
    return rf"""
WITH sample AS (
  SELECT doc_id, text FROM documents WHERE doc_id % {mod} = 0
  UNION ALL
  SELECT doc_id + {_DUP_OFFSET}, text || ' ' || text FROM documents
  WHERE doc_id % 7 = 0 AND doc_id % {mod} = 0
  UNION ALL
  SELECT ({boff} + i)::BIGINT, b.text
  FROM (SELECT unnest(range(0, {NGRAM_BOILER_COPIES})) AS i)
  CROSS JOIN (SELECT text FROM documents ORDER BY doc_id LIMIT 1) b
),
norm AS (
  SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS s
  FROM sample
),
grams AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(s) >= {k}
           THEN list_transform(range(1, len(s) - {k - 2}),
                               i -> substr(s, i::INT, {k}))
           ELSE [s] END) AS g
  FROM norm
),
exact AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         round(len(list_intersect(a.g, b.g))::DOUBLE
               / (len(a.g) + len(b.g)
                  - len(list_intersect(a.g, b.g)))::DOUBLE, 6) AS j
  FROM grams a JOIN grams b ON a.doc_id < b.doc_id
),
truth AS (
  SELECT id_a, id_b,
         CASE WHEN id_a >= {boff} OR id_b >= {boff}
              THEN 'boilerplate' ELSE 'corpus' END AS cohort
  FROM exact WHERE j >= {NGRAM_MIN_JACCARD}
),
keyed0 AS (
  SELECT doc_id, g,
         array_to_string(
           list_sort(list_transform(g, x -> md5(x)))[1:{NGRAM_SKETCH_K}],
           '|') AS bk
  FROM grams
),
keyed AS (
  SELECT k.* FROM keyed0 k
  JOIN (SELECT bk, count(*) AS cnt FROM keyed0 GROUP BY bk) s USING (bk)
  WHERE s.cnt <= {NGRAM_MAX_BLOCK}
),
found AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM keyed a JOIN keyed b ON a.bk = b.bk AND a.doc_id < b.doc_id
  WHERE least(len(a.g), len(b.g))::DOUBLE
        >= ({NGRAM_MIN_JACCARD} - 1e-6)
           * greatest(len(a.g), len(b.g))::DOUBLE
    AND round(len(list_intersect(a.g, b.g))::DOUBLE
              / (len(a.g) + len(b.g)
                 - len(list_intersect(a.g, b.g)))::DOUBLE, 6)
        >= {NGRAM_MIN_JACCARD}
),
hit AS (
  SELECT cohort, id_a FROM truth SEMI JOIN found USING (id_a, id_b)
),
tr AS (SELECT cohort, count(*)::BIGINT AS n_true FROM truth GROUP BY 1),
fo AS (SELECT cohort, count(*)::BIGINT AS n_found FROM hit GROUP BY 1)
SELECT tr.cohort, n_true,
       coalesce(n_found, 0)::BIGINT AS n_found,
       (n_true - coalesce(n_found, 0))::BIGINT AS n_missed,
       round(coalesce(n_found, 0)::DOUBLE / n_true::DOUBLE, 6) AS recall
FROM tr LEFT JOIN fo USING (cohort)
"""


def simhash_neardup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-banded near-dup pairs (Hamming ≤ 1) over the planted corpus.

    Doubled text doubles every token's vote without changing signs, so the
    planted near-dups collide at Hamming distance 0 — the property SimHash
    dedup exploits at scale.
    """
    from arcane_framework_spark.operators.dedup import simhash_neardup_pairs
    from arcane_framework_spark.queries import _planted_neardup_docs

    return simhash_neardup_pairs(_planted_neardup_docs(spark, sf_dir))


def _simhash_neardup_sql() -> str:
    from arcane_framework_spark.operators.dedup import (
        SIMHASH_BANDS,
        SIMHASH_BITS,
        SIMHASH_MAX_HAMMING,
    )

    band_w = SIMHASH_BITS // SIMHASH_BANDS
    bit_exprs = " || ".join(
        f"(CASE WHEN list_sum(list_transform(w, t -> CASE WHEN "
        f"substr(md5(t), {p}, 1) >= '8' THEN 1 ELSE -1 END)) > 0 "
        f"THEN '1' ELSE '0' END)"
        for p in range(1, SIMHASH_BITS + 1)
    )
    band_rows = "\n  UNION ALL\n  ".join(
        f"SELECT id, {b} AS band_id, "
        f"substr(sig, {b * band_w + 1}, {band_w}) AS band_hash FROM sig"
        for b in range(SIMHASH_BANDS)
    )
    hamming = " + ".join(
        f"(CASE WHEN substr(sa.sig, {p}, 1) <> substr(sb.sig, {p}, 1) "
        f"THEN 1 ELSE 0 END)"
        for p in range(1, SIMHASH_BITS + 1)
    )
    return rf"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {_DUP_OFFSET}, text || ' ' || text
  FROM documents WHERE doc_id % 7 = 0
),
toks AS (
  SELECT doc_id AS id, string_split_regex(lower(trim(text)), '\s+') AS w
  FROM corpus
),
sig AS (
  SELECT id, {bit_exprs} AS sig FROM toks
),
bands AS (
  {band_rows}
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.id < b.id
)
SELECT id_a, id_b, ({hamming})::INT AS hamming
FROM cand
JOIN sig sa ON sa.id = id_a
JOIN sig sb ON sb.id = id_b
WHERE ({hamming}) <= {SIMHASH_MAX_HAMMING}
"""


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup (banded hyperplane LSH)
# ---------------------------------------------------------------------------


def _neardup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "embeddings")
    emb = t["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    v = F.col("embedding")
    planted = emb.filter(F.col("vec_id") % NEARDUP_EVERY == 0).select(
        (F.col("vec_id") + F.lit(_DUP_OFFSET)).alias("vec_id"),
        F.concat(
            F.array(F.get(v, 0) + F.lit(NEARDUP_DELTA)),
            F.slice(v, 2, EMBEDDING_DIM - 1),
        ).alias("embedding"),
    )
    return emb.unionByName(planted)


def cosine_neardup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate vector pairs: banded LSH candidates + cosine >= 0.8."""
    return ann_banded_pairs(
        _neardup_corpus(spark, sf_dir),
        dim=EMBEDDING_DIM,
        min_cosine=NEARDUP_MIN_COSINE,
        num_planes=NEARDUP_PLANES,
        band_size=NEARDUP_BAND,
    )


def _cosine_neardup_sql() -> str:
    weights = hyperplane_weights(NEARDUP_PLANES, EMBEDDING_DIM)
    bits = " || ".join(
        "(CASE WHEN list_dot_product(v, CAST(["
        + ", ".join(f"{float(x)}" for x in weights[p])
        + "] AS DOUBLE[])) > 0 THEN '1' ELSE '0' END)"
        for p in range(NEARDUP_PLANES)
    )
    num_bands = NEARDUP_PLANES // NEARDUP_BAND
    band_rows = "\n  UNION ALL\n  ".join(
        f"SELECT vec_id, {b} AS band_id, "
        f"substr(sig, {b * NEARDUP_BAND + 1}, {NEARDUP_BAND}) AS band_hash FROM sig"
        for b in range(num_bands)
    )
    return f"""
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
corpus AS (
  SELECT vec_id, v FROM base
  UNION ALL
  SELECT vec_id + {_DUP_OFFSET}, list_concat([v[1] + {NEARDUP_DELTA}], v[2:])
  FROM base WHERE vec_id % {NEARDUP_EVERY} = 0
),
sig AS (
  SELECT vec_id, v, {bits} AS sig FROM corpus
),
bands AS (
  {band_rows}
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
   AND a.vec_id < b.vec_id
)
SELECT id_a, id_b,
       round(list_dot_product(sa.v, sb.v)
             / (sqrt(list_dot_product(sa.v, sa.v))
                * sqrt(list_dot_product(sb.v, sb.v))), 6) AS cosine
FROM cand
JOIN sig sa ON sa.vec_id = id_a
JOIN sig sb ON sb.vec_id = id_b
WHERE round(list_dot_product(sa.v, sb.v)
            / (sqrt(list_dot_product(sa.v, sa.v))
               * sqrt(list_dot_product(sb.v, sb.v))), 6) >= {NEARDUP_MIN_COSINE}
"""


# ---------------------------------------------------------------------------
# IVF approximate nearest neighbors
# ---------------------------------------------------------------------------


def ivf_topk_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: probe-1 top-5 by cosine within the query's coarse cell.

    Centroids are a deterministic corpus stride (vec_id % 25 == 0) standing
    in for a k-means codebook; queries are vec_id < 10.
    """
    t = load_tables(spark, sf_dir, "embeddings")
    emb = t["embeddings"]
    centroids = emb.filter(F.col("vec_id") % IVF_STRIDE == 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    return ivf_topk(
        emb, centroids, emb.filter(F.col("vec_id") < IVF_NUM_QUERIES), k=IVF_K
    )


_IVF_SQL = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
cent AS (
  SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % {IVF_STRIDE} = 0
),
scored AS (
  SELECT e.vec_id, e.v, cent.cid,
         list_dot_product(e.v, cent.cv)
           / (sqrt(list_dot_product(e.v, e.v))
              * sqrt(list_dot_product(cent.cv, cent.cv))) AS cos
  FROM e CROSS JOIN cent
),
assigned AS (
  SELECT vec_id, v, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY cos DESC, cid) AS rn
    FROM scored) WHERE rn = 1
),
q AS (
  SELECT vec_id AS query_id, v AS qv, cid FROM assigned
  WHERE vec_id < {IVF_NUM_QUERIES}
),
pairs AS (
  SELECT q.query_id, a.vec_id AS neighbor_id,
         list_dot_product(q.qv, a.v)
           / (sqrt(list_dot_product(q.qv, q.qv))
              * sqrt(list_dot_product(a.v, a.v))) AS cos
  FROM q JOIN assigned a ON q.cid = a.cid AND a.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id) AS rank
  FROM pairs
)
SELECT query_id, neighbor_id, round(cos, 6) AS cosine, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {IVF_K}
"""


# ---------------------------------------------------------------------------
# Multimodal features (Arrow-batched Pandas UDF plumbing)
# ---------------------------------------------------------------------------


def multimodal_features_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level asset features via mapInPandas over a binary column."""
    t = load_tables(spark, sf_dir, "documents")
    return extract_features(documents_as_assets(t["documents"]))


_MULTIMODAL_SQL = """
SELECT doc_id,
       'application/octet-stream'          AS mime,
       octet_length(encode(text))::BIGINT  AS n_bytes,
       sha256(text)                        AS sha256,
       (octet_length(encode(text)) % 640 + 16)::INT     AS width,
       (octet_length(encode(text)) * 7 % 480 + 16)::INT AS height,
       CAST(NULL AS DOUBLE)                AS pixel_mean
FROM documents
"""


def image_decode_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode through the full distributed plumbing: every 50th
    doc id becomes a synthetic image asset (``id % 3`` selects 24-bit
    BMP / binary PPM / zlib-filtered PNG — three different layout and
    compression conventions), born as a binary column in one
    Arrow-batched pass and decoded in another. The oracle recomputes
    dims, byte size, mean sample, and the decoded top-left red sample
    from the closed-form pixel rule — so a decoder that mis-handled
    BMP's bottom-up BGR layout, PPM's header grammar, or any of PNG's
    five scanline filters (the synthetic PNG cycles through all of
    them) hash-mismatches immediately. PNG's byte size is closed-form
    because the writer uses stored-deflate IDAT blocks
    (``68 + height*(1 + 3*width)``)."""
    from arcane_framework_spark.operators.multimodal import (
        image_decode_features,
        synth_image_assets,
    )

    t = load_tables(spark, sf_dir, "documents")
    ids = t["documents"].select("doc_id").filter(F.col("doc_id") % 50 == 0)
    return image_decode_features(synth_image_assets(ids))


_IMAGE_DECODE_SQL = """
SELECT d.doc_id,
       CASE d.doc_id % 3 WHEN 0 THEN 'bmp' WHEN 1 THEN 'ppm'
            ELSE 'png' END AS fmt,
       CAST(CASE d.doc_id % 3
            WHEN 0
            THEN 54 + (((8 + d.doc_id % 5) * 3 + 3) // 4) * 4
                      * (8 + d.doc_id % 3)
            WHEN 1
            THEN strlen('P6' || chr(10)
                   || CAST(8 + d.doc_id % 5 AS VARCHAR) || ' '
                   || CAST(8 + d.doc_id % 3 AS VARCHAR) || chr(10)
                   || '255' || chr(10))
                 + (8 + d.doc_id % 5) * (8 + d.doc_id % 3) * 3
            -- png: sig 8 + IHDR 25 + IDAT 12+(2+5+L+4) + IEND 12 = 68+L,
            -- L = rows * (1 filter byte + 3 samples per pixel)
            ELSE 68 + (8 + d.doc_id % 3) * (1 + 3 * (8 + d.doc_id % 5))
       END AS BIGINT) AS n_bytes,
       CAST(8 + d.doc_id % 5 AS INT) AS width,
       CAST(8 + d.doc_id % 3 AS INT) AS height,
       floor(m.mean_val * 10000 + 0.5) / 10000 AS pixel_mean,
       CAST(d.doc_id % 256 AS INT) AS first_pixel
FROM documents d,
LATERAL (
  -- DuckDB's generate_series cannot take correlated bounds; generate the
  -- max grid (12x10x3) and filter to this image's actual dims instead.
  SELECT avg(CAST((d.doc_id % 256 + r.i * 7 + c.j * 3 + ch.k) % 256
                  AS DOUBLE)) AS mean_val
  FROM generate_series(0, 9) r(i),
       generate_series(0, 11) c(j),
       generate_series(0, 2) ch(k)
  WHERE r.i < 8 + d.doc_id % 3 AND c.j < 8 + d.doc_id % 5
) m
WHERE d.doc_id % 50 = 0
"""


def jpeg_decode_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG decode (pure stdlib+numpy ``operators/jpeg.py``:
    marker parse, Huffman DC-difference entropy decode, dequantize,
    IDCT, chroma upsampling, YCbCr->RGB) through the distributed asset
    plumbing.

    Every 50th doc becomes a deterministic JPEG, variant by ``id % 3``:
    grayscale 4:4:4, color 4:2:0, color 4:2:2. All three are
    block-constant per component with exactly-invertible quantization
    (even luma with Q00=16; ``128 + 17*m`` chroma with Q00=17), so the
    oracle recomputes the decoded mean and top-left pixel in closed
    form — INCLUDING the replicated chroma upsample and the JFIF color
    transform (integer planes -> identical double arithmetic both
    engines). A decoder that mis-parsed the scan header, swapped
    planes, broke the DC prediction chain, or upsampled wrongly
    hash-mismatches immediately. JPEG byte size is Huffman-dependent
    (not closed-form), so unlike ``image_decode_documents`` this entry
    does not emit n_bytes."""
    from arcane_framework_spark.operators.multimodal import (
        image_decode_features,
        synth_jpeg_assets,
    )

    t = load_tables(spark, sf_dir, "documents")
    ids = t["documents"].select("doc_id").filter(F.col("doc_id") % 50 == 0)
    return image_decode_features(synth_jpeg_assets(ids)).drop("n_bytes")


def _jpeg_color_branch(variant: int, hs: int, vs: int) -> str:
    """One UNION ALL branch of the JPEG oracle: the closed-form decoded
    RGB of the subsampled color synthetic (variant 1 = 4:2:0, 2 = 4:2:2).

    Integer planes feed the SAME double expressions the decoder runs
    (literals 1.402 / 0.344136 / 0.714136 / 1.772, same association
    order), and the synthetic's ranges guarantee no clipping and no
    round-half ties, so floor(x+0.5) here equals numpy's round there."""
    return f"""
SELECT d.doc_id,
       'jpeg' AS fmt,
       CAST(16 + d.doc_id % 7 AS INT) AS width,
       CAST(16 + d.doc_id % 5 AS INT) AS height,
       floor(m.mean_val * 10000 + 0.5) / 10000 AS pixel_mean,
       CAST(m.fp AS INT) AS first_pixel
FROM documents d,
LATERAL (
  SELECT avg(CAST(px.v AS DOUBLE)) AS mean_val,
         max(CASE WHEN px.i = 0 AND px.j = 0 AND px.k = 0
                  THEN px.v END) AS fp
  FROM (
    SELECT g.i, g.j, g.k,
           CAST(floor(CASE g.k
             WHEN 0 THEN g.yv + 1.402 * (g.crv - 128.0)
             WHEN 1 THEN g.yv - 0.344136 * (g.cbv - 128.0)
                         - 0.714136 * (g.crv - 128.0)
             ELSE g.yv + 1.772 * (g.cbv - 128.0)
           END + 0.5) AS BIGINT) AS v
    FROM (
      SELECT r.i AS i, c.j AS j, ch.k AS k,
             CAST(64 + ((2 * (d.doc_id % 256) + (r.i // 8) * 14
                         + (c.j // 8) * 6) % 128) AS DOUBLE) AS yv,
             CAST(128 + 17 * (((d.doc_id % 256) + ((r.i // {vs}) // 8)
                               + ((c.j // {hs}) // 8)) % 5 - 2)
                  AS DOUBLE) AS cbv,
             CAST(128 + 17 * ((2 * (d.doc_id % 256) + ((r.i // {vs}) // 8)
                               + 2 * ((c.j // {hs}) // 8)) % 5 - 2)
                  AS DOUBLE) AS crv
      FROM generate_series(0, 20) r(i),
           generate_series(0, 22) c(j),
           generate_series(0, 2) ch(k)
      WHERE r.i < 16 + d.doc_id % 5 AND c.j < 16 + d.doc_id % 7
    ) g
  ) px
) m
WHERE d.doc_id % 50 = 0 AND d.doc_id % 3 = {variant}
"""


_JPEG_DECODE_SQL = f"""
SELECT d.doc_id,
       'jpeg' AS fmt,
       CAST(8 + d.doc_id % 5 AS INT) AS width,
       CAST(8 + d.doc_id % 3 AS INT) AS height,
       floor(m.mean_val * 10000 + 0.5) / 10000 AS pixel_mean,
       CAST((2 * (d.doc_id % 256)) % 256 AS INT) AS first_pixel
FROM documents d,
LATERAL (
  -- max 12x10 grid filtered to this image's dims (generate_series
  -- bounds cannot be lateral-correlated); grayscale: one channel
  SELECT avg(CAST((2 * (d.doc_id % 256) + (r.i // 8) * 14
                   + (c.j // 8) * 6) % 256 AS DOUBLE)) AS mean_val
  FROM generate_series(0, 9) r(i),
       generate_series(0, 11) c(j)
  WHERE r.i < 8 + d.doc_id % 3 AND c.j < 8 + d.doc_id % 5
) m
WHERE d.doc_id % 50 = 0 AND d.doc_id % 3 = 0
UNION ALL
{_jpeg_color_branch(1, 2, 2)}
UNION ALL
{_jpeg_color_branch(2, 2, 1)}
"""


def gif_decode_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF decode (pure-stdlib ``operators/gif.py``: header parse,
    variable-width LZW decompression, interlace reorder, palette
    expansion) through the distributed asset plumbing.

    Every 50th doc becomes a deterministic GIF; odd ids are stored
    INTERLACED — the decoded pixels must come out identical, which is
    the de-interlace proof. GIF is lossless, so the oracle recomputes
    the palette-lookup pixels in closed form; a decoder that broke the
    LZW width schedule, the dictionary growth, or the four-pass row
    order hash-mismatches immediately. LZW byte size is data-dependent
    (not closed-form), so like the JPEG entry this one drops n_bytes."""
    from arcane_framework_spark.operators.multimodal import (
        image_decode_features,
        synth_gif_assets,
    )

    t = load_tables(spark, sf_dir, "documents")
    ids = t["documents"].select("doc_id").filter(F.col("doc_id") % 50 == 0)
    return image_decode_features(synth_gif_assets(ids)).drop("n_bytes")


def _gif_sql() -> str:
    from arcane_framework_spark.operators.multimodal import (
        GIF_ADD, GIF_COLORS, GIF_MUL,
    )

    idx = f"(((d.doc_id % 256) + 5 * r.i + 3 * c.j) % {GIF_COLORS})"
    chan = (
        f"CASE ch.k WHEN 0 THEN ({GIF_MUL[0]} * {idx} + {GIF_ADD[0]}) % 256 "
        f"WHEN 1 THEN ({GIF_MUL[1]} * {idx} + {GIF_ADD[1]}) % 256 "
        f"ELSE ({GIF_MUL[2]} * {idx} + {GIF_ADD[2]}) % 256 END"
    )
    return f"""
SELECT d.doc_id,
       'gif' AS fmt,
       CAST(11 + d.doc_id % 6 AS INT) AS width,
       CAST(9 + d.doc_id % 4 AS INT) AS height,
       floor(m.mean_val * 10000 + 0.5) / 10000 AS pixel_mean,
       CAST(({GIF_MUL[0]} * ((d.doc_id % 256) % {GIF_COLORS})
             + {GIF_ADD[0]}) % 256 AS INT) AS first_pixel
FROM documents d,
LATERAL (
  SELECT avg(CAST({chan} AS DOUBLE)) AS mean_val
  FROM generate_series(0, 12) r(i),
       generate_series(0, 16) c(j),
       generate_series(0, 2) ch(k)
  WHERE r.i < 9 + d.doc_id % 4 AND c.j < 11 + d.doc_id % 6
) m
WHERE d.doc_id % 50 = 0
"""


def audio_spectral_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL spectral feature extraction: every 50th doc becomes an
    integer-period square tone WAV; the numpy rfft runs distributed in
    ``mapInPandas`` and emits the dominant bin/frequency + exact rms.

    Integer periods mean zero leakage — the DFT magnitude is an
    odd-harmonic comb whose argmax IS the cycle count — so the oracle
    predicts the FFT's answer closed-form from doc_id alone. A decoder
    or FFT path that mangled samples, dropped the DC exclusion, or
    mis-scaled frequency hash-fails."""
    from arcane_framework_spark.operators.multimodal import (
        documents_as_tone_assets,
        wav_spectral_features,
    )

    t = load_tables(spark, sf_dir, "documents")
    ids = t["documents"].select("doc_id").filter(F.col("doc_id") % 50 == 0)
    return wav_spectral_features(documents_as_tone_assets(ids))


_AUDIO_SPECTRAL_SQL = """
SELECT doc_id,
       CAST(8000 AS INT) AS sample_rate,
       CAST(2 * (1 + doc_id % 8) * (24 + doc_id % 40) AS BIGINT)
         AS n_samples,
       CAST(24 + doc_id % 40 AS BIGINT) AS dominant_bin,
       floor(CAST(8000 * (24 + doc_id % 40) AS DOUBLE)
             / (2 * (1 + doc_id % 8) * (24 + doc_id % 40))
             * 10000 + 0.5) / 10000 AS dominant_freq_hz,
       CAST(4096 + doc_id % 8192 AS DOUBLE) AS rms
FROM documents WHERE doc_id % 50 = 0
"""


def bpe_train_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL BPE tokenizer training (Sennrich 2016) over the corpus: the
    top-8 learned merges as (step, left_tok, right_tok, merged,
    pair_count).

    The only corpus-sized work is the word-frequency aggregation; the
    fixed-count merge iterations run over the distinct-word table with
    frequency-weighted pair counts (operators/bpe.py). Deterministic
    tie-breaks make the whole training loop SQL-expressible: the oracle
    unrolls the same 8 count→argmax→rewrite steps as DuckDB CTEs, and
    the merge table is exact integer arithmetic — a divergent replace
    semantics, tie-break, or weighting hash-fails."""
    from arcane_framework_spark.operators.bpe import bpe_train
    from arcane_framework_spark.prep import get_prepped

    t = load_tables(spark, sf_dir, "documents")
    return bpe_train(
        t["documents"].select("text"),
        tops=get_prepped(("bpe_tops", sf_dir), spark),
    )


def bpe_fertility_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train BPE merges globally, then tokenize every source with them:
    the per-source fertility of a LEARNED tokenizer (operators/bpe.py
    bpe_train_and_apply) — (source, n_words, n_chars, n_tokens_bpe,
    tokens_per_word).

    The train->apply split is the production shape: one shared
    vocabulary, per-source accounting of what it costs. The oracle
    extends the unrolled training CTEs with the identical 8-step
    replace chain over the per-source word table — all-integer sums
    plus one guarded division."""
    from arcane_framework_spark.operators.bpe import bpe_train_and_apply
    from arcane_framework_spark.prep import get_prepped

    t = load_tables(spark, sf_dir, "documents")
    return bpe_train_and_apply(
        t["documents"].select("source", "text"), group_col="source",
        tops=get_prepped(("bpe_tops", sf_dir), spark),
    )


def _bpe_train_ctes() -> list[str]:
    """The shared unrolled-training CTE chain (w0, p_i, m_i, w_i) —
    consumed by both the merge-table oracle and the apply oracle."""
    from arcane_framework_spark.operators.bpe import (
        BPE_MAX_WORD_LEN, BPE_MERGES,
    )

    ctes = [f"""w0 AS (
  SELECT '{{' || array_to_string(string_split(w, ''), '}}{{')
             || '}}{{#}}' AS s,
         cnt
  FROM (
    SELECT w, count(*) AS cnt FROM (
      SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
      FROM documents)
    WHERE regexp_matches(w, '^[a-z]+$') AND len(w) <= {BPE_MAX_WORD_LEN}
    GROUP BY w)
)"""]
    for i in range(1, BPE_MERGES + 1):
        prev = f"w{i - 1}"
        ctes.append(f"""p{i} AS (
  SELECT p.l AS l, p.r AS r, sum(cnt) AS c FROM (
    SELECT unnest(list_transform(range(1, len(t)),
                  j -> {{'l': t[j], 'r': t[j + 1]}})) AS p, cnt
    FROM (SELECT string_split(s[2 : len(s) - 1], '}}{{') AS t, cnt
          FROM {prev})
  ) GROUP BY p.l, p.r
)""")
        ctes.append(
            f"m{i} AS (SELECT l, r, c FROM p{i} "
            f"ORDER BY c DESC, l, r LIMIT 1)"
        )
        if i < BPE_MERGES:
            ctes.append(f"""w{i} AS (
  SELECT replace(s, '{{' || m.l || '}}{{' || m.r || '}}',
                 '{{' || m.l || m.r || '}}') AS s, cnt
  FROM {prev}, m{i} m
)""")
    return ctes


def _bpe_sql() -> str:
    from arcane_framework_spark.operators.bpe import BPE_MERGES

    selects = "\nUNION ALL\n".join(
        f"SELECT {i} AS step, l AS left_tok, r AS right_tok, "
        f"l || r AS merged, CAST(c AS BIGINT) AS pair_count FROM m{i}"
        for i in range(1, BPE_MERGES + 1)
    )
    return "WITH " + ",\n".join(_bpe_train_ctes()) + "\n" + selects


def _bpe_apply_sql() -> str:
    from arcane_framework_spark.operators.bpe import (
        BPE_MAX_WORD_LEN, BPE_MERGES,
    )

    ctes = _bpe_train_ctes()
    ctes.append(f"""ws0 AS (
  SELECT grp, len(w) AS n_chars_w,
         '{{' || array_to_string(string_split(w, ''), '}}{{')
             || '}}{{#}}' AS s,
         cnt
  FROM (
    SELECT grp, w, count(*) AS cnt FROM (
      SELECT source AS grp,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
      FROM documents)
    WHERE regexp_matches(w, '^[a-z]+$') AND len(w) <= {BPE_MAX_WORD_LEN}
    GROUP BY grp, w)
)""")
    for i in range(1, BPE_MERGES + 1):
        ctes.append(f"""ws{i} AS (
  SELECT grp, n_chars_w,
         replace(s, '{{' || m.l || '}}{{' || m.r || '}}',
                 '{{' || m.l || m.r || '}}') AS s, cnt
  FROM ws{i - 1}, m{i} m
)""")
    return f"""
WITH {",".join(ctes)}
SELECT grp AS source,
       CAST(sum(cnt) AS BIGINT) AS n_words,
       CAST(sum(cnt * n_chars_w) AS BIGINT) AS n_chars,
       CAST(sum(cnt * len(string_split(s[2 : len(s) - 1], '}}{{')))
            AS BIGINT) AS n_tokens_bpe,
       floor(CAST(sum(cnt * len(string_split(s[2 : len(s) - 1], '}}{{')))
                  AS DOUBLE)
             / CAST(sum(cnt) AS DOUBLE) * 10000 + 0.5) / 10000
         AS tokens_per_word
FROM ws{BPE_MERGES}
GROUP BY grp
"""


# ---------------------------------------------------------------------------
# Structured Streaming path (real readStream execution in the catalog)
# ---------------------------------------------------------------------------


def streaming_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event rollup computed by an actual Structured Streaming query.

    The events parquet is replayed through ``readStream`` → watermarked
    tumbling-window aggregation → complete-mode memory sink, drained with
    ``Trigger.availableNow``; the returned DataFrame is the sink table. The
    oracle is plain SQL — identical results prove the streaming execution
    path agrees with the batch semantics (T1/T8).
    """
    from arcane_framework_spark.streaming.stateful import windowed_rollup

    t = load_tables(spark, sf_dir, "events")  # sets nanosAsLong/ANSI/UTC
    schema = t["events"].schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")  # file source needs a dir
        .parquet(sf_dir)
    )
    ev = stream.select(
        ts_timestamp(schema).alias("ts"),
        "event_type",
        "value",
    )
    agg = windowed_rollup(ev, window="1 hour", watermark="2 hours")
    name = "streaming_hourly_rollup_sink"
    with stream_conf(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name).select(
        F.date_format("window_start", "yyyy-MM-dd HH:00:00").alias("hour"),
        "event_type",
        "n_events",
        F.round("sum_value", 2).alias("sum_value"),
    )


_STREAMING_HOURLY_SQL = """
SELECT strftime(ts, '%Y-%m-%d %H:00:00') AS hour,
       event_type,
       count(*)             AS n_events,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# BPE-ish token accounting
# ---------------------------------------------------------------------------


def bpe_token_stats_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace vs BPE-style pre-token counts per document."""
    t = load_tables(spark, sf_dir, "documents")
    return t["documents"].select(
        "doc_id",
        token_count_expr("text").alias("n_ws_tokens"),
        bpe_token_count_expr("text").alias("n_bpe_tokens"),
    )


def tokenizer_fertility_documents(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Per-source tokenizer fertility: chars per BPE pre-token and BPE
    pre-tokens per whitespace word — the stat that decides whether a
    corpus slice is cheap or expensive to train on (code and non-Latin
    text run hot). One map-side pass computes all three counts off the
    text column, then one partial-aggregated shuffle on ``source``; the
    ratios divide exact integer sums once per group and fix-point to 4
    decimals, so the aggregate is order-independent and engine-stable."""
    t = load_tables(spark, sf_dir, "documents")
    d = t["documents"].select(
        "source",
        F.length("text").cast("long").alias("__chars"),
        bpe_token_count_expr("text").alias("__bpe"),
        token_count_expr("text").alias("__ws"),
    )
    half_up = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000  # noqa: E731
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__chars").alias("n_chars"),
        F.sum("__bpe").alias("n_bpe_tokens"),
        F.sum("__ws").alias("n_ws_tokens"),
        half_up(
            F.sum("__chars").cast("double") / F.sum("__bpe")
        ).alias("chars_per_bpe"),
        half_up(
            F.sum("__bpe").cast("double") / F.sum("__ws")
        ).alias("bpe_per_word"),
    )


_FERTILITY_SQL = rf"""
WITH d AS (
  SELECT source,
         CAST(length(text) AS BIGINT) AS chars,
         CAST(len(regexp_extract_all(text, '{BPE_TOKEN_RE}')) AS BIGINT)
           AS bpe,
         CAST(CASE WHEN len(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(lower(trim(text)), '\s+'))
         END AS BIGINT) AS ws
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(chars) AS BIGINT) AS n_chars,
       CAST(SUM(bpe) AS BIGINT) AS n_bpe_tokens,
       CAST(SUM(ws) AS BIGINT) AS n_ws_tokens,
       floor(SUM(chars)::DOUBLE / SUM(bpe) * 10000 + 0.5) / 10000
         AS chars_per_bpe,
       floor(SUM(bpe)::DOUBLE / SUM(ws) * 10000 + 0.5) / 10000
         AS bpe_per_word
FROM d GROUP BY source
"""


_BPE_SQL = rf"""
SELECT doc_id,
       CASE WHEN len(trim(text)) = 0 THEN 0
            ELSE len(string_split_regex(lower(trim(text)), '\s+'))
       END::BIGINT AS n_ws_tokens,
       len(regexp_extract_all(text, '{BPE_TOKEN_RE}'))::BIGINT AS n_bpe_tokens
FROM documents
"""


# ---------------------------------------------------------------------------
# Ordered-statistics, pivot, and TF-IDF (relational + text depth)
# ---------------------------------------------------------------------------


def events_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantiles per event type (sort-based `percentile`).

    Exact percentile is a per-group sort — the right tool up to millions of
    rows per group; beyond that switch to `approx_percentile` (t-digest,
    mergeable map-side) and drop the oracle to rows-only. DuckDB's
    quantile_cont interpolates identically, so values hash-match bitwise.
    """
    t = load_tables(spark, sf_dir, "events")
    return t["events"].groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


_QUANTILES_SQL = """
SELECT event_type, count(*) AS n,
       round(quantile_cont(value, 0.5), 6)  AS p50,
       round(quantile_cont(value, 0.9), 6)  AS p90,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events
GROUP BY event_type
"""

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def pivot_events_by_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: user cohorts × event types → sum(value) matrix.

    Explicit pivot values keep the plan static (no discovery pass); the
    pivot is a single hash aggregation with one output column per type.
    """
    t = load_tables(spark, sf_dir, "events")
    return (
        t["events"]
        .withColumn("cohort", F.col("user_id") % 10)
        .groupBy("cohort")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.round(F.sum("value"), 2))
    )


_PIVOT_SQL = "SELECT user_id % 10 AS cohort, " + ", ".join(
    f"round(sum(CASE WHEN event_type = '{t}' THEN value END), 2) AS {t}"
    for t in _EVENT_TYPES
) + " FROM events GROUP BY 1"


def events_cube_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation: counts + cent-exact value sums over every
    (event_type, day-of-week) combination INCLUDING the marginal and
    grand totals, with grouping_id tagging which dimensions are rolled
    up. One Expand + one hash aggregation — Spark's multi-grouping-set
    execution (4 output rows per input row here), the standard shape for
    publishing a datacard's marginals in a single pass instead of four
    separate groupBys. Per-row cent rounding keeps the double sums
    order-independent (the q1/q9 money convention).

    The day-of-week label is derived from ``dayofweek()`` (an integer,
    engine-stable) through a literal CASE map rather than
    ``date_format(ts, 'E')``, which renders in the JVM *default locale*
    and would silently diverge from the C-locale oracle on a cluster
    running e.g. ``-Duser.language=de``."""
    t = load_tables(spark, sf_dir, "events")
    dn = F.dayofweek(ts_timestamp(t["events"]))  # 1=Sun .. 7=Sat
    dow = F.element_at(
        F.array(*[F.lit(d) for d in _DOW_LABELS]), dn
    )
    ev = t["events"].select(
        "event_type",
        dow.alias("dow"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).alias("__cents"),
    )
    return ev.cube("event_type", "dow").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("__cents").cast("long").alias("value_cents"),
        F.grouping_id().cast("int").alias("gid"),
    )


#: Sunday-first day labels: Spark ``dayofweek()`` is 1=Sun..7=Sat,
#: DuckDB ``dayofweek()`` is 0=Sun..6=Sat — both sides index this same
#: literal list, so the label is locale-free by construction.
_DOW_LABELS = ["Sun", "Mon", "Tue", "Wed", "Thu", "Fri", "Sat"]

_DOW_CASE_SQL = "CASE dayofweek(ts) " + " ".join(
    f"WHEN {i} THEN '{d}'" for i, d in enumerate(_DOW_LABELS)
) + " END"

_CUBE_SQL = f"""
SELECT event_type,
       {_DOW_CASE_SQL} AS dow,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(floor(value * 100 + 0.5)) AS BIGINT) AS value_cents,
       CAST(GROUPING(event_type) * 2 + GROUPING({_DOW_CASE_SQL})
            AS INT) AS gid
FROM events
GROUP BY CUBE (event_type, {_DOW_CASE_SQL})
"""


FAIR_TOPK_TOTAL = 100
FAIR_TOPK_PER_SOURCE = 10


def fair_topk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fairness-capped global top-k: the best FAIR_TOPK_TOTAL documents
    by quality score, but no source may contribute more than
    FAIR_TOPK_PER_SOURCE — the diversity constraint every curation
    pipeline applies so one crawl cannot dominate the training mix.

    Two-level ranking: a per-source rank window first (bare rank +
    filter → Spark's map-side WindowGroupLimit trims each source to the
    cap BEFORE any global work), then a global TakeOrderedAndProject
    over the capped survivors (≤ sources × cap rows). The global sort
    therefore never sees the corpus — the shape that holds at 100 TB.
    """
    from pyspark.sql import Window

    from arcane_framework_spark.operators.text import quality_score_expr

    t = load_tables(spark, sf_dir, "documents")
    scored = t["documents"].select(
        "doc_id",
        "source",
        F.floor(quality_score_expr("text") * 1_000_000 + F.lit(0.5))
        .cast("long")
        .alias("score_fp"),
    )
    w_src = Window.partitionBy("source").orderBy(
        F.col("score_fp").desc(), "doc_id"
    )
    capped = scored.withColumn("src_rank", F.row_number().over(w_src)).filter(
        F.col("src_rank") <= FAIR_TOPK_PER_SOURCE
    )
    return (
        capped.orderBy(F.col("score_fp").desc(), "doc_id")
        .limit(FAIR_TOPK_TOTAL)
        .select(
            "doc_id", "source",
            F.col("src_rank").cast("int").alias("src_rank"),
            "score_fp",
        )
    )


def _fair_topk_sql() -> str:
    # One shared tokenizer-literal definition (sqlconst.py) — queries_ext
    # loads before queries.py, so import from the constants module, not
    # from queries.
    from arcane_framework_spark.sqlconst import (
        SQL_PUNCT_CLASS as _SQL_PUNCT_CLASS,
        TOKS_SQL as _TOKS_SQL,
    )

    return rf"""
WITH feat AS (
  SELECT doc_id, source,
         CASE WHEN len(trim(text)) = 0 THEN 0
              ELSE len({_TOKS_SQL}) END::BIGINT AS n_tokens,
         CASE WHEN len(text) = 0 THEN 0.0
              ELSE (len(text) - len(regexp_replace(text,
                    '{_SQL_PUNCT_CLASS}', '', 'g')))::DOUBLE
                   / len(text)::DOUBLE END AS praw
  FROM documents
),
scored AS (
  SELECT doc_id, source,
         CAST(floor(least(1.0, n_tokens::DOUBLE / 100.0) * (1.0 - praw)
                    * 1000000 + 0.5) AS BIGINT) AS score_fp
  FROM feat
),
capped AS (
  SELECT doc_id, source, score_fp,
         row_number() OVER (PARTITION BY source
                            ORDER BY score_fp DESC, doc_id) AS src_rank
  FROM scored
)
SELECT doc_id, source, CAST(src_rank AS INT) AS src_rank, score_fp
FROM capped WHERE src_rank <= {FAIR_TOPK_PER_SOURCE}
ORDER BY score_fp DESC, doc_id LIMIT {FAIR_TOPK_TOTAL}
"""


SESSION_TTL_US = 30 * 60 * 1_000_000


def active_time_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user active time + session count under a 30-minute inactivity
    TTL: each event opens an interval [ts, ts+TTL) and
    `operators/temporal.py interval_union` merges the overlaps with pure
    window algebra — one shuffle on user_id, integer micros throughout.
    n_segments IS the 30-minute-timeout session count: the batch twin of
    the streaming applyInPandasWithState sessionizer, checkable against
    plain SQL."""
    from arcane_framework_spark.operators.temporal import interval_union

    t = load_tables(spark, sf_dir, "events")
    iv = t["events"].select(
        "user_id",
        ts_micros(t["events"]).alias("s"),
        (ts_micros(t["events"]) + F.lit(SESSION_TTL_US)).alias("e"),
    )
    return interval_union(iv, "user_id", "s", "e").select(
        "user_id",
        F.col("n_intervals").alias("n_events"),
        F.col("n_segments").alias("n_sessions"),
        F.col("covered").alias("active_us"),
    )


_ACTIVE_TIME_SQL = f"""
WITH iv AS (
  SELECT user_id,
         CAST(floor(epoch_us(ts)) AS BIGINT) AS s,
         CAST(floor(epoch_us(ts)) AS BIGINT) + {SESSION_TTL_US} AS e
  FROM events
),
w AS (
  SELECT user_id, s, e,
         MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS run_end
  FROM iv
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN run_end IS NULL OR s > run_end
                THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
       CAST(SUM(GREATEST(e - GREATEST(s, COALESCE(run_end, s)), 0))
            AS BIGINT) AS active_us
FROM w GROUP BY user_id
"""


def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native Structured Streaming SESSION WINDOWS, cross-validated
    against batch interval algebra: events replay through readStream →
    ``session_window(ts, '30 minutes')`` aggregation (complete mode,
    drained with availableNow) → per-user session count / event count /
    total session span.

    A session window's end is last-event + gap, so the summed spans are
    EXACTLY the interval union of [ts, ts+TTL) — this entry shares
    ``active_time_events``'s oracle verbatim. Three implementations of
    session semantics (native streaming session windows, batch window
    algebra, DuckDB SQL) hash-matching each other is the strongest
    equivalence evidence in the catalog."""
    t = load_tables(spark, sf_dir, "events")
    schema = t["events"].schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ev = stream.select(ts_timestamp(schema).alias("ts"), "user_id")
    agg = ev.groupBy(
        F.session_window("ts", "30 minutes"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n"))
    name = "streaming_session_windows_sink"
    with stream_conf(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    sessions = spark.table(name)
    return sessions.groupBy("user_id").agg(
        F.sum("n").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum(
            F.unix_micros(F.col("session_window.end"))
            - F.unix_micros(F.col("session_window.start"))
        ).cast("long").alias("active_us"),
    )


def unpivot_event_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): per-cohort wide metrics (event count, cent-exact
    value sum, distinct users) melted to long (cohort, metric, value)
    form — the wide→long reshape every metrics store ingests. Spark's
    native ``unpivot`` is a zero-shuffle Expand over the aggregated
    (already tiny) wide table; the oracle is the equivalent UNION ALL."""
    t = load_tables(spark, sf_dir, "events")
    wide = (
        t["events"]
        .withColumn("cohort", F.col("user_id") % 10)
        .groupBy("cohort")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)))
            .cast("long")
            .alias("value_cents"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
    )
    return wide.unpivot(
        ["cohort"], ["n_events", "value_cents", "n_users"],
        "metric", "value",
    )


_UNPIVOT_SQL = """
WITH wide AS (
  SELECT user_id % 10 AS cohort,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(SUM(floor(value * 100 + 0.5)) AS BIGINT) AS value_cents,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
  FROM events GROUP BY 1
)
SELECT cohort, 'n_events' AS metric, n_events AS value FROM wide
UNION ALL
SELECT cohort, 'value_cents', value_cents FROM wide
UNION ALL
SELECT cohort, 'n_users', n_users FROM wide
"""


TFIDF_TOP_K = 3


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 terms by TF-IDF.

    explode → (doc, term) counts → document frequencies → idf join → window
    top-k. Scale: two shuffles (term counts, df) + the ranked top-k, which
    Spark executes with partial WindowGroupLimit before the exchange. The
    df table joins RELATIONALLY — it has one row per distinct corpus term,
    which grows with the corpus (Heaps' law is sublinear, not bounded), so
    a hard broadcast would be a driver-collect bomb at 100 TB; AQE still
    picks broadcast while the vocabulary actually fits (round-14, the
    prefix_filter/BM25 treatment applied to every vocabulary-cardinality
    broadcast).
    """
    from pyspark.sql import Window

    from arcane_framework_spark.operators.scale import with_broadcast_scalar
    from arcane_framework_spark.operators.text import tokens_expr

    t = load_tables(spark, sf_dir, "documents")
    docs = t["documents"].select("doc_id", "text")
    # n_docs stays IN-PLAN as a broadcast 1-row aggregate — no driver
    # .count() action, so the whole query is a single job.
    n_docs_df = docs.agg(F.count(F.lit(1)).alias("__n_docs"))
    terms = docs.select(
        "doc_id", F.explode(tokens_expr("text")).alias("term")
    ).filter(F.col("term") != "")
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_tbl = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = with_broadcast_scalar(
        tf.join(df_tbl, "term"), n_docs_df
    ).select(
        "doc_id",
        "term",
        (
            F.col("tf").cast("double")
            * F.log(
                (F.col("__n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))
            )
        ).alias("__score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("__score").desc(), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_TOP_K)
        .select(
            "doc_id",
            "term",
            F.round("__score", 6).alias("tfidf"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def _tfidf_sql() -> str:
    return rf"""
WITH terms AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM terms WHERE term <> ''
  GROUP BY doc_id, term
),
dfs AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, term,
         tf::DOUBLE * ln((n_docs + 1)::DOUBLE / (df + 1)::DOUBLE) AS score
  FROM tf JOIN dfs USING (term) CROSS JOIN n
),
ranked AS (
  SELECT doc_id, term, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, term) AS rank
  FROM scored
)
SELECT doc_id, term, round(score, 6) AS tfidf, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {TFIDF_TOP_K}
"""


# ---------------------------------------------------------------------------
# Approximation / iteration operators with checkable oracle contracts
# ---------------------------------------------------------------------------


def approx_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL approximate distinct users per event type, with a checkable
    contract.

    approx_count_distinct is the only way to count distincts in one pass at
    100 TB (mergeable sketch, map-side combine, no exact-distinct shuffle).
    The raw sketch estimate is engine-specific, so the query emits the EXACT
    distinct count alongside a ``within_5pct`` accuracy boolean instead: the
    oracle recomputes the exact counts and asserts the same boolean, which
    hash-fails if the sketch ever drifts outside its rsd contract. (At
    production scale only the approx aggregate would be run; the exact twin
    here is the correctness harness.)
    """
    t = load_tables(spark, sf_dir, "events")
    agg = t["events"].groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("__approx"),
        F.count_distinct(F.col("user_id")).alias("exact_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return agg.select(
        "event_type",
        "exact_users",
        "n_events",
        (
            F.abs(F.col("__approx") - F.col("exact_users"))
            <= F.lit(0.05) * F.col("exact_users")
        ).alias("within_5pct"),
    )


_APPROX_USERS_SQL = """
SELECT event_type,
       count(DISTINCT user_id) AS exact_users,
       count(*) AS n_events,
       TRUE AS within_5pct
FROM events GROUP BY event_type
"""


def dedup_clusters_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: connected components over the MinHash pair graph.

    Pair generation alone is not dedup — the closure step groups
    transitively-connected docs so the pipeline can keep one canonical doc
    per cluster. Same planted corpus as minhash_pairs_documents; the oracle
    recomputes the identical min-reachable-id fixpoint with a DuckDB
    recursive-CTE closure.
    """
    from arcane_framework_spark.operators.dedup import minhash_lsh_pairs
    from arcane_framework_spark.operators.graph import dedup_clusters
    from arcane_framework_spark.prep import get_prepped
    from arcane_framework_spark.queries import _planted_neardup_docs

    pairs = minhash_lsh_pairs(_planted_neardup_docs(spark, sf_dir))
    return dedup_clusters(
        pairs, components=get_prepped(("components", sf_dir), spark)
    )


def _dedup_clusters_sql(minhash_pairs_sql: str) -> str:
    """Oracle: recursive-CTE closure over the MinHash pair graph.

    Takes the pairs SQL as a parameter (registered from queries.py after
    ``_minhash_sql`` exists — queries_ext loads before it is defined).
    """
    return f"""
WITH RECURSIVE edges AS (
  SELECT id_a, id_b FROM ({minhash_pairs_sql}) mh
),
sym AS (
  SELECT id_a AS node, id_b AS nbr FROM edges
  UNION
  SELECT id_b AS node, id_a AS nbr FROM edges
),
reach(node, r) AS (
  SELECT node, nbr FROM sym
  UNION
  SELECT reach.node, sym.nbr FROM reach JOIN sym ON reach.r = sym.node
),
comp AS (
  SELECT node, least(node, min(r)) AS component FROM reach GROUP BY node
),
sizes AS (
  SELECT component, count(*) AS cluster_size FROM comp GROUP BY component
)
SELECT comp.node AS doc_id,
       comp.component AS cluster_id,
       sizes.cluster_size,
       comp.node = comp.component AS is_canonical
FROM comp JOIN sizes USING (component)
"""


def asof_attribution_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: attribute each purchase to the user's most recent prior
    click (inclusive). One shuffle+sort over clicks∪purchases — the
    union-tag as-of pattern (operators/temporal.py). DuckDB's native ASOF
    JOIN is the oracle.
    """
    from arcane_framework_spark.operators.temporal import asof_join

    t = load_tables(spark, sf_dir, "events")
    # ts dtype normalized by session.ts_timestamp (timestamp[us] today;
    # legacy long-nanos testdata truncates to micros like DuckDB's read).
    ev = t["events"].withColumn("ts", ts_timestamp(t["events"]))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    out = asof_join(
        purchases,
        clicks,
        on="user_id",
        right_payload=["event_id"],
        suffix="_click",
    )
    return out.select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.round("value", 4).alias("value"),
        F.col("ts_click").alias("click_ts"),
        F.col("event_id_click").alias("click_id"),
    )


_ASOF_SQL = """
SELECT p.user_id,
       p.event_id AS purchase_id,
       p.ts AS purchase_ts,
       round(p.value, 4) AS value,
       c.ts AS click_ts,
       c.event_id AS click_id
FROM (SELECT user_id, ts, event_id, value FROM events
      WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT user_id, ts, event_id FROM events
                WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


#: Context-window token budget for the packing query.
PACK_BUDGET = 512
_PACK_GROUPS = 32


def pack_documents_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: documents → fixed-token-budget training packs via a
    distributed prefix sum (operators/packing.py). Output is the per-doc
    pack assignment; the oracle replays the identical (id%G, id)-ordered
    cumulative-sum arithmetic with SQL windows.
    """
    from arcane_framework_spark.operators.packing import pack_documents
    from arcane_framework_spark.operators.text import token_count_expr

    t = load_tables(spark, sf_dir, "documents")
    docs = t["documents"].select(
        "doc_id", token_count_expr("text").alias("n_tokens")
    )
    return pack_documents(
        docs, budget=PACK_BUDGET, num_groups=_PACK_GROUPS
    )


_PACK_SQL = f"""
WITH docs AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(lower(trim(text)), '\\s+'))
         END::BIGINT AS n_tokens,
         doc_id % {_PACK_GROUPS} AS grp
  FROM documents
),
local AS (
  SELECT doc_id, n_tokens, grp,
         COALESCE(sum(n_tokens) OVER (
           PARTITION BY grp ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS local_before
  FROM docs
),
offsets AS (
  SELECT grp,
         COALESCE(sum(grp_total) OVER (
           ORDER BY grp ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0) AS off
  FROM (SELECT grp, sum(n_tokens) AS grp_total FROM docs GROUP BY grp) g
)
SELECT l.doc_id, l.n_tokens,
       (l.local_before + o.off)::BIGINT AS fill_before,
       CAST(floor((l.local_before + o.off)::DOUBLE / {PACK_BUDGET}) AS BIGINT)
         AS pack_id
FROM local l JOIN offsets o USING (grp)
"""


#: Per-source document cap for the stratified-cap query.
SOURCE_CAP = 20


def source_capped_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap: keep the SOURCE_CAP longest docs per source
    (ties by doc_id) — the standard domain-rebalancing step before training.

    Scale: one shuffle on source; rank ≤ k plans as WindowGroupLimit
    (partial top-k map-side), so the shuffle carries at most k rows per
    source per input partition — never the full corpus.
    """
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        t["documents"]
        .select("doc_id", "source", "n_chars")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= SOURCE_CAP)
        .select("doc_id", "source", "n_chars", F.col("rank").cast("int").alias("rank"))
    )


_SOURCE_CAP_SQL = f"""
SELECT doc_id, source, n_chars, CAST(rank AS INT) AS rank
FROM (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rank
  FROM documents
) WHERE rank <= {SOURCE_CAP}
"""


def repetition_quality_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate/repetition quality metrics per document: fraction of
    duplicated word 2-grams and the most-frequent-token share — the
    repetition rules of public LLM data-quality pipelines.

    Shape: the tokens array materializes once behind the _with_tokens
    Generate barrier; bigram construction reads it row-locally; both
    aggregations shuffle on doc_id with map-side partial counts — linear in
    corpus size.
    """
    from arcane_framework_spark.operators.dedup import _with_tokens

    t = load_tables(spark, sf_dir, "documents")
    toks = _with_tokens(t["documents"], "text", "doc_id")
    bg_rows = toks.select(
        "id",
        F.explode(
            F.when(
                F.size("toks") >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size("toks") - 2),
                    lambda i: F.concat_ws(
                        " ", F.get(F.col("toks"), i), F.get(F.col("toks"), i + 1)
                    ),
                ),
            ).otherwise(F.array())
        ).alias("bg"),
    )
    bg_stats = (
        bg_rows.groupBy("id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("id")
        .agg(
            F.sum("c").alias("n_bigrams"),
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias(
                "dup_bigram_tokens"
            ),
        )
    )
    tok_stats = (
        toks.select("id", F.explode("toks").alias("tok"))
        .groupBy("id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.max("c").alias("top_token_count"),
        )
    )
    return bg_stats.join(tok_stats, "id").select(
        F.col("id").alias("doc_id"),
        "n_tokens",
        F.round(
            F.col("dup_bigram_tokens") / F.greatest(F.col("n_bigrams"), F.lit(1)),
            4,
        ).alias("dup_bigram_frac"),
        F.round(
            F.col("top_token_count") / F.greatest(F.col("n_tokens"), F.lit(1)),
            4,
        ).alias("top_token_frac"),
    )


_REPETITION_SQL = """
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
  FROM documents WHERE length(trim(text)) > 0
),
bg AS (
  SELECT doc_id, w[i] || ' ' || w[i+1] AS bg
  FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
        FROM toks WHERE len(w) >= 2) t
),
bg_stats AS (
  SELECT doc_id, sum(c) AS n_bigrams,
         sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_bigram_tokens
  FROM (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY doc_id, bg)
  GROUP BY doc_id
),
tok_stats AS (
  SELECT doc_id, sum(c) AS n_tokens, max(c) AS top_token_count
  FROM (SELECT doc_id, tok, count(*) AS c
        FROM (SELECT doc_id, unnest(w) AS tok FROM toks) u
        GROUP BY doc_id, tok) t
  GROUP BY doc_id
)
SELECT b.doc_id, t.n_tokens::BIGINT AS n_tokens,
       round(b.dup_bigram_tokens::DOUBLE / greatest(b.n_bigrams, 1), 4)
         AS dup_bigram_frac,
       round(t.top_token_count::DOUBLE / greatest(t.n_tokens, 1), 4)
         AS top_token_frac
FROM bg_stats b JOIN tok_stats t USING (doc_id)
"""


def frame_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame-sampling plumbing: binary assets → one row per
    sampled "frame" (sha256 of each 64-byte slice, ≤8 frames/asset) via
    Arrow-batched mapInPandas — the one-to-many fan-out a real video
    decoder plugs into. Deterministic byte slicing, so the oracle replays
    it with blob substrings.
    """
    from arcane_framework_spark.operators.multimodal import (
        documents_as_assets,
        sample_frames,
    )

    t = load_tables(spark, sf_dir, "documents")
    assets = documents_as_assets(t["documents"])
    return sample_frames(assets, every_n_bytes=64, max_frames=8).select(
        "doc_id", "frame_index", "frame_sha256"
    )


_FRAME_SAMPLE_SQL = """
-- DuckDB has no blob slicing; the corpus is pure ASCII (verified:
-- octet_length(encode(text)) == length(text) for every doc), so slicing the
-- VARCHAR by characters and encoding each slice equals python byte slicing.
WITH a AS (
  SELECT doc_id, text, octet_length(encode(text)) AS n
  FROM documents
),
f AS (
  SELECT doc_id, text,
         unnest(range(0, least(8, greatest(n, 1) // 64 + 1))) AS i
  FROM a
)
SELECT doc_id, i::INT AS frame_index,
       sha256(substring(text, (i * 64 + 1)::INT, 64)) AS frame_sha256
FROM f
"""


def redact_pii_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over the corpus: every 11th doc gets planted
    email/phone/IP strings; the query emits per-doc redaction counts and
    the md5 of the REDACTED text, which hash-matches only if both engines
    replace the exact same spans with the same tokens.
    """
    from arcane_framework_spark.operators.text import with_redaction

    t = load_tables(spark, sf_dir, "documents")
    docs = t["documents"].select(
        "doc_id",
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat_ws(
                " ",
                "text",
                F.concat(
                    F.lit("contact user"),
                    F.col("doc_id"),
                    F.lit("@example.com or +1 555-123-4567 at 192.168.1.17"),
                ),
            ),
        ).otherwise(F.col("text")).alias("text"),
    )
    out = with_redaction(docs)
    return out.select(
        "doc_id",
        F.md5("redacted").alias("redacted_md5"),
        F.col("n_email").cast("int").alias("n_email"),
        F.col("n_phone").cast("int").alias("n_phone"),
        F.col("n_ipv4").cast("int").alias("n_ipv4"),
    )


def _redact_sql() -> str:
    from arcane_framework_spark.operators.text import REDACTION_PATTERNS

    pats = {name: pat for name, pat, _ in REDACTION_PATTERNS}
    repls = {name: repl for name, _, repl in REDACTION_PATTERNS}
    chain = "text"
    for name, pat, repl in REDACTION_PATTERNS:
        chain = f"regexp_replace({chain}, '{pat}', '{repl}', 'g')"
    counts = ",\n       ".join(
        f"len(regexp_extract_all(text, '{pats[n]}'))::INT AS n_{n}"
        for n in ("email", "phone", "ipv4")
    )
    return f"""
WITH docs AS (
  SELECT doc_id,
         CASE WHEN doc_id % 11 = 0
              THEN text || ' ' || 'contact user' || doc_id ||
                   '@example.com or +1 555-123-4567 at 192.168.1.17'
              ELSE text END AS text
  FROM documents
)
SELECT doc_id,
       md5({chain}) AS redacted_md5,
       {counts}
FROM docs
"""


def streaming_dedup_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup executed by a REAL Structured Streaming query.

    Events replay through ``readStream`` → ``dropDuplicatesWithinWatermark``
    on (user_id, event_type) → per-type distinct-user counts from the
    drained sink. The watermark horizon (1000 h) exceeds the replayed
    data's ~30-day span, so streaming dedup state never evicts a key early and the
    result equals batch DISTINCT — which is exactly what the SQL oracle
    asserts (T7: bounded-state dedup agrees with batch semantics).
    """
    from arcane_framework_spark.streaming.stateful import dedup_stream

    t = load_tables(spark, sf_dir, "events")  # sets nanosAsLong/ANSI/UTC
    schema = t["events"].schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ev = stream.select(
        ts_timestamp(schema).alias("ts"),
        "user_id",
        "event_type",
    )
    deduped = dedup_stream(
        ev, keys=["user_id", "event_type"], watermark="1000 hours"
    )
    name = "streaming_dedup_users_sink"
    with stream_conf(spark):
        q = (
            deduped.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.table(name)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("distinct_users"))
    )


_STREAMING_DEDUP_SQL = """
SELECT event_type, count(DISTINCT user_id) AS distinct_users
FROM events GROUP BY event_type
"""


BUDGET_TOKENS = 5000


def budget_selection_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ranked budget selection: keep the most lexically diverse
    documents (distinct-token count as the integer score) until a 5000-token
    budget fills — the final cut of a curated data mix, with no global sort
    (score-band prefix sums, operators/packing.py)."""
    from arcane_framework_spark.operators.packing import select_by_budget
    from arcane_framework_spark.operators.text import (
        token_count_expr,
        tokens_expr,
    )

    t = load_tables(spark, sf_dir, "documents")
    docs = t["documents"].select(
        "doc_id",
        F.when(F.length(F.trim("text")) == 0, F.lit(0))
        .otherwise(F.size(F.array_distinct(tokens_expr("text"))))
        .cast("long")
        .alias("score"),
        token_count_expr("text").alias("n_tokens"),
    )
    return select_by_budget(docs, BUDGET_TOKENS)


_BUDGET_SELECTION_SQL = rf"""
WITH scored AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(list_distinct(string_split_regex(lower(trim(text)), '\s+')))
         END::BIGINT AS score,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(lower(trim(text)), '\s+'))
         END::BIGINT AS n_tokens
  FROM documents
),
cum AS (
  -- effective order (score DESC, doc_id % G, doc_id): the oracle twin of
  -- the two-level de-skewed prefix sum in operators/packing.py
  SELECT doc_id, score, n_tokens,
         CAST(coalesce(SUM(n_tokens) OVER (
           ORDER BY score DESC, doc_id % 32, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS fill_before
  FROM scored
)
SELECT doc_id, score, n_tokens, fill_before
FROM cum WHERE fill_before < {BUDGET_TOKENS}
"""


PPS_SAMPLE_N = 50


def pps_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic PPS systematic sample: 50 picks proportional to token
    count, pure integer arithmetic (identical sample in every engine —
    float-based weighted reservoirs are not reproducible across libms)."""
    from arcane_framework_spark.operators.sampling import (
        pps_systematic_sample,
    )
    from arcane_framework_spark.operators.text import token_count_expr

    t = load_tables(spark, sf_dir, "documents")
    docs = t["documents"].select(
        "doc_id", token_count_expr("text").alias("n_tokens")
    )
    return pps_systematic_sample(docs, n=PPS_SAMPLE_N)


def _pps_sample_sql() -> str:
    from arcane_framework_spark.operators.sampling import pps_sample_sql

    weight = (
        "CASE WHEN length(trim(text)) = 0 THEN 0 "
        "ELSE len(string_split_regex(lower(trim(text)), '\\s+')) END"
    )
    return pps_sample_sql(PPS_SAMPLE_N, weight)


def corpus_split_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by doc-id hash.

    Stable across runs/partitionings/engines (operators/sampling.py) — the
    property that keeps eval sets uncontaminated as the corpus grows. The
    oracle replays the identical md5-prefix CASE.
    """
    from arcane_framework_spark.operators.sampling import with_split
    from arcane_framework_spark.operators.text import token_count_expr

    t = load_tables(spark, sf_dir, "documents")
    docs = t["documents"].select(
        "doc_id", token_count_expr("text").alias("n_tokens")
    )
    return with_split(docs, ["doc_id"])


def _corpus_split_sql() -> str:
    from arcane_framework_spark.operators.sampling import split_sql

    case = split_sql("CAST(doc_id AS VARCHAR)")
    return f"""
SELECT doc_id,
       CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(string_split_regex(lower(trim(text)), '\\s+'))
       END::BIGINT AS n_tokens,
       {case} AS split
FROM documents
"""


def range_join_activation_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed range join: events falling inside ANY user's first-2-hour
    activation window (no equi-key — pure interval containment).

    Scale path per operators/rangejoin.py: both sides big → bucket on
    15-minute cells, equi-join, verify BETWEEN. Output: per-window count of
    in-window events from OTHER users (cross-user interval join).
    """
    from arcane_framework_spark.operators.rangejoin import range_join

    t = load_tables(spark, sf_dir, "events")
    # micros since epoch, dtype-dispatched (session.ts_micros)
    ev = t["events"].select(
        "event_id",
        "user_id",
        ts_micros(t["events"]).alias("ts_us"),
    )
    windows = ev.groupBy(F.col("user_id").alias("w_user")).agg(
        F.min("ts_us").alias("w_start")
    ).withColumn("w_end", F.col("w_start") + 2 * 3600 * 1_000_000)
    joined = range_join(
        ev, windows, "ts_us", "w_start", "w_end",
        bucket_width=15 * 60 * 1_000_000,
    )
    return (
        joined.filter(F.col("user_id") != F.col("w_user"))
        .groupBy("w_user")
        .agg(F.count(F.lit(1)).alias("n_other_events"))
    )


_RANGE_JOIN_SQL = """
WITH ev AS (
  SELECT event_id, user_id,
         CAST(floor(epoch_us(ts)) AS BIGINT) AS ts_us
  FROM events
),
w AS (
  SELECT user_id AS w_user, min(ts_us) AS w_start,
         min(ts_us) + 7200000000::BIGINT AS w_end
  FROM ev GROUP BY user_id
)
SELECT w_user, count(*) AS n_other_events
FROM ev JOIN w ON ev.ts_us BETWEEN w.w_start AND w.w_end
WHERE ev.user_id <> w.w_user
GROUP BY w_user
"""


#: Quantization-recall query knobs.
QUANT_QUERIES = 10
QUANT_K = 10


def quantization_recall_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8 scalar quantization + recall@k against the exact top-k.

    The production pattern for shipping embeddings at 100 TB: calibrate
    per-dimension ranges once (64-row aggregate), quantize map-side (4×
    smaller vectors), and measure retrieval recall of the dequantized
    vectors vs full precision. All arithmetic is element-wise IEEE ops the
    DuckDB oracle replays exactly.
    """
    from pyspark.sql import Window

    from arcane_framework_spark.operators.scale import with_broadcast_scalar
    from arcane_framework_spark.operators.similarity import (
        dequantize_expr,
        dimension_stats,
        dot_expr,
        norm_expr,
        quantize_expr,
    )

    t = load_tables(spark, sf_dir, "embeddings")
    emb = t["embeddings"].select("vec_id", "embedding")
    stats = dimension_stats(emb)
    deq = with_broadcast_scalar(emb, stats).select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("exact_vec"),
        dequantize_expr(
            quantize_expr(F.col("embedding"), F.col("mins"), F.col("maxs")),
            F.col("mins"),
            F.col("maxs"),
        ).alias("deq_vec"),
    )

    def topk(vec_field: str) -> DataFrame:
        q = deq.filter(F.col("vec_id") < QUANT_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col(vec_field).alias("qv"),
            norm_expr(F.col(vec_field)).alias("qn"),
        )
        c = deq.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col(vec_field).alias("cv"),
            norm_expr(F.col(vec_field)).alias("cn"),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("__cos").desc(), F.col("neighbor_id")
        )
        return (
            c.join(F.broadcast(q))
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select(
                "query_id",
                "neighbor_id",
                (dot_expr(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("__cos"),
            )
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= QUANT_K)
            .groupBy("query_id")
            .agg(F.collect_set("neighbor_id").alias("nbrs"))
        )

    exact = topk("exact_vec").withColumnRenamed("nbrs", "exact_nbrs")
    approx = topk("deq_vec").withColumnRenamed("nbrs", "deq_nbrs")
    return exact.join(approx, "query_id").select(
        "query_id",
        F.size(F.array_intersect("exact_nbrs", "deq_nbrs")).alias("n_overlap"),
        F.round(
            F.size(F.array_intersect("exact_nbrs", "deq_nbrs"))
            / F.lit(QUANT_K),
            4,
        ).alias("recall"),
    )


def _quant_recall_sql(dim: int = 64) -> str:
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
per_dim AS (
  SELECT g.i AS pos, min(e.v[g.i]) AS mn, max(e.v[g.i]) AS mx
  FROM e CROSS JOIN generate_series(1, {dim}) AS g(i)
  GROUP BY g.i
),
stats AS (
  SELECT list(mn ORDER BY pos) AS mins, list(mx ORDER BY pos) AS maxs
  FROM per_dim
),
deq AS (
  SELECT vec_id,
         v AS exact_vec,
         list_transform(range(1, {dim + 1}), i ->
           CASE WHEN s.maxs[i] = s.mins[i] THEN s.mins[i]
                ELSE s.mins[i]
                     + (floor((e.v[i] - s.mins[i]) / (s.maxs[i] - s.mins[i])
                              * 255 + 0.5) - 128 + 128) / 255
                       * (s.maxs[i] - s.mins[i])
           END) AS deq_vec
  FROM e, stats s
),
exact_scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(q.exact_vec, c.exact_vec)
           / (sqrt(list_dot_product(q.exact_vec, q.exact_vec))
              * sqrt(list_dot_product(c.exact_vec, c.exact_vec))) AS cos,
         row_number() OVER (PARTITION BY q.vec_id
                            ORDER BY cos DESC, c.vec_id) AS rn
  FROM deq q CROSS JOIN deq c
  WHERE q.vec_id < {QUANT_QUERIES} AND q.vec_id <> c.vec_id
),
deq_scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(q.deq_vec, c.deq_vec)
           / (sqrt(list_dot_product(q.deq_vec, q.deq_vec))
              * sqrt(list_dot_product(c.deq_vec, c.deq_vec))) AS cos,
         row_number() OVER (PARTITION BY q.vec_id
                            ORDER BY cos DESC, c.vec_id) AS rn
  FROM deq q CROSS JOIN deq c
  WHERE q.vec_id < {QUANT_QUERIES} AND q.vec_id <> c.vec_id
),
exact_nbrs AS (
  SELECT query_id, list(neighbor_id) AS nbrs FROM exact_scored
  WHERE rn <= {QUANT_K} GROUP BY query_id
),
deq_nbrs AS (
  SELECT query_id, list(neighbor_id) AS nbrs FROM deq_scored
  WHERE rn <= {QUANT_K} GROUP BY query_id
)
SELECT e.query_id,
       len(list_intersect(e.nbrs, d.nbrs)) AS n_overlap,
       round(len(list_intersect(e.nbrs, d.nbrs))::DOUBLE / {QUANT_K}, 4)
         AS recall
FROM exact_nbrs e JOIN deq_nbrs d USING (query_id)
"""


KMEANS_K = 10
KMEANS_ITERS = 3


PQ_QUERIES = 10
PQ_TOPK = 10


def pq_recall_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization end-to-end: per-subspace Lloyd codebooks →
    3-bit codes per subspace (32x compression of float32x64) →
    asymmetric-distance top-k, measured as recall@10 against the exact
    cosine top-10 plus the corpus-wide reconstruction quality.

    The deeper ANN compression step beyond int8 scalar quantization
    (X26): at 100 TB the vectors do not fit anywhere, the code table
    does — ADC scans only codes, queries stay full-precision, codebooks
    broadcast. Everything is deterministic (stride-init fixed-iteration
    Lloyd per subspace, cosine-argmax code assignment with id
    tie-breaks), so the DuckDB oracle replays the ENTIRE pipeline —
    eight unrolled k-means chains, the encode argmax, the ADC ranking —
    and the recall ratios are exact integer arithmetic."""
    from pyspark.sql import Window

    from arcane_framework_spark.operators.cache import scoped_persist
    from arcane_framework_spark.operators.similarity import (
        knn_bruteforce,
        pq_adc_topk,
        pq_codebooks,
        pq_encode,
    )

    from arcane_framework_spark.prep import get_prepped

    t = load_tables(spark, sf_dir, "embeddings")
    emb = t["embeddings"].select("vec_id", "embedding")
    # session prep shares one trained codebook/code table across the pq
    # and ivfpq entries; without prep (the gate) each trains its own
    cb = get_prepped(("pq_codebooks", sf_dir), spark)
    codes = get_prepped(("pq_codes", sf_dir), spark)
    if cb is None or codes is None:
        cb = pq_codebooks(emb)
        codes = pq_encode(emb, cb).transform(scoped_persist)
    q = emb.filter(F.col("vec_id") < PQ_QUERIES)
    adc = pq_adc_topk(codes, cb, q, k=PQ_TOPK)
    # Persisted: consumed by the overlap join AND the per-query base set;
    # the subtree is byte-identical to ivfpq_recall's exact arm, so
    # session prep additionally serves it to both entries from one run.
    exact = scoped_persist(knn_bruteforce(emb, q, k=PQ_TOPK))
    overlap = (
        exact.select("query_id", "neighbor_id")
        .join(adc.select("query_id", "neighbor_id"),
              ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    recon = codes.groupBy("vec_id").agg(
        (
            F.sum("pdot") / (F.max("vnorm") * F.sqrt(F.sum("pcnorm")))
        ).alias("rc")
    )
    gl = recon.agg(
        (F.floor(F.avg("rc") * 10000 + F.lit(0.5)) / 10000).alias(
            "avg_reconstruction_cos"
        )
    )
    base = exact.select("query_id").distinct()
    return (
        base.join(overlap, "query_id", "left")
        .crossJoin(F.broadcast(gl))
        .select(
            "query_id",
            F.coalesce(F.col("__n"), F.lit(0)).cast("long").alias(
                "n_overlap"
            ),
            F.round(
                F.coalesce(F.col("__n"), F.lit(0)) / F.lit(PQ_TOPK), 4
            ).alias("recall"),
            "avg_reconstruction_cos",
        )
    )


def _pq_core_ctes(dim: int = 64) -> list[str]:
    """ef -> eight subspace k-means chains -> cb -> sv -> enc -> codes:
    the shared PQ train+encode CTEs, consumed by the PQ and IVF-PQ
    oracles."""
    from arcane_framework_spark.operators.similarity import (
        PQ_CODE_K, PQ_ITERS, PQ_SUBSPACES,
    )

    sub = dim // PQ_SUBSPACES
    ctes = [
        "ef AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
        "FROM embeddings)"
    ]
    finals = []
    for s in range(PQ_SUBSPACES):
        lo, hi = s * sub + 1, (s + 1) * sub
        sub_ctes, prev, _ = _kmeans_ctes(
            f"SELECT vec_id, v[{lo}:{hi}] AS v FROM ef",
            PQ_CODE_K, PQ_ITERS, sub, prefix=f"p{s}",
        )
        ctes.extend(sub_ctes)
        finals.append((s, prev))
    cb_union = "\n  UNION ALL ".join(
        f"SELECT {s} AS subspace, cid AS code, cvec FROM {prev}"
        for s, prev in finals
    )
    enc_cos = (
        "list_dot_product(sv.sv, cb.cvec) / "
        "(sqrt(list_dot_product(sv.sv, sv.sv)) * "
        "sqrt(list_dot_product(cb.cvec, cb.cvec)))"
    )
    ctes.append(f"cb AS (\n  {cb_union}\n)")
    ctes.append(f"""sv AS (
  SELECT vec_id, g.s AS subspace,
         v[g.s * {sub} + 1 : g.s * {sub} + {sub}] AS sv,
         sqrt(list_dot_product(v, v)) AS vnorm
  FROM ef CROSS JOIN generate_series(0, {PQ_SUBSPACES - 1}) AS g(s)
)""")
    ctes.append(f"""enc AS (
  SELECT sv.vec_id, sv.subspace, sv.vnorm, cb.code,
         list_dot_product(sv.sv, cb.cvec) AS pdot,
         list_dot_product(cb.cvec, cb.cvec) AS pcnorm,
         row_number() OVER (PARTITION BY sv.vec_id, sv.subspace
                            ORDER BY {enc_cos} DESC, cb.code) AS rn
  FROM sv JOIN cb USING (subspace)
)""")
    ctes.append(
        "codes AS (SELECT vec_id, subspace, vnorm, code, pdot, pcnorm "
        "FROM enc WHERE rn = 1)"
    )
    return ctes


def _pq_recall_sql(dim: int = 64) -> str:
    ctes = _pq_core_ctes(dim)
    ctes.append("""recon AS (
  SELECT vec_id, sum(pdot) / (max(vnorm) * sqrt(sum(pcnorm))) AS rc
  FROM codes GROUP BY vec_id
)""")
    ctes.append(
        "gl AS (SELECT floor(avg(rc) * 10000 + 0.5) / 10000 "
        "AS avg_reconstruction_cos FROM recon)"
    )
    ctes.append(f"""lut AS (
  SELECT q.vec_id AS query_id, q.subspace, cb.code, q.vnorm AS qnorm,
         list_dot_product(q.sv, cb.cvec) AS qpdot
  FROM (SELECT * FROM sv WHERE vec_id < {PQ_QUERIES}) q
  JOIN cb USING (subspace)
)""")
    ctes.append("""adc AS (
  SELECT l.query_id, c.vec_id,
         sum(l.qpdot) / (max(l.qnorm) * sqrt(sum(c.pcnorm))) AS adc_cos
  FROM codes c JOIN lut l ON c.subspace = l.subspace AND c.code = l.code
  WHERE c.vec_id <> l.query_id
  GROUP BY l.query_id, c.vec_id
)""")
    ctes.append(f"""adc_nbrs AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY adc_cos DESC, vec_id) AS rn
    FROM adc
  ) WHERE rn <= {PQ_TOPK}
)""")
    ctes.append(f"""exact_nbrs AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY list_dot_product(q.v, c.v)
                      / (sqrt(list_dot_product(q.v, q.v))
                         * sqrt(list_dot_product(c.v, c.v))) DESC,
                      c.vec_id) AS rn
    FROM (SELECT * FROM ef WHERE vec_id < {PQ_QUERIES}) q
    CROSS JOIN ef c
    WHERE q.vec_id <> c.vec_id
  ) WHERE rn <= {PQ_TOPK}
)""")
    ctes.append("""overlap AS (
  SELECT e.query_id, count(*) AS n
  FROM exact_nbrs e JOIN adc_nbrs a USING (query_id, neighbor_id)
  GROUP BY e.query_id
)""")
    joined = ",\n".join(ctes)
    return f"""
WITH {joined}
SELECT q.query_id,
       CAST(coalesce(o.n, 0) AS BIGINT) AS n_overlap,
       round(coalesce(o.n, 0) / {PQ_TOPK}, 4) AS recall,
       gl.avg_reconstruction_cos
FROM (SELECT DISTINCT query_id FROM exact_nbrs) q
LEFT JOIN overlap o USING (query_id)
CROSS JOIN gl
"""


def ivfpq_recall_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ (the FAISS composition) end-to-end: coarse stride cells
    restrict the search, PQ-ADC scores the survivors, measured as
    recall@10 against the exact global cosine top-10 — the COMPOUND
    loss of cell restriction plus quantization, which is the number a
    pipeline actually tunes probes/codebooks against.

    Storage shape at 100 TB: the corpus is (cid, 8 codes) — a few bytes
    per vector; a query probes one cell's slice of the code table and
    scores it with the broadcast LUT. The oracle replays the whole
    composition: the shared PQ train+encode CTEs plus the stride-cell
    assignment and the cell-keyed ADC."""
    from pyspark.sql import functions as _F

    from arcane_framework_spark.operators.cache import scoped_persist
    from arcane_framework_spark.operators.similarity import (
        ivfpq_topk,
        knn_bruteforce,
        pq_codebooks,
        pq_encode,
    )

    from arcane_framework_spark.prep import get_prepped

    t = load_tables(spark, sf_dir, "embeddings")
    emb = t["embeddings"].select("vec_id", "embedding")
    centroids = emb.filter(F.col("vec_id") % IVF_STRIDE == 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    cb = get_prepped(("pq_codebooks", sf_dir), spark)
    codes = get_prepped(("pq_codes", sf_dir), spark)
    if cb is None or codes is None:
        cb = pq_codebooks(emb)
        codes = pq_encode(emb, cb).transform(scoped_persist)
    q = emb.filter(F.col("vec_id") < PQ_QUERIES)
    adc = ivfpq_topk(emb, centroids, codes, cb, q, k=PQ_TOPK)
    # Persisted + prep-shared with pq_recall's identical exact arm.
    exact = scoped_persist(knn_bruteforce(emb, q, k=PQ_TOPK))
    overlap = (
        exact.select("query_id", "neighbor_id")
        .join(adc.select("query_id", "neighbor_id"),
              ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(_F.count(_F.lit(1)).alias("__n"))
    )
    return (
        exact.select("query_id").distinct()
        .join(overlap, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("__n"), F.lit(0)).cast("long").alias(
                "n_overlap"
            ),
            F.round(
                F.coalesce(F.col("__n"), F.lit(0)) / F.lit(PQ_TOPK), 4
            ).alias("recall"),
        )
    )


def _ivfpq_sql(dim: int = 64) -> str:
    ctes = _pq_core_ctes(dim)
    ctes.append(f"""cellc AS (
  SELECT vec_id AS ccid, v AS cv FROM ef WHERE vec_id % {IVF_STRIDE} = 0
)""")
    ctes.append("""cass AS (
  SELECT vec_id, ccid FROM (
    SELECT ef.vec_id, cellc.ccid,
           row_number() OVER (PARTITION BY ef.vec_id
             ORDER BY list_dot_product(ef.v, cellc.cv)
                      / (sqrt(list_dot_product(ef.v, ef.v))
                         * sqrt(list_dot_product(cellc.cv, cellc.cv)))
                      DESC, cellc.ccid) AS rn
    FROM ef CROSS JOIN cellc
  ) WHERE rn = 1
)""")
    ctes.append(f"""lutq AS (
  SELECT q.vec_id AS query_id, q.subspace, cb.code, q.vnorm AS qnorm,
         list_dot_product(q.sv, cb.cvec) AS qpdot
  FROM (SELECT * FROM sv WHERE vec_id < {PQ_QUERIES}) q
  JOIN cb USING (subspace)
)""")
    ctes.append("""adc AS (
  SELECT l.query_id, c.vec_id,
         sum(l.qpdot) / (max(l.qnorm) * sqrt(sum(c.pcnorm))) AS adc_cos
  FROM codes c
  JOIN cass ca ON ca.vec_id = c.vec_id
  JOIN lutq l ON l.subspace = c.subspace AND l.code = c.code
  JOIN cass qa ON qa.vec_id = l.query_id AND qa.ccid = ca.ccid
  WHERE c.vec_id <> l.query_id
  GROUP BY l.query_id, c.vec_id
)""")
    ctes.append(f"""adc_nbrs AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY adc_cos DESC, vec_id) AS rn
    FROM adc
  ) WHERE rn <= {PQ_TOPK}
)""")
    ctes.append(f"""exact_nbrs AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY list_dot_product(q.v, c.v)
                      / (sqrt(list_dot_product(q.v, q.v))
                         * sqrt(list_dot_product(c.v, c.v))) DESC,
                      c.vec_id) AS rn
    FROM (SELECT * FROM ef WHERE vec_id < {PQ_QUERIES}) q
    CROSS JOIN ef c
    WHERE q.vec_id <> c.vec_id
  ) WHERE rn <= {PQ_TOPK}
)""")
    ctes.append("""overlap AS (
  SELECT e.query_id, count(*) AS n
  FROM exact_nbrs e JOIN adc_nbrs a USING (query_id, neighbor_id)
  GROUP BY e.query_id
)""")
    joined = ",\n".join(ctes)
    return f"""
WITH {joined}
SELECT q.query_id,
       CAST(coalesce(o.n, 0) AS BIGINT) AS n_overlap,
       round(coalesce(o.n, 0) / {PQ_TOPK}, 4) AS recall
FROM (SELECT DISTINCT query_id FROM exact_nbrs) q
LEFT JOIN overlap o USING (query_id)
"""


def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration Lloyd's k-means over the embeddings, oracle-checkable.

    Init and iteration count are deterministic (kmeans_fit), so the whole
    fit is SQL-expressible: the oracle unrolls the same three assign/mean
    iterations as DuckDB CTEs. Output is per-centroid quality stats —
    assignment counts, mean cosine to the centroid, centroid norm — the
    values a training pipeline actually monitors.
    """
    from arcane_framework_spark.operators.similarity import (
        dot_expr,
        ivf_assign,
        kmeans_fit,
        norm_expr,
    )

    t = load_tables(spark, sf_dir, "embeddings")
    emb = t["embeddings"]
    centroids = kmeans_fit(emb, k=KMEANS_K, iterations=KMEANS_ITERS)
    cent = centroids.select(
        "cid", "cvec", norm_expr(F.col("cvec")).alias("__cn")
    )
    assigned = ivf_assign(emb, centroids)
    scored = assigned.join(F.broadcast(cent), "cid").select(
        "cid",
        (
            dot_expr(F.col("vec"), F.col("cvec"))
            / (norm_expr(F.col("vec")) * F.col("__cn"))
        ).alias("__cos"),
    )
    stats = scored.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(F.avg("__cos"), 4).alias("avg_cosine"),
    )
    norms = centroids.select(
        "cid", F.round(norm_expr(F.col("cvec")), 4).alias("centroid_norm")
    )
    return stats.join(F.broadcast(norms), "cid").select(
        "cid", "n_points", "avg_cosine", "centroid_norm"
    )


def _kmeans_sql(k: int = KMEANS_K, iters: int = KMEANS_ITERS,
                dim: int = 64) -> str:
    """Unrolled deterministic Lloyd iterations as DuckDB CTEs.

    Mirrors kmeans_fit exactly: stride init (k lowest ids divisible by
    count/k), cosine-argmax assignment with (cos DESC, cid ASC) tie-break,
    per-dimension mean. list_dot_product accumulates in index order like the
    Spark-side ordered fold, so cosines agree to well under the round-4
    tolerance of the emitted stats.
    """
    ctes, prev, cos = _kmeans_ctes(
        "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings",
        k, iters, dim,
    )
    joined = ",\n".join(ctes)
    return f"""
WITH {joined},
final_scored AS (
  SELECT e.vec_id, c.cid, {cos} AS cos,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY {cos} DESC, c.cid) AS rn
  FROM e CROSS JOIN {prev} c
)
SELECT f.cid, count(*) AS n_points,
       round(avg(f.cos), 4) AS avg_cosine,
       round(any_value(sqrt(list_dot_product(c.cvec, c.cvec))), 4)
         AS centroid_norm
FROM (SELECT vec_id, cid, cos FROM final_scored WHERE rn = 1) f
JOIN {prev} c USING (cid)
GROUP BY f.cid
"""


def _kmeans_ctes(src_select: str, k: int | None, iters: int,
                 dim: int,
                 target_cell_size: int | None = None,
                 prefix: str = ""
                 ) -> tuple[list[str], str, str]:
    """Reusable unrolled-Lloyd CTE list over an arbitrary (vec_id, v)
    source select. Returns (ctes, final_centroid_cte_name, cos_template)
    where cos_template scores ``e`` rows against centroid alias ``c``.

    ``target_cell_size`` mirrors kmeans_fit's corpus-derived-k mode: the
    seed stride is floor(n / ceil(n / T)) from the corpus count and there
    is no LIMIT — the centroid count grows with the data. ``prefix``
    namespaces every CTE so several independent fits (e.g. one per PQ
    subspace) compose in a single WITH clause."""
    e = f"{prefix}e"
    cos = (
        f"list_dot_product({e}.v, c.cvec) / "
        f"(sqrt(list_dot_product({e}.v, {e}.v)) * "
        "sqrt(list_dot_product(c.cvec, c.cvec)))"
    )
    if target_cell_size is not None:
        c0 = f"""{prefix}c0 AS (
  SELECT vec_id AS cid, v AS cvec FROM {e},
       (SELECT greatest(1, CAST(floor(count(*) /
          ceil(count(*)::DOUBLE / {target_cell_size})) AS BIGINT))
          AS stride FROM {e}) p
  WHERE vec_id % p.stride = 0
)"""
    else:
        c0 = f"""{prefix}c0 AS (
  SELECT vec_id AS cid, v AS cvec FROM {e},
       (SELECT greatest(1, CAST(floor(count(*)::DOUBLE / {k}) AS BIGINT))
          AS stride FROM {e}) p
  WHERE vec_id % p.stride = 0 ORDER BY vec_id LIMIT {k}
)"""
    ctes = [f"{e} AS ({src_select})", c0]
    prev = f"{prefix}c0"
    for i in range(1, iters + 1):
        ctes.append(f"""{prefix}s{i} AS (
  SELECT {e}.vec_id, c.cid,
         row_number() OVER (PARTITION BY {e}.vec_id
                            ORDER BY {cos} DESC, c.cid) AS rn
  FROM {e} CROSS JOIN {prev} c
)""")
        ctes.append(f"""{prefix}c{i} AS (
  SELECT cid, list(m ORDER BY pos) AS cvec FROM (
    SELECT a.cid, g.i AS pos, avg({e}.v[g.i]) AS m
    FROM (SELECT vec_id, cid FROM {prefix}s{i} WHERE rn = 1) a
    JOIN {e} USING (vec_id)
    CROSS JOIN generate_series(1, {dim}) AS g(i)
    GROUP BY a.cid, g.i
  ) GROUP BY cid
)""")
        prev = f"{prefix}c{i}"
    return ctes, prev, cos


# ---------------------------------------------------------------------------
# Quality funnel, retrieval, and product-analytics operators
# ---------------------------------------------------------------------------


def quality_filter_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality-rule funnel: per-source pass counts for each
    rule (word-count bounds, mean-word-length ceiling, stopword floor) and
    the final keep count.

    Scale: one map-side pass computes all rule booleans off a single
    materialized token array (tokenizer runs once per row), then one
    partial-aggregated shuffle on `source`. Pure integer outputs — the
    most robust oracle contract there is.
    """
    from arcane_framework_spark.operators.text import (
        _with_token_barrier,
        quality_rules_exprs,
    )

    t = load_tables(spark, sf_dir, "documents")
    docs = _with_token_barrier(
        t["documents"].select("doc_id", "text", "source"), "text"
    )
    rules = quality_rules_exprs(F.col("__toks"), "text")
    flagged = docs.select(
        "source",
        *[expr.alias(name) for name, expr in rules.items()],
    )
    keep = F.col("pass_len") & F.col("pass_wordlen") & F.col("pass_stop")
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("pass_len").cast("long")).alias("n_pass_len"),
        F.sum(F.col("pass_wordlen").cast("long")).alias("n_pass_wordlen"),
        F.sum(F.col("pass_stop").cast("long")).alias("n_pass_stop"),
        F.sum(keep.cast("long")).alias("n_keep"),
    )


def _quality_filter_sql() -> str:
    from arcane_framework_spark.operators.text import (
        QUALITY_MAX_MEAN_WORD_LEN,
        QUALITY_MAX_TOKENS,
        QUALITY_MIN_STOPWORD_HITS,
        QUALITY_MIN_TOKENS,
        STOPWORDS,
    )

    swlist = ", ".join(f"'{w}'" for w in STOPWORDS)
    return rf"""
WITH feat AS (
  SELECT source,
         CASE WHEN len(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(lower(trim(text)), '\s+'))
         END::BIGINT AS n_tokens,
         len(regexp_replace(trim(text), '\s+', '', 'g'))::DOUBLE AS squeezed,
         len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         t -> t IN ({swlist}))) AS sw_hits
  FROM documents
),
flags AS (
  SELECT source,
         (n_tokens >= {QUALITY_MIN_TOKENS}
          AND n_tokens <= {QUALITY_MAX_TOKENS}) AS pass_len,
         (squeezed / greatest(n_tokens, 1)::DOUBLE
          <= {QUALITY_MAX_MEAN_WORD_LEN}::DOUBLE) AS pass_wordlen,
         (sw_hits >= {QUALITY_MIN_STOPWORD_HITS}) AS pass_stop
  FROM feat
)
SELECT source,
       count(*)::BIGINT AS n_docs,
       sum(CASE WHEN pass_len THEN 1 ELSE 0 END)::BIGINT AS n_pass_len,
       sum(CASE WHEN pass_wordlen THEN 1 ELSE 0 END)::BIGINT AS n_pass_wordlen,
       sum(CASE WHEN pass_stop THEN 1 ELSE 0 END)::BIGINT AS n_pass_stop,
       sum(CASE WHEN pass_len AND pass_wordlen AND pass_stop
                THEN 1 ELSE 0 END)::BIGINT AS n_keep
FROM flags GROUP BY source
"""


BM25_TOP_K = 5


def bm25_topk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-k retrieval for a fixed keyword-query set
    (operators/retrieval.py — inverted-index shape, broadcast query/df
    sides, fixed-point order-independent score sums)."""
    from arcane_framework_spark.operators.retrieval import (
        RETRIEVAL_POOL_K,
        bm25_topk,
    )

    t = load_tables(spark, sf_dir, "documents")
    # Rank against the shared pool depth and cut to the entry's k on
    # top: identical rows (top-5 is a prefix of the deterministic
    # top-20), and the pooled subtree is byte-identical to the RRF
    # fusion's BM25 arm, so session prep persists it once for both.
    return bm25_topk(
        spark, t["documents"].select("doc_id", "text"), k=RETRIEVAL_POOL_K
    ).filter(F.col("rank") <= BM25_TOP_K)


def _bm25_sql() -> str:
    from arcane_framework_spark.operators.retrieval import (
        BM25_FP,
        BM25_QUERIES,
        bm25_core_sql,
    )

    vals = ", ".join(
        f"({qid}, '{t}')"
        for qid, terms in sorted(BM25_QUERIES.items())
        for t in terms
    )
    tail = f"""
SELECT query_id, doc_id,
       round(score_fp::DOUBLE / {float(BM25_FP)!r}::DOUBLE, 6) AS score,
       CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {BM25_TOP_K}"""
    return bm25_core_sql(f"q(query_id, term) AS (VALUES {vals})", tail)


#: Funnel steps and window for ``window_funnel_events`` (24h in micros).
FUNNEL_STEPS = ["view", "click", "purchase"]
FUNNEL_WINDOW_US = 86_400_000_000


def window_funnel_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-step conversion funnel (view → click → purchase within 24h
    of the first view): distribution of deepest level reached per user.
    operators/temporal.py `window_funnel` — co-partitioned per-step
    aggregates, integer-microsecond arithmetic."""
    from arcane_framework_spark.operators.temporal import window_funnel

    t = load_tables(spark, sf_dir, "events")
    ev = t["events"].select(
        "user_id", "event_type", ts_micros(t["events"]).alias("ts_us")
    )
    levels = window_funnel(ev, FUNNEL_STEPS, FUNNEL_WINDOW_US)
    return levels.groupBy("level").agg(F.count(F.lit(1)).alias("n_users"))


_WINDOW_FUNNEL_SQL = f"""
WITH ev AS (
  SELECT user_id, event_type,
         CAST(floor(epoch_us(ts)) AS BIGINT) AS ts_us
  FROM events
),
t1 AS (
  SELECT user_id, min(ts_us) AS p,
         min(ts_us) + {FUNNEL_WINDOW_US}::BIGINT AS dl
  FROM ev WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id
),
t2 AS (
  SELECT e.user_id, min(ts_us) AS p, max(dl) AS dl
  FROM ev e JOIN t1 USING (user_id)
  WHERE event_type = '{FUNNEL_STEPS[1]}' AND ts_us >= t1.p AND ts_us <= dl
  GROUP BY e.user_id
),
t3 AS (
  SELECT e.user_id, min(ts_us) AS p
  FROM ev e JOIN t2 USING (user_id)
  WHERE event_type = '{FUNNEL_STEPS[2]}' AND ts_us >= t2.p AND ts_us <= dl
  GROUP BY e.user_id
)
SELECT level, count(*)::BIGINT AS n_users FROM (
  SELECT t1.user_id,
         CASE WHEN t3.user_id IS NOT NULL THEN 3
              WHEN t2.user_id IS NOT NULL THEN 2
              ELSE 1 END AS level
  FROM t1 LEFT JOIN t2 USING (user_id) LEFT JOIN t3 USING (user_id)
) GROUP BY level
"""


def retention_cohorts_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users bucketed by first-seen date, distinct
    actives per whole-week offset (operators/temporal.py
    `retention_cohorts`)."""
    from arcane_framework_spark.operators.temporal import retention_cohorts

    t = load_tables(spark, sf_dir, "events")
    ev = t["events"].select(
        "user_id",
        F.to_date(ts_timestamp(t["events"])).alias("event_date"),
    )
    res = retention_cohorts(ev)
    return res.select(
        F.date_format("cohort_date", "yyyy-MM-dd").alias("cohort_date"),
        F.col("week_offset").cast("int").alias("week_offset"),
        "n_users",
    )


_RETENTION_SQL = """
WITH ev AS (SELECT user_id, ts::DATE AS d FROM events),
fs AS (SELECT user_id, min(d) AS cohort FROM ev GROUP BY user_id)
SELECT strftime(cohort, '%Y-%m-%d') AS cohort_date,
       CAST(floor(date_diff('day', cohort, d) / 7.0) AS INT) AS week_offset,
       count(DISTINCT user_id)::BIGINT AS n_users
FROM ev JOIN fs USING (user_id)
GROUP BY 1, 2
"""


#: Repeated-span detection: span width in tokens.
SPAN_N = 16


def repeated_spans_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verbatim repeated spans: token 16-grams appearing in >= 2 distinct
    documents of a corpus with planted duplicates (every 7th doc
    re-inserted, mirroring the MinHash planting so positives exist).
    operators/decontam.py `repeated_spans`."""
    from arcane_framework_spark.operators.decontam import repeated_spans

    t = load_tables(spark, sf_dir, "documents")
    docs = t["documents"].select("doc_id", "text")
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + F.lit(_DUP_OFFSET)).alias("doc_id"), "text"
        )
    )
    return repeated_spans(corpus, n=SPAN_N)


_REPEATED_SPANS_SQL = rf"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {_DUP_OFFSET}, text FROM documents WHERE doc_id % 7 = 0
),
toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
  FROM corpus
),
grams AS (
  SELECT doc_id,
         md5(array_to_string(w[i:i+{SPAN_N - 1}], ' ')) AS gram_hash
  FROM toks, unnest(range(1, len(w) - {SPAN_N - 2})) AS t(i)
  WHERE len(w) >= {SPAN_N}
)
SELECT gram_hash,
       count(DISTINCT doc_id)::BIGINT AS n_docs,
       min(doc_id) AS example_doc
FROM grams
GROUP BY 1
HAVING count(DISTINCT doc_id) >= 2
"""


def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-feed derivation: diff the orders snapshot against a
    deterministically mutated copy (drop keys %101, bump price on %97,
    insert shifted copies of %103) and emit insert/update/delete rows
    (operators/relational.py `snapshot_diff`)."""
    from arcane_framework_spark.operators.relational import snapshot_diff

    t = load_tables(spark, sf_dir, "orders")
    old = t["orders"].select("o_orderkey", "o_totalprice", "o_orderstatus")
    new = old.filter(F.col("o_orderkey") % 101 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 97 == 0, F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
        "o_orderstatus",
    ).unionByName(
        old.filter(F.col("o_orderkey") % 103 == 0).select(
            (F.col("o_orderkey") + F.lit(10_000_000)).alias("o_orderkey"),
            "o_totalprice",
            "o_orderstatus",
        )
    )
    return snapshot_diff(old, new, keys=["o_orderkey"])


_SNAPSHOT_DIFF_SQL = """
WITH old AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
),
newt AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice + 1.0
              ELSE o_totalprice END AS o_totalprice,
         o_orderstatus
  FROM orders WHERE o_orderkey % 101 <> 0
  UNION ALL
  SELECT o_orderkey + 10000000, o_totalprice, o_orderstatus
  FROM orders WHERE o_orderkey % 103 = 0
)
SELECT COALESCE(n.o_orderkey, o.o_orderkey) AS o_orderkey,
       CASE WHEN o.o_orderkey IS NULL THEN 'insert'
            WHEN n.o_orderkey IS NULL THEN 'delete'
            ELSE 'update' END AS change_type,
       CASE WHEN n.o_orderkey IS NOT NULL THEN n.o_totalprice
            ELSE o.o_totalprice END AS o_totalprice,
       CASE WHEN n.o_orderkey IS NOT NULL THEN n.o_orderstatus
            ELSE o.o_orderstatus END AS o_orderstatus
FROM old o FULL OUTER JOIN newt n ON o.o_orderkey = n.o_orderkey
WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
   OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
   OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
"""


def centroid_outliers_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic outlier scoring: per-vector distance to its label's
    centroid via exact integer algebra (operators/similarity.py
    `centroid_outliers`)."""
    from arcane_framework_spark.operators.similarity import centroid_outliers

    t = load_tables(spark, sf_dir, "embeddings")
    return centroid_outliers(
        t["embeddings"].select("vec_id", "embedding", "label")
    )


_CENTROID_OUTLIERS_SQL = """
WITH e AS (
  SELECT vec_id, label,
         list_transform(
           embedding,
           x -> CAST(floor(x::DOUBLE * 1000000.0 + 0.5) AS BIGINT)
         ) AS ei
  FROM embeddings
),
dims AS (
  SELECT vec_id, label, i AS pos, ei[i] AS v
  FROM e, unnest(range(1, len(ei) + 1)) AS t(i)
),
cent AS (
  SELECT label, pos, sum(v)::BIGINT AS s, count(*)::BIGINT AS cnt
  FROM dims GROUP BY 1, 2
),
terms AS (
  SELECT d.vec_id, d.label,
         (d.v * c.cnt - c.s)::HUGEINT * (d.v * c.cnt - c.s)::HUGEINT AS term,
         c.cnt AS cnt
  FROM dims d JOIN cent c ON d.label = c.label AND d.pos = c.pos
)
SELECT vec_id, label,
       floor(
         sqrt(sum(term)::DOUBLE) / ((max(cnt) * 1000000)::DOUBLE) * 1000000.0
         + 0.5
       ) / 1000000.0 AS dist
FROM terms GROUP BY 1, 2
"""


def streaming_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join executed by an actual Structured
    Streaming query: clicks attributed to same-user purchases within 30
    minutes (streaming/stateful.py `interval_join_stream`). Both sides are
    branches of one replayed file stream; the time-bounded condition keeps
    join state watermark-evictable. The oracle is the equivalent batch
    join — identical results prove the streaming path agrees with batch
    semantics."""
    from arcane_framework_spark.streaming.stateful import interval_join_stream

    t = load_tables(spark, sf_dir, "events")
    schema = t["events"].schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ev = stream.select(
        "event_id", "user_id", "event_type",
        ts_timestamp(schema).alias("ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    joined = interval_join_stream(clicks, purchases, max_delay="30 minutes")
    out = joined.select(
        "user_id",
        F.col("l_event_id").alias("click_id"),
        F.col("r_event_id").alias("purchase_id"),
        F.expr("(unix_micros(r_ts) - unix_micros(l_ts)) div 1000000")
        .alias("delay_sec"),
    )
    name = "streaming_attribution_join_sink"
    # Drain-and-stop inner join: every output row is emitted by the DATA
    # batch at match time; the trailing no-data micro-batch exists only to
    # advance the watermark and evict join state for a query that keeps
    # running — here the query stops right after, so that batch is a pure
    # second round of planning + 8 partitions x 4 join-state-store commits
    # (measured ~1s of the entry). Skipping it cannot change the rows
    # (state eviction never adds output to an inner join). A long-running
    # production deployment keeps the default ON for timely eviction.
    no_data = "spark.sql.streaming.noDataMicroBatches.enabled"
    old_no_data = spark.conf.get(no_data)
    spark.conf.set(no_data, "false")
    try:
        with stream_conf(spark):
            q = (
                out.writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
    finally:
        spark.conf.set(no_data, old_no_data)
    return spark.table(name)


_STREAMING_ATTRIBUTION_SQL = """
SELECT a.user_id, a.event_id AS click_id, b.event_id AS purchase_id,
       (epoch_us(b.ts) - epoch_us(a.ts)) // 1000000 AS delay_sec
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND b.ts >= a.ts
 AND b.ts <= a.ts + INTERVAL '30 minutes'
WHERE a.event_type = 'click' AND b.event_type = 'purchase'
"""


#: Target mixture for the catalog query: source i weighted ∝ i+1, so the
#: keep-fraction sweeps 5%…100% across the 20 (balanced) synthetic sources.
#: Weights need not be normalized — frac = w·T/n with T = min(n/w) is
#: scale-invariant in w.
MIX_WEIGHTS: dict[str, float] = {f"src{i}": (i + 1) / 210 for i in range(20)}


def mixture_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain mixture rebalancing: hash-downsample each source toward a
    target mixture without upsampling (operators/sampling.py
    `mixture_sample`). Returns the surviving (doc_id, source) rows."""
    from arcane_framework_spark.operators.sampling import mixture_sample

    t = load_tables(spark, sf_dir, "documents")
    kept = mixture_sample(
        t["documents"].select("doc_id", "source"), weights=MIX_WEIGHTS
    )
    return kept.select("doc_id", "source")


def _mixture_sample_sql() -> str:
    values = ", ".join(
        f"('{s}', {w!r})" for s, w in MIX_WEIGHTS.items()
    )
    # Double-op order mirrors mixture_sample exactly: t = min(n / w);
    # frac = least(1.0, (w * t) / n); thr = floor(frac * 16^8).
    return rf"""
WITH w(source, w) AS (SELECT * FROM (VALUES {values})),
counts AS (
  SELECT source, count(*)::BIGINT AS n FROM documents GROUP BY 1
),
t AS (SELECT min(n / w) AS t FROM counts JOIN w USING (source)),
fr AS (
  SELECT source,
         CAST(floor(least(1.0, (w * t) / n) * 4294967296.0) AS BIGINT)
           AS thr
  FROM counts JOIN w USING (source), t
)
SELECT d.doc_id, d.source
FROM documents d JOIN fr USING (source)
WHERE thr >= 4294967296
   OR substr(md5('mix' || '#' || CAST(d.doc_id AS VARCHAR)), 1, 8)
      < lower(lpad(to_hex(thr), 8, '0'))
"""


def unigram_nll_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality score: per-document mean NLL under a
    unigram LM fitted on the corpus itself (operators/text.py
    `unigram_nll`). Fixed-point micro-nat arithmetic keeps both engines
    bit-identical and order-independent."""
    from arcane_framework_spark.operators.text import unigram_nll

    t = load_tables(spark, sf_dir, "documents")
    return unigram_nll(t["documents"].select("doc_id", "text"))


_UNIGRAM_NLL_SQL = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
  FROM documents
),
tf AS (SELECT doc_id, tok, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
vocab AS (SELECT tok, sum(tf)::BIGINT AS cnt FROM tf GROUP BY 1),
tot AS (SELECT sum(cnt)::BIGINT AS total FROM vocab),
lp AS (
  SELECT tok,
         CAST(floor(-1e6 * ln(cnt / total) + 0.5) AS BIGINT) AS lp_micro
  FROM vocab, tot
)
SELECT doc_id, sum(tf)::BIGINT AS n_tokens,
       sum(tf * lp_micro)::BIGINT AS sum_nll_micro,
       floor(sum(tf * lp_micro)::DOUBLE / sum(tf) / 100.0 + 0.5) / 1e4
         AS mean_nll
FROM tf JOIN lp USING (tok)
GROUP BY doc_id
"""


#: Catalog chunking parameters: small enough that the synthetic docs
#: (avg ~54, max ~99 tokens) actually produce overlapping multi-chunk
#: output; production uses the operator defaults (128/96) or larger.
CHUNK_Q_WIDTH = 32
CHUNK_Q_STRIDE = 24


def chunk_documents_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window token chunking (RAG/training prep): overlapping
    32-token windows every 24 tokens, one row per chunk with its token
    count and content hash. operators/packing.py `chunk_tokens` — pure
    map-side Generate+Project, no shuffle."""
    from arcane_framework_spark.operators.packing import chunk_tokens

    t = load_tables(spark, sf_dir, "documents")
    return chunk_tokens(
        t["documents"].select("doc_id", "text"),
        width=CHUNK_Q_WIDTH, stride=CHUNK_Q_STRIDE,
    )


def _chunk_sliding_sql() -> str:
    w, s = CHUNK_Q_WIDTH, CHUNK_Q_STRIDE
    return rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
  FROM documents
),
stats AS (
  SELECT doc_id, w, len(w) AS n,
         1 + greatest(0, CAST(floor((len(w) - {w} + {s - 1}) / {s}.0) AS INT))
           AS n_chunks
  FROM toks
),
ch AS (
  SELECT doc_id, w, n, k AS chunk_id, k * {s} + 1 AS start
  FROM stats, unnest(range(0, n_chunks)) AS t(k)
)
SELECT doc_id, chunk_id::INT AS chunk_id,
       least({w}, n - start + 1)::INT AS n_tokens,
       md5(array_to_string(w[start:least(start + {w - 1}, n)], ' '))
         AS chunk_hash
FROM ch
"""


#: Decontamination: flag corpus docs sharing >= this many distinct token
#: 8-grams with an eval/benchmark document.
DECONTAM_MIN_MATCHES = 3

#: Every 50th document plays the role of a benchmark/eval document.
DECONTAM_EVAL_MOD = 50


def decontam_overlap_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing verbatim token
    8-grams with a (tiny, broadcast) eval set.

    Every 50th document acts as the eval set; the corpus gets planted
    contaminated copies (eval text re-inserted under a shifted id) so the
    probe has guaranteed positives, mirroring the dedup queries' planting
    scheme. operators/decontam.py `contamination_pairs` — map-only corpus
    n-grams hash-joined against a broadcast eval n-gram table.
    """
    from arcane_framework_spark.operators.decontam import contamination_pairs

    t = load_tables(spark, sf_dir, "documents")
    docs = t["documents"].select("doc_id", "text")
    evalset = docs.filter(F.col("doc_id") % DECONTAM_EVAL_MOD == 0)
    corpus = docs.unionByName(
        evalset.select(
            (F.col("doc_id") + F.lit(_DUP_OFFSET)).alias("doc_id"), "text"
        )
    )
    return contamination_pairs(
        corpus, evalset, min_matches=DECONTAM_MIN_MATCHES
    )


_DECONTAM_SQL = rf"""
WITH evalset AS (
  SELECT doc_id AS eval_id, text FROM documents
  WHERE doc_id % {DECONTAM_EVAL_MOD} = 0
),
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT eval_id + {_DUP_OFFSET}, text FROM evalset
),
ctoks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
  FROM corpus
),
cgrams AS (
  SELECT doc_id, md5(array_to_string(w[i:i+7], ' ')) AS gram_hash
  FROM ctoks, unnest(range(1, len(w) - 6)) AS t(i)
  WHERE len(w) >= 8
),
etoks AS (
  SELECT eval_id, string_split_regex(lower(trim(text)), '\s+') AS w
  FROM evalset
),
egrams AS (
  SELECT DISTINCT eval_id, md5(array_to_string(w[i:i+7], ' ')) AS gram_hash
  FROM etoks, unnest(range(1, len(w) - 6)) AS t(i)
  WHERE len(w) >= 8
)
SELECT c.doc_id, e.eval_id,
       count(DISTINCT gram_hash)::BIGINT AS n_shared
FROM cgrams c JOIN egrams e USING (gram_hash)
WHERE c.doc_id <> e.eval_id
GROUP BY 1, 2
HAVING count(DISTINCT gram_hash) >= {DECONTAM_MIN_MATCHES}
"""


STRATIFIED_FRACTION = 0.25  # binary-exact: floor(n*f) matches bit-for-bit


def stratified_sample_embeddings(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Class-balanced subsample: exactly floor(n_label · 0.25) vectors per
    label, picked in deterministic hash order (operators/sampling.py
    ``stratified_sample`` — the two-level de-skewed rank, no seed, no
    partition-order sensitivity). Returns (vec_id, label)."""
    from arcane_framework_spark.operators.sampling import stratified_sample

    t = load_tables(spark, sf_dir, "embeddings")
    emb = t["embeddings"].select("vec_id", "label")
    return stratified_sample(
        emb, strata_col="label", fraction=STRATIFIED_FRACTION
    ).select("vec_id", "label")


_STRATIFIED_SQL = f"""
WITH base AS (
  SELECT vec_id, label,
         vec_id % 32 AS grp,
         md5('strat' || '#' || CAST(vec_id AS VARCHAR)) AS bk
  FROM embeddings
),
rk AS (
  -- single-window twin of the Spark two-level rank: same effective
  -- per-stratum order (id % G, md5, id)
  SELECT vec_id, label,
         row_number() OVER (
           PARTITION BY label ORDER BY grp, bk, vec_id
         ) AS r,
         count(*) OVER (PARTITION BY label) AS tot
  FROM base
)
SELECT vec_id, label FROM rk WHERE r <= floor(tot * {STRATIFIED_FRACTION})
"""


def dedup_canonical_documents(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """The corpus AFTER near-dup removal, reported per source: every doc
    outside the pair graph survives, paired docs survive only as their
    cluster's canonical (min-id) member — the accounting a curation run
    publishes alongside the deduped corpus. Same planted corpus as
    minhash_pairs_documents."""
    from arcane_framework_spark.operators.dedup import minhash_lsh_pairs
    from arcane_framework_spark.operators.graph import dedup_clusters
    from arcane_framework_spark.queries import _planted_neardup_docs

    t = load_tables(spark, sf_dir, "documents")
    docs = t["documents"].select("doc_id", "text", "source")
    planted = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + F.lit(_DUP_OFFSET)).alias("doc_id"),
        F.concat_ws(" ", "text", "text").alias("text"),
        "source",
    )
    corpus = docs.unionByName(planted)
    # pairs come from the SHARED corpus subtree (not corpus.select(...)):
    # same semantics, and the canonicalized plan matches the session-level
    # prep cache so the signature/pair tables are never re-derived here;
    # the CC table reuses the prep handle when one is active.
    from arcane_framework_spark.prep import get_prepped

    clusters = dedup_clusters(
        minhash_lsh_pairs(_planted_neardup_docs(spark, sf_dir)),
        components=get_prepped(("components", sf_dir), spark),
    )
    keep = F.coalesce(F.col("is_canonical"), F.lit(True))
    kept_flag = F.when(keep, 1).otherwise(0)
    return (
        corpus.join(
            clusters.select("doc_id", "is_canonical"), "doc_id", "left"
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(kept_flag).cast("long").alias("n_kept"),
        )
        .select(
            "source",
            "n_docs",
            "n_kept",
            (
                F.floor(
                    F.col("n_kept") / F.col("n_docs") * 10000 + F.lit(0.5)
                ) / 10000
            ).alias("kept_ratio"),
        )
    )


def _dedup_canonical_sql(minhash_pairs_sql: str) -> str:
    """Oracle: recursive-CTE closure → per-source survivor accounting.
    Parameterized on the pairs SQL like ``_dedup_clusters_sql``."""
    return f"""
WITH RECURSIVE edges AS (
  SELECT id_a, id_b FROM ({minhash_pairs_sql}) mh
),
sym AS (
  SELECT id_a AS node, id_b AS nbr FROM edges
  UNION
  SELECT id_b AS node, id_a AS nbr FROM edges
),
reach(node, r) AS (
  SELECT node, nbr FROM sym
  UNION
  SELECT reach.node, sym.nbr FROM reach JOIN sym ON reach.r = sym.node
),
comp AS (
  SELECT node, least(node, min(r)) AS component FROM reach GROUP BY node
),
corpus AS (
  SELECT doc_id, source FROM documents
  UNION ALL
  SELECT doc_id + {{dup_offset}}, source FROM documents WHERE doc_id % 7 = 0
),
flags AS (
  SELECT corpus.doc_id, corpus.source,
         CASE WHEN comp.node IS NULL THEN TRUE
              ELSE comp.node = comp.component END AS keep
  FROM corpus LEFT JOIN comp ON comp.node = corpus.doc_id
)
SELECT source,
       count(*)::BIGINT AS n_docs,
       SUM(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       floor(SUM(CASE WHEN keep THEN 1 ELSE 0 END)::DOUBLE
             / count(*) * 10000 + 0.5) / 10000 AS kept_ratio
FROM flags GROUP BY source
""".replace("{dup_offset}", str(_DUP_OFFSET))


def embedding_dispersion_labels(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Per-label embedding diversity: exact mean pairwise squared
    distance via the one-pass variance identity — the
    diversity-collapse monitor (operators/similarity.py
    embedding_dispersion)."""
    from arcane_framework_spark.operators.similarity import (
        embedding_dispersion,
    )

    t = load_tables(spark, sf_dir, "embeddings")
    return embedding_dispersion(t["embeddings"])


_DISPERSION_SQL = f"""
WITH comp AS (
  SELECT label, i.pos,
         CAST(floor(v[i.pos] * 1000000 + 0.5) AS HUGEINT) AS e
  FROM (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       (SELECT unnest(generate_series(1, {EMBEDDING_DIM})) AS pos) i
),
per_dim AS (
  SELECT label, pos, SUM(e) AS s, SUM(e * e) AS q, count(*) AS n
  FROM comp GROUP BY label, pos
),
per_group AS (
  SELECT label, SUM(s * s) AS ss, SUM(q) AS qq, MAX(n) AS n
  FROM per_dim GROUP BY label
)
SELECT label,
       CAST(n AS BIGINT) AS n_vectors,
       floor((2 * n * qq - 2 * ss)::DOUBLE
             / (n::DOUBLE * (n - 1)::DOUBLE * 1e12) * 1e6 + 0.5) / 1e6
         AS dispersion
FROM per_group WHERE n > 1
"""


SKEW_TOP_K = 10
TOP_FRACTION = 0.25
TOP_FRACTION_GROUPS = 32


def skew_report_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-shuffle skew diagnostic on the events join key: the 10
    hottest user_ids with their table share and skew factor vs a uniform
    key distribution (operators/scale.py skew_report)."""
    from arcane_framework_spark.operators.scale import skew_report

    t = load_tables(spark, sf_dir, "events")
    return skew_report(t["events"], "user_id", top_k=SKEW_TOP_K)


def length_quantiles_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact p50/p90/p99 of document length — the datacard
    tail statistic (operators/scale.py grouped_quantiles: one banded
    shuffle, integer lower-quantile convention, no interpolation)."""
    from arcane_framework_spark.operators.scale import grouped_quantiles

    t = load_tables(spark, sf_dir, "documents")
    return grouped_quantiles(
        t["documents"].select("source", F.length("text").alias("len")),
        "source", "len",
    )


_LENGTH_QUANTILES_SQL = """
WITH bands AS (
  SELECT source, CAST(length(text) AS BIGINT) AS value,
         CAST(count(*) AS BIGINT) AS cnt
  FROM documents GROUP BY 1, 2
),
cum AS (
  SELECT source, value,
         SUM(cnt) OVER (PARTITION BY source ORDER BY value) AS c,
         SUM(cnt) OVER (PARTITION BY source) AS tot
  FROM bands
)
SELECT source,
       CAST(max(tot) AS BIGINT) AS n_rows,
       CAST(min(CASE WHEN 100 * c >= 50 * tot THEN value END) AS BIGINT)
         AS p50_len,
       CAST(min(CASE WHEN 100 * c >= 90 * tot THEN value END) AS BIGINT)
         AS p90_len,
       CAST(min(CASE WHEN 100 * c >= 99 * tot THEN value END) AS BIGINT)
         AS p99_len
FROM cum GROUP BY source
"""


def corpus_version_diff_documents(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Corpus release diff: fingerprint-level change feed between two
    versions of the documents table, aggregated to per-source churn
    counts — the audit a curation pipeline publishes with every corpus
    release. v2 is simulated deterministically (every 17th doc dropped,
    every 13th edited, every 29th re-added as a new id), the diff is
    `operators/relational.py snapshot_diff` — ONE full-outer
    co-partitioned join, null-safe content-hash compare in codegen —
    and the output is (source, change_type, n): metadata-scale however
    big the corpus."""
    from arcane_framework_spark.operators.relational import snapshot_diff
    from arcane_framework_spark.operators.text import fingerprint_expr

    t = load_tables(spark, sf_dir, "documents")
    base = t["documents"]
    v1 = base.select(
        "doc_id", "source", fingerprint_expr("text").alias("fp")
    )
    edited = F.when(
        F.col("doc_id") % 13 == 0, F.concat(F.col("text"), F.lit(" rev2"))
    ).otherwise(F.col("text"))
    v2 = (
        base.filter(F.col("doc_id") % 17 != 0)
        .select("doc_id", "source", fingerprint_expr(edited).alias("fp"))
        .unionByName(
            base.filter(F.col("doc_id") % 29 == 0).select(
                (F.col("doc_id") + F.lit(_DUP_OFFSET)).alias("doc_id"),
                "source",
                fingerprint_expr(
                    F.concat(F.lit("new "), F.col("text"))
                ).alias("fp"),
            )
        )
    )
    return (
        snapshot_diff(v1, v2, keys=["doc_id"], compare_cols=["source", "fp"])
        .groupBy("source", "change_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_CORPUS_DIFF_SQL = rf"""
WITH v1 AS (
  SELECT doc_id, source,
         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
  FROM documents
),
v2 AS (
  SELECT doc_id, source,
         md5(regexp_replace(lower(trim(
           CASE WHEN doc_id % 13 = 0 THEN text || ' rev2' ELSE text END
         )), '\s+', ' ', 'g')) AS fp
  FROM documents WHERE doc_id % 17 <> 0
  UNION ALL
  SELECT doc_id + {_DUP_OFFSET}, source,
         md5(regexp_replace(lower(trim('new ' || text)), '\s+', ' ', 'g'))
  FROM documents WHERE doc_id % 29 = 0
),
d AS (
  SELECT COALESCE(n.source, o.source) AS source,
         CASE WHEN o.doc_id IS NULL THEN 'insert'
              WHEN n.doc_id IS NULL THEN 'delete'
              WHEN o.fp IS DISTINCT FROM n.fp
                   OR o.source IS DISTINCT FROM n.source THEN 'update'
         END AS change_type
  FROM v1 o FULL OUTER JOIN v2 n ON o.doc_id = n.doc_id
)
SELECT source, change_type, CAST(count(*) AS BIGINT) AS n
FROM d WHERE change_type IS NOT NULL
GROUP BY source, change_type
"""


def streaming_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of the corpus release diff: v2 documents ARRIVE as
    a stream (every 13th edited, every 29th also re-emitted as a brand-new
    id) and are classified against the static v1 fingerprint table by a
    stateless stream-static left join — insert / update / unchanged counts
    per source. Deletes are intentionally absent: an upsert stream cannot
    observe them, which is exactly why the reference's change feeds carry
    explicit delete markers (SURVEY §1.4) — the batch diff entry
    (`corpus_version_diff_documents`) is where deletes come from.

    The only stateful op is the final count aggregation (complete mode);
    the classification path is stateless and watermark-free, so the
    stream scales like any map+broadcast-join pipeline."""
    from arcane_framework_spark.operators.text import fingerprint_expr
    from arcane_framework_spark.queries_ext import stream_conf

    t = load_tables(spark, sf_dir, "documents")
    v1 = (
        t["documents"]
        .select("doc_id", fingerprint_expr("text").alias("__old_fp"))
        .persist()
    )

    schema = t["documents"].schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    edited = F.when(
        F.col("doc_id") % 13 == 0, F.concat(F.col("text"), F.lit(" rev2"))
    ).otherwise(F.col("text"))
    row_t = "struct<doc_id: bigint, source: string, fp: string>"
    v2 = (
        stream.select(
            F.explode(
                F.filter(
                    F.array(
                        F.struct(
                            F.col("doc_id"),
                            F.col("source"),
                            fingerprint_expr(edited).alias("fp"),
                        ).cast(row_t),
                        F.when(
                            F.col("doc_id") % 29 == 0,
                            F.struct(
                                (F.col("doc_id") + F.lit(_DUP_OFFSET)).alias(
                                    "doc_id"
                                ),
                                F.col("source"),
                                fingerprint_expr(
                                    F.concat(F.lit("new "), F.col("text"))
                                ).alias("fp"),
                            ).cast(row_t),
                        ),
                    ),
                    lambda x: x.isNotNull(),
                )
            ).alias("r")
        )
        .select("r.doc_id", "r.source", "r.fp")
    )
    classified = v2.join(v1, "doc_id", "left").select(
        "source",
        F.when(F.col("__old_fp").isNull(), F.lit("insert"))
        .when(F.col("__old_fp") != F.col("fp"), F.lit("update"))
        .otherwise(F.lit("unchanged"))
        .alias("change_type"),
    )
    agg = classified.groupBy("source", "change_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    name = "streaming_corpus_diff_sink"
    try:
        with stream_conf(spark):
            q = (
                agg.writeStream.format("memory")
                .queryName(name)
                .outputMode("complete")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
    finally:
        v1.unpersist()
    return spark.table(name)


_STREAMING_CORPUS_DIFF_SQL = rf"""
WITH v1 AS (
  SELECT doc_id,
         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS old_fp
  FROM documents
),
v2 AS (
  SELECT doc_id, source,
         md5(regexp_replace(lower(trim(
           CASE WHEN doc_id % 13 = 0 THEN text || ' rev2' ELSE text END
         )), '\s+', ' ', 'g')) AS fp
  FROM documents
  UNION ALL
  SELECT doc_id + {_DUP_OFFSET}, source,
         md5(regexp_replace(lower(trim('new ' || text)), '\s+', ' ', 'g'))
  FROM documents WHERE doc_id % 29 = 0
)
SELECT n.source,
       CASE WHEN o.doc_id IS NULL THEN 'insert'
            WHEN o.old_fp <> n.fp THEN 'update'
            ELSE 'unchanged' END AS change_type,
       CAST(count(*) AS BIGINT) AS n
FROM v2 n LEFT JOIN v1 o ON o.doc_id = n.doc_id
GROUP BY 1, 2
"""


def salted_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The diagnostic→remedy bridge end-to-end: a join key where ~90% of
    events collapse onto one value (user_id % 10 < 9 → key 0, the rest
    keep user_id % 100) is joined to its dim table through
    ``auto_salted_join`` — skew_report flags key 0, ONLY that key is
    salted across 8 buckets, the dim replicates just its hot row. The
    oracle is the PLAIN join aggregated per tag, so any row the salting
    duplicated or dropped hash-mismatches. Per-row cent rounding before
    the sum keeps the double aggregate order-independent."""
    from arcane_framework_spark.operators.scale import auto_salted_join

    t = load_tables(spark, sf_dir, "events")
    ev = t["events"].select(
        F.when(F.col("user_id") % 10 < 9, F.lit(0))
        .otherwise(F.col("user_id") % 100)
        .cast("long")
        .alias("k"),
        "value",
    )
    dim = ev.select("k").distinct().select(
        "k", (F.col("k") * 7 + 3).cast("long").alias("tag")
    )
    joined = auto_salted_join(ev, dim, on="k", num_salts=8)
    return joined.groupBy("tag").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)))
        .cast("long")
        .alias("value_cents"),
    )


_SALTED_JOIN_SQL = """
WITH ev AS (
  SELECT CASE WHEN user_id % 10 < 9 THEN 0 ELSE user_id % 100 END AS k,
         value
  FROM events
),
dim AS (
  SELECT DISTINCT k, k * 7 + 3 AS tag FROM ev
)
SELECT d.tag,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(floor(e.value * 100 + 0.5)) AS BIGINT) AS value_cents
FROM ev e JOIN dim d USING (k)
GROUP BY d.tag
"""


_SKEW_REPORT_SQL = f"""
WITH counts AS (
  SELECT user_id AS key, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY user_id
),
totals AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows,
         CAST(count(*) AS BIGINT) AS n_keys
  FROM counts
),
ranked AS (
  SELECT key, cnt,
         row_number() OVER (ORDER BY cnt DESC, key) AS rk
  FROM counts
)
SELECT r.key AS user_id, r.cnt,
       floor(r.cnt::DOUBLE / t.n_rows * 10000 + 0.5) / 10000 AS share,
       floor(r.cnt::DOUBLE * t.n_keys / t.n_rows * 10000 + 0.5) / 10000
         AS skew
FROM ranked r CROSS JOIN totals t
WHERE r.rk <= {SKEW_TOP_K}
"""


def top_fraction_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality gate: the longest 25% of every source's docs
    (n_chars standing in for any fixed-point quality score), via the
    two-level de-skewed per-group rank (operators/sampling.py
    top_fraction_per_group). Returns (doc_id, source, n_chars)."""
    from arcane_framework_spark.operators.sampling import (
        top_fraction_per_group,
    )

    t = load_tables(spark, sf_dir, "documents")
    docs = t["documents"].select("doc_id", "source", "n_chars")
    return top_fraction_per_group(
        docs, group_col="source", score_col="n_chars",
        fraction=TOP_FRACTION, num_groups=TOP_FRACTION_GROUPS,
    ).select("doc_id", "source", "n_chars")


_TOP_FRACTION_SQL = f"""
WITH base AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (
           PARTITION BY source
           ORDER BY n_chars DESC, doc_id % {TOP_FRACTION_GROUPS}, doc_id
         ) AS rk,
         count(*) OVER (PARTITION BY source) AS tot
  FROM documents
)
SELECT doc_id, source, n_chars FROM base
WHERE rk <= floor(tot * {TOP_FRACTION})
"""


INC_CC_GROUP = 5
INC_CC_BRIDGE_EVERY = 35
INC_CC_NEWNODE_EVERY = 50
INC_CC_NEW_OFFSET = 200_000


def incremental_clusters_documents(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Incremental cluster maintenance: a prior (node, component)
    assignment — groups of 5 consecutive doc ids, component = group min —
    absorbs a batch of new edges (bridges merging adjacent groups, plus
    brand-new docs attaching to existing ones) via
    operators/graph.py incremental_components. Only touched components
    are recomputed; the oracle replays a FULL recursive-CTE closure over
    (star edges ∪ new edges), so the hash match proves the incremental
    path equals a from-scratch recompute."""
    from arcane_framework_spark.operators.graph import incremental_components

    t = load_tables(spark, sf_dir, "documents")
    ids = t["documents"].select("doc_id")
    assignment = ids.select(
        F.col("doc_id").alias("node"),
        (F.col("doc_id") - F.col("doc_id") % INC_CC_GROUP).alias("component"),
    )
    bridges = ids.filter(F.col("doc_id") % INC_CC_BRIDGE_EVERY == 0).select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + INC_CC_GROUP).alias("id_b"),
    )
    attaches = ids.filter(F.col("doc_id") % INC_CC_NEWNODE_EVERY == 0).select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + INC_CC_NEW_OFFSET).alias("id_b"),
    )
    return incremental_components(
        assignment, bridges.unionByName(attaches)
    )


_INC_CC_SQL = f"""
WITH RECURSIVE base AS (SELECT doc_id FROM documents),
edges AS (
  SELECT doc_id AS id_a, doc_id - doc_id % {INC_CC_GROUP} AS id_b FROM base
  UNION ALL
  SELECT doc_id, doc_id + {INC_CC_GROUP} FROM base
  WHERE doc_id % {INC_CC_BRIDGE_EVERY} = 0
  UNION ALL
  SELECT doc_id, doc_id + {INC_CC_NEW_OFFSET} FROM base
  WHERE doc_id % {INC_CC_NEWNODE_EVERY} = 0
),
sym AS (
  SELECT id_a AS node, id_b AS nbr FROM edges
  UNION
  SELECT id_b AS node, id_a AS nbr FROM edges
),
reach(node, r) AS (
  SELECT node, nbr FROM sym
  UNION
  SELECT reach.node, sym.nbr FROM reach JOIN sym ON reach.r = sym.node
),
comp AS (
  SELECT node, least(node, min(r)) AS component FROM reach GROUP BY node
)
SELECT node, component FROM comp
"""


NGRAM_HH_N = 3
NGRAM_HH_TOP_K = 10
NGRAM_HH_MIN_COUNT = 2


def frequent_ngrams_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter boilerplate detector: top-10 most frequent word
    trigrams per language across the corpus (operators/text.py
    frequent_ngrams)."""
    from arcane_framework_spark.operators.text import frequent_ngrams

    t = load_tables(spark, sf_dir, "documents")
    return frequent_ngrams(
        t["documents"].select("lang", "text"),
        n=NGRAM_HH_N,
        top_k=NGRAM_HH_TOP_K,
        min_count=NGRAM_HH_MIN_COUNT,
    )


_FREQUENT_NGRAMS_SQL = rf"""
WITH toks AS (
  SELECT lang, string_split_regex(lower(trim(text)), '\s+') AS t
  FROM documents
),
grams AS (
  SELECT lang, array_to_string(t[i:i + {NGRAM_HH_N - 1}], ' ') AS ngram
  FROM (SELECT lang, t,
               unnest(generate_series(1, len(t) - {NGRAM_HH_N - 1})) AS i
        FROM toks)
),
counts AS (
  SELECT lang, ngram, CAST(count(*) AS BIGINT) AS cnt
  FROM grams GROUP BY lang, ngram
  HAVING count(*) >= {NGRAM_HH_MIN_COUNT}
),
ranked AS (
  SELECT lang, ngram, cnt,
         row_number() OVER (PARTITION BY lang
                            ORDER BY cnt DESC, ngram) AS rank
  FROM counts
)
SELECT lang, ngram, cnt, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {NGRAM_HH_TOP_K}
"""


COMPACT_TARGET = 1024
COMPACT_THRESHOLD = 512
COMPACT_GROUPS = 32


def compaction_plan_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction plan over synthetic file metadata: each doc
    stands in for a sink-written file (partition=source, size=byte
    length); files >= 512 B are already 'compact', the rest are grouped
    into ~1 KiB rewrite tasks per partition. Exercises the maintenance
    planner end-to-end (operators/maintenance.py)."""
    from arcane_framework_spark.operators.maintenance import plan_compaction

    t = load_tables(spark, sf_dir, "documents")
    files = t["documents"].select(
        "source", "doc_id", F.length("text").alias("size")
    )
    return plan_compaction(
        files,
        target_bytes=COMPACT_TARGET,
        partition_col="source",
        id_col="doc_id",
        size_col="size",
        small_file_threshold=COMPACT_THRESHOLD,
        num_groups=COMPACT_GROUPS,
    )


_COMPACTION_SQL = f"""
WITH base AS (
  SELECT source, doc_id, CAST(length(text) AS BIGINT) AS size,
         doc_id % {COMPACT_GROUPS} AS grp
  FROM documents WHERE length(text) < {COMPACT_THRESHOLD}
),
local AS (
  SELECT *, COALESCE(SUM(size) OVER (
      PARTITION BY source, grp ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS local_before
  FROM base
),
offsets AS (
  SELECT source, grp, COALESCE(SUM(grp_total) OVER (
      PARTITION BY source ORDER BY grp
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM (SELECT source, grp, SUM(size) AS grp_total
        FROM base GROUP BY source, grp)
),
assigned AS (
  SELECT l.source, l.doc_id, l.size,
         CAST(floor((l.local_before + o.off) / {COMPACT_TARGET}.0) AS BIGINT)
           AS compaction_group
  FROM local l JOIN offsets o ON l.source = o.source AND l.grp = o.grp
),
groups AS (
  SELECT source, compaction_group,
         CAST(count(*) AS BIGINT) AS group_files,
         CAST(SUM(size) AS BIGINT) AS group_bytes
  FROM assigned GROUP BY source, compaction_group
)
SELECT a.source, a.doc_id, a.size, a.compaction_group,
       g.group_files, g.group_bytes
FROM assigned a JOIN groups g USING (source, compaction_group)
WHERE g.group_files > 1
"""


SEMDEDUP_CELL = 64
SEMDEDUP_ITERS = 2
SEMDEDUP_TAU = 0.8


def semantic_dedup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embedding corpus with planted near-duplicates:
    deterministic k-means cells bound the pairwise work, then each vector
    is pruned when a same-cell mate with cosine >= 0.8 sits closer to the
    cell centroid. Returns the full per-vector decision table
    (vec_id, cid, cent_cos, pruned) so the oracle checks every individual
    keep/prune call, not just aggregates.

    Scale governance: k is NOT fixed — ``target_cell_size=SEMDEDUP_CELL``
    derives the centroid count in-plan from the corpus count, so at 100×
    the data the cell count grows 100× and per-cell pairwise work stays
    constant (the lsh_recall broadcast-scalar pattern applied to SemDeDup).

    Session prep shares ONE trained centroid table across the SemDeDup
    twins (the pq_codebooks pattern); without prep (the gate) the entry
    trains its own — identical table, the fit is deterministic."""
    from arcane_framework_spark.operators.similarity import semantic_dedup
    from arcane_framework_spark.prep import get_prepped

    return semantic_dedup(
        _neardup_corpus(spark, sf_dir),
        k=None,
        threshold=SEMDEDUP_TAU,
        iterations=SEMDEDUP_ITERS,
        target_cell_size=SEMDEDUP_CELL,
        centroids=get_prepped(("semdedup_cent_exact", sf_dir), spark),
    )


def _semantic_dedup_sql(cell: int = SEMDEDUP_CELL,
                        iters: int = SEMDEDUP_ITERS,
                        tau: float = SEMDEDUP_TAU,
                        dim: int = EMBEDDING_DIM) -> str:
    """Oracle: same planted corpus, same unrolled Lloyd iterations
    (shared ``_kmeans_ctes`` builder, corpus-derived centroid count),
    then the same dominance rule — cent_cos rounded to 5 decimals before
    comparison in both engines so the prune decision is bit-stable across
    summation order."""
    src = f"""SELECT vec_id, v FROM (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    UNION ALL
    SELECT vec_id + {_DUP_OFFSET},
           list_concat([v2[1] + {NEARDUP_DELTA}], v2[2:]) FROM (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v2 FROM embeddings
      WHERE vec_id % {NEARDUP_EVERY} = 0))"""
    ctes, prev, cos = _kmeans_ctes(src, None, iters, dim,
                                   target_cell_size=cell)
    joined = ",\n".join(ctes)
    pair_cos = (
        "round(list_dot_product(x.v, y.v) / "
        "(sqrt(list_dot_product(x.v, x.v)) * "
        "sqrt(list_dot_product(y.v, y.v))), 6)"
    )
    return f"""
WITH {joined},
scored AS (
  SELECT e.vec_id, e.v, c.cid, round({cos}, 5) AS cent_cos,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY {cos} DESC, c.cid) AS rn
  FROM e CROSS JOIN {prev} c
),
cc AS (SELECT vec_id, v, cid, cent_cos FROM scored WHERE rn = 1),
pruned AS (
  SELECT DISTINCT x.vec_id FROM cc x JOIN cc y
    ON x.cid = y.cid AND x.vec_id <> y.vec_id
   AND (y.cent_cos > x.cent_cos
        OR (y.cent_cos = x.cent_cos AND y.vec_id < x.vec_id))
   AND {pair_cos} >= {tau}
)
SELECT cc.vec_id, cc.cid, cc.cent_cos,
       (pruned.vec_id IS NOT NULL) AS pruned
FROM cc LEFT JOIN pruned USING (vec_id)
"""


def semantic_dedup_routed_embeddings(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """SemDeDup with the coarse-ROUTED two-level assignment — the scale
    path for governed centroid counts. Governed mode makes assignment
    O(N²/T) (k ∝ N); routing every Lloyd iteration and the final cell
    assignment through ~sqrt(k) coarse centroids cuts it to ~2·N·sqrt(k):
    measured 902s → 100s at the 100x stress corpus (200k vectors,
    STRESS_100X_r09.json). Assignment is approximate (a boundary vector
    can land in a near-best cell) — and measured at 100x it OVERFILLS
    dense cells (max 1614 vs target 64), so the operator hard-caps:
    cells beyond SEMDEDUP_SPLIT_FACTOR * target split into
    rank-contiguous sub-cells re-keyed by min member id, making the
    quadratic-probe bound a guarantee (the stress harness asserts
    max_cell <= the cap exactly). The dominance/prune rule inside each
    (sub-)cell is unchanged and exact. Full per-vector decision table
    like the exact twin, and the DuckDB oracle unrolls the SAME routed
    choreography (rank-by-cid coarse pick, fine→coarse routing,
    two-stage argmax, all tie-broken (cos DESC, id ASC)) plus the SAME
    split, so every keep/prune call is hash-checked.
    """
    from arcane_framework_spark.operators.similarity import semantic_dedup
    from arcane_framework_spark.prep import get_prepped

    return semantic_dedup(
        _neardup_corpus(spark, sf_dir),
        k=None,
        threshold=SEMDEDUP_TAU,
        iterations=SEMDEDUP_ITERS,
        target_cell_size=SEMDEDUP_CELL,
        routed=True,
        centroids=get_prepped(("semdedup_cent_routed", sf_dir), spark),
    )


#: Forced-split twin's cap multiplier: cap = 1 x target = 64, BELOW the
#: routed max cell observed at sf0.01 (129), so the rank-split branch —
#: Spark's floor((rn-1)/cap) sub-cell windows AND the oracle's
#: split/cells CTEs — demonstrably executes in every gate run. The
#: production entries keep SEMDEDUP_SPLIT_FACTOR=8 (cap 512), where the
#: split is a stress-scale guard that gate-scale corpora cannot reach.
SEMDEDUP_FORCED_SPLIT_FACTOR = 1


def semantic_dedup_split_embeddings(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """Routed SemDeDup with the hard cell cap FORCED to bind at gate
    scale (split_factor=1 -> cap = target = 64; routed cells at sf0.01
    reach 129). Exists so the cap's cross-engine semantics — row_number
    ties by id, floor-division sub-cell keys, min-member-id re-keying —
    are hash-checked in BOTH engines every round, not just unit-tested
    on the Spark side and stress-asserted at 100x: `//` vs floor() and
    rank-tie divergences would surface here immediately. Same planted
    corpus, same dominance tail; only the cap differs from
    semantic_dedup_routed_embeddings.
    """
    from arcane_framework_spark.operators.similarity import semantic_dedup
    from arcane_framework_spark.prep import get_prepped

    return semantic_dedup(
        _neardup_corpus(spark, sf_dir),
        k=None,
        threshold=SEMDEDUP_TAU,
        iterations=SEMDEDUP_ITERS,
        target_cell_size=SEMDEDUP_CELL,
        routed=True,
        split_factor=SEMDEDUP_FORCED_SPLIT_FACTOR,
        centroids=get_prepped(("semdedup_cent_routed", sf_dir), spark),
    )


def _routed_assign_ctes(e: str, prev: str, tag: str,
                        out_name: str) -> tuple[list[str], str]:
    """CTEs for ONE coarse-routed assignment of `e` rows against the
    centroid CTE `prev` (mirrors operators/similarity.ivf_assign_routed):
    coarse = every g-th centroid by cid rank (g = floor(sqrt(k))), route
    fines and vectors to max-cosine coarse, then argmax among the coarse
    cell's fines. Returns (ctes, name) where `name` selects
    (vec_id, cid)."""

    def cos(a_vec: str, b_vec: str) -> str:
        return (
            f"list_dot_product({a_vec}, {b_vec}) / "
            f"(sqrt(list_dot_product({a_vec}, {a_vec})) * "
            f"sqrt(list_dot_product({b_vec}, {b_vec})))"
        )

    co, f2c, vc = f"{tag}co", f"{tag}f2c", f"{tag}vc"
    ctes = [
        f"""{co} AS (
  SELECT cid AS ccid, cvec AS ccvec FROM (
    SELECT cid, cvec, row_number() OVER (ORDER BY cid) AS rk FROM {prev})
  CROSS JOIN (SELECT greatest(1, CAST(floor(sqrt(count(*))) AS BIGINT))
              AS g FROM {prev}) p
  WHERE (rk - 1) % p.g = 0
)""",
        f"""{f2c} AS (
  SELECT cid, cvec, ccid FROM (
    SELECT f.cid, f.cvec, c.ccid,
           row_number() OVER (PARTITION BY f.cid
                              ORDER BY (CASE WHEN f.cid = c.ccid THEN 2.0
                                        ELSE {cos('f.cvec', 'c.ccvec')}
                                        END) DESC,
                                       c.ccid) AS rn
    FROM {prev} f CROSS JOIN {co} c) WHERE rn = 1
)""",
        f"""{vc} AS (
  SELECT vec_id, ccid FROM (
    SELECT {e}.vec_id, c.ccid,
           row_number() OVER (PARTITION BY {e}.vec_id
                              ORDER BY {cos(f'{e}.v', 'c.ccvec')} DESC,
                                       c.ccid) AS rn
    FROM {e} CROSS JOIN {co} c) WHERE rn = 1
)""",
        f"""{out_name} AS (
  SELECT vec_id, cid FROM (
    SELECT {e}.vec_id, f.cid,
           row_number() OVER (PARTITION BY {e}.vec_id
                              ORDER BY {cos(f'{e}.v', 'f.cvec')} DESC,
                                       f.cid) AS rn
    FROM {e} JOIN {vc} USING (vec_id) JOIN {f2c} f ON f.ccid = {vc}.ccid)
  WHERE rn = 1
)""",
    ]
    return ctes, out_name


def _semantic_dedup_routed_sql(cell: int = SEMDEDUP_CELL,
                               iters: int = SEMDEDUP_ITERS,
                               tau: float = SEMDEDUP_TAU,
                               dim: int = EMBEDDING_DIM,
                               split_factor: int | None = None) -> str:
    """Oracle for the routed twin: same planted corpus and seeds, Lloyd
    iterations and the final assignment each unrolled through the routed
    choreography, then the identical dominance tail."""
    src = f"""SELECT vec_id, v FROM (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    UNION ALL
    SELECT vec_id + {_DUP_OFFSET},
           list_concat([v2[1] + {NEARDUP_DELTA}], v2[2:]) FROM (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v2 FROM embeddings
      WHERE vec_id % {NEARDUP_EVERY} = 0))"""
    ctes = [f"e AS ({src})"]
    ctes.append(f"""c0 AS (
  SELECT vec_id AS cid, v AS cvec FROM e,
       (SELECT greatest(1, CAST(floor(count(*) /
          ceil(count(*)::DOUBLE / {cell})) AS BIGINT))
          AS stride FROM e) p
  WHERE vec_id % p.stride = 0
)""")
    prev = "c0"
    for i in range(1, iters + 1):
        assign_ctes, s_name = _routed_assign_ctes(
            "e", prev, f"i{i}", f"s{i}"
        )
        ctes.extend(assign_ctes)
        ctes.append(f"""c{i} AS (
  SELECT cid, list(m ORDER BY pos) AS cvec FROM (
    SELECT a.cid, g.i AS pos, avg(e.v[g.i]) AS m
    FROM {s_name} a JOIN e USING (vec_id)
    CROSS JOIN generate_series(1, {dim}) AS g(i)
    GROUP BY a.cid, g.i
  ) GROUP BY cid
)""")
        prev = f"c{i}"
    final_ctes, fin = _routed_assign_ctes("e", prev, "fin", "sf")
    ctes.extend(final_ctes)
    from arcane_framework_spark.operators.similarity import (
        SEMDEDUP_SPLIT_FACTOR,
    )

    cap = (split_factor if split_factor is not None
           else SEMDEDUP_SPLIT_FACTOR) * cell
    # Hard cell cap, mirroring semantic_dedup's routed split: members
    # ranked by vec_id within their routed cell, grouped `cap` at a
    # time, each sub-cell re-keyed by its min member id. Integer //
    # matches Spark floor((rn-1)/cap) exactly (both floor division on
    # exact small ints).
    ctes.append(f"""split AS (
  SELECT vec_id, cid,
         (row_number() OVER (PARTITION BY cid ORDER BY vec_id) - 1)
           // {cap} AS sub
  FROM {fin}
)""")
    ctes.append("""cells AS (
  SELECT vec_id, cid,
         min(vec_id) OVER (PARTITION BY cid, sub) AS cell
  FROM split
)""")
    pair_cos = (
        "round(list_dot_product(x.v, y.v) / "
        "(sqrt(list_dot_product(x.v, x.v)) * "
        "sqrt(list_dot_product(y.v, y.v))), 6)"
    )
    joined = ",\n".join(ctes)
    return f"""
WITH {joined},
cc AS (
  SELECT e.vec_id, e.v, a.cell AS cid,
         round(list_dot_product(e.v, c.cvec) /
               (sqrt(list_dot_product(e.v, e.v)) *
                sqrt(list_dot_product(c.cvec, c.cvec))), 5) AS cent_cos
  FROM e JOIN cells a USING (vec_id) JOIN {prev} c ON c.cid = a.cid
),
pruned AS (
  SELECT DISTINCT x.vec_id FROM cc x JOIN cc y
    ON x.cid = y.cid AND x.vec_id <> y.vec_id
   AND (y.cent_cos > x.cent_cos
        OR (y.cent_cos = x.cent_cos AND y.vec_id < x.vec_id))
   AND {pair_cos} >= {tau}
)
SELECT cc.vec_id, cc.cid, cc.cent_cos,
       (pruned.vec_id IS NOT NULL) AS pruned
FROM cc LEFT JOIN pruned USING (vec_id)
"""


def semantic_dedup_agreement_embeddings(spark: SparkSession,
                                        sf_dir: str) -> DataFrame:
    """What the routed approximation costs in DECISIONS: exact vs routed
    SemDeDup prune flags compared per vector, aggregated to the decision
    confusion (prune_both / prune_exact_only / prune_routed_only) and an
    integer agreement rate — the same quantified-trade treatment
    ngram_cap_recall_documents gives the block cap (X157). The routed
    path buys ~10x assignment speed at 100x stress (870s → 88s) with
    approximate cell membership plus the hard cell cap; this entry is
    the standing measurement that the keep/prune decisions stay
    near-identical on the planted corpus, and the drift alarm if a
    future routing change quietly degrades them.

    All five outputs are exact longs (counts and a floor-divided ppm),
    so the cross-engine hash is bit-stable. Cost note: builds BOTH
    twins (two governed k-means runs); the corpus subtree is shared via
    scoped_persist, and this is by design the catalog's only
    double-pipeline entry.
    """
    from arcane_framework_spark.operators.similarity import semantic_dedup
    from arcane_framework_spark.prep import get_prepped

    corpus = _neardup_corpus(spark, sf_dir)
    ex = semantic_dedup(
        corpus, k=None, threshold=SEMDEDUP_TAU,
        iterations=SEMDEDUP_ITERS, target_cell_size=SEMDEDUP_CELL,
        centroids=get_prepped(("semdedup_cent_exact", sf_dir), spark),
    ).select("vec_id", F.col("pruned").alias("pe"))
    ro = semantic_dedup(
        corpus, k=None, threshold=SEMDEDUP_TAU,
        iterations=SEMDEDUP_ITERS, target_cell_size=SEMDEDUP_CELL,
        routed=True,
        centroids=get_prepped(("semdedup_cent_routed", sf_dir), spark),
    ).select("vec_id", F.col("pruned").alias("pr"))
    j = ex.join(ro, "vec_id")
    agg = j.agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.sum(F.when(F.col("pe") & F.col("pr"), 1).otherwise(0))
        .cast("long").alias("prune_both"),
        F.sum(F.when(F.col("pe") & ~F.col("pr"), 1).otherwise(0))
        .cast("long").alias("prune_exact_only"),
        F.sum(F.when(~F.col("pe") & F.col("pr"), 1).otherwise(0))
        .cast("long").alias("prune_routed_only"),
        F.sum(F.when(F.col("pe") == F.col("pr"), 1).otherwise(0))
        .cast("long").alias("__agree"),
    )
    return agg.select(
        "n_vectors",
        "prune_both",
        "prune_exact_only",
        "prune_routed_only",
        F.expr("CAST(__agree * 1000000 DIV n_vectors AS BIGINT)").alias(
            "agreement_ppm"
        ),
    )


def _semantic_dedup_agreement_sql() -> str:
    """Oracle: both full pipelines as nested-WITH CTEs (DuckDB supports a
    WITH query as a CTE body), joined on vec_id, same integer outputs —
    `//` matches Spark `DIV` (floor division on non-negative longs)."""
    return f"""
WITH ex AS ({_semantic_dedup_sql()}),
ro AS ({_semantic_dedup_routed_sql()}),
j AS (
  SELECT ex.vec_id, ex.pruned AS pe, ro.pruned AS pr
  FROM ex JOIN ro USING (vec_id)
)
SELECT count(*)::BIGINT AS n_vectors,
       sum(CASE WHEN pe AND pr THEN 1 ELSE 0 END)::BIGINT AS prune_both,
       sum(CASE WHEN pe AND NOT pr THEN 1 ELSE 0 END)::BIGINT
         AS prune_exact_only,
       sum(CASE WHEN NOT pe AND pr THEN 1 ELSE 0 END)::BIGINT
         AS prune_routed_only,
       (sum(CASE WHEN pe = pr THEN 1 ELSE 0 END)::BIGINT * 1000000)
         // count(*)::BIGINT AS agreement_ppm
FROM j
"""


# ---------------------------------------------------------------------------
# Mergeable sketches with engine-reproducible register tables (X90/X91)
# ---------------------------------------------------------------------------


def hll_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable HyperLogLog distinct-users-per-event-type, register-exact.

    approx_user_counts (X44) uses Spark's built-in HLL++ whose register
    layout is engine-internal — only its accuracy CONTRACT is checkable.
    This twin uses operators/sketches.py: md5-hashed, integer-register
    HLL whose full register table the DuckDB oracle reproduces
    BIT-FOR-BIT — ``register_checksum`` pins the (bucket, rank)
    assignment, ``hll_estimate`` the FFGM07 raw estimate (one double
    division over exact dyadic-integer sums), ``n_zero_registers`` the
    linear-counting input. That portability is the point: the register
    table can be persisted as an incremental side table, merged across
    batches (union + max), or handed to another engine. ``exact_users``
    is the interpretability column (at sf-scale cardinalities, n << m,
    the raw estimate is expected to sit near alpha*m — callers apply
    linear counting from n_zero_registers; see module docstring).
    """
    from arcane_framework_spark.operators.sketches import hll_distinct

    t = load_tables(spark, sf_dir, "events")
    items = t["events"].select(
        "event_type", F.col("user_id").cast("string").alias("uid")
    )
    est = hll_distinct(items, "uid", ["event_type"])
    exact = t["events"].groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    return est.join(F.broadcast(exact), "event_type").select(
        "event_type", "hll_estimate", "n_zero_registers",
        "register_checksum", "exact_users",
    )


def _hll_sql() -> str:
    from arcane_framework_spark.operators.sketches import (
        HLL_ALPHA, HLL_B, HLL_M, HLL_RANK_BITS,
    )

    unit = 1 << (HLL_RANK_BITS + 1)  # 2^51
    rank_max = HLL_RANK_BITS + 1
    return f"""
WITH hashed AS (
  SELECT event_type,
         CAST(concat('0x', substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
  FROM events
),
regs AS (
  SELECT event_type, h % {HLL_M} AS bucket,
         max(CASE WHEN (h >> {HLL_B}) = 0 THEN {rank_max}
                  ELSE {rank_max} - length(bin(h >> {HLL_B})) END) AS rank
  FROM hashed GROUP BY event_type, h % {HLL_M}
),
agg AS (
  SELECT event_type,
         sum(1::BIGINT << ({rank_max} - rank)) AS present_num,
         count(*) AS n_present,
         CAST(sum((bucket + 1) * rank) AS BIGINT) AS register_checksum
  FROM regs GROUP BY event_type
),
exact AS (
  SELECT event_type, count(DISTINCT user_id) AS exact_users
  FROM events GROUP BY event_type
)
SELECT agg.event_type,
       floor(({HLL_M}.0 * {HLL_M}.0 * CAST({HLL_ALPHA!r} AS DOUBLE)
              * {float(unit)!r}
              / CAST(present_num + ({HLL_M} - n_present) * {unit}::BIGINT
                     AS DOUBLE)) * 100 + 0.5) / 100 AS hll_estimate,
       CAST({HLL_M} - n_present AS BIGINT) AS n_zero_registers,
       register_checksum,
       exact_users
FROM agg JOIN exact USING (event_type)
"""


def incremental_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HLL register table used AS an incremental side table: the
    'corpus' sketch (events with ``event_id % 5 != 0``, standing in for
    persisted state) is FOLDED with the arriving batch's sketch
    (``event_id % 5 == 0``) by union + max(rank) — never rescanning the
    corpus values — and the merged registers are collapsed to estimates.

    The oracle deliberately recomputes the ONE-SHOT sketch over the
    whole table: merge-associativity (fold == one-shot) is exactly what
    the hash match proves, register-bit-for-register-bit. This is the
    100 TB cardinality story end-to-end — per-batch state updates touch
    only ``groups x m`` rows, and the estimate is always current."""
    from arcane_framework_spark.operators.sketches import (
        hll_estimate, hll_registers,
    )

    t = load_tables(spark, sf_dir, "events")
    items = t["events"].select(
        "event_id", "event_type",
        F.col("user_id").cast("string").alias("uid"),
    )
    corpus = items.filter(F.col("event_id") % 5 != 0)
    batch = items.filter(F.col("event_id") % 5 == 0)
    merged = (
        hll_registers(corpus, "uid", ["event_type"])
        .union(hll_registers(batch, "uid", ["event_type"]))
        .groupBy("event_type", "bucket")
        .agg(F.max("rank").alias("rank"))
    )
    return hll_estimate(merged, ["event_type"])


def _incremental_hll_sql() -> str:
    from arcane_framework_spark.operators.sketches import (
        HLL_ALPHA, HLL_B, HLL_M, HLL_RANK_BITS,
    )

    unit = 1 << (HLL_RANK_BITS + 1)
    rank_max = HLL_RANK_BITS + 1
    return f"""
WITH hashed AS (
  SELECT event_type,
         CAST(concat('0x', substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
  FROM events
),
regs AS (
  SELECT event_type, h % {HLL_M} AS bucket,
         max(CASE WHEN (h >> {HLL_B}) = 0 THEN {rank_max}
                  ELSE {rank_max} - length(bin(h >> {HLL_B})) END) AS rank
  FROM hashed GROUP BY event_type, h % {HLL_M}
),
agg AS (
  SELECT event_type,
         sum(1::BIGINT << ({rank_max} - rank)) AS present_num,
         count(*) AS n_present,
         CAST(sum((bucket + 1) * rank) AS BIGINT) AS register_checksum
  FROM regs GROUP BY event_type
)
SELECT event_type,
       floor(({HLL_M}.0 * {HLL_M}.0 * CAST({HLL_ALPHA!r} AS DOUBLE)
              * {float(unit)!r}
              / CAST(present_num + ({HLL_M} - n_present) * {unit}::BIGINT
                     AS DOUBLE)) * 100 + 0.5) / 100 AS hll_estimate,
       CAST({HLL_M} - n_present AS BIGINT) AS n_zero_registers,
       register_checksum
FROM agg
"""


def streaming_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HLL register table maintained BY Structured Streaming: events
    replayed through ``readStream`` → the register aggregation
    (groupBy(event_type, bucket).max(rank)) runs as the streaming
    STATEFUL operator — the stream's state store literally IS the
    sketch — drained with availableNow into a complete-mode memory
    sink, then collapsed to estimates batch-side.

    Shares ``incremental_hll_users``' oracle VERBATIM: streaming
    register maintenance ≡ batch fold ≡ DuckDB one-shot, a three-way
    register-exact equivalence. This is the production shape for
    always-current cardinality over an unbounded stream: per-batch
    state updates touch only ``groups x m`` rows and never replay
    history."""
    from arcane_framework_spark.operators.sketches import (
        hll_estimate, hll_registers,
    )

    t = load_tables(spark, sf_dir, "events")
    schema = t["events"].schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ev = stream.select(
        "event_type", F.col("user_id").cast("string").alias("uid")
    )
    regs = hll_registers(ev, "uid", ["event_type"])
    name = "streaming_hll_users_sink"
    with stream_conf(spark):
        q = (
            regs.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return hll_estimate(spark.table(name), ["event_type"])


def sketch_quantiles_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch: per event_type, p50/p90/p99 of
    ``value`` estimated from a deterministic bottom-k (KMV-style) hash
    sample of 64 events — alongside the EXACT quantiles for the
    accuracy exhibit.

    At 100 TB exact quantiles shuffle every row; the bottom-k state is
    64 rows per group, mergeable by union + re-bottom-k, incrementally
    maintainable, and broadcastable. The md5(event_id) rank makes the
    SAMPLE ITSELF engine-exact, and the estimates are pure index reads
    of untouched input doubles — the DuckDB oracle reproduces every
    emitted value bit-for-bit."""
    from arcane_framework_spark.operators.sketches import (
        bottomk_quantiles, bottomk_sample,
    )

    t = load_tables(spark, sf_dir, "events")
    ev = t["events"].select("event_type", "event_id", "value")
    est = bottomk_quantiles(
        bottomk_sample(ev, "value", "event_id", ["event_type"]),
        qs=[0.5, 0.9, 0.99],
        group_cols=["event_type"],
    )
    exact = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("__e50"),
        F.expr("percentile(value, 0.9)").alias("__e90"),
    )
    return est.join(F.broadcast(exact), "event_type").select(
        "event_type", "sample_n", "q50", "q90", "q99",
        (F.floor(F.col("__e50") * 100 + F.lit(0.5)) / 100).alias(
            "exact_p50_cents"
        ),
        (F.floor(F.col("__e90") * 100 + F.lit(0.5)) / 100).alias(
            "exact_p90_cents"
        ),
    )


def _sketch_quantiles_sql() -> str:
    from arcane_framework_spark.operators.sketches import BOTTOMK_K

    def q(frac: str) -> str:
        return (
            f"vals[CAST(floor({frac} * (sample_n - 1)) AS INT) + 1]"
        )

    return f"""
WITH ranked AS (
  SELECT event_type, value, md5(CAST(event_id AS VARCHAR)) AS rk,
         row_number() OVER (PARTITION BY event_type ORDER BY
                            md5(CAST(event_id AS VARCHAR))) AS rn
  FROM events
),
sample AS (SELECT event_type, value FROM ranked WHERE rn <= {BOTTOMK_K}),
agg AS (
  SELECT event_type, list_sort(list(value)) AS vals,
         count(*) AS sample_n
  FROM sample GROUP BY event_type
),
exact AS (
  SELECT event_type,
         quantile_cont(value, 0.5) AS e50,
         quantile_cont(value, 0.9) AS e90
  FROM events GROUP BY event_type
)
SELECT agg.event_type,
       CAST(sample_n AS BIGINT) AS sample_n,
       {q("0.5")} AS q50,
       {q("0.9")} AS q90,
       {q("0.99")} AS q99,
       floor(e50 * 100 + 0.5) / 100 AS exact_p50_cents,
       floor(e90 * 100 + 0.5) / 100 AS exact_p90_cents
FROM agg JOIN exact USING (event_type)
"""


def kmv_intersections_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/KMV set algebra: for every pair of event types, the
    estimated DISTINCT-USER intersection from two 64-hash sketches,
    next to the exact intersection — audience-overlap analysis whose
    state is 64 hashes per set regardless of corpus size.

    The one sketch family that answers cross-SET questions (|A∩B|)
    without co-shuffling the sets: sketches are built independently
    (mergeable, incremental), and the pairwise estimate touches only
    sketch rows. Hashes, thetas, sample counts, and the single-division
    estimate are all engine-exact — the DuckDB oracle rebuilds every
    sketch and replays the algebra bit-for-bit."""
    from arcane_framework_spark.operators.sketches import (
        kmv_intersection, kmv_sketch,
    )

    t = load_tables(spark, sf_dir, "events")
    ev = t["events"].select(
        "event_type", F.col("user_id").cast("string").alias("uid")
    )
    est = kmv_intersection(
        kmv_sketch(ev, "uid", ["event_type"]), "event_type"
    )
    users = ev.distinct()
    exact = (
        users.select(F.col("event_type").alias("group_a"),
                     F.col("uid").alias("u"))
        .join(users.select(F.col("event_type").alias("group_b"),
                           F.col("uid").alias("u")), "u")
        .filter(F.col("group_a") < F.col("group_b"))
        .groupBy("group_a", "group_b")
        .agg(F.count(F.lit(1)).alias("exact_intersection"))
    )
    return est.join(F.broadcast(exact), ["group_a", "group_b"], "left").select(
        "group_a", "group_b", "n_common", "theta", "est_intersection",
        F.coalesce("exact_intersection", F.lit(0)).cast("long").alias(
            "exact_intersection"
        ),
    )


def _kmv_sql() -> str:
    from arcane_framework_spark.operators.sketches import KMV_H, KMV_K

    return f"""
WITH hashed AS (
  SELECT DISTINCT event_type,
         CAST(concat('0x', substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
  FROM events
),
sk AS (
  SELECT event_type, h FROM (
    SELECT event_type, h,
           row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
    FROM hashed
  ) WHERE rn <= {KMV_K}
),
pg AS (
  SELECT event_type AS g,
         CASE WHEN count(*) >= {KMV_K} THEN max(h)
              ELSE {KMV_H}::BIGINT END AS theta
  FROM sk GROUP BY event_type
),
grid AS (
  SELECT a.g AS group_a, b.g AS group_b, least(a.theta, b.theta) AS theta
  FROM pg a CROSS JOIN pg b WHERE a.g < b.g
),
common AS (
  SELECT sa.event_type AS group_a, sb.event_type AS group_b,
         count(*) AS n_common
  FROM sk sa
  JOIN sk sb ON sa.h = sb.h AND sa.event_type < sb.event_type
  JOIN grid g ON g.group_a = sa.event_type AND g.group_b = sb.event_type
  WHERE sa.h < g.theta
  GROUP BY 1, 2
),
users AS (
  SELECT DISTINCT event_type, CAST(user_id AS VARCHAR) AS u FROM events
),
exact AS (
  SELECT a.event_type AS group_a, b.event_type AS group_b,
         count(*) AS n
  FROM users a JOIN users b ON a.u = b.u AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT grid.group_a, grid.group_b,
       CAST(coalesce(c.n_common, 0) AS BIGINT) AS n_common,
       CAST(grid.theta AS BIGINT) AS theta,
       floor(CAST(coalesce(c.n_common, 0) AS DOUBLE)
             * {float(KMV_H)!r} / CAST(grid.theta AS DOUBLE)
             * 100 + 0.5) / 100 AS est_intersection,
       CAST(coalesce(e.n, 0) AS BIGINT) AS exact_intersection
FROM grid
LEFT JOIN common c USING (group_a, group_b)
LEFT JOIN exact e USING (group_a, group_b)
"""


def streaming_kmv_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KMV sketch maintained BY a custom stateful streaming
    operator: events replay through ``readStream`` →
    ``applyInPandasWithState`` keeps the bottom-64 distinct user-hash
    set per event type as its state (bounded at 64 longs per key
    forever), emitting the full sketch per micro-batch — the consumer
    keeps each key's final version.

    The oracle recomputes the batch sketch in SQL: stateful-streaming
    state ≡ batch ``kmv_sketch`` ≡ DuckDB bottom-64, hash-for-hash.
    Distinct from ``streaming_hll_users`` (a built-in streaming
    AGGREGATION): this one exercises arbitrary user state in the state
    store — the shape any custom sketch needs once it outgrows SQL
    aggregation semantics."""
    from pyspark.sql import Window

    from arcane_framework_spark.streaming.stateful import kmv_stream

    t = load_tables(spark, sf_dir, "events")
    schema = t["events"].schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ev = stream.select(
        "event_type", F.col("user_id").cast("string").alias("uid")
    )
    sk = kmv_stream(ev)
    name = "streaming_kmv_users_sink"
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
    w = Window.partitionBy("event_type")
    return (
        sink.withColumn("__maxv", F.max("ver").over(w))
        .filter(F.col("ver") == F.col("__maxv"))
        .select("event_type", "h")
    )


def _kmv_sketch_only_sql() -> str:
    from arcane_framework_spark.operators.sketches import KMV_K

    return f"""
WITH hashed AS (
  SELECT DISTINCT event_type,
         CAST(concat('0x', substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
  FROM events
)
SELECT event_type, h FROM (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM hashed
) WHERE rn <= {KMV_K}
"""


CMS_TOP_K = 20


def cms_heavy_hitters_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min heavy hitters: top-20 users by CMS-estimated event count.

    The d x w BIGINT counter table is all-integer (md5 bucket hash, exact
    sums), so the DuckDB oracle reproduces every counter and every
    point-estimate bit-for-bit; ``exact_count`` rides along to exhibit
    the one-sided error (cms_count >= exact always). The counter table
    is mergeable by element-wise add and always broadcastable (d*w rows),
    which is the 100 TB story: frequency state that never grows with the
    data.
    """
    from arcane_framework_spark.operators.sketches import (
        cms_counts, cms_estimate,
    )

    t = load_tables(spark, sf_dir, "events")
    items = t["events"].select(F.col("user_id").cast("string").alias("uid"))
    counts = cms_counts(items, "uid")
    est = cms_estimate(items, counts, "uid")
    exact = items.groupBy(F.col("uid").alias("value")).agg(
        F.count(F.lit(1)).alias("exact_count")
    )
    return (
        est.join(exact, "value")
        .orderBy(F.col("cms_count").desc(), "value")
        .limit(CMS_TOP_K)
        .select("value", "cms_count", "exact_count")
    )


def _cms_sql() -> str:
    from arcane_framework_spark.operators.sketches import CMS_D, CMS_W

    return f"""
WITH items AS (
  SELECT CAST(user_id AS VARCHAR) AS v FROM events
),
exploded AS (
  SELECT v, r.range AS row FROM items CROSS JOIN range({CMS_D}) r
),
counts AS (
  SELECT row,
         CAST(concat('0x', substring(
              md5(concat_ws('|', CAST(row AS VARCHAR), v)), 1, 15))
              AS BIGINT) % {CMS_W} AS bucket,
         CAST(count(*) AS BIGINT) AS cnt
  FROM exploded GROUP BY 1, 2
),
probes AS (
  SELECT DISTINCT v AS value FROM items
),
probe_rows AS (
  SELECT value, r.range AS row,
         CAST(concat('0x', substring(
              md5(concat_ws('|', CAST(r.range AS VARCHAR), value)), 1, 15))
              AS BIGINT) % {CMS_W} AS bucket
  FROM probes CROSS JOIN range({CMS_D}) r
),
est AS (
  SELECT value, min(coalesce(cnt, 0)) AS cms_count
  FROM probe_rows LEFT JOIN counts USING (row, bucket)
  GROUP BY value
),
exact AS (
  SELECT v AS value, CAST(count(*) AS BIGINT) AS exact_count
  FROM items GROUP BY v
)
SELECT value, cms_count, exact_count
FROM est JOIN exact USING (value)
ORDER BY cms_count DESC, value
LIMIT {CMS_TOP_K}
"""


def bloom_prune_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable Bloom-filter join pruning: build the filter over the
    BUILDING-segment customer keys, probe every order, and account for
    the outcome — (n_build_keys, n_probe_rows, n_passed, n_true_members,
    false_positives, bloom_checksum).

    The pruning pattern that matters at 100 TB: the filter is m/8 bytes
    whatever the build size, broadcastable, mergeable by bit_or — the
    probe-side scan drops non-matching rows BEFORE any join shuffle
    moves them. The all-integer md5 bitmap lets the DuckDB oracle
    rebuild the filter and replay every probe BIT-FOR-BIT
    (``bloom_checksum`` pins the word table; ``false_positives`` pins
    the probe outcomes — true members always pass by construction, and
    the exact twin proves it).
    """
    from arcane_framework_spark.operators.sketches import (
        bloom_build, bloom_probe,
    )

    t = load_tables(spark, sf_dir, "customer", "orders")
    build = (
        t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").cast("string").alias("key"))
        .distinct()
    )
    bloom = bloom_build(build, "key")
    probe = t["orders"].select(F.col("o_custkey").cast("string").alias("key"))
    probed = bloom_probe(probe, bloom, "key")
    flagged = probed.join(
        F.broadcast(build.withColumn("__member", F.lit(1))), "key", "left"
    )
    stats = flagged.agg(
        F.count(F.lit(1)).alias("n_probe_rows"),
        F.sum(F.col("bloom_passed").cast("long")).alias("n_passed"),
        F.sum(
            F.coalesce(F.col("__member"), F.lit(0)).cast("long")
        ).alias("n_true_members"),
        F.sum(
            (F.col("bloom_passed") & F.col("__member").isNull())
            .cast("long")
        ).alias("false_positives"),
    )
    checks = bloom.agg(
        F.sum((F.col("word_idx") + 1) * F.col("word")).cast("long").alias(
            "bloom_checksum"
        )
    )
    n_build = build.agg(F.count(F.lit(1)).alias("n_build_keys"))
    return n_build.crossJoin(stats).crossJoin(checks)


def _bloom_sql() -> str:
    from arcane_framework_spark.operators.sketches import BLOOM_K, BLOOM_M

    def bit(j_expr: str, v_expr: str) -> str:
        return (
            f"CAST(concat('0x', substring(md5(concat_ws('|', "
            f"concat('bloom', CAST({j_expr} AS VARCHAR)), {v_expr})), "
            f"1, 15)) AS BIGINT) % {BLOOM_M}"
        )

    probe_joins = "\n".join(
        f"LEFT JOIN bloom b{j} ON (p.bit{j} >> 5) = b{j}.word_idx"
        for j in range(BLOOM_K)
    )
    probe_bits = ",\n         ".join(
        f"{bit(str(j), 'key')} AS bit{j}" for j in range(BLOOM_K)
    )
    passed = " AND ".join(
        f"(coalesce(b{j}.word, 0) & (CAST(1 AS BIGINT) "
        f"<< CAST(p.bit{j} % 32 AS INT))) <> 0"
        for j in range(BLOOM_K)
    )
    return f"""
WITH build AS (
  SELECT DISTINCT CAST(c_custkey AS VARCHAR) AS key
  FROM customer WHERE c_mktsegment = 'BUILDING'
),
bits AS (
  SELECT {bit("j.range", "key")} AS bit
  FROM build CROSS JOIN range({BLOOM_K}) j
),
bloom AS (
  SELECT bit >> 5 AS word_idx,
         bit_or(CAST(1 AS BIGINT) << CAST(bit % 32 AS INT)) AS word
  FROM bits GROUP BY 1
),
probe AS (
  SELECT CAST(o_custkey AS VARCHAR) AS key FROM orders
),
probe_bits AS (
  SELECT key,
         {probe_bits}
  FROM probe
),
outcomes AS (
  SELECT p.key, ({passed}) AS passed
  FROM probe_bits p
{probe_joins}
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM build) AS n_build_keys,
       CAST(count(*) AS BIGINT) AS n_probe_rows,
       CAST(sum(CASE WHEN passed THEN 1 ELSE 0 END) AS BIGINT) AS n_passed,
       CAST(sum(CASE WHEN m.key IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_true_members,
       CAST(sum(CASE WHEN passed AND m.key IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS false_positives,
       (SELECT CAST(sum((word_idx + 1) * word) AS BIGINT) FROM bloom)
         AS bloom_checksum
FROM outcomes o LEFT JOIN build m USING (key)
"""


EXT_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "ngram_jaccard_documents": ngram_jaccard_documents,
    "ngram_cap_recall_documents": ngram_cap_recall_documents,
    "simhash_neardup_documents": simhash_neardup_documents,
    "cosine_neardup_embeddings": cosine_neardup_embeddings,
    "ivf_topk_embeddings": ivf_topk_embeddings,
    "multimodal_features_documents": multimodal_features_documents,
    "image_decode_documents": image_decode_documents,
    "jpeg_decode_documents": jpeg_decode_documents,
    "gif_decode_documents": gif_decode_documents,
    "audio_spectral_documents": audio_spectral_documents,
    "bpe_train_documents": bpe_train_documents,
    "bpe_fertility_by_source": bpe_fertility_by_source,
    "bpe_token_stats_documents": bpe_token_stats_documents,
    "tokenizer_fertility_documents": tokenizer_fertility_documents,
    "streaming_hourly_rollup": streaming_hourly_rollup,
    "events_quantiles": events_quantiles,
    "pivot_events_by_cohort": pivot_events_by_cohort,
    "events_cube_rollup": events_cube_rollup,
    "active_time_events": active_time_events,
    "streaming_session_windows": streaming_session_windows,
    "unpivot_event_metrics": unpivot_event_metrics,
    "fair_topk_documents": fair_topk_documents,
    "tfidf_top_terms": tfidf_top_terms,
    "approx_user_counts": approx_user_counts,
    "hll_user_counts": hll_user_counts,
    "incremental_hll_users": incremental_hll_users,
    "streaming_hll_users": streaming_hll_users,
    "cms_heavy_hitters_events": cms_heavy_hitters_events,
    "sketch_quantiles_events": sketch_quantiles_events,
    "kmv_intersections_events": kmv_intersections_events,
    "streaming_kmv_users": streaming_kmv_users,
    "bloom_prune_orders": bloom_prune_orders,
    "kmeans_embeddings": kmeans_embeddings,
    "dedup_clusters_documents": dedup_clusters_documents,
    "asof_attribution_events": asof_attribution_events,
    "pack_documents_512": pack_documents_query,
    "quantization_recall_embeddings": quantization_recall_embeddings,
    "pq_recall_embeddings": pq_recall_embeddings,
    "ivfpq_recall_embeddings": ivfpq_recall_embeddings,
    "corpus_split_documents": corpus_split_documents,
    "pps_sample_documents": pps_sample_documents,
    "budget_selection_documents": budget_selection_documents,
    "range_join_activation_events": range_join_activation_events,
    "streaming_dedup_users": streaming_dedup_users,
    "source_capped_documents": source_capped_documents,
    "repetition_quality_documents": repetition_quality_documents,
    "redact_pii_documents": redact_pii_documents,
    "frame_sample_documents": frame_sample_documents,
    "quality_filter_documents": quality_filter_documents,
    "bm25_topk_documents": bm25_topk_documents,
    "window_funnel_events": window_funnel_events,
    "retention_cohorts_events": retention_cohorts_events,
    "decontam_overlap_documents": decontam_overlap_documents,
    "chunk_documents_sliding": chunk_documents_sliding,
    "unigram_nll_documents": unigram_nll_documents,
    "mixture_sample_documents": mixture_sample_documents,
    "streaming_attribution_join": streaming_attribution_join,
    "centroid_outliers_embeddings": centroid_outliers_embeddings,
    "snapshot_diff_orders": snapshot_diff_orders,
    "repeated_spans_documents": repeated_spans_documents,
    "stratified_sample_embeddings": stratified_sample_embeddings,
    "dedup_canonical_documents": dedup_canonical_documents,
    "semantic_dedup_embeddings": semantic_dedup_embeddings,
    "semantic_dedup_routed_embeddings": semantic_dedup_routed_embeddings,
    "semantic_dedup_split_embeddings": semantic_dedup_split_embeddings,
    "semantic_dedup_agreement_embeddings": semantic_dedup_agreement_embeddings,
    "compaction_plan_documents": compaction_plan_documents,
    "frequent_ngrams_documents": frequent_ngrams_documents,
    "incremental_clusters_documents": incremental_clusters_documents,
    "skew_report_events": skew_report_events,
    "salted_join_events": salted_join_events,
    "corpus_version_diff_documents": corpus_version_diff_documents,
    "streaming_corpus_diff": streaming_corpus_diff,
    "length_quantiles_documents": length_quantiles_documents,
    "top_fraction_documents": top_fraction_documents,
    "embedding_dispersion_labels": embedding_dispersion_labels,
}

EXT_ORACLE_SQL: dict[str, str] = {
    "ngram_jaccard_documents": _ngram_jaccard_sql(),
    "ngram_cap_recall_documents": _ngram_cap_recall_sql(),
    "simhash_neardup_documents": _simhash_neardup_sql(),
    "cosine_neardup_embeddings": _cosine_neardup_sql(),
    "ivf_topk_embeddings": _IVF_SQL,
    "multimodal_features_documents": _MULTIMODAL_SQL,
    "image_decode_documents": _IMAGE_DECODE_SQL,
    "jpeg_decode_documents": _JPEG_DECODE_SQL,
    "gif_decode_documents": _gif_sql(),
    "audio_spectral_documents": _AUDIO_SPECTRAL_SQL,
    "bpe_train_documents": _bpe_sql(),
    "bpe_fertility_by_source": _bpe_apply_sql(),
    "bpe_token_stats_documents": _BPE_SQL,
    "tokenizer_fertility_documents": _FERTILITY_SQL,
    "streaming_hourly_rollup": _STREAMING_HOURLY_SQL,
    "events_quantiles": _QUANTILES_SQL,
    "pivot_events_by_cohort": _PIVOT_SQL,
    "events_cube_rollup": _CUBE_SQL,
    "active_time_events": _ACTIVE_TIME_SQL,
    "streaming_session_windows": _ACTIVE_TIME_SQL,
    "unpivot_event_metrics": _UNPIVOT_SQL,
    "fair_topk_documents": _fair_topk_sql(),
    "tfidf_top_terms": _tfidf_sql(),
    "approx_user_counts": _APPROX_USERS_SQL,
    "hll_user_counts": _hll_sql(),
    "incremental_hll_users": _incremental_hll_sql(),
    "streaming_hll_users": _incremental_hll_sql(),
    "cms_heavy_hitters_events": _cms_sql(),
    "sketch_quantiles_events": _sketch_quantiles_sql(),
    "kmv_intersections_events": _kmv_sql(),
    "streaming_kmv_users": _kmv_sketch_only_sql(),
    "bloom_prune_orders": _bloom_sql(),
    "kmeans_embeddings": _kmeans_sql(),
    "asof_attribution_events": _ASOF_SQL,
    "pack_documents_512": _PACK_SQL,
    "quantization_recall_embeddings": _quant_recall_sql(),
    "pq_recall_embeddings": _pq_recall_sql(),
    "ivfpq_recall_embeddings": _ivfpq_sql(),
    "corpus_split_documents": _corpus_split_sql(),
    "pps_sample_documents": _pps_sample_sql(),
    "budget_selection_documents": _BUDGET_SELECTION_SQL,
    "range_join_activation_events": _RANGE_JOIN_SQL,
    "streaming_dedup_users": _STREAMING_DEDUP_SQL,
    "source_capped_documents": _SOURCE_CAP_SQL,
    "repetition_quality_documents": _REPETITION_SQL,
    "redact_pii_documents": _redact_sql(),
    "frame_sample_documents": _FRAME_SAMPLE_SQL,
    "quality_filter_documents": _quality_filter_sql(),
    "bm25_topk_documents": _bm25_sql(),
    "window_funnel_events": _WINDOW_FUNNEL_SQL,
    "retention_cohorts_events": _RETENTION_SQL,
    "decontam_overlap_documents": _DECONTAM_SQL,
    "chunk_documents_sliding": _chunk_sliding_sql(),
    "unigram_nll_documents": _UNIGRAM_NLL_SQL,
    "mixture_sample_documents": _mixture_sample_sql(),
    "streaming_attribution_join": _STREAMING_ATTRIBUTION_SQL,
    "centroid_outliers_embeddings": _CENTROID_OUTLIERS_SQL,
    "snapshot_diff_orders": _SNAPSHOT_DIFF_SQL,
    "repeated_spans_documents": _REPEATED_SPANS_SQL,
    "stratified_sample_embeddings": _STRATIFIED_SQL,
    "semantic_dedup_embeddings": _semantic_dedup_sql(),
    "semantic_dedup_routed_embeddings": _semantic_dedup_routed_sql(),
    "semantic_dedup_split_embeddings": _semantic_dedup_routed_sql(
        split_factor=SEMDEDUP_FORCED_SPLIT_FACTOR
    ),
    "semantic_dedup_agreement_embeddings": _semantic_dedup_agreement_sql(),
    "compaction_plan_documents": _COMPACTION_SQL,
    "frequent_ngrams_documents": _FREQUENT_NGRAMS_SQL,
    "incremental_clusters_documents": _INC_CC_SQL,
    "skew_report_events": _SKEW_REPORT_SQL,
    "salted_join_events": _SALTED_JOIN_SQL,
    "corpus_version_diff_documents": _CORPUS_DIFF_SQL,
    "streaming_corpus_diff": _STREAMING_CORPUS_DIFF_SQL,
    "length_quantiles_documents": _LENGTH_QUANTILES_SQL,
    "top_fraction_documents": _TOP_FRACTION_SQL,
    "embedding_dispersion_labels": _DISPERSION_SQL,
    # dedup_clusters_documents and dedup_canonical_documents are
    # registered by queries.py (their oracles embed _minhash_sql, which
    # is defined after this module loads).
}
