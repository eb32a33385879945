"""Round-10 catalog wave: data-selection and curation operators.

Same contract as every other wave module: each entry is a
``(spark, sf_dir) -> DataFrame`` callable plus a DuckDB oracle producing
identical column names and bit-stable values (integer / fixed-point /
single-IEEE-op arithmetic only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arcane_framework_spark.session import load_tables
from arcane_framework_spark.sqlconst import TOKS_SQL as _TOKS_SQL

# ---------------------------------------------------------------------------
# DSIR-style importance weighting (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling") — hashed token features,
# target-vs-source bucket ratios, per-document importance scores.
# ---------------------------------------------------------------------------

#: Hashed feature dimension. 4096 buckets keeps the whole weight table a
#: guaranteed broadcast at ANY corpus scale — the per-doc scoring join
#: never shuffles the corpus against it.
DSIR_BUCKETS = 4096

#: Deterministic "curated target" cohort: every 10th doc stands in for the
#: high-quality seed corpus DSIR weights toward. In production this is a
#: real curated set; the in-plan modulus keeps the entry self-contained
#: and identically computable in both engines.
DSIR_TARGET_MOD = 10

#: Fixed-point scale for the per-bucket weight (integer micro-units, so
#: per-doc sums are exact longs in both engines — no float summation
#: order anywhere).
DSIR_SCALE = 1_000_000


#: Selection budget for the resampling twin, in percent of the corpus.
DSIR_BUDGET_PCT = 25

#: Selection-hash resolution: u ~ uniform over [0, 2^24) from an md5 of
#: the salted doc id. 24 bits keeps every cross-engine comparison inside
#: exact double arithmetic.
DSIR_U_BITS = 1 << 24


def _dsir_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared scoring pipeline: (doc_id, n_tokens, score, score_per_token)."""
    t = load_tables(spark, sf_dir, "documents")
    docs = t["documents"].select("doc_id", "text")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
            "tok"
        ),
    ).filter(F.col("tok") != "")
    tokb = toks.select(
        "doc_id",
        (
            F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10)
            .cast("long")
            % F.lit(DSIR_BUCKETS)
        ).alias("b"),
    )
    wtab = tokb.groupBy("b").agg(
        F.count(F.lit(1)).alias("__ns"),
        F.sum(
            F.when(F.col("doc_id") % DSIR_TARGET_MOD == 0, 1).otherwise(0)
        ).alias("__nt"),
    ).select(
        "b",
        F.expr(
            f"CAST({DSIR_SCALE} * (__nt + 1) DIV (__ns + 1) AS BIGINT)"
        ).alias("__w"),
    )
    scored = (
        tokb.join(F.broadcast(wtab), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("__w").cast("long").alias("score"),
        )
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        "score",
        F.expr("CAST(score DIV n_tokens AS BIGINT)").alias(
            "score_per_token"
        ),
    )


def dsir_weights_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance scores over hashed token features.

    The DSIR recipe: featurize text into a small hashed space, estimate
    target and source (raw-corpus) distributions there, and score each
    document by how much the target over-represents its features; high
    scores drive resampling toward the target distribution. Here:
    feature = md5 hash bucket of each whitespace token (DSIR_BUCKETS
    buckets), target = the deterministic ``doc_id % DSIR_TARGET_MOD = 0``
    cohort, per-bucket weight = the smoothed integer ratio
    ``DSIR_SCALE * (n_target + 1) // (n_source + 1)``, per-doc score =
    the exact long sum of its tokens' bucket weights (and the
    length-normalized ``score_per_token``).

    The classic log-likelihood-ratio form is deliberately replaced by the
    plain smoothed ratio: monotone in the same direction per bucket and
    exactly representable as integers in BOTH engines (``log`` is libm-
    dependent, see the q9 lesson), so the hash gate stays bit-stable.

    Scale: one explode over corpus tokens, ONE hash-agg shuffle for the
    bucket table (map-side partial, target counted with a conditional sum
    in the same pass), the 4096-row weight table broadcast to the scoring
    join, one groupBy(doc_id) shuffle for the per-doc sum. No all-pairs
    anywhere; at 100 TB the weight table is still 4096 rows.

    Reference parity: the reference has no data-selection surface; this
    extends the sampling/quality family (X20, X34) the way a pretraining
    pipeline selects corpus subsets toward a curated seed.
    """
    return _dsir_scored(spark, sf_dir)


_DSIR_SQL = rf"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents
),
tb AS (
  SELECT doc_id,
         CAST(concat('0x', substring(md5(tok), 1, 8)) AS BIGINT)
           % {DSIR_BUCKETS} AS b
  FROM toks WHERE tok <> ''
),
w AS (
  SELECT b,
         {DSIR_SCALE} * (sum(CASE WHEN doc_id % {DSIR_TARGET_MOD} = 0
                                  THEN 1 ELSE 0 END) + 1)
           // (count(*) + 1) AS wgt
  FROM tb GROUP BY b
),
scored AS (
  SELECT tb.doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(wgt) AS BIGINT) AS score
  FROM tb JOIN w USING (b)
  GROUP BY tb.doc_id
)
SELECT doc_id, n_tokens, score,
       CAST(score // n_tokens AS BIGINT) AS score_per_token
FROM scored
"""


WAVE5_QUERIES = {
    "dsir_weights_documents": dsir_weights_documents,
}

WAVE5_ORACLE_SQL: dict[str, str] = {
    "dsir_weights_documents": _DSIR_SQL,
}
