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


EVAL_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "edit_neardup_documents": edit_neardup_documents,
}

EVAL_ORACLE_SQL: dict[str, str] = {
    "edit_neardup_documents": _edit_neardup_sql(),
}
