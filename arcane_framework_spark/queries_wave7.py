"""Round-12 catalog wave: bucketed batch MinHash (the 100 TB disk-ceiling
fix) and offset-invariant exact-substring dedup via content-defined
anchors.

Same contract as every other wave module: each entry is a
``(spark, sf_dir) -> DataFrame`` callable plus a DuckDB oracle producing
identical column names and bit-stable values (integer / fixed-point /
string arithmetic only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arcane_framework_spark.session import load_tables
from arcane_framework_spark.sqlconst import TOKS_SQL as _TOKS_SQL

# ---------------------------------------------------------------------------
# Bucketed batch MinHash (round-11 verdict #1)
# ---------------------------------------------------------------------------


def minhash_pairs_bucketed_documents(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """``minhash_pairs_documents`` through the BUCKETED side-table plan
    (``operators.dedup.minhash_pair_counts_bucketed``): band table
    bucketed+sorted on (band_id, band_hash) so the candidate self-join
    reads exchange-free; shingle arrays bucketed on id so the
    exact-verification joins never shuffle the corpus's arrays. Shares
    ``minhash_pairs_documents``'s oracle VERBATIM — the storage-path and
    in-memory-path hashes must agree bit-for-bit (the X87 pattern applied
    to the full-corpus batch shape the 1000x probe named as the first
    100 TB ceiling: 20.3 GiB of shuffle+spill to executor disk)."""
    from arcane_framework_spark.operators.dedup import (
        minhash_lsh_pairs_bucketed,
    )
    from arcane_framework_spark.queries import _planted_neardup_docs

    return minhash_lsh_pairs_bucketed(
        _planted_neardup_docs(spark, sf_dir),
        table_prefix="minhash_batch_gate",
    )


# ---------------------------------------------------------------------------
# Offset-invariant exact-substring dedup (round-11 verdict #2)
#
# X175's aligned fixed-width segments provably miss a verbatim span copied
# at a token offset that is not a multiple of SEGMENT_WIDTH. These entries
# plant exactly that adversarial corpus — copies at off-by-1..7 token
# offsets — and (a) remove the spans with the content-defined anchored
# segmentation, (b) commit the aligned-vs-anchored recall comparison the
# verdict asked for.
# ---------------------------------------------------------------------------

#: Every Nth doc gets an offset-planted copy (same modulus as the X175
#: family so the corpora stay comparable).
UNALIGNED_EVERY = 9

#: The planted verbatim span — 16 tokens, same length as X175's so the
#: recall comparison isolates ALIGNMENT, not span size.
UNALIGNED_SPAN = (
    "alpha beta gamma delta epsilon zeta eta theta "
    "iota kappa lambda mu nu xi omicron pi"
)


def _planted_offset_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + every ``UNALIGNED_EVERY``-th doc re-inserted at
    ``doc_id + _DUP_OFFSET`` with ``m = doc_id % 7 + 1`` DOC-UNIQUE filler
    tokens prepended before the verbatim span — so the span (and the
    copied body after it) sits at token offset m in 1..7, never a
    multiple of SEGMENT_WIDTH: the aligned variant's windows can never
    line up with the original's, while content-defined anchors reproduce
    inside the span/body wherever they sit. Doc-unique fillers
    ('pad{doc_id}' x m) keep the filler region itself from deduping.
    ``concat``/'||' NULL propagation matches cross-engine (both drop a
    NULL-text row)."""
    from arcane_framework_spark.queries import _DUP_OFFSET

    t = load_tables(spark, sf_dir, "documents")
    docs = t["documents"].select("doc_id", "source", "text")
    planted = docs.filter(F.col("doc_id") % UNALIGNED_EVERY == 0).select(
        (F.col("doc_id") + F.lit(_DUP_OFFSET)).alias("doc_id"),
        "source",
        F.concat(
            F.expr(
                "repeat(concat('pad', CAST(doc_id AS STRING), ' '), "
                "CAST(doc_id % 7 + 1 AS INT))"
            ),
            F.lit(UNALIGNED_SPAN + " "),
            F.col("text"),
        ).alias("text"),
    )
    return docs.unionByName(planted)


def substring_dedup_unaligned_documents(spark: SparkSession,
                                        sf_dir: str) -> DataFrame:
    """Per-doc exact-substring removal over the OFFSET-planted corpus
    using content-defined anchored segmentation: (doc_id, n_segments,
    n_removed_segments, removed_tokens, kept_tokens, removed_idxs).
    The copies' span/body interiors are removed at every offset 1..7 —
    the spans X175's aligned windows provably miss (see
    ``substring_recall_aligned_vs_anchored`` for the measured gap)."""
    from arcane_framework_spark.operators.dedup import (
        anchored_substring_stats,
    )

    return anchored_substring_stats(_planted_offset_docs(spark, sf_dir))


def substring_recall_aligned_vs_anchored(spark: SparkSession,
                                         sf_dir: str) -> DataFrame:
    """The verdict's recall-comparison row, per span offset m in 1..7:
    (span_offset, n_copies, aligned_docs_hit, anchored_docs_hit,
    aligned_removed_tokens, anchored_removed_tokens) over the offset-
    planted copies only. 'hit' = at least one segment removed. The
    aligned variant catches at most the single SEGMENT_WIDTH window that
    happens to fall fully inside the span for SAME-offset copies; the
    anchored variant removes the span/body interior at every offset."""
    from arcane_framework_spark.operators.dedup import (
        anchored_substring_segments,
        exact_substring_segments,
    )
    from arcane_framework_spark.queries import _DUP_OFFSET

    corpus = _planted_offset_docs(spark, sf_dir)
    rm = F.col("removed")

    def per_doc(flagged: DataFrame, tag: str) -> DataFrame:
        return (
            flagged.filter(F.col("doc_id") >= _DUP_OFFSET)
            .groupBy("doc_id")
            .agg(
                F.sum(F.when(rm, 1).otherwise(0)).alias(f"__{tag}_rm_segs"),
                F.sum(F.when(rm, F.col("seg_tokens")).otherwise(0)).alias(
                    f"__{tag}_rm_toks"
                ),
            )
        )

    aligned = per_doc(exact_substring_segments(corpus), "al")
    anchored = per_doc(anchored_substring_segments(corpus), "an")
    return (
        aligned.join(anchored, "doc_id")
        .withColumn(
            "span_offset", (F.col("doc_id") - _DUP_OFFSET) % 7 + 1
        )
        .groupBy("span_offset")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_copies"),
            F.sum(F.when(F.col("__al_rm_segs") > 0, 1).otherwise(0))
            .cast("long").alias("aligned_docs_hit"),
            F.sum(F.when(F.col("__an_rm_segs") > 0, 1).otherwise(0))
            .cast("long").alias("anchored_docs_hit"),
            F.sum("__al_rm_toks").cast("long").alias(
                "aligned_removed_tokens"
            ),
            F.sum("__an_rm_toks").cast("long").alias(
                "anchored_removed_tokens"
            ),
        )
    )


def incremental_substring_unaligned_documents(spark: SparkSession,
                                              sf_dir: str) -> DataFrame:
    """Incremental anchored exact-substring dedup: the offset-planted
    arrivals judged against the plain corpus's ANCHORED segment-presence
    index (corpus text never re-segmented; only the batch tokenizes) —
    X177's continuous-ingest shape carried to the offset-invariant
    segmentation, so a copy arriving at ANY token offset is still
    removed against the corpus. Decision rule provably equal to the
    batch operator on (corpus ∪ arrivals) restricted to arrivals (every
    corpus doc_id precedes every arrival), which is literally the shared
    oracle restriction."""
    from arcane_framework_spark.operators.dedup import (
        anchored_corpus_segment_hashes,
        incremental_substring_stats,
    )
    from arcane_framework_spark.queries import _DUP_OFFSET

    t = load_tables(spark, sf_dir, "documents")
    docs = t["documents"].select("doc_id", "text")
    index = anchored_corpus_segment_hashes(docs)
    batch = docs.filter(F.col("doc_id") % UNALIGNED_EVERY == 0).select(
        (F.col("doc_id") + F.lit(_DUP_OFFSET)).alias("doc_id"),
        F.concat(
            F.expr(
                "repeat(concat('pad', CAST(doc_id AS STRING), ' '), "
                "CAST(doc_id % 7 + 1 AS INT))"
            ),
            F.lit(UNALIGNED_SPAN + " "),
            F.col("text"),
        ).alias("text"),
    )
    return incremental_substring_stats(batch, index, anchored=True)


def streaming_substring_unaligned(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Streaming twin of incremental ANCHORED substring dedup: the
    offset-planted arrivals stream in (availableNow, doc_id order) and
    are judged per micro-batch against the bucketed seen-state table
    seeded with the anchored corpus index — X178's growing-state shape
    carried to the offset-invariant segmentation. First-arrived-wins
    coincides with the batch order for the ordered drain, so the entry
    shares the incremental oracle verbatim."""
    import os
    import tempfile

    from arcane_framework_spark.queries import _DUP_OFFSET
    from arcane_framework_spark.queries_wave6 import (
        run_substring_dedup_stream,
    )

    def arrivals(stream: DataFrame) -> DataFrame:
        return stream.filter(
            F.col("doc_id") % UNALIGNED_EVERY == 0
        ).select(
            (F.col("doc_id") + F.lit(_DUP_OFFSET)).alias("doc_id"),
            F.concat(
                F.expr(
                    "repeat(concat('pad', CAST(doc_id AS STRING), ' '), "
                    "CAST(doc_id % 7 + 1 AS INT))"
                ),
                F.lit(UNALIGNED_SPAN + " "),
                F.col("text"),
            ).alias("text"),
        )

    acc: list = []
    with tempfile.TemporaryDirectory() as tmp:
        run_substring_dedup_stream(
            spark, sf_dir, os.path.join(tmp, "seen"),
            lambda out, _bid: acc.extend(out.collect()),
            anchored=True, arrival_transform=arrivals,
        )
    return spark.createDataFrame(
        acc,
        "doc_id: long, n_segments: long, n_removed_segments: long, "
        "removed_tokens: long, kept_tokens: long, removed_idxs: string",
    )


def streaming_substring_compacted(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """X186 with the seen-state COMPACTION live (round-12 verdict #4):
    ``compact_files_per_bucket=1`` makes the X47-planner trigger fire
    after the drain's append, so the gate EXECUTES the bucketed
    generation rewrite + table swap, not just the pytest. Decisions are
    unchanged by construction — compaction rewrites the same rows into
    fewer files after judging — so the entry shares the incremental
    oracle verbatim; the hash match IS the proof the swap lost nothing."""
    import os
    import tempfile

    from arcane_framework_spark.queries import _DUP_OFFSET
    from arcane_framework_spark.queries_wave6 import (
        run_substring_dedup_stream,
    )

    def arrivals(stream: DataFrame) -> DataFrame:
        return stream.filter(
            F.col("doc_id") % UNALIGNED_EVERY == 0
        ).select(
            (F.col("doc_id") + F.lit(_DUP_OFFSET)).alias("doc_id"),
            F.concat(
                F.expr(
                    "repeat(concat('pad', CAST(doc_id AS STRING), ' '), "
                    "CAST(doc_id % 7 + 1 AS INT))"
                ),
                F.lit(UNALIGNED_SPAN + " "),
                F.col("text"),
            ).alias("text"),
        )

    acc: list = []
    with tempfile.TemporaryDirectory() as tmp:
        run_substring_dedup_stream(
            spark, sf_dir, os.path.join(tmp, "seen"),
            lambda out, _bid: acc.extend(out.collect()),
            anchored=True, arrival_transform=arrivals,
            compact_files_per_bucket=1,
        )
    return spark.createDataFrame(
        acc,
        "doc_id: long, n_segments: long, n_removed_segments: long, "
        "removed_tokens: long, kept_tokens: long, removed_idxs: string",
    )


def anchored_width_stats_documents(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Distribution of anchored segment widths over the plain corpus:
    (seg_tokens, n_segments, token_share_ppm) — the committed evidence
    for the geometric-width claim in ``anchored_segment_hashes``'s
    docstring (cut density 1/8 → expected width SEGMENT_WIDTH, no hard
    cap). A fat tail here is the early warning that a corpus is
    anchor-starved (degenerate repeated content) before any 100 TB run
    bets on bounded segments. Exact integer ppm of TOKENS per width."""
    from arcane_framework_spark.operators.scale import with_broadcast_scalar
    from arcane_framework_spark.operators.text import (
        anchored_segment_hashes,
    )

    t = load_tables(spark, sf_dir, "documents")
    segs = anchored_segment_hashes(t["documents"].select("doc_id", "text"))
    per_width = segs.groupBy("seg_tokens").agg(
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        F.sum("seg_tokens").cast("long").alias("__toks"),
    )
    total = per_width.agg(F.sum("__toks").alias("__total"))
    return with_broadcast_scalar(per_width, total).select(
        "seg_tokens",
        "n_segments",
        F.expr("CAST(__toks * 1000000 DIV __total AS BIGINT)").alias(
            "token_share_ppm"
        ),
    )


# ---------------------------------------------------------------------------
# Oracles
# ---------------------------------------------------------------------------


def _offset_corpus_sql() -> str:
    from arcane_framework_spark.queries import _DUP_OFFSET

    return f"""
WITH corpus AS (
  SELECT doc_id, source, text FROM documents
  UNION ALL
  SELECT doc_id + {_DUP_OFFSET}, source,
         repeat('pad' || CAST(doc_id AS VARCHAR) || ' ',
                CAST(doc_id % 7 + 1 AS INTEGER))
           || '{UNALIGNED_SPAN} ' || text
  FROM documents WHERE doc_id % {UNALIGNED_EVERY} = 0
)"""


def _anchored_segs_sql(cte_prefix: str = "") -> str:
    """The anchored segmentation chain over a ``corpus`` CTE — the DuckDB
    spelling of ``operators.text.anchored_segment_hashes``: one md5 per
    token reduced into Z_ANCHOR_PRIME, candidate anchors at gram
    positions 2..n-k+1 where the ANCHOR_COEF-weighted k-token-hash sum is
    0 mod ANCHOR_MOD (exact small-integer arithmetic, max intermediate
    < 2^25 in both engines); cuts = [1] + anchors; one segment per cut."""
    from arcane_framework_spark.operators.text import (
        ANCHOR_COEF,
        ANCHOR_K,
        ANCHOR_MOD,
        ANCHOR_PRIME,
    )

    k = ANCHOR_K
    p = cte_prefix
    weighted = " + ".join(
        f"th[i + {j}] * {ANCHOR_COEF[j]}" for j in range(k)
    )
    return f""",
{p}toks AS (
  SELECT doc_id, source, {_TOKS_SQL} AS ls FROM corpus
  WHERE length(trim(text)) > 0
),
{p}hashed AS (
  SELECT doc_id, source, ls,
         list_transform(ls, t ->
           CAST(concat('0x', substring(md5(t), 1, 8)) AS BIGINT)
             % {ANCHOR_PRIME}) AS th
  FROM {p}toks
),
{p}cutted AS (
  SELECT doc_id, source, ls,
         list_prepend(1, list_filter(
           range(2, len(ls) - {k} + 2),
           i -> ({weighted}) % {ANCHOR_MOD} = 0)) AS cuts
  FROM {p}hashed WHERE len(ls) > 0
),
{p}segs AS (
  SELECT doc_id, source, CAST(j - 1 AS BIGINT) AS seg_idx,
         md5(array_to_string(
           ls[cuts[j] : CASE WHEN j < len(cuts) THEN cuts[j + 1] - 1
                             ELSE len(ls) END], ' ')) AS seg_hash,
         (CASE WHEN j < len(cuts) THEN cuts[j + 1] - 1
               ELSE len(ls) END - cuts[j] + 1)::BIGINT AS seg_tokens
  FROM {p}cutted,
       LATERAL (SELECT unnest(range(1, len(cuts) + 1)) AS j)
),
{p}ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY seg_hash ORDER BY doc_id, seg_idx) AS rn
  FROM {p}segs
)"""


def _unaligned_dedup_sql() -> str:
    return _offset_corpus_sql() + _anchored_segs_sql() + """
SELECT doc_id,
       count(*)::BIGINT AS n_segments,
       sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)::BIGINT AS n_removed_segments,
       sum(CASE WHEN rn > 1 THEN seg_tokens ELSE 0 END)::BIGINT
         AS removed_tokens,
       sum(CASE WHEN rn = 1 THEN seg_tokens ELSE 0 END)::BIGINT
         AS kept_tokens,
       coalesce(string_agg(CASE WHEN rn > 1 THEN seg_idx END, ','
                           ORDER BY seg_idx), '') AS removed_idxs
FROM ranked GROUP BY doc_id
"""


def _aligned_segs_over_corpus_sql() -> str:
    """X175's aligned fixed-width chain (queries_wave6._substring_segs_sql
    body) over the SAME offset-planted corpus, CTE-prefixed 'al'."""
    from arcane_framework_spark.operators.text import SEGMENT_WIDTH

    w = SEGMENT_WIDTH
    return f""",
altoks AS (
  SELECT doc_id, source, {_TOKS_SQL} AS ls FROM corpus
  WHERE length(trim(text)) > 0
),
alsegs AS (
  SELECT doc_id, source, CAST(i - 1 AS BIGINT) AS seg_idx,
         md5(array_to_string(ls[(i - 1) * {w} + 1 : i * {w}], ' ')) AS seg_hash,
         len(ls[(i - 1) * {w} + 1 : i * {w}])::BIGINT AS seg_tokens
  FROM altoks,
       LATERAL (SELECT unnest(range(1, CAST(ceil(len(ls) / {w}.0) AS BIGINT) + 1)) AS i)
  WHERE len(ls) > 0
),
alranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY seg_hash ORDER BY doc_id, seg_idx) AS rn
  FROM alsegs
)"""


def _incremental_unaligned_sql() -> str:
    """The anchored batch chain restricted to the arrival rows — valid by
    the same id-ordering argument as X177's shared oracle."""
    from arcane_framework_spark.queries import _DUP_OFFSET

    return _offset_corpus_sql() + _anchored_segs_sql() + f"""
SELECT doc_id,
       count(*)::BIGINT AS n_segments,
       sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)::BIGINT AS n_removed_segments,
       sum(CASE WHEN rn > 1 THEN seg_tokens ELSE 0 END)::BIGINT
         AS removed_tokens,
       sum(CASE WHEN rn = 1 THEN seg_tokens ELSE 0 END)::BIGINT
         AS kept_tokens,
       coalesce(string_agg(CASE WHEN rn > 1 THEN seg_idx END, ','
                           ORDER BY seg_idx), '') AS removed_idxs
FROM ranked WHERE doc_id >= {_DUP_OFFSET} GROUP BY doc_id
"""


def _anchored_width_sql() -> str:
    return ("""
WITH corpus AS (
  SELECT doc_id, NULL AS source, text FROM documents
)"""
            + _anchored_segs_sql()
            + """,
per_width AS (
  SELECT seg_tokens, count(*)::BIGINT AS n_segments,
         sum(seg_tokens) AS toks
  FROM segs GROUP BY seg_tokens
)
SELECT seg_tokens, n_segments,
       CAST(toks * 1000000 // (SELECT sum(toks) FROM per_width) AS BIGINT)
         AS token_share_ppm
FROM per_width
""")


def _recall_comparison_sql() -> str:
    from arcane_framework_spark.queries import _DUP_OFFSET

    return (
        _offset_corpus_sql()
        + _anchored_segs_sql("an")
        + _aligned_segs_over_corpus_sql()
        + f""",
al_doc AS (
  SELECT doc_id,
         sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS rm_segs,
         sum(CASE WHEN rn > 1 THEN seg_tokens ELSE 0 END) AS rm_toks
  FROM alranked WHERE doc_id >= {_DUP_OFFSET} GROUP BY doc_id
),
an_doc AS (
  SELECT doc_id,
         sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS rm_segs,
         sum(CASE WHEN rn > 1 THEN seg_tokens ELSE 0 END) AS rm_toks
  FROM anranked WHERE doc_id >= {_DUP_OFFSET} GROUP BY doc_id
)
SELECT (al_doc.doc_id - {_DUP_OFFSET}) % 7 + 1 AS span_offset,
       count(*)::BIGINT AS n_copies,
       sum(CASE WHEN al_doc.rm_segs > 0 THEN 1 ELSE 0 END)::BIGINT
         AS aligned_docs_hit,
       sum(CASE WHEN an_doc.rm_segs > 0 THEN 1 ELSE 0 END)::BIGINT
         AS anchored_docs_hit,
       sum(al_doc.rm_toks)::BIGINT AS aligned_removed_tokens,
       sum(an_doc.rm_toks)::BIGINT AS anchored_removed_tokens
FROM al_doc JOIN an_doc USING (doc_id)
GROUP BY 1
"""
    )


WAVE7_QUERIES = {
    "minhash_pairs_bucketed_documents": minhash_pairs_bucketed_documents,
    "substring_dedup_unaligned_documents": substring_dedup_unaligned_documents,
    "substring_recall_aligned_vs_anchored": substring_recall_aligned_vs_anchored,
    "incremental_substring_unaligned_documents":
        incremental_substring_unaligned_documents,
    "streaming_substring_unaligned": streaming_substring_unaligned,
    "streaming_substring_compacted": streaming_substring_compacted,
    "anchored_width_stats_documents": anchored_width_stats_documents,
}
