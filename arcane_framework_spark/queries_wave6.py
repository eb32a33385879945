"""Round-11 catalog wave: exact-substring dedup (Lee et al. 2021).

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
# Exact-substring dedup (Lee et al. 2021, "Deduplicating Training Data
# Makes Language Models Better"): the pass every production pretraining
# pipeline runs AFTER MinHash doc-level dedup — remove every later
# occurrence of a verbatim repeated span, keep exactly one copy (the
# first). X33 (repeated_spans_documents) DETECTS repeated spans; these
# entries REMOVE them, with per-doc kept/removed accounting and a
# per-source governance rollup.
# ---------------------------------------------------------------------------

#: Every Nth doc gets a planted copy carrying the verbatim span, so the
#: removal is non-trivial at gate scale. 9 is coprime with the other
#: planting moduli (7, 10) so the corpora stay distinguishable.
SUBSTR_EVERY = 9

#: The planted verbatim span: exactly 16 whitespace tokens = two full
#: 8-token segments, so every planted doc contributes two removable
#: segment occurrences and the body that follows stays segment-ALIGNED
#: (16 % SEGMENT_WIDTH == 0) — which makes the planted doc's own body a
#: verbatim cross-doc repeat of its original, removed too (exactly the
#: paper's semantics: later copies of any repeated span go).
SUBSTR_SPAN = (
    "alpha beta gamma delta epsilon zeta eta theta "
    "iota kappa lambda mu nu xi omicron pi"
)


def _planted_substring_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + every ``SUBSTR_EVERY``-th doc re-inserted at
    ``doc_id + _DUP_OFFSET`` with the verbatim span prepended — one
    helper so both entries build the byte-identical logical subtree
    (CacheManager plan-equality sharing, the ``_planted_neardup_docs``
    pattern). ``concat`` (not concat_ws) on purpose: it propagates a
    NULL ``text`` exactly like the oracle's ``||``, so a corpus with
    NULL text cannot diverge cross-engine (both drop the row)."""
    from arcane_framework_spark.queries import _DUP_OFFSET

    t = load_tables(spark, sf_dir, "documents")
    docs = t["documents"].select("doc_id", "source", "text")
    planted = docs.filter(F.col("doc_id") % SUBSTR_EVERY == 0).select(
        (F.col("doc_id") + F.lit(_DUP_OFFSET)).alias("doc_id"),
        "source",
        F.concat(F.lit(SUBSTR_SPAN + " "), F.col("text")).alias("text"),
    )
    return docs.unionByName(planted)


def substring_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc exact-substring removal: (doc_id, n_segments,
    n_removed_segments, removed_tokens, kept_tokens, removed_idxs) over
    the planted corpus. ``removed_idxs`` (comma-joined sorted removed
    segment positions) is the exact complement of the doc's kept-token
    ranges — a consumer rebuilds the deduplicated text by dropping those
    ``SEGMENT_WIDTH``-token windows.

    Scale: see ``operators.dedup.exact_substring_segments`` — one
    shuffle on the 16-byte segment hash, first-occurrence via a
    map-side-combinable min(struct) aggregate (no per-key sort), the
    duplicated-hash side table broadcast back by AQE.
    """
    from arcane_framework_spark.operators.dedup import substring_dedup_stats

    return substring_dedup_stats(_planted_substring_docs(spark, sf_dir))


def substring_dedup_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-substring removal accounting — the governance
    view (which feed ships how much verbatim-repeated text): (source,
    n_docs, n_segments, n_removed_segments, removed_tokens, kept_tokens,
    removal_ppm) with an exact integer ppm."""
    from arcane_framework_spark.operators.dedup import (
        exact_substring_segments,
    )

    flagged = exact_substring_segments(
        _planted_substring_docs(spark, sf_dir), carry=("source",)
    )
    rm = F.col("removed")
    return (
        flagged.groupBy("source")
        .agg(
            F.count_distinct(F.col("doc_id")).cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_segments"),
            F.sum(F.when(rm, 1).otherwise(0)).cast("long").alias(
                "n_removed_segments"
            ),
            F.sum(F.when(rm, F.col("seg_tokens")).otherwise(0)).cast("long")
            .alias("removed_tokens"),
            F.sum(F.when(~rm, F.col("seg_tokens")).otherwise(0)).cast("long")
            .alias("kept_tokens"),
        )
        .select(
            "source",
            "n_docs",
            "n_segments",
            "n_removed_segments",
            "removed_tokens",
            "kept_tokens",
            F.expr(
                "CAST(removed_tokens * 1000000 DIV "
                "(removed_tokens + kept_tokens) AS BIGINT)"
            ).alias("removal_ppm"),
        )
    )


def incremental_substring_dedup_documents(spark: SparkSession,
                                          sf_dir: str) -> DataFrame:
    """Incremental exact-substring dedup: the planted arrivals judged
    against the EXISTING corpus's materialized segment index — corpus
    text never re-segmented, only the batch tokenizes (the
    ``incremental_dedup_documents`` continuous-ingest shape applied to
    X175). Provably identical to the batch operator on (corpus UNION
    batch) restricted to batch rows (every corpus doc precedes every
    arrival in corpus order), which is exactly what the shared oracle
    computes: the batch entry's SQL filtered to ``doc_id >=
    _DUP_OFFSET``."""
    from arcane_framework_spark.operators.dedup import (
        corpus_segment_hashes,
        incremental_substring_stats,
    )
    from arcane_framework_spark.queries import _DUP_OFFSET

    t = load_tables(spark, sf_dir, "documents")
    docs = t["documents"].select("doc_id", "text")
    index = corpus_segment_hashes(docs)
    batch = docs.filter(F.col("doc_id") % SUBSTR_EVERY == 0).select(
        (F.col("doc_id") + F.lit(_DUP_OFFSET)).alias("doc_id"),
        F.concat(F.lit(SUBSTR_SPAN + " "), F.col("text")).alias("text"),
    )
    return incremental_substring_stats(batch, index)


def substring_span_stats_documents(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Distribution of MAXIMAL removed-span lengths: consecutive removed
    segments in a doc merge into one span (gaps-and-islands:
    ``seg_idx - row_number()`` per doc over removed rows is constant
    within a run), and the output histograms spans by length —
    (span_segments, n_spans, total_tokens). This is the report that says
    whether removal is dominated by short boilerplate echoes or by long
    wholesale copies (the planted 2-segment span + whole-body repeats
    both show up as distinct modes).

    Scale: runs entirely on X175's flagged segment table; the island
    grouping is a per-doc window over REMOVED segments only (removal is
    the rare case on a real corpus), then one small groupBy on span
    length."""
    from arcane_framework_spark.operators.dedup import (
        exact_substring_segments,
    )
    from pyspark.sql import Window

    flagged = exact_substring_segments(_planted_substring_docs(spark, sf_dir))
    w = Window.partitionBy("doc_id").orderBy("seg_idx")
    spans = (
        flagged.filter(F.col("removed"))
        .withColumn(
            "__island", F.col("seg_idx") - F.row_number().over(w)
        )
        .groupBy("doc_id", "__island")
        .agg(
            F.count(F.lit(1)).cast("long").alias("span_segments"),
            F.sum("seg_tokens").cast("long").alias("__span_tokens"),
        )
    )
    return (
        spans.groupBy("span_segments")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.sum("__span_tokens").cast("long").alias("total_tokens"),
        )
        .select("span_segments", "n_spans", "total_tokens")
    )


def _substring_span_stats_sql() -> str:
    return _substring_segs_sql() + """
,
removed AS (
  SELECT doc_id, seg_idx, seg_tokens FROM ranked WHERE rn > 1
),
islands AS (
  SELECT doc_id, seg_idx, seg_tokens,
         seg_idx - row_number() OVER (
           PARTITION BY doc_id ORDER BY seg_idx) AS island
  FROM removed
),
spans AS (
  SELECT doc_id, island,
         count(*)::BIGINT AS span_segments,
         sum(seg_tokens)::BIGINT AS span_tokens
  FROM islands GROUP BY doc_id, island
)
SELECT span_segments,
       count(*)::BIGINT AS n_spans,
       CAST(sum(span_tokens) AS BIGINT) AS total_tokens
FROM spans GROUP BY span_segments
"""


def repetition_stats_documents(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Gopher/MassiveText intra-document repetition filters (Rae et al.
    2021): per doc, duplicate-bigram/trigram occurrence fractions and
    the top n-gram's share, as exact integer ppm — the self-repetition
    complement of X33's cross-doc span detection (a page dominated by
    its own repeated n-grams is template/spam regardless of corpus
    context). See ``operators.text.repetition_stats``."""
    from arcane_framework_spark.operators.text import repetition_stats

    t = load_tables(spark, sf_dir, "documents")
    return repetition_stats(t["documents"].select("doc_id", "text"))


def _repetition_stats_sql() -> str:
    def block(n: int, label: str) -> str:
        return f"""
g{n} AS (
  SELECT doc_id, array_to_string(ls[i : i + {n - 1}], ' ') AS g
  FROM toks, LATERAL (SELECT unnest(range(1, len(ls) - {n - 2})) AS i)
  WHERE len(ls) >= {n}
),
c{n} AS (SELECT doc_id, g, count(*)::BIGINT AS c FROM g{n} GROUP BY 1, 2),
s{n} AS (
  SELECT doc_id,
         sum(c)::BIGINT AS n_{label}s,
         CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) * 1000000
              // sum(c) AS BIGINT) AS dup_{label}_ppm,
         CAST(max(c) * 1000000 // sum(c) AS BIGINT) AS top_{label}_ppm
  FROM c{n} GROUP BY doc_id
)"""

    return f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_SQL} AS ls FROM documents
  WHERE length(trim(text)) > 0
),{block(2, "bigram")},{block(3, "trigram")}
SELECT t.doc_id,
       len(t.ls)::BIGINT AS n_tokens,
       coalesce(s2.n_bigrams, 0) AS n_bigrams,
       coalesce(s2.dup_bigram_ppm, 0) AS dup_bigram_ppm,
       coalesce(s2.top_bigram_ppm, 0) AS top_bigram_ppm,
       coalesce(s3.n_trigrams, 0) AS n_trigrams,
       coalesce(s3.dup_trigram_ppm, 0) AS dup_trigram_ppm,
       coalesce(s3.top_trigram_ppm, 0) AS top_trigram_ppm
FROM toks t
LEFT JOIN s2 USING (doc_id)
LEFT JOIN s3 USING (doc_id)
"""


def streaming_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of incremental exact-substring dedup: arriving
    documents are segmented per micro-batch and judged against (a) the
    corpus's persisted segment index and (b) a GROWING side table of
    segments seen in earlier micro-batches — the ``foreachBatch`` +
    parquet-side-table state pattern (unlike X169's semantic twin, the
    decisions here are NOT batch-independent: a later arrival repeating
    an earlier arrival's new content must be removed, so the stream
    carries exactly that state and nothing else).

    Dedup order is FIRST-ARRIVED-WINS — the semantics a production
    firehose actually has. The gate entry drains the planted arrivals
    with ``availableNow`` in doc_id order, which makes first-arrived
    coincide with the batch operator's (doc_id, seg_idx) order, so the
    entry shares the incremental oracle verbatim; the multi-batch split
    test (ordered files, maxFilesPerTrigger=1) asserts the side-table
    state machinery preserves that equality across any ordered slicing.

    Scale: per batch, only the batch tokenizes. The presence state
    (corpus index ∪ previously-seen arrival content) is ONE bucketed
    external parquet table on ``seg_hash`` (the X87 layout; round-11
    verdict #3): the per-batch presence join and the new-hash anti-join
    both read the state side exchange-free — only the batch shuffles,
    no matter how large the seen state grows — and each batch appends
    its NEW hashes as bucket-aligned files. The earlier shape (flat
    parquet dir unioned+distinct'd with an in-memory corpus index every
    micro-batch) re-shuffled the whole state per tick.
    """
    import os
    import tempfile

    acc: list = []
    with tempfile.TemporaryDirectory() as tmp:
        seen_dir = os.path.join(tmp, "seen")
        run_substring_dedup_stream(
            spark, sf_dir, seen_dir,
            lambda out, _bid: acc.extend(out.collect()),
        )
    return spark.createDataFrame(
        acc,
        "doc_id: long, n_segments: long, n_removed_segments: long, "
        "removed_tokens: long, kept_tokens: long, removed_idxs: string",
    )


#: Per-invocation sequence for the streaming seen-state table name: the
#: state is INVOCATION-scoped (bench best-of-3 and the gate re-run the
#: entry in one session and must each start from a fresh corpus-only
#: state), so the session-scoped name alone is not unique enough.
_SEEN_STATE_SEQ = __import__("itertools").count()

#: Bucket count of the streaming seen-state table. Matches the default
#: shuffle-partition count so the batch side lands bucket-aligned.
_SEEN_STATE_BUCKETS = 16


def _seen_state_compaction_due(spark: SparkSession, state_tbl: str,
                               files_per_bucket: int) -> bool:
    """The X47 planner composed as the seen-state compaction TRIGGER:
    when the table's file count crosses ``files_per_bucket`` per bucket,
    feed each file's (bucket, path, size) to ``plan_compaction`` — every
    append is small relative to a full bucket, so the planner emits
    rewrite groups exactly when some bucket holds >= 2 files. Cheap:
    one catalog file listing + a metadata-scale plan."""
    import os as _os
    import re as _re

    files = spark.table(state_tbl).inputFiles()
    if len(files) < files_per_bucket * _SEEN_STATE_BUCKETS:
        return False
    from arcane_framework_spark.operators.maintenance import plan_compaction

    rows = []
    for f in files:
        path = f.removeprefix("file:")
        m = _re.search(r"_(\d{5})", _os.path.basename(path))
        bucket = int(m.group(1)) if m else 0
        try:
            size = _os.path.getsize(path)
        except OSError:
            size = 0
        rows.append((bucket, path, size))
    total = max(sum(size for _, _, size in rows), 1)
    # The listing is already driver-side and tick-sized — hand it to the
    # planner as ONE partition and probe with isEmpty: the default
    # createDataFrame parallelizes ~30 rows across every core and the
    # planner's window/join stages then schedule dozens of empty tasks
    # (measured 1.4s → 0.77s per tick for the identical plan output).
    plan = plan_compaction(
        spark.createDataFrame(
            spark.sparkContext.parallelize(rows, 1),
            "part int, file_id string, size long",
        ),
        # one output file per bucket: every file is sub-threshold, each
        # bucket collapses into a single rewrite group
        target_bytes=total,
        small_file_threshold=total,
    )
    return not plan.isEmpty()


def _compact_seen_state(spark: SparkSession, state_tbl: str, seen_dir: str,
                        old_dir: str, generation: int) -> tuple[str, str]:
    """Rewrite the seen-state into a fresh bucketed generation table and
    drop the old catalog entry AND its data directory. Spark's writer
    rewrites bucketed tables WHOLE (per-bucket file surgery would have
    to forge bucket-suffixed file names under the reader); with the
    files-per-bucket trigger this is classic tiered compaction —
    O(state) every ~threshold ticks, so amortized O(state/threshold)
    per tick. Bucketing and sort order are preserved, so the
    presence/anti joins stay exchange-free across the swap; a
    production deployment would hold this state in a table format whose
    OPTIMIZE does the same rewrite transactionally (and whose VACUUM
    does the directory GC below). The superseded generation's files are
    removed only AFTER the new generation is fully written and the
    catalog swap is done — a crash in between leaves garbage on disk,
    never a missing live state (round-13 verdict #6). Returns
    (new_table, new_dir) so the caller can thread the live dir into the
    next swap."""
    import shutil

    new_tbl = f"{state_tbl}_g{generation}"
    new_dir = f"{seen_dir}_g{generation}"
    (
        spark.table(state_tbl)
        # bucket-align the rewrite input so each task writes exactly one
        # bucket file (the point of the compaction); a plain scan of the
        # old generation splits by file, so without this the "compacted"
        # generation would again hold tasks × buckets files
        .repartition(_SEEN_STATE_BUCKETS, "seg_hash")
        .write.mode("overwrite")
        .bucketBy(_SEEN_STATE_BUCKETS, "seg_hash")
        .sortBy("seg_hash")
        .option("path", new_dir)
        .saveAsTable(new_tbl)
    )
    spark.sql(f"DROP TABLE IF EXISTS {state_tbl}")
    shutil.rmtree(old_dir.removeprefix("file:"), ignore_errors=True)
    return new_tbl, new_dir


def run_substring_dedup_stream(spark: SparkSession, sf_dir: str,
                               seen_dir: str, decision_sink,
                               max_files_per_trigger: int | None = None,
                               arrival_source: str | None = None,
                               anchored: bool = False,
                               arrival_transform=None,
                               compact_files_per_bucket: int | None = None,
                               ) -> None:
    """Drive the availableNow substring-dedup arrival stream; per batch
    the DECISIONS DataFrame goes to ``decision_sink(df, batch_id)`` and
    the batch's NEW segment hashes are appended to the presence state —
    an EXTERNAL bucketed parquet table at ``seen_dir`` (bucketed+sorted
    on ``seg_hash``), seeded pre-stream with the corpus's segment index.
    One state table, bucket-aligned reads every tick (see
    ``streaming_substring_dedup``). ``arrival_source`` overrides the
    default planted-arrival construction with a prepared parquet
    directory of (doc_id, text) — the multi-batch split test uses it
    with ``max_files_per_trigger=1``."""
    from arcane_framework_spark.operators.dedup import (
        anchored_corpus_segment_hashes,
        corpus_segment_hashes,
        incremental_substring_stats,
    )
    from arcane_framework_spark.operators.scale import (
        gc_stale_side_tables,
        session_scoped_table,
    )
    from arcane_framework_spark.operators.text import (
        anchored_segment_hashes,
        positioned_segment_hashes,
    )

    index_of = (
        anchored_corpus_segment_hashes if anchored
        else corpus_segment_hashes
    )
    segments_of = (
        anchored_segment_hashes if anchored else positioned_segment_hashes
    )
    from arcane_framework_spark.queries import _DUP_OFFSET
    from arcane_framework_spark.queries_ext import stream_conf

    t = load_tables(spark, sf_dir, "documents")
    docs = t["documents"].select("doc_id", "text")
    state_tbl = (
        session_scoped_table(spark, "substr_seen_state")
        + f"_{next(_SEEN_STATE_SEQ)}"
    )
    # mutable holder: compaction swaps the active generation table and
    # tracks the live data dir so each swap can GC its predecessor
    state = {"tbl": state_tbl, "dir": seen_dir}
    gc_stale_side_tables(spark, "substr_seen_state")
    (
        index_of(docs)
        # one bucket file per bucket (see the append-side note below)
        .repartition(_SEEN_STATE_BUCKETS, "seg_hash")
        .write.mode("overwrite")
        .bucketBy(_SEEN_STATE_BUCKETS, "seg_hash")
        .sortBy("seg_hash")
        .option("path", seen_dir)
        .saveAsTable(state_tbl)
    )

    if arrival_source is None:
        stream = (
            spark.readStream.schema(t["documents"].schema)
            .option("pathGlobFilter", "documents.parquet")
            .parquet(sf_dir)
        )
        if arrival_transform is not None:
            arrivals = arrival_transform(stream)
        else:
            arrivals = stream.filter(
                F.col("doc_id") % SUBSTR_EVERY == 0
            ).select(
                (F.col("doc_id") + F.lit(_DUP_OFFSET)).alias("doc_id"),
                F.concat(
                    F.lit(SUBSTR_SPAN + " "), F.col("text")
                ).alias("text"),
            )
    else:
        reader = spark.readStream.schema("doc_id long, text string")
        if max_files_per_trigger is not None:
            reader = reader.option(
                "maxFilesPerTrigger", str(max_files_per_trigger)
            )
        arrivals = reader.parquet(arrival_source)

    def judge_batch(batch_df: DataFrame, batch_id: int) -> None:
        # re-resolve per tick so files appended by earlier batches are
        # visible; the scan stays bucket-aligned however many appends
        # have landed (more files per bucket, same bucketing)
        index = spark.table(state["tbl"]).select("seg_hash")
        # Segment the batch ONCE per tick: the decisions path builds
        # this byte-identical subtree twice internally (firsts aggregate
        # + flagged join) and the state append a third time — persisting
        # it here tokenizes the batch once, CacheManager substitutes the
        # other reads (guide §1.2 step 1). Plain persist, not
        # scoped_persist: foreachBatch runs on the stream's thread and
        # the scope stack is thread-local.
        segs = segments_of(batch_df).persist()
        try:
            out = incremental_substring_stats(batch_df, index,
                                              anchored=anchored)
            decision_sink(out, batch_id)
            # append this batch's content to the seen state: one row per
            # distinct NEW hash (presence is all later batches need; the
            # anti-join keeps the state duplicate-free, which the presence
            # LEFT join relies on). The state side of the anti-join reads
            # bucket-aligned too — only the batch-sized left side
            # shuffles. Repartitioning on the bucket key before the write
            # aligns rows to buckets so each task emits ONE bucket file
            # (tasks × buckets files otherwise — the write_bucketed
            # lesson), keeping the state's file count bounded by
            # appends, not appends × tasks.
            (
                segs
                .select("seg_hash")
                .distinct()
                .join(index, "seg_hash", "left_anti")
                .repartition(_SEEN_STATE_BUCKETS, "seg_hash")
                .write.mode("append")
                .bucketBy(_SEEN_STATE_BUCKETS, "seg_hash")
                .sortBy("seg_hash")
                .saveAsTable(state["tbl"])
            )
        finally:
            segs.unpersist()
        # the session catalog caches the table's file listing; without
        # an explicit refresh the NEXT tick's scan can serve the
        # pre-append file set and silently re-keep seen content
        spark.catalog.refreshTable(state["tbl"])
        # bounded-file-count story (round-12 verdict #4): appends
        # accumulate files per bucket forever; when the X47 planner
        # says a rewrite is due, swap in a compacted generation
        if compact_files_per_bucket is not None and _seen_state_compaction_due(
            spark, state["tbl"], compact_files_per_bucket
        ):
            state["tbl"], state["dir"] = _compact_seen_state(
                spark, state["tbl"], seen_dir, state["dir"], batch_id
            )

    try:
        with stream_conf(spark):
            q = (
                arrivals.writeStream.foreachBatch(judge_batch)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
    finally:
        # external table: dropping releases the catalog entry; the
        # bucket files in seen_dir stay with their owner (the caller's
        # tempdir at gate scale, durable storage in production)
        spark.sql(f"DROP TABLE IF EXISTS {state['tbl']}")


def _substring_segs_sql() -> str:
    """Shared CTE chain: planted corpus -> positioned segments -> first-
    occurrence ranking (the oracle uses a window; the Spark side uses the
    equivalent min-struct aggregate — same removal decisions)."""
    from arcane_framework_spark.operators.text import SEGMENT_WIDTH
    from arcane_framework_spark.queries import _DUP_OFFSET

    w = SEGMENT_WIDTH
    return f"""
WITH corpus AS (
  SELECT doc_id, source, text FROM documents
  UNION ALL
  SELECT doc_id + {_DUP_OFFSET}, source, '{SUBSTR_SPAN} ' || text
  FROM documents WHERE doc_id % {SUBSTR_EVERY} = 0
),
toks AS (
  SELECT doc_id, source, {_TOKS_SQL} AS ls FROM corpus
  WHERE length(trim(text)) > 0
),
segs AS (
  SELECT doc_id, source, CAST(i - 1 AS BIGINT) AS seg_idx,
         md5(array_to_string(ls[(i - 1) * {w} + 1 : i * {w}], ' ')) AS seg_hash,
         len(ls[(i - 1) * {w} + 1 : i * {w}])::BIGINT AS seg_tokens
  FROM toks,
       LATERAL (SELECT unnest(range(1, CAST(ceil(len(ls) / {w}.0) AS BIGINT) + 1)) AS i)
  WHERE len(ls) > 0
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY seg_hash ORDER BY doc_id, seg_idx) AS rn
  FROM segs
)"""


def _substring_dedup_sql() -> str:
    return _substring_segs_sql() + """
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


def _substring_by_source_sql() -> str:
    return _substring_segs_sql() + """
SELECT source,
       count(DISTINCT doc_id)::BIGINT AS n_docs,
       count(*)::BIGINT AS n_segments,
       sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)::BIGINT AS n_removed_segments,
       sum(CASE WHEN rn > 1 THEN seg_tokens ELSE 0 END)::BIGINT
         AS removed_tokens,
       sum(CASE WHEN rn = 1 THEN seg_tokens ELSE 0 END)::BIGINT
         AS kept_tokens,
       CAST(sum(CASE WHEN rn > 1 THEN seg_tokens ELSE 0 END) * 1000000
            // sum(seg_tokens) AS BIGINT) AS removal_ppm
FROM ranked GROUP BY source
"""


def _incremental_substring_sql() -> str:
    """The batch chain restricted to the arrival rows — the id-ordering
    argument in ``incremental_substring_dedup_documents``'s docstring is
    what makes this literal reuse valid."""
    from arcane_framework_spark.queries import _DUP_OFFSET

    return _substring_segs_sql() + f"""
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


WAVE6_QUERIES = {
    "substring_dedup_documents": substring_dedup_documents,
    "substring_dedup_by_source": substring_dedup_by_source,
    "incremental_substring_dedup_documents":
        incremental_substring_dedup_documents,
    "streaming_substring_dedup": streaming_substring_dedup,
    "substring_span_stats_documents": substring_span_stats_documents,
    "repetition_stats_documents": repetition_stats_documents,
}
