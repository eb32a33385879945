"""Round-14 catalog wave: per-source document caps (domain balancing),
Duffield–Lund–Thorup priority sampling, and a grouping-sets datacard.

Same contract as every other wave module: each entry is a
``(spark, sf_dir) -> DataFrame`` callable plus a DuckDB oracle producing
identical column names and bit-stable values. Cross-engine exactness
notes: the priority key is ``(w · 2³²) / (u + 1)`` — an exact
power-of-two product followed by ONE division, and IEEE division is
correctly rounded on both engines, so the key is bit-identical without
any fixed-point dance (contrast ``pow``/``log``, which are libm-bound
and banned from rank keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from arcane_framework_spark.session import load_tables

# ---------------------------------------------------------------------------
# X188: per-source document cap (domain balancing)
# ---------------------------------------------------------------------------

#: Max documents kept per source — the CCNet/RefinedWeb-style domain
#: balancing knob: no single domain may contribute more than CAP docs
#: to the training mix, chosen by size priority.
SOURCE_CAP = 40

#: Pre-aggregation fan-out for the two-level top-CAP (see below).
_CAP_PREGROUPS = 64


def source_cap_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap with deterministic priority — the domain
    balancer every web-scale mix applies before training: keep at most
    ``SOURCE_CAP`` docs per source, preferring longer docs
    (``n_chars`` DESC, ``doc_id`` tie-break), and report the resulting
    mixture: (source, n_docs, n_kept, kept_chars, dropped_chars,
    share_kept) where share_kept is each source's fraction of the
    post-cap corpus (6dp).

    Scale: a bare ``row_number() OVER (PARTITION BY source)`` would
    funnel EVERY row of a hot domain through one task — at 100 TB a
    single domain can be half the corpus. Instead the rank runs
    two-level: each (source, doc_id % 64) subgroup pre-ranks and keeps
    its own top-CAP (64-way parallel per source), and only the
    surviving ≤ 64·CAP rows per source enter the final per-source
    rank — decision-identical (the global top-CAP of a union is inside
    the union of per-part top-CAPs), with the hot-domain window input
    bounded at 64·CAP rows. The oracle ranks in one window (same
    decisions, gate-scale table).
    """
    t = load_tables(spark, sf_dir, "documents")
    docs = t["documents"].select("doc_id", "source", "n_chars")
    totals = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("__total_chars"),
    )
    order = (F.col("n_chars").desc(), F.col("doc_id"))
    pre_w = Window.partitionBy(
        "source", (F.col("doc_id") % _CAP_PREGROUPS)
    ).orderBy(*order)
    survivors = (
        docs.withColumn("__prk", F.row_number().over(pre_w))
        .filter(F.col("__prk") <= SOURCE_CAP)
        .drop("__prk")
    )
    final_w = Window.partitionBy("source").orderBy(*order)
    kept = (
        survivors.withColumn("__rk", F.row_number().over(final_w))
        .filter(F.col("__rk") <= SOURCE_CAP)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").alias("kept_chars"),
        )
    )
    from arcane_framework_spark.operators.scale import with_broadcast_scalar

    grand = kept.agg(F.sum("kept_chars").alias("__grand"))
    return with_broadcast_scalar(totals.join(kept, "source"), grand).select(
        "source",
        "n_docs",
        "n_kept",
        "kept_chars",
        (F.col("__total_chars") - F.col("kept_chars")).alias("dropped_chars"),
        (
            F.floor(
                F.col("kept_chars").cast("double")
                / F.col("__grand").cast("double")
                * 1e6
                + F.lit(0.5)
            )
            / 1e6
        ).alias("share_kept"),
    )


def _source_cap_sql() -> str:
    return f"""
WITH ranked AS (
  SELECT source, n_chars,
         row_number() OVER (
           PARTITION BY source ORDER BY n_chars DESC, doc_id
         ) AS rk
  FROM documents
),
tot AS (
  SELECT source, count(*)::BIGINT AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS total_chars
  FROM documents GROUP BY source
),
kept AS (
  SELECT source, count(*)::BIGINT AS n_kept,
         CAST(sum(n_chars) AS BIGINT) AS kept_chars
  FROM ranked WHERE rk <= {SOURCE_CAP} GROUP BY source
),
grand AS (SELECT CAST(sum(kept_chars) AS BIGINT) AS g FROM kept)
SELECT tot.source, n_docs, n_kept, kept_chars,
       total_chars - kept_chars AS dropped_chars,
       floor(CAST(kept_chars AS DOUBLE) / CAST(g AS DOUBLE) * 1e6 + 0.5)
         / 1e6 AS share_kept
FROM tot JOIN kept ON tot.source = kept.source, grand
"""


# ---------------------------------------------------------------------------
# X189: priority sampling (Duffield–Lund–Thorup)
# ---------------------------------------------------------------------------

#: Sample size for the priority-sampling entry.
PRIORITY_SAMPLE_K = 64

#: 2^32 — the md5-prefix bucket space (exact power of two: multiplying
#: a weight by it only shifts the exponent, so the subsequent division
#: is the key's ONLY rounding step).
_U_SPACE = 4294967296.0


def _priority_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, source, weight, __q) with the DLT priority key — shared
    by the batch entry and the streaming twin so both rank the
    bit-identical doubles."""
    from arcane_framework_spark.operators.sampling import md5_bucket_expr

    u = md5_bucket_expr("doc_id", "pri", 16 ** 8)
    prio = (F.col("n_chars").cast("double") * F.lit(_U_SPACE)) / (
        (u + F.lit(1)).cast("double")
    )
    return docs.select(
        "doc_id", "source", F.col("n_chars").alias("weight"),
        prio.alias("__q"),
    )


def _priority_finalize(topk1: DataFrame, k: int,
                       cols: tuple = ("doc_id", "source", "weight"),
                       ) -> DataFrame:
    """Sample + estimator weights from a ranked top-(k+1) relation
    (columns ``cols`` + __q + __rk, where ``cols`` must include
    ``weight``) — the shared tail of every DLT entry: τ from the
    (k+1)-th row as a broadcast scalar, output (*cols, priority,
    est_w) at 4dp. The quality-weighted twin (queries_wave9) reuses it
    without a source column."""
    from arcane_framework_spark.operators.scale import with_broadcast_scalar

    tau = topk1.agg(
        F.coalesce(
            F.min(F.when(F.col("__rk") == k + 1, F.col("__q"))),
            F.lit(0.0),
        ).alias("__tau")
    )
    half_up = lambda c, s: F.floor(c * s + F.lit(0.5)) / s  # noqa: E731
    return with_broadcast_scalar(
        topk1.filter(F.col("__rk") <= k), tau
    ).select(
        *cols,
        half_up(F.col("__q"), 1e4).alias("priority"),
        half_up(
            F.greatest(F.col("weight").cast("double"), F.col("__tau")), 1e4
        ).alias("est_w"),
    )


def priority_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement in one pass: DLT priority
    sampling (Duffield, Lund, Thorup 2007). Each doc gets priority
    ``q = w / u`` with weight ``w = n_chars`` and a deterministic
    uniform ``u = (h+1)/2³²`` from the repo's salted md5 contract; the
    sample is the top-``k`` by priority and the threshold ``τ`` is the
    (k+1)-th priority. Every sampled doc carries the unbiased
    subset-sum estimator weight ``max(w, τ)`` — sum any subset's
    ``est_w`` and you estimate that subset's true total weight, the
    property that makes this THE one-pass weighted sample for
    telemetry/mixture estimation at corpus scale.

    Cross-engine exactness: ``q = (w · 2³²) / (h+1)`` — the product is
    exact (power-of-two scale of an integer ≤ 2⁵³), the division is
    IEEE-correctly-rounded on both engines, so ranking keys are
    bit-identical with no fixed-point scaffolding.

    Scale: the global rank plans as a TakeOrderedAndProject — each map
    partition surfaces its own top-(k+1), the driver merges k+1 rows —
    so the single-partition window ranks k+1 rows, never the corpus
    (allowlisted rank-limit-capped in tools/explain_audit.py). τ rides
    back as a 1-row broadcast scalar.

    Output (doc_id, source, weight, priority, est_w), priorities 4dp.
    """
    from arcane_framework_spark.operators.cache import scoped_persist

    k = PRIORITY_SAMPLE_K
    t = load_tables(spark, sf_dir, "documents")
    pr = _priority_rows(t["documents"])
    w = Window.orderBy(F.col("__q").desc(), "doc_id")
    # top-(k+1) feeds BOTH the τ scalar and the sample — persist the
    # (k+1)-row result so the TakeOrdered scan runs once
    topk1 = scoped_persist(
        pr.withColumn("__rk", F.row_number().over(w)).filter(
            F.col("__rk") <= k + 1
        )
    )
    return _priority_finalize(topk1, k)


def _priority_sample_sql() -> str:
    k = PRIORITY_SAMPLE_K
    return f"""
WITH pr AS (
  SELECT doc_id, source, n_chars AS weight,
         (CAST(n_chars AS DOUBLE) * {_U_SPACE!r}) /
         CAST(CAST(concat('0x', substring(
                md5(concat_ws('#', 'pri', CAST(doc_id AS VARCHAR))),
                1, 8)) AS BIGINT) % {16 ** 8} + 1 AS DOUBLE) AS q
  FROM documents
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY q DESC, doc_id) AS rk FROM pr
),
tau AS (
  SELECT coalesce(min(CASE WHEN rk = {k + 1} THEN q END), 0.0) AS tau
  FROM ranked WHERE rk <= {k + 1}
)
SELECT doc_id, source, weight,
       floor(q * 1e4 + 0.5) / 1e4 AS priority,
       floor(greatest(CAST(weight AS DOUBLE), tau) * 1e4 + 0.5) / 1e4
         AS est_w
FROM ranked, tau WHERE rk <= {k}
"""


def run_priority_sample_stream(spark: SparkSession, source_df,
                               k: int = PRIORITY_SAMPLE_K) -> DataFrame:
    """Drain a (doc_id, source, n_chars) arrival stream maintaining the
    DLT top-(k+1) priority state, and return the finished sample.

    The state is the current top-(k+1) rows BY CONSTRUCTION — the same
    k-row boundedness the centroid collects rely on — so it lives as
    driver-held rows merged per micro-batch: each batch contributes its
    own top-(k+1) (a TakeOrderedAndProject over the batch, never a
    corpus sort), the union is re-ranked, and at most k+1 rows survive.
    ``top-(k+1) of a union == top-(k+1) of unions of per-part
    top-(k+1)s`` makes the result independent of batch boundaries and
    arrival order, which is exactly why DLT is the one-pass telemetry
    sampler — and why the streamed sample shares the batch oracle
    verbatim.
    """
    from arcane_framework_spark.queries_ext import stream_conf

    state: list = []  # rows (doc_id, source, weight, __q), ≤ k+1 kept

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        w = Window.orderBy(F.col("__q").desc(), "doc_id")
        batch_top = (
            _priority_rows(batch_df)
            .withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= k + 1)
            .drop("__rk")
            .collect()
        )
        merged = state + [tuple(r) for r in batch_top]
        # same total order as the window: priority DESC, doc_id ASC —
        # on the bit-identical doubles Spark ranked
        merged.sort(key=lambda r: (-r[3], r[0]))
        state[:] = merged[: k + 1]

    with stream_conf(spark):
        q = (
            source_df.writeStream.foreachBatch(merge_batch)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    final = spark.createDataFrame(
        state, "doc_id long, source string, weight long, __q double"
    )
    w = Window.orderBy(F.col("__q").desc(), "doc_id")
    return _priority_finalize(
        final.withColumn("__rk", F.row_number().over(w)), k
    )


def streaming_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of :func:`priority_sample_documents`: the corpus
    arrives as a file stream and the sample is maintained incrementally
    (X191). Decisions are batching-independent (see
    :func:`run_priority_sample_stream`), so this entry hash-checks the
    streamed result against the same DuckDB oracle as the batch entry;
    the multi-batch split equality is asserted in pytest with
    maxFilesPerTrigger=1 arrivals."""
    t = load_tables(spark, sf_dir, "documents")
    stream = (
        spark.readStream.schema(t["documents"].schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    return run_priority_sample_stream(spark, stream)


# ---------------------------------------------------------------------------
# X190: grouping-sets datacard
# ---------------------------------------------------------------------------


def rollup_datacard_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus datacard with subtotals in ONE pass: ``ROLLUP(source,
    lang)`` emits per-(source, lang) rows, per-source subtotals, and
    the grand total — the hierarchy a dataset card publishes — without
    three separate aggregations over the corpus. ``src_total`` /
    ``lang_total`` are the GROUPING markers (1 = that column is rolled
    up in this row) so consumers can filter levels without relying on
    NULL labels.

    Scale: rollup is a single shuffle with map-side partial aggregation
    over (source, lang) — Spark expands the grouping sets BEFORE the
    exchange, so subtotals cost one extra partial-agg row per group,
    not extra passes. avg_chars divides two exact integers as doubles
    (IEEE division — identical on both engines) and rounds 4dp.
    """
    t = load_tables(spark, sf_dir, "documents")
    return (
        t["documents"]
        .rollup("source", "lang")
        .agg(
            # grouping() is only legal inside the rollup's agg list
            F.grouping("source").cast("int").alias("src_total"),
            F.grouping("lang").cast("int").alias("lang_total"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .select(
            "source",
            "lang",
            "src_total",
            "lang_total",
            "n_docs",
            "sum_chars",
            (
                F.floor(
                    F.col("sum_chars").cast("double")
                    / F.col("n_docs").cast("double")
                    * 1e4
                    + F.lit(0.5)
                )
                / 1e4
            ).alias("avg_chars"),
        )
    )


_ROLLUP_DATACARD_SQL = """
SELECT source, lang,
       CAST(GROUPING(source) AS INT) AS src_total,
       CAST(GROUPING(lang) AS INT) AS lang_total,
       count(*)::BIGINT AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       floor(CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             * 1e4 + 0.5) / 1e4 AS avg_chars
FROM documents
GROUP BY ROLLUP(source, lang)
"""


WAVE8_QUERIES = {
    "source_cap_documents": source_cap_documents,
    "priority_sample_documents": priority_sample_documents,
    "streaming_priority_sample": streaming_priority_sample,
    "rollup_datacard_documents": rollup_datacard_documents,
}

WAVE8_ORACLE_SQL = {
    "source_cap_documents": _source_cap_sql(),
    "priority_sample_documents": _priority_sample_sql(),
    # batching-independent top-k ⇒ the streamed sample shares the batch
    # oracle verbatim (see run_priority_sample_stream)
    "streaming_priority_sample": _priority_sample_sql(),
    "rollup_datacard_documents": _ROLLUP_DATACARD_SQL,
}
