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


def dsir_select_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance RESAMPLING: the selection step that completes
    :func:`dsir_weights_documents`.

    Each doc is kept with probability proportional to its
    ``score_per_token`` (capped at 1), targeting an expected budget of
    ``DSIR_BUDGET_PCT`` percent of the corpus — deterministic PPS
    sampling: u = 24-bit integer from an md5 of the salted doc id (salt
    ``sel|`` decorrelates it from the feature-bucket hash), keep iff
    ``u * T < spt * B * 2^24`` where T = sum of all scores and
    B = N * PCT // 100. The comparison is computed in double in BOTH
    engines with identical association order — IEEE multiplication is
    exactly rounded, so identical inputs give identical bits and the
    decision is engine-independent (integers would overflow 2^63 at
    corpus scale: spt*B*2^24 ~ 1e22 at N=1e9).

    Scale: the totals are a 1-row broadcast (same pattern as every
    governed modulus); selection itself is MAP-ONLY over the scored
    table — no global sort, no top-k shuffle, which is the reason PPS
    beats rank-the-corpus selection at 100 TB (the X34 lesson).
    """
    from arcane_framework_spark.operators.scale import with_broadcast_scalar

    scored = _dsir_scored(spark, sf_dir)
    tot = scored.agg(
        F.sum("score_per_token").cast("long").alias("__t"),
        F.expr(
            f"CAST(count(*) * {DSIR_BUDGET_PCT} DIV 100 AS BIGINT)"
        ).alias("__b"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("sel|"), F.col("doc_id").cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % F.lit(DSIR_U_BITS)
    )
    return (
        with_broadcast_scalar(scored, tot)
        .withColumn("__u", u)
        .filter(
            F.col("__u").cast("double") * F.col("__t").cast("double")
            < F.col("score_per_token").cast("double")
            * F.col("__b").cast("double")
            * F.lit(float(DSIR_U_BITS))
        )
        .select("doc_id", "n_tokens", "score_per_token")
    )


def _dsir_core_ctes() -> str:
    """The shared scoring CTE chain (toks/tb/w/scored), for composition."""
    return _DSIR_SQL[_DSIR_SQL.index("WITH") + 4 : _DSIR_SQL.index(
        "SELECT doc_id, n_tokens"
    )].rstrip().rstrip(")") + ")"


_DSIR_SELECT_SQL = rf"""
WITH {_dsir_core_ctes()},
spt AS (
  SELECT doc_id, n_tokens,
         CAST(score // n_tokens AS BIGINT) AS score_per_token
  FROM scored
),
tot AS (
  SELECT CAST(sum(score_per_token) AS BIGINT) AS t,
         CAST(count(*) * {DSIR_BUDGET_PCT} // 100 AS BIGINT) AS b
  FROM spt
)
SELECT doc_id, n_tokens, score_per_token
FROM spt CROSS JOIN tot
WHERE CAST(CAST(concat('0x', substring(
             md5('sel|' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
           % {DSIR_U_BITS} AS DOUBLE) * CAST(t AS DOUBLE)
      < CAST(score_per_token AS DOUBLE) * CAST(b AS DOUBLE)
        * {float(DSIR_U_BITS)}
"""


# ---------------------------------------------------------------------------
# Per-source dedup-rate report (corpus-composition view of the MinHash
# pair machinery). Oracle registered in queries.py (it embeds
# _minhash_sql, which is defined after this module loads).
# ---------------------------------------------------------------------------

#: Jaccard threshold (in tenths) above which a pair counts as a near-dup
#: for the per-source rate — the same 0.8 the incremental-dedup family
#: uses, tested as the exact integer cross-multiplication.
DEDUP_RATE_T10 = 8


def dedup_rate_by_source_documents(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Near-duplication rate per ``source`` — the corpus-composition
    report a data team reads to find WHICH feed is flooding the corpus
    with duplicates (dedup governance, not just dedup execution).

    Composes the shared MinHash-LSH pair machinery on the planted corpus
    (so the rates are non-trivial at gate scale), thresholds pairs at
    Jaccard >= 0.8 via the exact integer test ``ni*10 >= 8*(na+nb-ni)``,
    maps planted ids back to their base doc (the ``_DUP_OFFSET``
    re-insertion is the planting scheme itself, so the inverse is exact
    at planted scales), and reports per source: docs, near-dup members,
    and an integer ppm rate.

    The inverse mapping's validity contract — every REAL ``doc_id`` is
    below ``_DUP_OFFSET`` — is enforced in-plan (``assert_true`` on the
    report side): if the corpus ever grows into the planted-id space the
    entry FAILS LOUDLY instead of silently folding real docs onto wrong
    bases. (The planting helper itself would collide first at that point;
    the guard turns that scale cliff into an explicit error.)

    Scale: pair discovery is the banded bucket join (never all-pairs);
    the member set is distinct doc ids (bounded by the corpus); the
    report is one groupBy(source) over documents left-joined to members.
    """
    from arcane_framework_spark.operators.dedup import minhash_pair_counts
    from arcane_framework_spark.queries import _DUP_OFFSET, _planted_neardup_docs

    t = load_tables(spark, sf_dir, "documents")
    sized = minhash_pair_counts(_planted_neardup_docs(spark, sf_dir))
    hits = sized.filter(
        F.col("ni") * 10
        >= F.lit(DEDUP_RATE_T10) * (F.col("na") + F.col("nb") - F.col("ni"))
    )
    members = (
        hits.select(
            F.explode(F.array(F.col("id_a"), F.col("id_b"))).alias("id")
        )
        .select(
            F.when(
                F.col("id") >= _DUP_OFFSET, F.col("id") - _DUP_OFFSET
            ).otherwise(F.col("id")).alias("doc_id")
        )
        .distinct()
        .withColumn("__dup", F.lit(1))
    )
    # assert_true is NULL for every in-contract row (filter keeps all),
    # and raises the moment a real doc_id enters the planted-id space
    docs = t["documents"].select("doc_id", "source").filter(
        F.assert_true(
            F.col("doc_id") < F.lit(_DUP_OFFSET),
            F.lit(
                f"doc_id >= {_DUP_OFFSET} collides with the planted-dup "
                "id space; the >=offset inverse mapping would mislabel"
            ),
        ).isNull()
    )
    return (
        docs.join(members, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.coalesce(F.col("__dup"), F.lit(0)))
            .cast("long")
            .alias("n_dup_docs"),
        )
        .select(
            "source",
            "n_docs",
            "n_dup_docs",
            F.expr(
                "CAST(n_dup_docs * 1000000 DIV n_docs AS BIGINT)"
            ).alias("dup_rate_ppm"),
        )
    )


def dedup_rate_by_source_sql() -> str:
    """Oracle tail over the shared MinHash ``sized`` CTE (see queries.py
    registration)."""
    from arcane_framework_spark.queries import _DUP_OFFSET, _minhash_sql

    return _minhash_sql(tail=rf"""
,
hits AS (
  SELECT id_a, id_b FROM sized
  WHERE ni * 10 >= {DEDUP_RATE_T10} * (na + nb - ni)
),
mem AS (
  SELECT DISTINCT CASE WHEN id >= {_DUP_OFFSET} THEN id - {_DUP_OFFSET}
                       ELSE id END AS doc_id
  FROM (SELECT id_a AS id FROM hits UNION ALL SELECT id_b FROM hits)
)
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN mem.doc_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_dup_docs,
       CAST(sum(CASE WHEN mem.doc_id IS NOT NULL THEN 1 ELSE 0 END)
            * 1000000 // count(*) AS BIGINT) AS dup_rate_ppm
FROM documents d LEFT JOIN mem USING (doc_id)
GROUP BY d.source
""")


def streaming_dsir_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of DSIR scoring: weights are learned OFFLINE (the
    batch bucket table), then arriving documents are scored ENTIRELY
    per-row — tokens hashed to buckets and weight-summed through a
    4096-entry map literal — so the stream path has no join, no shuffle,
    no state, no watermark: the shape a firehose quality-scorer runs in
    production (model trained offline, applied map-only in-stream).

    The 4096-row weight collect is the same documented bounded-driver
    pattern as the broadcast query matrix (DSIR_BUCKETS is a constant —
    the table CANNOT grow with the corpus). Scores are the identical
    exact longs as :func:`dsir_weights_documents` (same md5 buckets, same
    smoothed integer ratios), so the twin shares its DuckDB oracle
    verbatim — the stream result is hash-checked against the batch SQL.
    """
    from arcane_framework_spark.queries_ext import stream_conf

    t = load_tables(spark, sf_dir, "documents")
    docs = t["documents"].select("doc_id", "text")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
            "tok"
        ),
    ).filter(F.col("tok") != "")
    wtab = (
        toks.select(
            "doc_id",
            (
                F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10)
                .cast("long")
                % F.lit(DSIR_BUCKETS)
            ).alias("b"),
        )
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).alias("__ns"),
            F.sum(
                F.when(
                    F.col("doc_id") % DSIR_TARGET_MOD == 0, 1
                ).otherwise(0)
            ).alias("__nt"),
        )
        .select(
            "b",
            F.expr(
                f"CAST({DSIR_SCALE} * (__nt + 1) DIV (__ns + 1) AS BIGINT)"
            ).alias("__w"),
        )
        .collect()
    )
    wmap = F.map_from_arrays(
        F.array(*[F.lit(int(r["b"])) for r in wtab]),
        F.array(*[F.lit(int(r["__w"])) for r in wtab]),
    )

    stream = (
        spark.readStream.schema(t["documents"].schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    tok_arr = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
        lambda x: x != "",
    )
    bucket = lambda x: (  # noqa: E731 — tiny expression builder
        F.conv(F.substring(F.md5(x), 1, 8), 16, 10).cast("long")
        % F.lit(DSIR_BUCKETS)
    )
    scored = (
        stream.select("doc_id", tok_arr.alias("__toks"))
        .filter(F.size("__toks") > 0)
        .select(
            "doc_id",
            F.size("__toks").cast("long").alias("n_tokens"),
            F.aggregate(
                "__toks",
                F.lit(0).cast("long"),
                lambda acc, x: acc
                + F.coalesce(
                    F.try_element_at(wmap, bucket(x)), F.lit(0).cast("long")
                ),
            ).alias("score"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "score",
            F.expr("CAST(score DIV n_tokens AS BIGINT)").alias(
                "score_per_token"
            ),
        )
    )
    name = "streaming_dsir_scoring_sink"
    with stream_conf(spark):
        q = (
            scored.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


# ---------------------------------------------------------------------------
# Incremental aggregate maintenance from a change feed (the rollup-table
# analog of incremental dedup: apply deltas to a materialized aggregate,
# never re-scan the base).
# ---------------------------------------------------------------------------

#: Deterministic change-feed split of the events table: every 13th event
#: arrives in the DELTA batch (insert op); every 17th BASE event is
#: retracted (delete op referencing an existing row).
ROLLUP_INS_MOD = 13
ROLLUP_DEL_MOD = 17


def incremental_rollup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally MAINTAINED rollup == full recompute — the CDC
    consumer contract (R11/T9) applied to aggregates instead of row
    state: a materialized per-key rollup absorbs a delta batch of
    insert/delete ops by ADDING signed partial aggregates, never
    re-scanning the base table.

    The feed split is deterministic (see ROLLUP_*_MOD); measures are
    per-row cents fixed-point (``floor(value*100 + 0.5)``, the q9
    lesson) so every sum is an exact long in both engines. The Spark
    side computes base_agg ⊕ delta_agg (full-outer merge on the key,
    zero-count keys dropped — a delete can empty a key); the DuckDB
    oracle computes the same rollup by DIRECT GROUP BY over the
    effective row set, so the gate hash-proves the incremental path
    equals the recompute, the same equivalence treatment
    incremental_dedup gets.

    Scale: base_agg is the stored rollup (at 100 TB it is a parquet
    side table, re-aggregated never); the delta batch is tick-sized;
    the merge joins |keys| rows, not |events|.
    """
    t = load_tables(spark, sf_dir, "events")
    ev = t["events"].select(
        "event_id",
        "event_type",
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    base = ev.filter(F.col("event_id") % ROLLUP_INS_MOD != 0)
    ins = ev.filter(F.col("event_id") % ROLLUP_INS_MOD == 0)
    dels = base.filter(F.col("event_id") % ROLLUP_DEL_MOD == 0)

    base_agg = base.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("cents").cast("long").alias("__s"),
    )
    delta = ins.select(
        "event_type", F.lit(1).alias("__w"), F.col("cents")
    ).unionByName(
        dels.select(
            "event_type", F.lit(-1).alias("__w"), F.col("cents")
        )
    )
    delta_agg = delta.groupBy("event_type").agg(
        F.sum("__w").cast("long").alias("__dn"),
        F.sum(F.col("__w") * F.col("cents")).cast("long").alias("__ds"),
    )
    merged = base_agg.join(delta_agg, "event_type", "full_outer").select(
        "event_type",
        (
            F.coalesce(F.col("__n"), F.lit(0))
            + F.coalesce(F.col("__dn"), F.lit(0))
        ).cast("long").alias("n_events"),
        (
            F.coalesce(F.col("__s"), F.lit(0))
            + F.coalesce(F.col("__ds"), F.lit(0))
        ).cast("long").alias("total_cents"),
    )
    return merged.filter(F.col("n_events") > 0).select(
        "event_type",
        "n_events",
        "total_cents",
        F.expr("CAST(total_cents DIV n_events AS BIGINT)").alias(
            "avg_cents"
        ),
    )


_INCREMENTAL_ROLLUP_SQL = rf"""
WITH ev AS (
  SELECT event_id, event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
effective AS (
  -- base rows that were not retracted, plus the delta inserts
  SELECT event_type, cents FROM ev
  WHERE event_id % {ROLLUP_INS_MOD} != 0
    AND NOT (event_id % {ROLLUP_DEL_MOD} = 0)
  UNION ALL
  SELECT event_type, cents FROM ev WHERE event_id % {ROLLUP_INS_MOD} = 0
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(cents) AS BIGINT) AS total_cents,
       CAST(sum(cents) // count(*) AS BIGINT) AS avg_cents
FROM effective
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Multi-probe IVF recall curve: the nprobe knob every IVF deployment tunes
# (probe more cells -> higher recall, proportionally more candidates).
# ---------------------------------------------------------------------------

#: Probe counts swept by the recall curve.
IVF_PROBE_SET = (1, 2, 4)


def ivf_multiprobe_recall_embeddings(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """Recall@k of multi-probe IVF vs exact ground truth, per probe count
    — the measured recall/cost curve behind the nprobe knob (probe-1 is
    `ivf_topk_embeddings`; this quantifies what probing 2 and 4 cells
    buys, the X157/X159 quantified-trade treatment applied to the ANN
    family).

    Corpus vectors keep their probe-1 cell assignment (each appears in
    exactly ONE cell, so multi-probe candidates are duplicate-free by
    construction); each query ranks ALL centroids once and searches its
    top-P cells. Ground truth is exact brute-force top-k over the same
    queries — the query side is a fixed-size set, so the exact scan is
    bounded like lsh_recall's. Output per probe count: (probes, hits,
    possible, recall_ppm) — all exact integers.

    Scale: candidate volume is P·N/k_cells per query; the centroid
    ranking is |Q|·k_cells against a broadcast centroid table; the
    ground-truth scan is |Q|·N with the QUERY side broadcast — every
    join here keeps the corpus un-shuffled.
    """
    from arcane_framework_spark.operators.similarity import (
        dot_expr,
        ivf_assign,
        norm_expr,
    )
    from arcane_framework_spark.queries_ext import (
        IVF_K,
        IVF_NUM_QUERIES,
        IVF_STRIDE,
    )
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir, "embeddings")
    emb = t["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    centroids = emb.filter(F.col("vec_id") % IVF_STRIDE == 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    assigned = ivf_assign(emb, centroids).withColumn(
        "__n", norm_expr(F.col("vec"))
    )
    queries = emb.filter(F.col("vec_id") < IVF_NUM_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        norm_expr(F.col("embedding")).alias("__qn"),
    )
    max_p = max(IVF_PROBE_SET)
    wq = Window.partitionBy("query_id").orderBy(
        F.col("__ccos").desc(), F.col("cid")
    )
    qcells = (
        queries.join(
            F.broadcast(
                centroids.select(
                    "cid", "cvec", norm_expr(F.col("cvec")).alias("__cn")
                )
            )
        )
        .select(
            "query_id",
            "qv",
            "__qn",
            "cid",
            (
                dot_expr(F.col("qv"), F.col("cvec"))
                / (F.col("__qn") * F.col("__cn"))
            ).alias("__ccos"),
        )
        .withColumn("__crn", F.row_number().over(wq))
        .filter(F.col("__crn") <= max_p)
        .drop("__ccos")
    )
    cand = (
        qcells.join(assigned, "cid")
        .filter(F.col("id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            "__crn",
            (
                dot_expr(F.col("qv"), F.col("vec"))
                / (F.col("__qn") * F.col("__n"))
            ).alias("__cos"),
        )
    )
    probed = cand.join(
        F.broadcast(
            spark.createDataFrame(
                [(p,) for p in IVF_PROBE_SET], "probes: int"
            )
        ),
        F.col("__crn") <= F.col("probes"),
    )
    wk = Window.partitionBy("probes", "query_id").orderBy(
        F.col("__cos").desc(), F.col("neighbor_id")
    )
    ivfk = (
        probed.withColumn("__rk", F.row_number().over(wk))
        .filter(F.col("__rk") <= IVF_K)
        .select("probes", "query_id", "neighbor_id")
    )
    wg = Window.partitionBy("query_id").orderBy(
        F.col("__cos").desc(), F.col("neighbor_id")
    )
    from arcane_framework_spark.operators.cache import scoped_persist

    # persisted before the eager count() below so the brute-force |Q|×N
    # ground-truth scan executes ONCE (count + hits join share it);
    # released by the caller's cache_scope
    gt = (
        F.broadcast(queries)
        .join(emb, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                dot_expr(F.col("qv"), F.col("embedding"))
                / (F.col("__qn") * norm_expr(F.col("embedding")))
            ).alias("__cos"),
        )
        .withColumn("__rk", F.row_number().over(wg))
        .filter(F.col("__rk") <= IVF_K)
        .select("query_id", "neighbor_id")
        .transform(scoped_persist)
    )
    probes_df = spark.createDataFrame(
        [(p,) for p in IVF_PROBE_SET], "probes: int"
    )
    hits = (
        ivfk.join(gt, ["query_id", "neighbor_id"])
        .groupBy("probes")
        .agg(F.count(F.lit(1)).cast("long").alias("hits"))
    )
    possible = gt.count()
    return (
        probes_df.join(hits, "probes", "left")
        .select(
            "probes",
            F.coalesce("hits", F.lit(0)).cast("long").alias("hits"),
            F.lit(possible).cast("long").alias("possible"),
            F.expr(
                f"CAST(coalesce(hits, 0) * 1000000 DIV {possible} AS BIGINT)"
            ).alias("recall_ppm"),
        )
    )


def _ivf_multiprobe_sql() -> str:
    from arcane_framework_spark.queries_ext import (
        IVF_K,
        IVF_NUM_QUERIES,
        IVF_STRIDE,
    )

    probes = ", ".join(str(p) for p in IVF_PROBE_SET)
    max_p = max(IVF_PROBE_SET)

    def cos(a: str, b: str) -> str:
        return (
            f"list_dot_product({a}, {b}) / "
            f"(sqrt(list_dot_product({a}, {a})) * "
            f"sqrt(list_dot_product({b}, {b})))"
        )

    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
cent AS (
  SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % {IVF_STRIDE} = 0
),
assigned AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, cent.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {cos('e.v', 'cent.cv')} DESC,
                                       cent.cid) AS rn
    FROM e CROSS JOIN cent) WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, v AS qv FROM e
      WHERE vec_id < {IVF_NUM_QUERIES}),
qcells AS (
  SELECT query_id, qv, cid, crn FROM (
    SELECT q.query_id, q.qv, cent.cid,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {cos('q.qv', 'cent.cv')} DESC,
                                       cent.cid) AS crn
    FROM q CROSS JOIN cent) WHERE crn <= {max_p}
),
cand AS (
  SELECT qc.query_id, a.vec_id AS neighbor_id, qc.crn,
         {cos('qc.qv', 'a.v')} AS c
  FROM qcells qc JOIN assigned a ON qc.cid = a.cid
  WHERE a.vec_id <> qc.query_id
),
pr AS (SELECT unnest([{probes}])::INT AS probes),
ivfk AS (
  SELECT probes, query_id, neighbor_id FROM (
    SELECT pr.probes, cand.query_id, cand.neighbor_id,
           row_number() OVER (PARTITION BY pr.probes, cand.query_id
                              ORDER BY cand.c DESC,
                                       cand.neighbor_id) AS rk
    FROM cand JOIN pr ON cand.crn <= pr.probes)
  WHERE rk <= {IVF_K}
),
gt AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {cos('q.qv', 'e.v')} DESC,
                                       e.vec_id) AS rk
    FROM q JOIN e ON e.vec_id <> q.query_id)
  WHERE rk <= {IVF_K}
),
hits AS (
  SELECT probes, CAST(count(*) AS BIGINT) AS hits
  FROM ivfk JOIN gt USING (query_id, neighbor_id)
  GROUP BY probes
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS possible FROM gt)
SELECT pr.probes,
       CAST(coalesce(hits.hits, 0) AS BIGINT) AS hits,
       tot.possible,
       CAST(coalesce(hits.hits, 0) * 1000000 // tot.possible AS BIGINT)
         AS recall_ppm
FROM pr LEFT JOIN hits USING (probes) CROSS JOIN tot
"""


# ---------------------------------------------------------------------------
# Incremental semantic dedup: a new embedding batch pruned against the
# EXISTING corpus's cells — no re-clustering, the embedding-modality
# analog of incremental_dedup_documents.
# ---------------------------------------------------------------------------


def incremental_semantic_dedup_embeddings(spark: SparkSession,
                                          sf_dir: str) -> DataFrame:
    """New embedding batch deduped against the existing corpus WITHOUT
    re-clustering: corpus vectors keep their cell assignments (in
    production a materialized side table, like the incremental-dedup
    signature table), the arriving batch is assigned to the SAME frozen
    codebook (broadcast), and a new vector is pruned when some corpus
    cell-mate has cosine >= the SemDeDup threshold. Corpus members are
    never re-judged — exactly the asymmetry a daily-ingest pipeline
    wants (the corpus is settled; only arrivals are questioned).

    Batch = the planted near-dup twins (vec_id % NEARDUP_EVERY == 0,
    first dimension shifted by NEARDUP_DELTA — same planting as the LSH
    family, so most arrivals DO have a corpus near-dup and the decision
    table is non-trivial at gate scale). Codebook = the deterministic
    corpus stride (IVF_STRIDE), standing in for the frozen k-means
    centroids like ivf_topk's.

    Output per arrival: (vec_id, cid, pruned). Scale: one broadcast
    assignment per side, one cid-keyed join of the (tiny) batch against
    corpus cells — the corpus is scanned once and never shuffled
    against itself; nothing re-clusters.
    """
    from arcane_framework_spark.operators.similarity import (
        dot_expr,
        ivf_assign,
        norm_expr,
    )
    from arcane_framework_spark.queries_ext import (
        EMBEDDING_DIM,
        IVF_STRIDE,
        NEARDUP_DELTA,
        NEARDUP_EVERY,
        SEMDEDUP_TAU,
        _DUP_OFFSET,
    )

    t = load_tables(spark, sf_dir, "embeddings")
    emb = t["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    cent = emb.filter(F.col("vec_id") % IVF_STRIDE == 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    newb = emb.filter(F.col("vec_id") % NEARDUP_EVERY == 0).select(
        (F.col("vec_id") + F.lit(_DUP_OFFSET)).alias("vec_id"),
        F.concat(
            F.array(
                F.get(F.col("embedding"), 0) + F.lit(NEARDUP_DELTA)
            ),
            F.slice(F.col("embedding"), 2, EMBEDDING_DIM - 1),
        ).alias("embedding"),
    )
    corpus_cells = ivf_assign(emb, cent).withColumn(
        "__n", norm_expr(F.col("vec"))
    )
    new_cells = ivf_assign(newb, cent).withColumn(
        "__n", norm_expr(F.col("vec"))
    )
    pair_cos = F.round(
        dot_expr(F.col("nv"), F.col("cv")) / (F.col("nn") * F.col("cn")), 6
    )
    pruned = (
        new_cells.select(
            F.col("id").alias("vec_id"),
            "cid",
            F.col("vec").alias("nv"),
            F.col("__n").alias("nn"),
        )
        .join(
            corpus_cells.select(
                "cid", F.col("vec").alias("cv"), F.col("__n").alias("cn")
            ),
            "cid",
        )
        .filter(pair_cos >= F.lit(SEMDEDUP_TAU))
        .select("vec_id")
        .distinct()
        .withColumn("__p", F.lit(True))
    )
    return (
        new_cells.select(F.col("id").alias("vec_id"), "cid")
        .join(pruned, "vec_id", "left")
        .select(
            "vec_id", "cid", F.coalesce("__p", F.lit(False)).alias("pruned")
        )
    )


def _incremental_semantic_sql() -> str:
    from arcane_framework_spark.queries_ext import (
        IVF_STRIDE,
        NEARDUP_DELTA,
        NEARDUP_EVERY,
        SEMDEDUP_TAU,
        _DUP_OFFSET,
    )

    def cos(a: str, b: str) -> str:
        return (
            f"list_dot_product({a}, {b}) / "
            f"(sqrt(list_dot_product({a}, {a})) * "
            f"sqrt(list_dot_product({b}, {b})))"
        )

    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
cent AS (
  SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % {IVF_STRIDE} = 0
),
newb AS (
  SELECT vec_id + {_DUP_OFFSET} AS vec_id,
         list_concat([v[1] + {NEARDUP_DELTA}], v[2:]) AS v
  FROM e WHERE vec_id % {NEARDUP_EVERY} = 0
),
corpus_cells AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, cent.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {cos('e.v', 'cent.cv')} DESC,
                                       cent.cid) AS rn
    FROM e CROSS JOIN cent) WHERE rn = 1
),
new_cells AS (
  SELECT vec_id, v, cid FROM (
    SELECT n.vec_id, n.v, cent.cid,
           row_number() OVER (PARTITION BY n.vec_id
                              ORDER BY {cos('n.v', 'cent.cv')} DESC,
                                       cent.cid) AS rn
    FROM newb n CROSS JOIN cent) WHERE rn = 1
),
pruned AS (
  SELECT DISTINCT n.vec_id
  FROM new_cells n JOIN corpus_cells c ON n.cid = c.cid
  WHERE round({cos('n.v', 'c.v')}, 6) >= {SEMDEDUP_TAU}
)
SELECT n.vec_id, n.cid, (p.vec_id IS NOT NULL) AS pruned
FROM new_cells n LEFT JOIN pruned p USING (vec_id)
"""


def embedding_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-table hygiene audit: vector count, zero-norm vectors
    (cosine is undefined on them — the NULL-cosine source every ANN
    operator upstream has to guard), unit-normalized fraction (|norm-1|
    <= 1e-3, detects whether the embedder already L2-normalized), and
    the rounded norm range. The embedding-modality counterpart of
    encoding_audit_documents: the one-pass gate a pipeline runs before
    pointing dedup/ANN at a new embedding dump.

    Map-only until a 1-row aggregate; norms are sqrt (IEEE-exact both
    engines), comparisons on rounded values.
    """
    from arcane_framework_spark.operators.similarity import norm_expr

    t = load_tables(spark, sf_dir, "embeddings")
    emb = t["embeddings"].select(
        F.col("embedding").cast("array<double>").alias("v")
    )
    norms = emb.select(F.round(norm_expr(F.col("v")), 6).alias("nm"))
    return norms.agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.sum(F.when(F.col("nm") == 0.0, 1).otherwise(0))
        .cast("long")
        .alias("n_zero_norm"),
        F.sum(
            F.when(F.abs(F.col("nm") - 1.0) <= 0.001, 1).otherwise(0)
        ).cast("long").alias("n_unit"),
        F.round(F.min("nm"), 6).alias("min_norm"),
        F.round(F.max("nm"), 6).alias("max_norm"),
    ).select(
        "n_vectors",
        "n_zero_norm",
        "n_unit",
        F.expr("CAST(n_unit * 1000000 DIV n_vectors AS BIGINT)").alias(
            "unit_ppm"
        ),
        "min_norm",
        "max_norm",
    )


_NORM_AUDIT_SQL = """
WITH norms AS (
  SELECT round(sqrt(list_dot_product(v, v)), 6) AS nm
  FROM (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_vectors,
         CAST(sum(CASE WHEN nm = 0.0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_zero_norm,
         CAST(sum(CASE WHEN abs(nm - 1.0) <= 0.001 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_unit,
         round(min(nm), 6) AS min_norm,
         round(max(nm), 6) AS max_norm
  FROM norms
)
SELECT n_vectors, n_zero_norm, n_unit,
       CAST(n_unit * 1000000 // n_vectors AS BIGINT) AS unit_ppm,
       min_norm, max_norm
FROM agg
"""


def lsh_precision_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate PRECISION of the MinHash-LSH banding — the complement of
    lsh_recall_documents: of all banded candidate pairs, how many survive
    exact Jaccard verification at each sweep threshold. Low precision
    means the bands are wasting verification work (too few rows per
    band / too many bands); the pair a data team reads next to the
    recall number when tuning the banding. Integer threshold test,
    ppm output — all exact.
    """
    from arcane_framework_spark.operators.dedup import minhash_pair_counts
    from arcane_framework_spark.queries import (
        SWEEP_T10S,
        _planted_neardup_docs,
    )

    from arcane_framework_spark.operators.cache import scoped_persist

    sized = minhash_pair_counts(_planted_neardup_docs(spark, sf_dir))
    cand = sized.select(
        "id_a",
        "id_b",
        "ni",
        (F.col("na") + F.col("nb") - F.col("ni")).alias("__u"),
    ).transform(scoped_persist)
    n_cand = cand.count()
    swept = cand.select(
        F.explode(F.array(*[F.lit(t) for t in SWEEP_T10S])).alias("t10"),
        "ni",
        "__u",
    )
    out = (
        swept.groupBy("t10")
        .agg(
            F.sum(
                F.when(F.col("ni") * 10 >= F.col("t10") * F.col("__u"), 1)
                .otherwise(0)
            ).cast("long").alias("n_verified"),
        )
        .select(
            (F.col("t10") * 10).cast("int").alias("threshold_pct"),
            F.lit(n_cand).cast("long").alias("n_candidates"),
            "n_verified",
            F.expr(
                f"CAST(n_verified * 1000000 DIV {max(n_cand, 1)} AS BIGINT)"
            ).alias("precision_ppm"),
        )
    )
    # cache released by the caller's cache_scope (scoped_persist): the
    # returned plan still READS the cached candidates — an eager
    # unpersist here would force the whole pair machinery to recompute
    # at execution time.
    return out


def lsh_precision_sql() -> str:
    """Oracle tail over the shared MinHash ``sized`` CTE (registered in
    queries.py beside dedup_rate_by_source)."""
    from arcane_framework_spark.queries import SWEEP_T10S, _minhash_sql

    t10s = ", ".join(str(t) for t in SWEEP_T10S)
    return _minhash_sql(tail=rf"""
,
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_candidates FROM sized)
SELECT (t10 * 10)::INT AS threshold_pct,
       tot.n_candidates,
       CAST(sum(CASE WHEN ni * 10 >= t10 * (na + nb - ni)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_verified,
       CAST(sum(CASE WHEN ni * 10 >= t10 * (na + nb - ni)
                     THEN 1 ELSE 0 END) * 1000000
            // greatest(tot.n_candidates, 1) AS BIGINT) AS precision_ppm
FROM sized CROSS JOIN (SELECT unnest([{t10s}]) AS t10) CROSS JOIN tot
GROUP BY t10, tot.n_candidates
""")


def token_histogram_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed token-length histogram per source — the
    sequence-length profile a packing/curriculum planner reads before
    choosing a context length (how much of each feed lands in the
    512-1023 bucket vs the tails). Bucket = floor(log2(n_tokens))
    computed EXACTLY as ``length(bin(n_tokens)) - 1`` (binary-string
    length, identical in Spark and DuckDB — no libm log anywhere);
    empty docs land in bucket 0 alongside length-1 docs by that same
    convention (bin(0)='0'). Map-only to a (source × ~12 buckets)
    aggregate; token sums are exact longs.
    """
    from arcane_framework_spark.operators.text import token_count_expr

    t = load_tables(spark, sf_dir, "documents")
    d = t["documents"].select(
        "source", token_count_expr("text").alias("n_tokens")
    )
    return (
        d.select(
            "source",
            "n_tokens",
            (F.length(F.bin(F.col("n_tokens"))) - 1)
            .cast("int")
            .alias("log2_bucket"),
        )
        .groupBy("source", "log2_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
    )


_TOKEN_HISTOGRAM_SQL = rf"""
WITH d AS (
  SELECT source,
         CASE WHEN len(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(lower(trim(text)), '\s+'))
         END::BIGINT AS n_tokens
  FROM documents
)
SELECT source,
       (length(bin(n_tokens)) - 1)::INT AS log2_bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens
FROM d
GROUP BY source, (length(bin(n_tokens)) - 1)::INT
"""


def minhash_calibration_documents(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """MinHash estimator CALIBRATION: for every banded candidate pair,
    the 16-permutation signature agreement count vs the exact shingle
    Jaccard, aggregated per agreement level — the measured answer to
    "how biased is est=agree/16 on OUR corpus", which is what decides
    whether the estimator-verified incremental path
    (incremental_minhash_pairs) can replace exact verification at a
    given threshold. Output per agree count: pair count, the implied
    estimate (ppm), and the mean exact Jaccard (ppm, integer mean of
    per-pair integer ppms — no float summation anywhere).

    Scale: candidates come from the banded bucket join; the signature
    join adds two hash joins on doc id against the (already derived)
    16-column signature table.
    """
    from arcane_framework_spark.operators.dedup import (
        NUM_HASHES,
        minhash_pair_counts,
        minhash_signatures,
    )
    from arcane_framework_spark.queries import _planted_neardup_docs

    corpus = _planted_neardup_docs(spark, sf_dir)
    sized = minhash_pair_counts(corpus)
    sigs = minhash_signatures(corpus)
    sa = sigs.select(
        F.col("id").alias("id_a"),
        *[F.col(f"s{i}").alias(f"__a{i}") for i in range(NUM_HASHES)],
    )
    sb = sigs.select(
        F.col("id").alias("id_b"),
        *[F.col(f"s{i}").alias(f"__b{i}") for i in range(NUM_HASHES)],
    )
    agree = sum(
        F.when(F.col(f"__a{i}") == F.col(f"__b{i}"), 1).otherwise(0)
        for i in range(NUM_HASHES)
    )
    cal = (
        sized.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            agree.cast("int").alias("agree16"),
            F.expr(
                "CAST(ni * 1000000 DIV (na + nb - ni) AS BIGINT)"
            ).alias("__jppm"),
        )
    )
    return cal.groupBy("agree16").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.expr(
            f"CAST(first(agree16) * 1000000 DIV {NUM_HASHES} AS BIGINT)"
        ).alias("est_jaccard_ppm"),
        F.expr("CAST(sum(__jppm) DIV count(*) AS BIGINT)").alias(
            "mean_true_jaccard_ppm"
        ),
    )


def minhash_calibration_sql() -> str:
    """Oracle tail over the shared MinHash ``sig``/``sized`` CTEs
    (registered in queries.py)."""
    from arcane_framework_spark.operators.dedup import NUM_HASHES
    from arcane_framework_spark.queries import _minhash_sql

    return _minhash_sql(tail=rf"""
,
cal AS (
  SELECT len(list_filter(range(1, {NUM_HASHES + 1}),
                         i -> sa.sig[i] = sb.sig[i]))::INT AS agree16,
         s.ni * 1000000 // (s.na + s.nb - s.ni) AS j_ppm
  FROM sized s
  JOIN sig sa ON sa.doc_id = s.id_a
  JOIN sig sb ON sb.doc_id = s.id_b
)
SELECT agree16,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(agree16 * 1000000 // {NUM_HASHES} AS BIGINT) AS est_jaccard_ppm,
       CAST(sum(j_ppm) // count(*) AS BIGINT) AS mean_true_jaccard_ppm
FROM cal GROUP BY agree16
""")


def pretrain_funnel_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole pretraining prep pipeline as ONE DataFrame program, with
    a funnel row per stage: raw -> Gopher quality rules -> exact dedup
    (md5 fingerprint, keep min doc_id) -> near-dup prune (MinHash-LSH
    pairs at Jaccard >= 0.8, drop the greater id when a surviving lesser
    cell-mate exists). Every stage reuses the catalog's single-purpose
    machinery — the showpiece that a user's end-to-end prep run is the
    COMPOSITION of gated operators, not a separate code path.

    The near-dup stage is the greedy lowest-id keep over verified pairs
    among exact-stage survivors (well-defined in one pass; the full
    transitive-closure variant is dedup_clusters/dedup_canonical). Token
    counts per stage use the quality funnel's exact integer definition.

    Scale: one map pass for features/flags, the banded pair machinery
    (never all-pairs), one anti-join per pruning stage; at 100 TB each
    stage materializes to parquet between runs — the funnel numbers are
    the cheap byproduct of the same plan.
    """
    from arcane_framework_spark.operators.dedup import minhash_pair_counts
    from arcane_framework_spark.operators.text import (
        _with_token_barrier,
        quality_rules_exprs,
    )
    from arcane_framework_spark.queries import _planted_neardup_docs
    from pyspark.sql import Window

    corpus = _planted_neardup_docs(spark, sf_dir)
    feat = _with_token_barrier(corpus, "text")
    rules = quality_rules_exprs(F.col("__toks"), "text")
    n_tokens = F.when(F.length(F.trim(F.col("text"))) == 0, F.lit(0)) \
        .otherwise(F.size(F.col("__toks"))).cast("long")
    feat = feat.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.md5(F.col("text")).alias("__fp"),
        (rules["pass_len"] & rules["pass_wordlen"] & rules["pass_stop"])
        .alias("__keep"),
    ).transform(lambda d: d.persist())
    q = feat.filter(F.col("__keep"))
    ex = (
        q.withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("__fp").orderBy("doc_id")
            ),
        )
        .filter(F.col("__rn") == 1)
        .select("doc_id", "n_tokens")
        .transform(lambda d: d.persist())
    )
    sized = minhash_pair_counts(corpus)
    verified = sized.filter(
        F.col("ni") * 10
        >= F.lit(DEDUP_RATE_T10) * (F.col("na") + F.col("nb") - F.col("ni"))
    )
    drop_ids = (
        verified.join(
            ex.select(F.col("doc_id").alias("id_a")), "id_a", "semi"
        )
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    nd = ex.join(drop_ids, "doc_id", "anti")

    def stage(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.coalesce(F.sum("n_tokens"), F.lit(0))
            .cast("long")
            .alias("n_tokens"),
        ).select("stage", "n_docs", "n_tokens")

    out = (
        stage("stage1_raw", feat)
        .unionByName(stage("stage2_quality", q))
        .unionByName(stage("stage3_exact", ex))
        .unionByName(stage("stage4_neardup", nd))
    )
    result = out.localCheckpoint()
    feat.unpersist()
    ex.unpersist()
    return result


def pretrain_funnel_sql() -> str:
    """Oracle tail over the shared MinHash CTEs (registered in queries.py):
    `corpus` and `sized` come from _minhash_sql; the quality flags are the
    quality_filter oracle's exact expressions applied to `corpus`."""
    from arcane_framework_spark.operators.text import (
        QUALITY_MAX_MEAN_WORD_LEN,
        QUALITY_MAX_TOKENS,
        QUALITY_MIN_STOPWORD_HITS,
        QUALITY_MIN_TOKENS,
        STOPWORDS,
    )
    from arcane_framework_spark.queries import _minhash_sql

    swlist = ", ".join(f"'{w}'" for w in STOPWORDS)
    return _minhash_sql(tail=rf"""
,
feat AS (
  SELECT doc_id,
         CASE WHEN len(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(lower(trim(text)), '\s+'))
         END::BIGINT AS n_tokens,
         len(regexp_replace(trim(text), '\s+', '', 'g'))::DOUBLE AS squeezed,
         len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         t -> t IN ({swlist}))) AS sw_hits,
         md5(text) AS fp
  FROM corpus
),
q AS (
  SELECT doc_id, n_tokens, fp FROM feat
  WHERE n_tokens >= {QUALITY_MIN_TOKENS} AND n_tokens <= {QUALITY_MAX_TOKENS}
    AND squeezed / greatest(n_tokens, 1)::DOUBLE
        <= {QUALITY_MAX_MEAN_WORD_LEN}::DOUBLE
    AND sw_hits >= {QUALITY_MIN_STOPWORD_HITS}
),
ex AS (
  SELECT doc_id, n_tokens FROM (
    SELECT doc_id, n_tokens,
           row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
    FROM q) WHERE rn = 1
),
nd AS (
  SELECT e.doc_id, e.n_tokens FROM ex e
  WHERE NOT EXISTS (
    SELECT 1 FROM sized s JOIN ex a ON a.doc_id = s.id_a
    WHERE s.id_b = e.doc_id
      AND s.ni * 10 >= {DEDUP_RATE_T10} * (s.na + s.nb - s.ni))
)
SELECT stage, n_docs, n_tokens FROM (
  SELECT 'stage1_raw' AS stage, count(*)::BIGINT AS n_docs,
         CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS n_tokens FROM feat
  UNION ALL
  SELECT 'stage2_quality', count(*)::BIGINT,
         CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM q
  UNION ALL
  SELECT 'stage3_exact', count(*)::BIGINT,
         CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM ex
  UNION ALL
  SELECT 'stage4_neardup', count(*)::BIGINT,
         CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM nd
)
""")


def run_semantic_dedup_stream(spark: SparkSession, sf_dir: str,
                              decision_sink) -> None:
    """Drive the availableNow semantic-dedup arrival stream, delivering
    each micro-batch's DECISIONS DataFrame ``(vec_id, cid, pruned)`` to
    ``decision_sink(df, batch_id)`` — the production seam: pass
    ``ParquetStreamSink(path).foreach_batch()`` (K1) and the stream writes the
    protocol parquet layout; the gate entry passes a driver accumulator
    (arrivals are tick-sized by construction). Both paths run the SAME
    per-batch plan; the K1 route is executed in
    ``tests/test_wave5.py::test_streaming_semantic_dedup_k1_parquet_sink``.
    """
    from arcane_framework_spark.operators.similarity import (
        dot_expr,
        ivf_assign,
        norm_expr,
    )
    from arcane_framework_spark.queries_ext import (
        EMBEDDING_DIM,
        IVF_STRIDE,
        NEARDUP_DELTA,
        NEARDUP_EVERY,
        SEMDEDUP_TAU,
        _DUP_OFFSET,
        stream_conf,
    )

    t = load_tables(spark, sf_dir, "embeddings")
    emb = t["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    cent = emb.filter(F.col("vec_id") % IVF_STRIDE == 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    corpus_cells = (
        ivf_assign(emb, cent)
        .withColumn("__n", norm_expr(F.col("vec")))
        .select("cid", F.col("vec").alias("cv"), F.col("__n").alias("cn"))
        .persist()
    )
    corpus_cells.count()

    stream = (
        spark.readStream.schema(t["embeddings"].schema)
        .option("pathGlobFilter", "embeddings.parquet")
        .parquet(sf_dir)
    )
    arrivals = stream.filter(F.col("vec_id") % NEARDUP_EVERY == 0).select(
        (F.col("vec_id") + F.lit(_DUP_OFFSET)).alias("vec_id"),
        F.concat(
            F.array(
                F.get(F.col("embedding").cast("array<double>"), 0)
                + F.lit(NEARDUP_DELTA)
            ),
            F.slice(
                F.col("embedding").cast("array<double>"),
                2,
                EMBEDDING_DIM - 1,
            ),
        ).alias("embedding"),
    )

    def judge_batch(batch_df: DataFrame, batch_id: int) -> None:
        new_cells = ivf_assign(batch_df, cent).withColumn(
            "__n", norm_expr(F.col("vec"))
        )
        pair_cos = F.round(
            dot_expr(F.col("nv"), F.col("cv")) / (F.col("nn") * F.col("cn")),
            6,
        )
        pruned = (
            new_cells.select(
                F.col("id").alias("vec_id"),
                "cid",
                F.col("vec").alias("nv"),
                F.col("__n").alias("nn"),
            )
            .join(corpus_cells, "cid")
            .filter(pair_cos >= F.lit(SEMDEDUP_TAU))
            .select("vec_id")
            .distinct()
            .withColumn("__p", F.lit(True))
        )
        out = (
            new_cells.select(F.col("id").alias("vec_id"), "cid")
            .join(pruned, "vec_id", "left")
            .select(
                "vec_id",
                "cid",
                F.coalesce("__p", F.lit(False)).alias("pruned"),
            )
        )
        decision_sink(out, batch_id)

    try:
        with stream_conf(spark):
            q = (
                arrivals.writeStream.foreachBatch(judge_batch)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
    finally:
        corpus_cells.unpersist()


def streaming_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of incremental semantic dedup, built on
    ``foreachBatch`` — the pattern for per-batch logic that needs full
    relational ops (argmax assignment, joins) a stateless stream cannot
    express and a stateful one should not hold state for: each arriving
    micro-batch is assigned to the FROZEN corpus codebook and pruned
    against the static corpus cell table, exactly the batch operator,
    then appended to the sink. Decisions depend only on (arrival, static
    corpus), so the result is independent of how the stream slices into
    batches — which is what lets the twin share the batch entry's oracle
    verbatim (and is asserted across a forced multi-batch split in the
    tests).

    The static corpus cell table is persisted ONCE before the stream
    starts (a stream re-evaluates its static side per micro-batch
    otherwise — the streaming_incremental_dedup lesson); at 100 TB it is
    the materialized side table the batch twin documents. The gate
    entry's sink is a driver accumulator (arrivals are tick-sized by
    construction, so the accumulation is one tick's decisions, not
    unbounded); the production sink is K1's ``foreach_batch`` parquet
    adapter through the SAME ``run_semantic_dedup_stream`` seam —
    executed, not asserted, in
    ``test_streaming_semantic_dedup_k1_parquet_sink``.
    """
    acc: list = []
    run_semantic_dedup_stream(
        spark, sf_dir, lambda out, _bid: acc.extend(out.collect())
    )
    return spark.createDataFrame(
        acc, "vec_id: long, cid: long, pruned: boolean"
    )


WAVE5_QUERIES = {
    "dsir_weights_documents": dsir_weights_documents,
    "dsir_select_documents": dsir_select_documents,
    "dedup_rate_by_source_documents": dedup_rate_by_source_documents,
    "streaming_dsir_scoring": streaming_dsir_scoring,
    "incremental_rollup_events": incremental_rollup_events,
    "ivf_multiprobe_recall_embeddings": ivf_multiprobe_recall_embeddings,
    "incremental_semantic_dedup_embeddings":
        incremental_semantic_dedup_embeddings,
    "streaming_semantic_dedup": streaming_semantic_dedup,
    "embedding_norm_audit": embedding_norm_audit,
    "lsh_precision_documents": lsh_precision_documents,
    "pretrain_funnel_documents": pretrain_funnel_documents,
    "token_histogram_documents": token_histogram_documents,
    "minhash_calibration_documents": minhash_calibration_documents,
}

WAVE5_ORACLE_SQL: dict[str, str] = {
    "dsir_weights_documents": _DSIR_SQL,
    "dsir_select_documents": _DSIR_SELECT_SQL,
    # The streaming twin emits the identical exact longs as the batch
    # scorer (same buckets, same ratios, map-only application) — it
    # shares the batch oracle verbatim.
    "streaming_dsir_scoring": _DSIR_SQL,
    "incremental_rollup_events": _INCREMENTAL_ROLLUP_SQL,
    "ivf_multiprobe_recall_embeddings": _ivf_multiprobe_sql(),
    "incremental_semantic_dedup_embeddings": _incremental_semantic_sql(),
    # foreachBatch twin: batch-split-independent decisions (arrival vs
    # static corpus only) — shares the batch oracle verbatim.
    "streaming_semantic_dedup": _incremental_semantic_sql(),
    "embedding_norm_audit": _NORM_AUDIT_SQL,
    "token_histogram_documents": _TOKEN_HISTOGRAM_SQL,
    # lsh_precision_documents and pretrain_funnel_documents registered in
    # queries.py (their oracles embed _minhash_sql)
}
