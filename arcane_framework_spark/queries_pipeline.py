"""Round-5 training-pipeline queries: corpus boilerplate accounting,
cross-source overlap, deterministic training order, vocabulary coverage,
volume anomaly detection, and mixture epoch budgeting.

Same contract as queries.py: every Spark query has a DuckDB oracle with
identical column names, rounding (floor(x*10^n + 0.5)/10^n), and hash
functions (md5).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arcane_framework_spark.operators.decontam import (
    OVERLAP_NGRAM_WIDTH,
    source_overlap,
)
from arcane_framework_spark.operators.sampling import (
    epoch_allocation,
    interleaved_order,
)
from arcane_framework_spark.operators.temporal import (
    ANOMALY_TOP_K,
    hourly_anomaly,
)
from arcane_framework_spark.operators.text import (
    BIGRAM_MIN_COUNT,
    BIGRAM_TOP_K,
    BOILERPLATE_MIN_DOCS,
    SEGMENT_WIDTH,
    VOCAB_SIZE,
    boilerplate_segment_stats,
    token_count_expr,
    vocab_coverage,
)
from arcane_framework_spark.session import load_tables, ts_micros, ts_timestamp

#: Whitespace tokenizer, DuckDB spelling (mirrors text.tokens_expr).
#: One shared definition in sqlconst.py (regexp_split_to_array and
#: string_split_regex are DuckDB aliases — values are identical).
from arcane_framework_spark.sqlconst import TOKS_SQL as _TOKS_SQL  # noqa: E402

#: Training-order shuffle seed (an epoch id in a real pipeline).
ORDER_SEED = "epoch0"

#: Token budget for the mixture allocation query (~10x the sf0.1 corpus).
EPOCH_BUDGET_TOKENS = 10_000_000


def boilerplate_segments_documents(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Per-doc boilerplate share under C4-style corpus line dedup, with
    non-overlapping 8-token segments standing in for lines
    (operators/text.py boilerplate_segment_stats)."""
    t = load_tables(spark, sf_dir, "documents")
    return boilerplate_segment_stats(t["documents"])


_BOILERPLATE_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_SQL} AS ls FROM documents
  WHERE length(trim(text)) > 0
),
segs AS (
  SELECT doc_id,
         md5(array_to_string(ls[(i - 1) * {SEGMENT_WIDTH} + 1 : i * {SEGMENT_WIDTH}], ' ')) AS seg_hash,
         len(ls[(i - 1) * {SEGMENT_WIDTH} + 1 : i * {SEGMENT_WIDTH}]) AS seg_tokens
  FROM toks,
       LATERAL (SELECT unnest(range(1, CAST(ceil(len(ls) / {SEGMENT_WIDTH}.0) AS BIGINT) + 1)) AS i)
  WHERE len(ls) > 0
),
boiler AS (
  SELECT seg_hash FROM segs GROUP BY seg_hash
  HAVING count(DISTINCT doc_id) >= {BOILERPLATE_MIN_DOCS}
),
flagged AS (
  SELECT s.doc_id, s.seg_tokens, (b.seg_hash IS NOT NULL) AS is_b
  FROM segs s LEFT JOIN boiler b USING (seg_hash)
)
SELECT doc_id,
       count(*)::BIGINT AS n_segments,
       SUM(CASE WHEN is_b THEN 1 ELSE 0 END)::BIGINT AS n_boiler_segments,
       floor(SUM(CASE WHEN is_b THEN seg_tokens ELSE 0 END)::DOUBLE
             / SUM(seg_tokens) * 1e4 + 0.5) / 1e4 AS boiler_token_frac,
       (SUM(seg_tokens)
        - SUM(CASE WHEN is_b THEN seg_tokens ELSE 0 END))::BIGINT AS kept_tokens
FROM flagged GROUP BY doc_id
"""


def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cross-source 3-gram containment matrix — which corpus
    slices duplicate each other (operators/decontam.py source_overlap)."""
    t = load_tables(spark, sf_dir, "documents")
    return source_overlap(t["documents"])


_SOURCE_OVERLAP_SQL = f"""
WITH toks AS (
  SELECT source, {_TOKS_SQL} AS ls FROM documents
),
grams AS (
  SELECT DISTINCT source,
         md5(array_to_string(ls[i : i + {OVERLAP_NGRAM_WIDTH - 1}], ' ')) AS gram_hash
  FROM toks,
       LATERAL (SELECT unnest(range(1, len(ls) - {OVERLAP_NGRAM_WIDTH - 2})) AS i)
  WHERE len(ls) >= {OVERLAP_NGRAM_WIDTH}
),
totals AS (SELECT source, count(*) AS n FROM grams GROUP BY source),
shared AS (
  SELECT a.source AS source_a, b.source AS source_b,
         count(*)::BIGINT AS shared_ngrams
  FROM grams a JOIN grams b USING (gram_hash)
  WHERE a.source < b.source
  GROUP BY 1, 2
)
SELECT source_a, source_b, shared_ngrams,
       floor(shared_ngrams::DOUBLE / least(ta.n, tb.n) * 1e6 + 0.5) / 1e6
         AS overlap_frac
FROM shared
JOIN totals ta ON ta.source = shared.source_a
JOIN totals tb ON tb.source = shared.source_b
"""


def training_order_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic source-interleaved global training order
    (operators/sampling.py interleaved_order)."""
    t = load_tables(spark, sf_dir, "documents")
    return interleaved_order(t["documents"], seed=ORDER_SEED)


_TRAINING_ORDER_SQL = f"""
WITH ranked AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5('{ORDER_SEED}#' || CAST(doc_id AS VARCHAR)), doc_id
         ) AS rk,
         dense_rank() OVER (ORDER BY source) - 1 AS sidx
  FROM documents
)
SELECT CAST((rk - 1) * (SELECT count(DISTINCT source) FROM documents)
            + sidx AS BIGINT) AS position,
       doc_id, source
FROM ranked
"""


def vocab_coverage_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source coverage of the corpus-induced top-V vocabulary
    (operators/text.py vocab_coverage)."""
    t = load_tables(spark, sf_dir, "documents")
    return vocab_coverage(t["documents"])


_VOCAB_COVERAGE_SQL = f"""
WITH toks AS (
  SELECT source, t.token
  FROM (SELECT source, {_TOKS_SQL} AS ls FROM documents),
       LATERAL (SELECT unnest(ls) AS token) t
  WHERE t.token <> ''
),
vocab AS (
  SELECT token FROM toks GROUP BY token
  ORDER BY count(*) DESC, token LIMIT {VOCAB_SIZE}
)
SELECT source,
       count(*)::BIGINT AS total_tokens,
       SUM(CASE WHEN v.token IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         AS vocab_tokens,
       floor(SUM(CASE WHEN v.token IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
             / count(*) * 1e6 + 0.5) / 1e6 AS coverage
FROM toks LEFT JOIN vocab v USING (token)
GROUP BY source
"""


def _format_anomaly(out: DataFrame) -> DataFrame:
    """Shared output contract of the batch/streaming anomaly twins
    (string hour keeps the driver's cross-engine compare timezone-free)."""
    return out.select(
        "event_type",
        F.date_format("hour", "yyyy-MM-dd HH:00:00").alias("hour"),
        "n_events",
        "z_score",
        "rank",
    )


def event_anomaly_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 anomalous hours per event type by integer-moment z-score
    (operators/temporal.py hourly_anomaly)."""
    t = load_tables(spark, sf_dir, "events")
    ev = t["events"]
    return _format_anomaly(hourly_anomaly(ev, ts_timestamp(ev)))


_EVENT_ANOMALY_SQL = f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         count(*)::BIGINT AS n_events
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type, hour, n_events,
         count(*) OVER w AS n,
         SUM(n_events) OVER w AS s,
         SUM(n_events * n_events) OVER w AS q
  FROM hourly
  WINDOW w AS (PARTITION BY event_type)
),
scored AS (
  SELECT event_type, hour, n_events,
         CASE WHEN CAST(n AS DOUBLE) * CAST(q AS BIGINT)
                   - CAST(s AS DOUBLE) * CAST(s AS BIGINT) > 0
              THEN (CAST(n_events AS DOUBLE) * CAST(n AS BIGINT)
                    - CAST(s AS BIGINT))
                   / sqrt(CAST(n AS DOUBLE) * CAST(q AS BIGINT)
                          - CAST(s AS DOUBLE) * CAST(s AS BIGINT))
              ELSE 0.0 END AS z
  FROM stats
),
ranked AS (
  SELECT event_type, hour, n_events, z,
         row_number() OVER (
           PARTITION BY event_type ORDER BY abs(z) DESC, hour
         ) AS rank
  FROM scored
)
SELECT event_type,
       strftime(hour, '%Y-%m-%d %H:00:00') AS hour,
       n_events,
       floor(z * 1e4 + 0.5) / 1e4 AS z_score,
       CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {ANOMALY_TOP_K}
"""


def epoch_mix_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-0.5 per-source token budgeting / epoch allocation
    (operators/sampling.py epoch_allocation)."""
    t = load_tables(spark, sf_dir, "documents")
    docs = t["documents"].withColumn("n_tokens", token_count_expr("text"))
    return epoch_allocation(docs, EPOCH_BUDGET_TOKENS)


_EPOCH_MIX_SQL = f"""
WITH per_doc AS (
  SELECT source,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len({_TOKS_SQL}) END AS n_tokens
  FROM documents
),
per_src AS (
  SELECT source, SUM(n_tokens)::BIGINT AS n_tokens FROM per_doc
  GROUP BY source
),
milli AS (
  SELECT source, n_tokens,
         CAST(floor(sqrt(n_tokens::DOUBLE) * 1000 + 0.5) AS BIGINT) AS m
  FROM per_src
),
tot AS (SELECT SUM(m)::BIGINT AS mt FROM milli)
SELECT source, n_tokens,
       floor(m::DOUBLE / mt * 1e6 + 0.5) / 1e6 AS weight,
       CAST(floor(m::DOUBLE / mt * {EPOCH_BUDGET_TOKENS}.0 + 0.5) AS BIGINT)
         AS target_tokens,
       floor(CAST(floor(m::DOUBLE / mt * {EPOCH_BUDGET_TOKENS}.0 + 0.5)
                  AS BIGINT)::DOUBLE
             / n_tokens * 1e4 + 0.5) / 1e4 AS repeat_factor
FROM milli, tot
"""




def drift_report_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-mix drift between the early and late half of the stream's
    time range — total-variation contributions per event type
    (operators/drift.py distribution_drift)."""
    from arcane_framework_spark.operators.drift import distribution_drift

    t = load_tables(spark, sf_dir, "events")
    ev = t["events"]
    return distribution_drift(ev, ts_micros(ev))


_DRIFT_SQL = """
WITH base AS (
  SELECT event_type, CAST(floor(epoch_us(ts)) AS BIGINT) AS us FROM events
),
bounds AS (SELECT min(us) AS mn, max(us) AS mx FROM base),
counts AS (
  SELECT event_type,
         SUM(CASE WHEN 2 * us < mn + mx THEN 1 ELSE 0 END)::BIGINT AS n_early,
         SUM(CASE WHEN 2 * us < mn + mx THEN 0 ELSE 1 END)::BIGINT AS n_late
  FROM base, bounds GROUP BY event_type
),
tot AS (SELECT SUM(n_early)::BIGINT AS te, SUM(n_late)::BIGINT AS tl FROM counts)
SELECT event_type, n_early, n_late,
       floor(n_early::DOUBLE / te * 1e6 + 0.5) / 1e6 AS share_early,
       floor(n_late::DOUBLE / tl * 1e6 + 0.5) / 1e6 AS share_late,
       floor(abs(n_early::DOUBLE / te - n_late::DOUBLE / tl) * 1e6 + 0.5) / 1e6
         AS tvd_contrib
FROM counts, tot
"""


def bigram_lift_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 adjacent-token collocations by lift — the log-free PMI
    ranking (operators/text.py bigram_lift)."""
    from arcane_framework_spark.operators.text import bigram_lift

    t = load_tables(spark, sf_dir, "documents")
    return bigram_lift(t["documents"])


_BIGRAM_LIFT_SQL = f"""
WITH toks AS (
  SELECT {_TOKS_SQL} AS ls FROM documents WHERE length(trim(text)) > 0
),
pairs AS (
  SELECT ls[i] AS w1, ls[i + 1] AS w2
  FROM toks, LATERAL (SELECT unnest(range(1, len(ls))) AS i)
  WHERE len(ls) >= 2
),
pair_counts AS (
  SELECT w1, w2, count(*)::BIGINT AS n_pair FROM pairs GROUP BY 1, 2
  HAVING count(*) >= {BIGRAM_MIN_COUNT}
),
unigrams AS (
  SELECT t.w, count(*)::BIGINT AS c
  FROM toks, LATERAL (SELECT unnest(ls) AS w) t GROUP BY t.w
),
n_total AS (
  SELECT SUM(greatest(len(ls) - 1, 0))::BIGINT AS n FROM toks
),
scored AS (
  SELECT w1, w2, n_pair,
         floor(n::DOUBLE * n_pair / (u1.c::DOUBLE * u2.c) * 1e6 + 0.5) / 1e6 AS lift
  FROM pair_counts
  JOIN unigrams u1 ON u1.w = pair_counts.w1
  JOIN unigrams u2 ON u2.w = pair_counts.w2
  CROSS JOIN n_total
)
SELECT w1, w2, n_pair, lift,
       CAST(row_number() OVER (ORDER BY lift DESC, w1, w2) AS INT) AS rank
FROM scored
ORDER BY lift DESC, w1, w2 LIMIT {BIGRAM_TOP_K}
"""


def median_chars_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-source lower-median document length via value-band
    cumulative sums (operators/scale.py grouped_median)."""
    from arcane_framework_spark.operators.scale import grouped_median

    t = load_tables(spark, sf_dir, "documents")
    return grouped_median(t["documents"], "source", "n_chars")


_MEDIAN_SQL = """
WITH bands AS (
  SELECT source, n_chars AS value, count(*)::BIGINT AS cnt
  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2
),
cum AS (
  SELECT source, value, cnt,
         SUM(cnt) OVER (PARTITION BY source ORDER BY value
                        ROWS UNBOUNDED PRECEDING) AS c,
         SUM(cnt) OVER (PARTITION BY source) AS t
  FROM bands
)
SELECT source, CAST(max(t) AS BIGINT) AS n_rows,
       min(value) AS median_n_chars
FROM cum WHERE 2 * c >= t GROUP BY source
"""




def streaming_drift_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``drift_report_events``: the event stream is
    replayed through readStream and the per-type early/late counts are
    maintained by a streaming aggregation (complete mode, availableNow);
    shares and TVD contributions are computed batch-side on the drained
    S-row sink table. Proves the drift monitor's corpus-scale pass runs
    under Structured Streaming with identical results.

    The midpoint boundary is resolved BEFORE the stream starts (one
    metadata-cheap batch aggregate — production would pin it in config):
    a stream cannot know its own future max(ts).
    """
    from arcane_framework_spark.queries_ext import stream_conf

    t = load_tables(spark, sf_dir, "events")
    ev = t["events"]
    schema = ev.schema
    mn, mx = ev.agg(
        F.min(ts_micros(ev)), F.max(ts_micros(ev))
    ).first()
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    early = (F.lit(2) * ts_micros(schema) < F.lit(int(mn) + int(mx)))
    counts = (
        stream.select(F.col("event_type"), early.alias("__early"))
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("__early"), 1).otherwise(0)).cast("long")
            .alias("n_early"),
            F.sum(F.when(F.col("__early"), 0).otherwise(1)).cast("long")
            .alias("n_late"),
        )
    )
    name = "streaming_drift_sink"
    with stream_conf(spark):
        q = (
            counts.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    from arcane_framework_spark.operators.drift import drift_finalize

    return drift_finalize(spark.table(name))




def audio_features_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real audio path: per-document synthesized PCM16 WAVs are decoded
    by the RIFF chunk parser and reduced to exact sample statistics
    (operators/multimodal.py synthesize_wav / decode_wav /
    wav_audio_features). The oracle predicts every value closed-form
    from (doc_id, n_chars) because the synthesized signal is a square
    wave — the decode itself is genuine."""
    from arcane_framework_spark.operators.multimodal import (
        documents_as_wav_assets,
        wav_audio_features,
    )

    t = load_tables(spark, sf_dir, "documents")
    return wav_audio_features(documents_as_wav_assets(t["documents"]))


_AUDIO_FEATURES_SQL = """
SELECT doc_id,
       CAST(8000 AS INT) AS sample_rate,
       CAST(256 + n_chars % 256 AS BIGINT) AS n_samples,
       CAST((256 + n_chars % 256) * 1000 // 8000 AS BIGINT) AS duration_ms,
       CAST(8192 + doc_id % 8192 AS DOUBLE) AS rms,
       CAST((256 + n_chars % 256 - 1) // (1 + doc_id % 8) AS BIGINT)
         AS zero_crossings
FROM documents
"""




#: Id offset for the planted winnowing near-dups (every 9th doc gets a
#: suffixed copy — near-dup, not exact, so only local fingerprinting
#: catches it with certainty).
WINNOW_DUP_OFFSET = 400_000


def winnow_pairs_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) local-fingerprint dedup: pairs sharing >= 2
    selected fingerprints, with deterministic guarantees MinHash bands
    lack (operators/dedup.py winnow_fingerprints / winnow_pairs)."""
    from arcane_framework_spark.operators.dedup import winnow_pairs

    t = load_tables(spark, sf_dir, "documents")
    docs = t["documents"].select("doc_id", "text")
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") % 9 == 0).select(
            (F.col("doc_id") + F.lit(WINNOW_DUP_OFFSET)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" winnow planted tail")).alias(
                "text"
            ),
        )
    )
    return winnow_pairs(corpus, min_shared=2)


def _winnow_sql() -> str:
    from arcane_framework_spark.operators.dedup import (
        WINNOW_K,
        WINNOW_MAX_DOCS_PER_FP,
        WINNOW_W,
    )

    k, w, cap = WINNOW_K, WINNOW_W, WINNOW_MAX_DOCS_PER_FP
    return f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {WINNOW_DUP_OFFSET}, text || ' winnow planted tail'
  FROM documents WHERE doc_id % 9 = 0
),
toks AS (
  SELECT doc_id, {_TOKS_SQL} AS ls FROM corpus
  WHERE length(trim(text)) > 0
),
gh AS (
  SELECT doc_id,
         list_transform(range(1, len(ls) - {k} + 2),
           i -> substr(md5(array_to_string(ls[i : i + {k - 1}], ' ')), 1, 16)
         ) AS g
  FROM toks WHERE len(ls) >= {k}
),
fps AS (
  SELECT DISTINCT doc_id, u.fp
  FROM gh,
    LATERAL (SELECT unnest(
      CASE WHEN len(g) >= {w}
           THEN list_transform(range(1, len(g) - {w} + 2),
                               i -> list_min(g[i : i + {w - 1}]))
           ELSE [list_min(g)] END) AS fp) u
),
ok AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= {cap}),
pruned AS (SELECT f.doc_id, f.fp FROM fps f JOIN ok USING (fp))
SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*)::BIGINT AS shared_fps
FROM pruned a JOIN pruned b USING (fp)
WHERE a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= 2
"""




#: FK-shift used to plant referential-integrity violations in-query.
AUDIT_ORPHAN_SHIFT = 900_000_000


def integrity_audit_tpch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity + constraint audit over the TPC-H tables:
    (check, violations). Violations are planted in-query (shifted FK
    copies) so every check exercises its non-zero path
    (operators/audit.py orphan_check / count_check)."""
    from arcane_framework_spark.operators.audit import (
        count_check,
        integrity_report,
        orphan_check,
    )

    t = load_tables(spark, sf_dir, "lineitem", "orders", "customer")
    li, od, cu = t["lineitem"], t["orders"], t["customer"]
    li_corrupt = li.filter(
        (F.col("l_orderkey") % 997 == 0) & (F.col("l_linenumber") == 1)
    ).withColumn(
        "l_orderkey", F.col("l_orderkey") + F.lit(AUDIT_ORPHAN_SHIFT)
    )
    od_corrupt = od.filter(F.col("o_orderkey") % 1009 == 0).withColumn(
        "o_custkey", F.col("o_custkey") + F.lit(AUDIT_ORPHAN_SHIFT)
    )
    li_all = li.unionByName(li_corrupt)
    od_all = od.unionByName(od_corrupt)
    return integrity_report([
        orphan_check(li_all, od, "orphan_lineitem_orders",
                     "l_orderkey", "o_orderkey"),
        orphan_check(od_all, cu, "orphan_orders_customer",
                     "o_custkey", "c_custkey"),
        count_check(li_all, "nonpositive_extendedprice",
                    F.col("l_extendedprice") <= 0),
        count_check(
            li_all, "discount_out_of_range",
            (F.col("l_discount") < 0) | (F.col("l_discount") > 1),
        ),
    ])


_INTEGRITY_SQL = f"""
WITH li_all AS (
  SELECT * FROM lineitem
  UNION ALL
  SELECT l_orderkey + {AUDIT_ORPHAN_SHIFT}, l_partkey, l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM lineitem WHERE l_orderkey % 997 = 0 AND l_linenumber = 1
)
SELECT 'orphan_lineitem_orders' AS check,
       (SELECT count(*) FROM li_all l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey))::BIGINT
         AS violations
UNION ALL
SELECT 'orphan_orders_customer',
       (SELECT count(*) FROM (
          SELECT * FROM orders
          UNION ALL
          SELECT o_orderkey, o_custkey + {AUDIT_ORPHAN_SHIFT},
                 o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
          FROM orders WHERE o_orderkey % 1009 = 0
        ) o2
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o2.o_custkey))::BIGINT
UNION ALL
SELECT 'nonpositive_extendedprice',
       (SELECT count(*) FROM li_all
        WHERE l_extendedprice <= 0)::BIGINT
UNION ALL
SELECT 'discount_out_of_range',
       (SELECT count(*) FROM li_all
        WHERE l_discount < 0 OR l_discount > 1)::BIGINT
"""


def coverage_gaps_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type hourly coverage audit: missing hours against the global
    time range — the freshness/completeness gate of a streaming ingest
    (operators/audit.py coverage_gaps)."""
    from arcane_framework_spark.operators.audit import coverage_gaps

    t = load_tables(spark, sf_dir, "events")
    ev = t["events"]
    return coverage_gaps(ev, ts_timestamp(ev))


_COVERAGE_GAPS_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT min(hour) AS mn, max(hour) AS mx FROM hourly),
spine AS (
  SELECT t.event_type, g.h AS hour
  FROM (SELECT DISTINCT event_type FROM hourly) t,
       bounds,
       LATERAL (SELECT unnest(generate_series(mn, mx,
                                              INTERVAL 1 HOUR)) AS h) g
),
missing AS (
  SELECT s.event_type, s.hour
  FROM spine s
  WHERE NOT EXISTS (SELECT 1 FROM hourly h
                    WHERE h.event_type = s.event_type
                      AND h.hour = s.hour)
),
per_missing AS (
  SELECT event_type, count(*)::BIGINT AS n_missing,
         min(hour) AS first_missing
  FROM missing GROUP BY event_type
),
per_observed AS (
  SELECT event_type, count(*)::BIGINT AS n_observed FROM hourly
  GROUP BY event_type
)
SELECT o.event_type,
       (SELECT (epoch_us(mx) - epoch_us(mn)) // 3600000000 + 1
        FROM bounds)::BIGINT AS n_expected,
       o.n_observed,
       coalesce(m.n_missing, 0)::BIGINT AS n_missing,
       strftime(m.first_missing, '%Y-%m-%d %H:00:00')
         AS first_missing_hour
FROM per_observed o LEFT JOIN per_missing m USING (event_type)
"""




def jl_distortion_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss audit: project embeddings 64 -> 16 dims with
    the deterministic Rademacher matrix and measure pairwise-distance
    distortion on a LINEAR pair sample (operators/similarity.py
    jl_project / jl_distortion)."""
    from arcane_framework_spark.operators.similarity import jl_distortion

    t = load_tables(spark, sf_dir, "embeddings")
    return jl_distortion(t["embeddings"])


def _jl_sql() -> str:
    from arcane_framework_spark.operators.similarity import (
        EMBEDDING_DIM,
        JL_PLANES,
        JL_SAMPLE_MOD,
    )
    from arcane_framework_spark.operators.similarity import (
        hyperplane_weights,
    )

    w = hyperplane_weights(JL_PLANES, EMBEDDING_DIM)
    p_exprs = ",\n         ".join(
        "list_sum(list_transform(range(1, {d1}), i -> e[i] * ([{ws}])[i]))"
        .format(d1=EMBEDDING_DIM + 1, ws=", ".join(str(v) for v in w[p]))
        for p in range(JL_PLANES)
    )
    return f"""
WITH s AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(floor(x * 1e6 + 0.5) AS BIGINT)) AS e
  FROM embeddings WHERE vec_id % {JL_SAMPLE_MOD} = 0
),
proj AS (
  SELECT vec_id, e,
         [{p_exprs}] AS p
  FROM s
),
pairs AS (
  SELECT a.p AS pa, b.p AS pb, a.e AS ea, b.e AS eb
  FROM proj a JOIN proj b ON b.vec_id = a.vec_id + {JL_SAMPLE_MOD}
),
d AS (
  SELECT list_sum(list_transform(range(1, {JL_PLANES + 1}),
                  i -> (pa[i] - pb[i]) * (pa[i] - pb[i]))) AS dp,
         list_sum(list_transform(range(1, {EMBEDDING_DIM + 1}),
                  i -> (ea[i] - eb[i]) * (ea[i] - eb[i]))) AS dd
  FROM pairs
),
m AS (
  SELECT CAST(floor(dp::DOUBLE / ({JL_PLANES} * dd) * 1e6 + 0.5) AS BIGINT)
           AS m
  FROM d WHERE dd > 0
)
SELECT count(*)::BIGINT AS n_pairs,
       floor(SUM(m)::DOUBLE / count(*) + 0.5) / 1e6 AS mean_distortion,
       MIN(m)::DOUBLE / 1e6 AS min_distortion,
       MAX(m)::DOUBLE / 1e6 AS max_distortion
FROM m
"""




def streaming_anomaly_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``event_anomaly_hours``: the corpus-scale
    (type, hour) rollup runs as a Structured Streaming aggregation
    (complete mode, availableNow); the z-score ranking runs batch-side
    on the drained metadata-scale sink — the same split a production
    monitor uses (stream maintains the rollup, alerting reads it)."""
    from arcane_framework_spark.queries_ext import stream_conf

    t = load_tables(spark, sf_dir, "events")
    schema = t["events"].schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    from arcane_framework_spark.operators.temporal import hourly_rollup

    hourly = hourly_rollup(stream, ts_timestamp(schema))
    name = "streaming_anomaly_sink"
    with stream_conf(spark):
        q = (
            hourly.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    # Score the drained rollup with the batch twin's shared helper —
    # the fixed-point/z-score contract lives in exactly one place.
    from arcane_framework_spark.operators.temporal import anomaly_scores

    return _format_anomaly(anomaly_scores(spark.table(name)))




def posting_lists_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mini inverted index over the corpus: per-token true document
    frequency + capped, deterministically serialized posting lists
    (operators/retrieval.py posting_lists)."""
    from arcane_framework_spark.operators.retrieval import posting_lists

    t = load_tables(spark, sf_dir, "documents")
    return posting_lists(t["documents"])


def _posting_lists_sql() -> str:
    from arcane_framework_spark.operators.retrieval import MAX_POSTINGS

    return f"""
WITH toks AS (
  SELECT doc_id, t.pos - 1 AS pos, t.token
  FROM (SELECT doc_id, {_TOKS_SQL} AS ls FROM documents),
       LATERAL (SELECT unnest(ls) AS token,
                       generate_subscripts(ls, 1) AS pos) t
  WHERE t.token <> ''
),
per_doc AS (
  SELECT token, doc_id,
         string_agg(pos::VARCHAR, '|' ORDER BY pos) AS positions
  FROM toks GROUP BY token, doc_id
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY token ORDER BY doc_id) AS rk,
         count(*) OVER (PARTITION BY token) AS nd
  FROM per_doc
)
SELECT token, CAST(max(nd) AS BIGINT) AS n_docs,
       string_agg(doc_id::VARCHAR || ':' || positions, ';'
                  ORDER BY doc_id) AS postings
FROM ranked WHERE rk <= {MAX_POSTINGS}
GROUP BY token
"""




def bpe_merges_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-merge-step BPE statistics: the top-20 adjacent character
    pairs by corpus weight over the word-type table
    (operators/text.py bpe_merge_candidates)."""
    from arcane_framework_spark.operators.text import bpe_merge_candidates

    t = load_tables(spark, sf_dir, "documents")
    return bpe_merge_candidates(t["documents"])


def _bpe_merges_sql() -> str:
    from arcane_framework_spark.operators.text import BPE_MERGE_TOP_K

    return f"""
WITH words AS (
  SELECT t.word, count(*)::BIGINT AS cnt
  FROM (SELECT {_TOKS_SQL} AS ls FROM documents),
       LATERAL (SELECT unnest(ls) AS word) t
  WHERE t.word <> '' GROUP BY t.word
),
pairs AS (
  SELECT p.pair, cnt
  FROM words,
       LATERAL (SELECT unnest(list_transform(
         range(1, length(word)), i -> substr(word, i, 2))) AS pair) p
  WHERE length(word) >= 2
)
SELECT pair, SUM(cnt)::BIGINT AS weight,
       CAST(row_number() OVER (ORDER BY SUM(cnt) DESC, pair) AS INT)
         AS rank
FROM pairs GROUP BY pair
ORDER BY weight DESC, pair LIMIT {BPE_MERGE_TOP_K}
"""




def cv_folds_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5-fold cross-validation assignment with per-fold
    balance stats (operators/sampling.py cv_fold_stats)."""
    from arcane_framework_spark.operators.sampling import cv_fold_stats

    t = load_tables(spark, sf_dir, "documents")
    docs = t["documents"].withColumn("n_tokens", token_count_expr("text"))
    return cv_fold_stats(docs, tokens_col="n_tokens")


def _cv_folds_sql() -> str:
    from arcane_framework_spark.operators.sampling import CV_FOLDS

    return f"""
WITH assigned AS (
  SELECT CAST(concat('0x', substring(md5('cv#' || CAST(doc_id AS VARCHAR)),
                                     1, 8)) AS BIGINT) % {CV_FOLDS} AS fold,
         source,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len({_TOKS_SQL}) END AS n_tokens
  FROM documents
)
SELECT fold, count(*)::BIGINT AS n_docs,
       count(DISTINCT source)::BIGINT AS n_strata,
       SUM(n_tokens)::BIGINT AS n_tokens
FROM assigned GROUP BY fold
"""




def bm25_self_retrieval_documents(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Label-free retrieval eval: chunk->source self-retrieval MRR@10
    under BM25 (operators/retrieval.py bm25_self_retrieval)."""
    from arcane_framework_spark.operators.retrieval import (
        bm25_self_retrieval,
    )

    t = load_tables(spark, sf_dir, "documents")
    # select the same 2-column shape bm25_topk_documents feeds bm25_rank,
    # so both entries' term-frequency subtrees canonicalize identically
    # and the shared prep's persisted tf table substitutes into both.
    # Governed mode: ~SELF_RETRIEVAL_TARGET queries at ANY corpus size
    # (modulus derived in-plan from the corpus count) — the eval's total
    # cost stays linear in the corpus instead of quadratic.
    from arcane_framework_spark.operators.retrieval import (
        SELF_RETRIEVAL_TARGET,
    )

    return bm25_self_retrieval(
        t["documents"].select("doc_id", "text"),
        sample_mod=None,
        target_queries=SELF_RETRIEVAL_TARGET,
    )


def _self_retrieval_sql() -> str:
    from arcane_framework_spark.operators.retrieval import (
        SELF_RETRIEVAL_K,
        SELF_RETRIEVAL_QTOKENS,
        SELF_RETRIEVAL_TARGET,
        bm25_core_sql,
    )

    mod = (
        f"(SELECT greatest(1, count(*) // {SELF_RETRIEVAL_TARGET}) "
        f"FROM documents)"
    )
    q_cte = f"""q AS (
  SELECT DISTINCT doc_id AS query_id, t.term
  FROM (SELECT doc_id,
               ({_TOKS_SQL})[1 : {SELF_RETRIEVAL_QTOKENS}] AS qs
        FROM documents WHERE doc_id % {mod} = 0),
       LATERAL (SELECT unnest(qs) AS term) t
  WHERE t.term <> ''
)"""
    tail = f""",
hits AS (
  SELECT query_id, CAST(floor(1000000 / min(rank)) AS BIGINT) AS m
  FROM ranked WHERE doc_id = query_id AND rank <= {SELF_RETRIEVAL_K}
  GROUP BY query_id
),
qn AS (SELECT count(DISTINCT query_id)::BIGINT AS n_queries FROM q)
SELECT n_queries,
       (SELECT count(*) FROM hits)::BIGINT AS n_hits,
       CASE WHEN n_queries = 0 THEN 0.0
            ELSE floor((SELECT COALESCE(SUM(m), 0) FROM hits)::DOUBLE
                       / n_queries + 0.5) / 1e6 END AS mrr
FROM qn"""
    return bm25_core_sql(q_cte, tail)


PIPELINE_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "boilerplate_segments_documents": boilerplate_segments_documents,
    "source_overlap_matrix": source_overlap_matrix,
    "training_order_documents": training_order_documents,
    "vocab_coverage_documents": vocab_coverage_documents,
    "event_anomaly_hours": event_anomaly_hours,
    "epoch_mix_documents": epoch_mix_documents,
    "drift_report_events": drift_report_events,
    "bigram_lift_documents": bigram_lift_documents,
    "median_chars_by_source": median_chars_by_source,
    "streaming_drift_events": streaming_drift_events,
    "audio_features_documents": audio_features_documents,
    "winnow_pairs_documents": winnow_pairs_documents,
    "integrity_audit_tpch": integrity_audit_tpch,
    "coverage_gaps_events": coverage_gaps_events,
    "jl_distortion_embeddings": jl_distortion_embeddings,
    "streaming_anomaly_hours": streaming_anomaly_hours,
    "posting_lists_documents": posting_lists_documents,
    "bpe_merges_documents": bpe_merges_documents,
    "cv_folds_documents": cv_folds_documents,
    "bm25_self_retrieval_documents": bm25_self_retrieval_documents,
}

PIPELINE_ORACLE_SQL: dict[str, str] = {
    "boilerplate_segments_documents": _BOILERPLATE_SQL,
    "source_overlap_matrix": _SOURCE_OVERLAP_SQL,
    "training_order_documents": _TRAINING_ORDER_SQL,
    "vocab_coverage_documents": _VOCAB_COVERAGE_SQL,
    "event_anomaly_hours": _EVENT_ANOMALY_SQL,
    "epoch_mix_documents": _EPOCH_MIX_SQL,
    "drift_report_events": _DRIFT_SQL,
    "bigram_lift_documents": _BIGRAM_LIFT_SQL,
    "median_chars_by_source": _MEDIAN_SQL,
    # Streaming execution, batch semantics: same oracle as the batch twin.
    "streaming_drift_events": _DRIFT_SQL,
    "audio_features_documents": _AUDIO_FEATURES_SQL,
    "winnow_pairs_documents": _winnow_sql(),
    "integrity_audit_tpch": _INTEGRITY_SQL,
    "coverage_gaps_events": _COVERAGE_GAPS_SQL,
    "jl_distortion_embeddings": _jl_sql(),
    # Streaming execution, batch semantics: same oracle as the batch twin.
    "streaming_anomaly_hours": _EVENT_ANOMALY_SQL,
    "posting_lists_documents": _posting_lists_sql(),
    "bpe_merges_documents": _bpe_merges_sql(),
    "cv_folds_documents": _cv_folds_sql(),
    "bm25_self_retrieval_documents": _self_retrieval_sql(),
}
