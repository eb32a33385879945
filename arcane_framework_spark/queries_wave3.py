"""Round-8 wave-3 extension queries: product/corpus health analytics.

Eight operators a training-data / analytics team runs weekly, each with
the repo's standard contract — a Spark implementation whose arithmetic
is exact-integer (or single-IEEE-operation) all the way to the last
division, paired with a DuckDB oracle computing the identical plan so
the driver's value-hash compare is bit-for-bit:

- ``rolling_active_users_events``: 7-day rolling distinct users (WAU)
  next to DAU with the DAU/WAU stickiness ratio.
- ``ols_trend_events``: per-event-type OLS trend of daily volume
  (slope / intercept / R^2 from exact integer moment sums).
- ``spearman_corr_documents``: tie-corrected Spearman rank correlation
  between document length and token count via doubled average ranks.
- ``benford_audit_orders``: first-significant-digit distribution of
  order totals vs Benford's law (fixed micro-unit expectation literals).
- ``chi2_independence_events``: event-type x day-of-week contingency
  with per-cell chi-squared contributions (division-free integer
  day-of-week, IEEE-deterministic per-cell scalar math).
- ``rrf_fusion_documents``: reciprocal-rank fusion of the BM25 and
  query-likelihood rankers (integer micro-unit contributions).
- ``basket_rules_lineitem``: brand-level market-basket association
  rules (support/confidence/lift, in-plan per-mille support floor).
- ``rfm_segments_customers``: recency/frequency/monetary quintile
  segmentation via integer rank buckets over value-level tables.

Reference parity: these extend the SURVEY §2.9 LLM-pipeline surface
(the reference, an ingestion framework, stops at delivering the rows;
see ``SURVEY.md §2.9`` for why the analytics layer lives here).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from arcane_framework_spark.session import load_tables, ts_micros

_DAY_US = 86_400_000_000

#: round(log10(1 + 1/d) * 1e6) for d = 1..9 — Benford's law first-digit
#: probabilities as micro-unit integer literals, so neither engine ever
#: evaluates a logarithm (libm results are not cross-engine stable).
BENFORD_MICRO = (301030, 176091, 124939, 96910, 79181, 66947, 57992,
                 51153, 45757)

#: Day-of-week from an epoch-microsecond timestamp WITHOUT any calendar
#: function: day 0 (1970-01-01) was a Thursday, so ``(day_idx + 4) % 7``
#: yields 0=Sunday .. 6=Saturday identically in both engines (Spark's
#: ``dayofweek`` is 1-based and DuckDB's is 0-based — bypassed entirely).
_DOW_LABELS = ("Sun", "Mon", "Tue", "Wed", "Thu", "Fri", "Sat")


def rolling_active_users_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling active users (WAU) per day next to daily actives
    (DAU) and the DAU/WAU "stickiness" ratio — the engagement headline
    metric. Exact sliding-window DISTINCT without re-scanning a week of
    raw events per day: each distinct (user, day) pair fans out to the
    <= 7 window-END days it supports (``sequence(day, day+6)`` clipped
    to the last observed day), then one distinct-count per window end.
    The fan-out is bounded 7x of the (user, day) table — which is
    already the DAU aggregate — never 7x of raw events; at 100 TB the
    shuffle moves user-day pairs, not events (operators/temporal.py
    ``rolling_active_users``; the 10x stress harness drives the same
    operator)."""
    from arcane_framework_spark.operators.temporal import (
        rolling_active_users,
    )

    t = load_tables(spark, sf_dir, "events")
    ev = t["events"].select(
        "user_id", ts_micros(t["events"]).alias("ts_us")
    )
    return rolling_active_users(ev)


_ROLLING_ACTIVE_SQL = rf"""
WITH ud AS (
  SELECT DISTINCT epoch_us(ts) // {_DAY_US} AS day, user_id FROM events
),
mx AS (SELECT max(day) AS mxd FROM ud),
fan AS (
  SELECT user_id,
         unnest(generate_series(day, least(day + 6, mxd))) AS wd
  FROM ud CROSS JOIN mx
),
wau AS (
  SELECT wd, count(DISTINCT user_id)::BIGINT AS wau FROM fan GROUP BY 1
),
dau AS (SELECT day, count(*)::BIGINT AS dau FROM ud GROUP BY 1)
SELECT wd * {_DAY_US} AS day_us, coalesce(dau, 0)::BIGINT AS dau, wau,
       round(coalesce(dau, 0)::DOUBLE / wau::DOUBLE, 6) AS stickiness
FROM wau LEFT JOIN dau ON wd = day
"""


def ols_trend_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type ordinary-least-squares trend of daily event volume:
    is each stream growing, flat, or decaying, and how linear is it?
    All five moment sums (n, Sx, Sy, Sxy, Sxx, Syy) are exact integer
    aggregates over per-type DAILY rows (x = day index rebased to the
    type's first day, so magnitudes stay tiny); slope and intercept are
    each ONE double division of exact-integer numerator/denominator, and
    R^2 squares/multiplies int64-exact values as IEEE doubles (every
    input below 2^53, so the conversions are exact and the double ops
    deterministically rounded — identical in both engines). Degenerate
    types (a single day, or constant volume) yield NULL, not error."""
    t = load_tables(spark, sf_dir, "events")
    ev = t["events"].select(
        "event_type", ts_micros(t["events"]).alias("ts_us")
    )
    daily = ev.groupBy(
        "event_type", F.expr(f"ts_us div {_DAY_US}").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    w = Window.partitionBy("event_type")
    xy = daily.withColumn(
        "x", F.col("day") - F.min("day").over(w)
    )
    agg = xy.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    den_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.col("sy").cast("long").alias("n_events"),
        F.round(
            num.cast("double") / F.nullif(den_x, F.lit(0)).cast("double"), 6
        ).alias("slope_per_day"),
        F.round(
            (F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy"))
            .cast("double")
            / F.nullif(den_x, F.lit(0)).cast("double"),
            6,
        ).alias("intercept"),
        F.round(
            (num.cast("double") * num.cast("double"))
            / F.nullif(
                den_x.cast("double") * den_y.cast("double"), F.lit(0.0)
            ),
            6,
        ).alias("r2"),
    )


_OLS_TREND_SQL = rf"""
WITH daily AS (
  SELECT event_type, epoch_us(ts) // {_DAY_US} AS day,
         count(*)::BIGINT AS y
  FROM events GROUP BY 1, 2
),
xy AS (
  SELECT event_type, y,
         day - min(day) OVER (PARTITION BY event_type) AS x
  FROM daily
),
agg AS (
  SELECT event_type, count(*)::BIGINT AS n,
         sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
         sum(x * y)::BIGINT AS sxy, sum(x * x)::BIGINT AS sxx,
         sum(y * y)::BIGINT AS syy
  FROM xy GROUP BY 1
)
SELECT event_type, n AS n_days, sy AS n_events,
       round((n*sxy - sx*sy)::DOUBLE
             / nullif(n*sxx - sx*sx, 0)::DOUBLE, 6) AS slope_per_day,
       round((sy*sxx - sx*sxy)::DOUBLE
             / nullif(n*sxx - sx*sx, 0)::DOUBLE, 6) AS intercept,
       round(((n*sxy - sx*sy)::DOUBLE * (n*sxy - sx*sy)::DOUBLE)
             / nullif((n*sxx - sx*sx)::DOUBLE * (n*syy - sy*sy)::DOUBLE,
                      0.0), 6) AS r2
FROM agg
"""


def spearman_corr_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Spearman rank correlation between document length
    (n_chars) and whitespace token count — the monotone-association
    check behind "is this cheap feature a proxy for that expensive
    one?". Ranks are computed WITHOUT a global row sort: per-distinct-
    value counts -> cumulative offsets over value levels -> broadcast
    value->rank maps joined back (the AUC/Gini two-level pattern).
    Doubled average ranks keep ties integer; ranks are centered by their
    exact integer mean (n+1, in doubled units) so the moment sums are
    zero-mean products. The products fit int64 up to n ~ 1e9 docs and
    are summed as DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — exact at
    any corpus size; rho is one double expression at the end (IEEE
    sqrt, the two-proportion z-test precedent). Core:
    operators/evalmetrics.py ``spearman_corr`` (the 10x stress harness
    drives the same operator)."""
    from arcane_framework_spark.operators.evalmetrics import spearman_corr
    from arcane_framework_spark.operators.text import token_count_expr

    t = load_tables(spark, sf_dir, "documents")
    d = t["documents"].select(
        "n_chars", token_count_expr("text").alias("n_tok")
    )
    return spearman_corr(d, "n_chars", "n_tok").select(
        F.col("n_rows").alias("n_docs"), "spearman_rho"
    )


def _spearman_sql() -> str:
    return r"""
WITH d AS (
  SELECT n_chars,
         CASE WHEN len(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(lower(trim(text)), '\s+'))
         END::BIGINT AS n_tok
  FROM documents
),
la AS (SELECT n_chars, count(*)::BIGINT AS m FROM d GROUP BY 1),
ra AS (
  SELECT n_chars,
         (2 * ((sum(m) OVER (ORDER BY n_chars
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) - m)
          + m + 1)::BIGINT AS r2a
  FROM la
),
lb AS (SELECT n_tok, count(*)::BIGINT AS m FROM d GROUP BY 1),
rb AS (
  SELECT n_tok,
         (2 * ((sum(m) OVER (ORDER BY n_tok
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) - m)
          + m + 1)::BIGINT AS r2b
  FROM lb
),
n AS (SELECT count(*)::BIGINT AS n FROM d),
ranked AS (
  SELECT n.n, (ra.r2a - (n.n + 1)) AS ca, (rb.r2b - (n.n + 1)) AS cb
  FROM d JOIN ra USING (n_chars) JOIN rb USING (n_tok) CROSS JOIN n
),
agg AS (
  SELECT max(n)::BIGINT AS n,
         sum(ca * cb)::HUGEINT AS sab,
         sum(ca * ca)::HUGEINT AS saa,
         sum(cb * cb)::HUGEINT AS sbb
  FROM ranked
)
SELECT n AS n_docs,
       round(sab::DOUBLE / sqrt(saa::DOUBLE * sbb::DOUBLE), 6)
         AS spearman_rho
FROM agg
"""


def benford_audit_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit audit of order totals against Benford's
    law — the classic fabricated-/truncated-data screen for financial
    columns. Prices are fixed to integer cents once (the repo-wide
    money convention), the leading digit is the first character of the
    integer's decimal rendering (identical in both engines — no
    log10/pow), expected counts use the micro-unit Benford literals,
    and each digit's chi-squared contribution ``(O-E)^2/E`` is computed
    as ``(O*1e6 - N*Bm)^2 / (1e6*N*Bm)`` with the base exact in int64
    and the square/divide in IEEE doubles (deterministic). Window totals
    run over 9 digit rows — metadata scale."""
    t = load_tables(spark, sf_dir, "orders")
    # cents > 0 guard: a zero/negative total would yield digit 0 (or a
    # NULL cast from '-'), and element_at(array, 0) throws in Spark while
    # the DuckDB CASE just returns NULL — filter before digit extraction
    # in BOTH engines so behavior matches if the generator ever emits
    # non-positive totals.
    cents = t["orders"].select(
        F.expr(
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"
        ).alias("cents")
    ).filter(F.col("cents") > 0)
    dig = cents.select(
        F.substring(F.col("cents").cast("string"), 1, 1)
        .cast("int")
        .alias("digit")
    )
    obs = dig.groupBy("digit").agg(F.count(F.lit(1)).alias("observed"))
    w = Window.partitionBy()
    bm = F.element_at(
        F.array(*[F.lit(v) for v in BENFORD_MICRO]), F.col("digit")
    ).cast("long")
    with_tot = obs.withColumn("n_total", F.sum("observed").over(w))
    base = (
        F.col("observed") * F.lit(1_000_000) - F.col("n_total") * bm
    )
    return with_tot.select(
        "digit",
        F.col("observed").cast("long").alias("observed"),
        (F.col("n_total") * bm).cast("long").alias("expected_micro"),
        base.cast("long").alias("delta_scaled"),
        F.round(
            (base.cast("double") * base.cast("double"))
            / (
                F.lit(1_000_000.0)
                * (F.col("n_total") * bm).cast("double")
            ),
            6,
        ).alias("chi2_contrib"),
    )


def _benford_sql() -> str:
    case = " ".join(
        f"WHEN {d} THEN {v}"
        for d, v in enumerate(BENFORD_MICRO, start=1)
    )
    return rf"""
WITH cents AS (
  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
  WHERE CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) > 0
),
dig AS (SELECT substr(cents::VARCHAR, 1, 1)::INT AS digit FROM cents),
obs AS (
  SELECT digit, count(*)::BIGINT AS observed,
         (sum(count(*)) OVER ())::BIGINT AS n_total
  FROM dig GROUP BY 1
),
bm AS (SELECT digit, observed, n_total,
              (CASE digit {case} END)::BIGINT AS b_micro
       FROM obs)
SELECT digit, observed,
       (n_total * b_micro)::BIGINT AS expected_micro,
       (observed * 1000000 - n_total * b_micro)::BIGINT AS delta_scaled,
       round(((observed * 1000000 - n_total * b_micro)::DOUBLE
              * (observed * 1000000 - n_total * b_micro)::DOUBLE)
             / (1000000.0 * (n_total * b_micro)::DOUBLE), 6)
         AS chi2_contrib
FROM bm
"""


def chi2_independence_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared test of independence between event type and day of
    week — "is the traffic mix stable across the week, or does some
    event type have a weekday signature?". Day-of-week is the pure
    integer ``(epoch_day + 4) % 7`` (no calendar/locale function on
    either engine). The contingency cells, row/column/grand totals are
    exact integer aggregates; each cell's expected count and chi-squared
    contribution ``(O*N - R*C)^2 / (R*C*N)`` is per-row IEEE-double math
    over int64-exact inputs (deterministic across engines). The global
    statistic is the ORDER-INDEPENDENT integer sum of per-cell
    micro-unit floors (a cross-engine double sum would depend on
    summation order); all windows run over <= |types| x 7 cell rows."""
    t = load_tables(spark, sf_dir, "events")
    ev = t["events"].select(
        "event_type", ts_micros(t["events"]).alias("ts_us")
    )
    cells = ev.groupBy(
        "event_type",
        ((F.expr(f"ts_us div {_DAY_US}") + 4) % 7).alias("dow"),
    ).agg(F.count(F.lit(1)).alias("o"))
    wr = Window.partitionBy("event_type")
    wc = Window.partitionBy("dow")
    wt = Window.partitionBy()
    x = (
        cells.withColumn("r", F.sum("o").over(wr))
        .withColumn("c", F.sum("o").over(wc))
        .withColumn("n", F.sum("o").over(wt))
    )
    base = F.col("o") * F.col("n") - F.col("r") * F.col("c")
    contrib = (base.cast("double") * base.cast("double")) / (
        (F.col("r") * F.col("c")).cast("double") * F.col("n").cast("double")
    )
    scored = x.withColumn("__contrib", contrib)
    return scored.select(
        "event_type",
        "dow",
        F.element_at(
            F.array(*[F.lit(s) for s in _DOW_LABELS]),
            (F.col("dow") + 1).cast("int"),
        ).alias("dow_label"),
        F.col("o").cast("long").alias("observed"),
        F.round(
            (F.col("r") * F.col("c")).cast("double")
            / F.col("n").cast("double"),
            6,
        ).alias("expected"),
        F.round(F.col("__contrib"), 6).alias("chi2_contrib"),
        F.sum(F.floor(F.col("__contrib") * 1_000_000).cast("long"))
        .over(wt)
        .cast("long")
        .alias("chi2_micro_total"),
    )


def _chi2_sql() -> str:
    labels = ", ".join(f"'{s}'" for s in _DOW_LABELS)
    return rf"""
WITH cells AS (
  SELECT event_type,
         ((epoch_us(ts) // {_DAY_US}) + 4) % 7 AS dow,
         count(*)::BIGINT AS o
  FROM events GROUP BY 1, 2
),
x AS (
  SELECT event_type, dow, o,
         (sum(o) OVER (PARTITION BY event_type))::BIGINT AS r,
         (sum(o) OVER (PARTITION BY dow))::BIGINT AS c,
         (sum(o) OVER ())::BIGINT AS n
  FROM cells
),
scored AS (
  SELECT event_type, dow, o, r, c, n,
         ((o*n - r*c)::DOUBLE * (o*n - r*c)::DOUBLE)
           / ((r*c)::DOUBLE * n::DOUBLE) AS contrib
  FROM x
)
SELECT event_type, dow,
       ([{labels}])[dow + 1] AS dow_label,
       o AS observed,
       round((r*c)::DOUBLE / n::DOUBLE, 6) AS expected,
       round(contrib, 6) AS chi2_contrib,
       (sum(CAST(floor(contrib * 1000000) AS BIGINT)) OVER ())::BIGINT
         AS chi2_micro_total
FROM scored
"""


#: RRF fusion: pool depth taken from each ranker, fused list cutoff, and
#: the standard RRF damping constant (Cormack et al. 2009 use k=60).
#: The pool depth is the retrieval-family shared constant so the ranker
#: subtrees here are byte-identical to the single-ranker entries'
#: (prep persists each pooled ranking once — r14 optimization).
from arcane_framework_spark.operators.retrieval import RETRIEVAL_POOL_K

RRF_POOL_K = RETRIEVAL_POOL_K
RRF_TOP_K = 10
RRF_DAMP = 60

#: Brand-basket rules: minimum support as a per-mille of all orders, and
#: how many rules to keep (ranked by lift).
BASKET_SUPPORT_PERMILLE = 1
BASKET_TOP_RULES = 50

#: RFM: quintile count and the monetary banding (cents per band) that
#: keeps the rank tables at value-LEVEL scale (near-unique cent totals
#: would otherwise make the level table as big as the customer table).
RFM_BUCKETS = 5
RFM_MONETARY_BAND_CENTS = 10_000


def rrf_fusion_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of the two lexical
    rankers this repo ships — Okapi BM25 and Dirichlet query-likelihood —
    into one hybrid list per query: the standard trick every hybrid RAG
    retrieval stack runs. Each ranker contributes
    ``floor(1e6 / (60 + rank))`` micro-units (INTEGER division — the
    fused score never touches a float), absent docs contribute 0 via a
    full-outer join of the two top-``RRF_POOL_K`` lists (query-cardinality
    tables — metadata scale), and the fused rank is a deterministic
    (score desc, doc_id) row_number. Reuses ``bm25_topk`` /
    ``query_likelihood_topk`` verbatim, so the ranker plans keep their
    inverted-index shape (broadcast queries, shared tf aggregate)."""
    from arcane_framework_spark.operators.retrieval import (
        bm25_topk,
        query_likelihood_topk,
    )
    from arcane_framework_spark.queries_eval import QL_ENTRY_MU

    t = load_tables(spark, sf_dir, "documents")
    docs = t["documents"].select("doc_id", "text")
    a = bm25_topk(spark, docs, k=RRF_POOL_K).select(
        "query_id", "doc_id", F.col("rank").alias("rank_a")
    )
    b = query_likelihood_topk(
        spark, docs, k=RRF_POOL_K, mu=QL_ENTRY_MU
    ).select("query_id", "doc_id", F.col("rank").alias("rank_b"))
    fused = a.join(b, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        F.col("rank_a").isNotNull().cast("int").alias("in_bm25"),
        F.col("rank_b").isNotNull().cast("int").alias("in_ql"),
        (
            F.coalesce(
                F.expr(f"1000000 div ({RRF_DAMP} + rank_a)"), F.lit(0)
            )
            + F.coalesce(
                F.expr(f"1000000 div ({RRF_DAMP} + rank_b)"), F.lit(0)
            )
        ).cast("long").alias("rrf_micro"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_micro").desc(), "doc_id"
    )
    return (
        fused.withColumn("fused_rank", F.row_number().over(w))
        .filter(F.col("fused_rank") <= RRF_TOP_K)
        .withColumn("fused_rank", F.col("fused_rank").cast("int"))
    )


def _rrf_sql() -> str:
    from arcane_framework_spark.operators.retrieval import (
        BM25_QUERIES,
        bm25_core_sql,
    )
    from arcane_framework_spark.queries_eval import _query_likelihood_sql

    vals = ", ".join(
        f"({qid}, '{t}')"
        for qid, terms in sorted(BM25_QUERIES.items())
        for t in terms
    )
    bm_sql = bm25_core_sql(
        f"q(query_id, term) AS (VALUES {vals})",
        f"SELECT query_id, doc_id, rank FROM ranked"
        f" WHERE rank <= {RRF_POOL_K}",
    )
    ql_sql = _query_likelihood_sql(
        tail=f"SELECT query_id, doc_id, rank FROM ranked"
             f" WHERE rank <= {RRF_POOL_K}"
    )
    return rf"""
WITH fused AS (
  SELECT coalesce(a.query_id, b.query_id) AS query_id,
         coalesce(a.doc_id, b.doc_id) AS doc_id,
         CASE WHEN a.rank IS NOT NULL THEN 1 ELSE 0 END AS in_bm25,
         CASE WHEN b.rank IS NOT NULL THEN 1 ELSE 0 END AS in_ql,
         (coalesce(1000000 // ({RRF_DAMP} + a.rank), 0)
          + coalesce(1000000 // ({RRF_DAMP} + b.rank), 0))::BIGINT
           AS rrf_micro
  FROM ({bm_sql}) a
  FULL JOIN ({ql_sql}) b
    ON a.query_id = b.query_id AND a.doc_id = b.doc_id
)
SELECT query_id, doc_id, in_bm25, in_ql, rrf_micro,
       rank::INT AS fused_rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY rrf_micro DESC, doc_id) AS rank
  FROM fused
) WHERE rank <= {RRF_TOP_K}
"""


def basket_rules_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules at part-BRAND level over TPC-H
    orders (which brands are co-purchased?): per-order distinct brand
    sets (part dim broadcast onto lineitem), unordered brand-pair
    supports via a per-order self-join bounded by the ≤25-brand
    vocabulary — never a cross join over items — then confidence and
    lift from exact integer counts with ONE division each. The support
    floor is scale-governed IN-PLAN (``c_xy * 1000 >= S`` — a per-mille
    of all orders, not a fixed count), and the final lift rank runs
    over brand-PAIR rows (≤ 300 — metadata scale)."""
    from arcane_framework_spark.operators.scale import with_broadcast_scalar

    t = load_tables(spark, sf_dir, "lineitem", "part")
    bl = (
        t["lineitem"]
        .select("l_orderkey", "l_partkey")
        .join(
            F.broadcast(
                t["part"].select(
                    F.col("p_partkey").alias("l_partkey"), "p_brand"
                )
            ),
            "l_partkey",
        )
        .select(F.col("l_orderkey").alias("okey"), "p_brand")
        .distinct()
    )
    from arcane_framework_spark.operators.cache import scoped_persist

    # Persisted: consumed by the order count, the per-brand supports, and
    # BOTH sides of the per-order self-join — four scans of the
    # lineitem-join-part distinct without it.
    bl = scoped_persist(bl)
    s = bl.agg(F.countDistinct("okey").alias("__s"))
    cx = bl.groupBy("p_brand").agg(F.count(F.lit(1)).alias("c"))
    # NOTE (r14 opt): a collect_set-arrays variant was tried here —
    # groupBy(okey).collect_set(brand) + in-array pair explode to fold
    # the distinct and both self-join exchanges into one. Measured
    # same-session at sf0.1: arrays 1.73s + pairs 1.40s vs distinct
    # 1.29s + self-join 1.41s (pair tables identical) — the collect_set
    # aggregate costs what the distinct cost, so the join below stays.
    a = bl.select("okey", F.col("p_brand").alias("x"))
    b = bl.select("okey", F.col("p_brand").alias("y"))
    pairs = (
        a.join(b, "okey")
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("c_xy"))
    )
    rules = (
        with_broadcast_scalar(pairs, s)
        .join(
            F.broadcast(cx.select(F.col("p_brand").alias("x"),
                                  F.col("c").alias("c_x"))),
            "x",
        )
        .join(
            F.broadcast(cx.select(F.col("p_brand").alias("y"),
                                  F.col("c").alias("c_y"))),
            "y",
        )
        .filter(
            F.col("c_xy") * 1000 >= F.col("__s") * BASKET_SUPPORT_PERMILLE
        )
    )
    # The rank key is lift in micro-units via INTEGER division (exact and
    # truncation-identical on both engines; double->long casts differ:
    # Spark truncates, DuckDB rounds). s*c_xy*1e6 fits int64 to ~1e6
    # orders per brand pair — far past any TPC-H SF here.
    w = Window.orderBy(
        F.expr("(__s * c_xy * 1000000) div (c_x * c_y)").desc(),
        "x",
        "y",
    )
    return (
        rules.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= BASKET_TOP_RULES)
        .select(
            "x",
            "y",
            F.col("c_xy").cast("long").alias("n_orders_both"),
            F.col("c_x").cast("long").alias("n_orders_x"),
            F.col("c_y").cast("long").alias("n_orders_y"),
            F.round(
                F.col("c_xy").cast("double") / F.col("c_x").cast("double"),
                6,
            ).alias("confidence_x_to_y"),
            F.round(
                (F.col("__s") * F.col("c_xy")).cast("double")
                / (F.col("c_x") * F.col("c_y")).cast("double"),
                6,
            ).alias("lift"),
            F.col("__rk").cast("int").alias("rule_rank"),
        )
    )


def _basket_sql() -> str:
    return rf"""
WITH bl AS (
  SELECT DISTINCT l_orderkey AS okey, p_brand
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
s AS (SELECT count(DISTINCT okey)::BIGINT AS s FROM bl),
cx AS (SELECT p_brand, count(*)::BIGINT AS c FROM bl GROUP BY 1),
pairs AS (
  SELECT a.p_brand AS x, b.p_brand AS y, count(*)::BIGINT AS c_xy
  FROM bl a JOIN bl b ON a.okey = b.okey AND a.p_brand < b.p_brand
  GROUP BY 1, 2
),
rules AS (
  SELECT x, y, c_xy, cxx.c AS c_x, cyy.c AS c_y, s.s AS s
  FROM pairs
  JOIN cx cxx ON cxx.p_brand = x
  JOIN cx cyy ON cyy.p_brand = y
  CROSS JOIN s
  WHERE c_xy * 1000 >= s.s * {BASKET_SUPPORT_PERMILLE}
)
SELECT x, y, c_xy AS n_orders_both, c_x AS n_orders_x, c_y AS n_orders_y,
       round(c_xy::DOUBLE / c_x::DOUBLE, 6) AS confidence_x_to_y,
       round((s * c_xy)::DOUBLE / (c_x * c_y)::DOUBLE, 6) AS lift,
       rk::INT AS rule_rank
FROM (
  SELECT *, row_number() OVER (
      ORDER BY (s * c_xy * 1000000) // (c_x * c_y) DESC,
               x, y) AS rk
  FROM rules
) WHERE rk <= {BASKET_TOP_RULES}
"""


def _quintile_map(levels: DataFrame, col: str, out: str) -> DataFrame:
    """value -> quintile bucket map over a value-LEVEL table: bucket =
    ``(5 * cum_prev) div n`` — every member of a level shares the bucket
    of its first rank position, exact integers on both engines. The
    window sorts levels, never rows."""
    w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy()
    return (
        levels.withColumn(
            "__prev", F.sum("m").over(w) - F.col("m")
        )
        .withColumn("__tot", F.sum("m").over(wt))
        .select(
            col,
            F.expr(f"({RFM_BUCKETS} * __prev) div __tot")
            .cast("long")
            .alias(out),
        )
    )


def rfm_segments_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation from
    order history — the classic lifecycle-marketing cube. Per-customer
    R (last order date), F (order count), M (lifetime cents, BANDED to
    $100 so the rank table stays value-level scale) are each mapped to
    quintiles via ``(5 * cum_prev) div n`` over per-distinct-value
    counts — integer rank buckets, no ntile over raw customer rows, no
    percentile interpolation (cross-engine unsafe). Buckets are
    ascending (R=4 - most recent, F=4 - most orders, M=4 - highest
    spend); the output is the segment cube with customer counts and
    exact-cents monetary stats."""
    from arcane_framework_spark.operators.scale import with_broadcast_scalar

    t = load_tables(spark, sf_dir, "orders")
    cust = (
        t["orders"]
        .select(
            "o_custkey",
            "o_orderdate",
            F.expr(
                "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"
            ).alias("cents"),
        )
        .groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("r_val"),
            F.count(F.lit(1)).alias("f_val"),
            F.sum("cents").alias("cents"),
        )
        .withColumn(
            "m_val", F.expr(f"cents div {RFM_MONETARY_BAND_CENTS}")
        )
    )
    maps = {}
    for col, out in (("r_val", "r"), ("f_val", "f"), ("m_val", "m")):
        levels = cust.groupBy(col).agg(F.count(F.lit(1)).alias("m"))
        maps[col] = _quintile_map(levels, col, out)
    seg = (
        cust.join(F.broadcast(maps["r_val"]), "r_val")
        .join(F.broadcast(maps["f_val"]), "f_val")
        .join(F.broadcast(maps["m_val"]), "m_val")
    )
    return seg.groupBy("r", "f", "m").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("total_cents"),
        # floor(x + 0.5) instead of round(): on a half-cent tie Spark
        # rounds the binary double, DuckDB the decimal rendering.
        (
            F.floor(
                F.sum("cents").cast("double")
                / F.count(F.lit(1)).cast("double")
                + F.lit(0.5)
            ).cast("double")
            / F.lit(100.0)
        ).alias("avg_dollars"),
    )


def _rfm_sql() -> str:
    def qmap(src: str, col: str, out: str) -> str:
        return f"""
{out}_lv AS (SELECT {col}, count(*)::BIGINT AS m FROM cust GROUP BY 1),
{out}_map AS (
  SELECT {col},
         ({RFM_BUCKETS} * ((sum(m) OVER (ORDER BY {col}
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) - m))
           // (sum(m) OVER ()) AS {out}
  FROM {out}_lv
)"""

    return rf"""
WITH cust AS (
  SELECT o_custkey, max(o_orderdate) AS r_val,
         count(*)::BIGINT AS f_val,
         sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))::BIGINT
           AS cents,
         sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))::BIGINT
           // {RFM_MONETARY_BAND_CENTS} AS m_val
  FROM orders GROUP BY 1
),{qmap('cust', 'r_val', 'r')},{qmap('cust', 'f_val', 'f')},{qmap('cust', 'm_val', 'm')}
SELECT r::BIGINT AS r, f::BIGINT AS f, m::BIGINT AS m,
       count(*)::BIGINT AS n_customers,
       sum(cents)::BIGINT AS total_cents,
       floor(sum(cents)::DOUBLE / count(*)::DOUBLE + 0.5)::DOUBLE / 100.0
         AS avg_dollars
FROM cust
JOIN r_map USING (r_val) JOIN f_map USING (f_val) JOIN m_map USING (m_val)
GROUP BY 1, 2, 3
"""


WAVE3_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "rolling_active_users_events": rolling_active_users_events,
    "ols_trend_events": ols_trend_events,
    "spearman_corr_documents": spearman_corr_documents,
    "benford_audit_orders": benford_audit_orders,
    "chi2_independence_events": chi2_independence_events,
    "rrf_fusion_documents": rrf_fusion_documents,
    "basket_rules_lineitem": basket_rules_lineitem,
    "rfm_segments_customers": rfm_segments_customers,
}

WAVE3_ORACLE_SQL: dict[str, str] = {
    "rolling_active_users_events": _ROLLING_ACTIVE_SQL,
    "ols_trend_events": _OLS_TREND_SQL,
    "spearman_corr_documents": _spearman_sql(),
    "benford_audit_orders": _benford_sql(),
    "chi2_independence_events": _chi2_sql(),
    "rrf_fusion_documents": _rrf_sql(),
    "basket_rules_lineitem": _basket_sql(),
    "rfm_segments_customers": _rfm_sql(),
}
