"""TPC-H-shape relational queries widening the Catalyst-exposed surface.

SURVEY.md §2.4 establishes that the reference pushes all relational work to
the source database as generated T-SQL; our engine exposes the same (and a
wider) relational surface natively through Catalyst. This module covers the
join/aggregation patterns the core catalog (queries.py) does not yet hit:

- semi-join / anti-join (EXISTS / NOT EXISTS shapes)
- outer join + double aggregation
- window functions (max-over-all, lag-based sessionization)
- scalar aggregate subqueries (per-group avg thresholds)
- HAVING-style post-aggregation filters
- disjunctive multi-column pushdown predicates

Each query carries a DuckDB oracle with identical column names and rounding.
All predicates are adapted to the synthetic testdata's columns (TESTDATA.md);
shapes follow the public TPC-H specification, not any proprietary workload.

Scale notes are per-query docstrings: every plan is one or two shuffles with
broadcast dims, no driver-side materialization anywhere.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from arcane_framework_spark.session import load_tables, ts_micros, ts_timestamp

# q18 threshold chosen so the result is non-empty from sf0.001 upward.
Q18_MIN_QTY = 300.0


def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate, zero joins.

    Scale: all three predicates push down to the parquet scan; the aggregate
    is a map-side partial + single-row final — the cheapest possible plan.
    """
    t = load_tables(spark, sf_dir, "lineitem")
    return (
        t["lineitem"]
        .filter(
            F.expr(
                "l_shipdate >= timestamp'1997-01-01 00:00:00' AND "
                "l_shipdate <  timestamp'1998-01-01 00:00:00'"
            )
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


_Q6_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q4_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi-join orders→lineitem with a non-equi term.

    (Adapted: testdata lacks commit/receipt dates, so "late" means a line
    shipped after the order date.) Scale: left-semi join shuffles on
    orderkey only; lineitem payload columns are pruned before the shuffle.
    """
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    o = t["orders"].filter(
        F.expr(
            "o_orderdate >= timestamp'1997-07-01 00:00:00' AND "
            "o_orderdate <  timestamp'1997-10-01 00:00:00'"
        )
    )
    li = t["lineitem"].select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


_Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
"""


def q7_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: two-nation trade flow, supplier-nation x customer-nation.

    Scale: nation is broadcast twice under different aliases; the nation-pair
    filter collapses the fact stream early; one shuffle each for
    orders⋈lineitem and the final (year, nation-pair) aggregate.
    """
    t = load_tables(
        spark, sf_dir, "nation", "customer", "supplier", "orders", "lineitem"
    )
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


_Q7_SQL = """
SELECT n1.n_name                                          AS supp_nation,
       n2.n_name                                          AS cust_nation,
       CAST(year(l_shipdate) AS INT)                      AS l_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2)  AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue ranking, deterministic top-20."""
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    o = t["orders"].filter(
        F.expr(
            "o_orderdate >= timestamp'1997-10-01 00:00:00' AND "
            "o_orderdate <  timestamp'1998-01-01 00:00:00'"
        )
    )
    li = t["lineitem"].filter(F.col("l_returnflag") == "R")
    return (
        t["customer"]
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


_Q10_SQL = """
SELECT c_custkey, c_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       round(c_acctbal, 2)                               AS c_acctbal,
       n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: outer join + two-level aggregation.

    Scale: the left outer join shuffles on custkey; the second aggregate is
    over at most a few thousand distinct counts — near-free.
    """
    t = load_tables(spark, sf_dir, "customer", "orders")
    o = t["orders"].filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        t["customer"]
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


_Q13_SQL = """
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist
FROM per_cust
GROUP BY c_count
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregate ratio over lineitem⋈part.

    Scale: part is broadcast; single scan of the shipdate-pruned lineitem.
    """
    t = load_tables(spark, sf_dir, "lineitem", "part")
    li = t["lineitem"].filter(
        F.expr(
            "l_shipdate >= timestamp'1997-09-01 00:00:00' AND "
            "l_shipdate <  timestamp'1997-10-01 00:00:00'"
        )
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(0.0))
                / F.sum(disc),
                4,
            ).alias("promo_revenue")
        )
    )


_Q14_SQL = """
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
"""


def q15_top_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: max-revenue supplier(s) via a broadcast scalar max.

    Scale: revenue-per-supplier is one shuffle; the global max then rides
    a partial-aggregated 1-row scalar joined back onto the rollup —
    NOT an all-rows window max, which would single-partition the whole
    supplier-cardinality rollup (the one corpus-growing table in this
    query) through one task (round-14: the last unpartitioned window
    over a non-bounded table in the catalog). ``rev`` is persisted: it
    feeds both the scalar and the filter. Rounding happens before the
    max comparison so both engines compare identical cent values.
    """
    from arcane_framework_spark.operators.cache import scoped_persist
    from arcane_framework_spark.operators.scale import with_broadcast_scalar

    t = load_tables(spark, sf_dir, "lineitem", "supplier")
    rev = scoped_persist(
        t["lineitem"]
        .filter(
            F.expr(
                "l_shipdate >= timestamp'1997-01-01 00:00:00' AND "
                "l_shipdate <  timestamp'1997-04-01 00:00:00'"
            )
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    best = with_broadcast_scalar(
        rev, rev.agg(F.max("total_revenue").alias("max_rev"))
    ).filter(F.col("total_revenue") == F.col("max_rev"))
    return (
        best.join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


_Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: per-part avg-quantity threshold (scalar agg subquery).

    Expressed as an aggregate-then-rejoin rather than a correlated subquery —
    the idiomatic Spark decorrelation. l_quantity carries integer values, so
    the avg is exact in binary floating point and the 0.2*avg comparison is
    engine-stable.
    """
    t = load_tables(spark, sf_dir, "lineitem", "part")
    p = t["part"].filter(F.col("p_brand") == "Brand#3").select("p_partkey")
    li = t["lineitem"].join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    avg_q = li.groupBy("l_partkey").agg(F.avg("l_quantity").alias("avg_qty"))
    return (
        li.join(avg_q, "l_partkey")
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


_Q17_SQL = """
WITH li AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#3'
),
avg_q AS (
  SELECT l_partkey, avg(l_quantity) AS avg_qty FROM li GROUP BY l_partkey
)
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM li JOIN avg_q USING (l_partkey)
WHERE l_quantity < 0.2 * avg_qty
"""


def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING on a grouped sum, then enrich + rank.

    Scale: the HAVING aggregate shrinks lineitem to a handful of orderkeys
    which then semi-joins (broadcast) back to orders/customer.
    """
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > Q18_MIN_QTY)
    )
    return (
        t["orders"]
        .join(F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("sum_qty", 2).alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


_Q18_SQL = f"""
WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > {Q18_MIN_QTY}
)
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       round(o_totalprice, 2)            AS o_totalprice,
       round(sum_qty, 2)                 AS sum_qty
FROM orders
JOIN big      ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs multi-table predicate.

    Scale: Catalyst extracts the common join key and pushes the disjunction's
    part-only/lineitem-only conjuncts below the join (the classic Q19
    optimization) — verified via .explain's PushedFilters.
    """
    t = load_tables(spark, sf_dir, "lineitem", "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 21)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_Q19_SQL = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*)                                          AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 21)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 40)
"""


def q22_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: anti-join + global scalar-subquery threshold.

    Customers above the positive-balance average with no orders since
    2000-01-01, rolled up per nation. Scale: the threshold is a broadcast
    scalar; the anti-join shuffles on custkey; the rollup is tiny.
    """
    t = load_tables(spark, sf_dir, "customer", "orders")
    cust = t["customer"]
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    recent = t["orders"].filter(
        F.expr("o_orderdate >= timestamp'2000-01-01 00:00:00'")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            recent.select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


_Q22_SQL = """
SELECT c_nationkey, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_nationkey
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: supplier-nation market share within a region by year.

    8-way join with every dim broadcast; the conditional-sum ratio is a
    single aggregation over the joined fact stream.
    """
    t = load_tables(
        spark, sf_dir,
        "region", "nation", "customer", "supplier", "orders", "lineitem", "part",
    )
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"].filter(F.col("p_type") == "PROMO")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.expr(
                "o_orderdate >= timestamp'1996-01-01 00:00:00' AND "
                "o_orderdate <= timestamp'1997-12-31 00:00:00'"
            )
        )
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
              F.col("c_rkey") == F.col("r_regionkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


_Q8_SQL = """
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       round(sum(CASE WHEN n2.n_name = 'NATION_1'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = 'PROMO' AND r_name = 'ASIA'
  AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                      AND TIMESTAMP '1997-12-31 00:00:00'
GROUP BY 1
"""


def q12_shipping_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + two conditional counts per group.

    (Adapted: the synthetic lineitem has no shipmode, so l_returnflag
    plays the grouping role and priority classes split the counts.)
    """
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    li = t["lineitem"].filter(
        F.expr(
            "l_shipdate >= timestamp'1997-01-01 00:00:00' AND "
            "l_shipdate <  timestamp'1998-01-01 00:00:00'"
        )
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


_Q12_SQL = """
SELECT l_returnflag,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END)::BIGINT AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_returnflag
"""


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-count aggregation over part attributes.

    (Adapted: no partsupp table, so lineitem bridges parts to suppliers.)
    Scale: count(distinct) expands to a two-phase aggregate; the first
    groupBy deduplicates (brand, size, suppkey) triples map-side.
    """
    t = load_tables(spark, sf_dir, "lineitem", "part")
    p = t["part"].filter(
        (F.col("p_brand") != "Brand#1") & (F.col("p_size") <= 25)
    )
    return (
        t["lineitem"]
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


_Q16_SQL = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_size <= 25
GROUP BY p_brand, p_type, p_size
"""


def rollup_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation: (status, priority) hierarchy with subtotals.

    Scale: rollup is a single shuffle producing all grouping levels via
    partial aggregation — no extra pass per level. NULL grouping cells are
    labeled 'ALL' so both engines emit identical keys.
    """
    t = load_tables(spark, sf_dir, "orders")
    return (
        t["orders"]
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_totalprice"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("o_orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("o_orderpriority"),
            "n_orders",
            "sum_totalprice",
        )
    )


_ROLLUP_SQL = """
SELECT coalesce(o_orderstatus, 'ALL')   AS o_orderstatus,
       coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
       count(*)                          AS n_orders,
       round(sum(o_totalprice), 2)       AS sum_totalprice
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def setops_repeat_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: INTERSECT / EXCEPT cohorts of ordering customers.

    Scale: both set ops are hash aggregations on custkey (one shuffle each
    over already-filtered projections).
    """
    t = load_tables(spark, sf_dir, "orders")
    o = t["orders"]

    def cohort(year: int) -> DataFrame:
        return o.filter(
            F.expr(
                f"o_orderdate >= timestamp'{year}-01-01 00:00:00' AND "
                f"o_orderdate < timestamp'{year + 1}-01-01 00:00:00'"
            )
        ).select("o_custkey")

    y96, y97 = cohort(1996), cohort(1997)
    both = y96.intersect(y97).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("both_years").alias("cohort"), "n"
    )
    # subtract = EXCEPT DISTINCT (exceptAll would subtract multiplicities)
    only96 = y96.subtract(y97).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("only_1996").alias("cohort"), "n"
    )
    return both.unionByName(only96)


_SETOPS_SQL = """
WITH y96 AS (
  SELECT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
),
y97 AS (
  SELECT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
)
SELECT 'both_years' AS cohort, count(*) AS n
FROM (SELECT o_custkey FROM y96 INTERSECT SELECT o_custkey FROM y97)
UNION ALL
SELECT 'only_1996' AS cohort, count(*) AS n
FROM (SELECT o_custkey FROM y96 EXCEPT SELECT o_custkey FROM y97)
"""


def cube_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation: all grouping combinations of (status, priority)."""
    t = load_tables(spark, sf_dir, "orders")
    return (
        t["orders"]
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("o_orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("o_orderpriority"),
            "n_orders",
        )
    )


_CUBE_SQL = """
SELECT coalesce(o_orderstatus, 'ALL')   AS o_orderstatus,
       coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
       count(*)                          AS n_orders
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def ntile_customer_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window ntile: customers quartiled by account balance per nation.

    Scale: one shuffle on the partition key; ntile needs the per-partition
    sort but no cross-partition state.
    """
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    t = load_tables(spark, sf_dir, "customer")
    quartiled = t["customer"].select(
        "c_nationkey",
        "c_custkey",
        F.ntile(4).over(w).alias("quartile"),
        "c_acctbal",
    )
    return quartiled.groupBy("c_nationkey", "quartile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
    )


_NTILE_SQL = """
WITH q AS (
  SELECT c_nationkey, c_custkey, c_acctbal,
         ntile(4) OVER (PARTITION BY c_nationkey
                        ORDER BY c_acctbal DESC, c_custkey) AS quartile
  FROM customer
)
SELECT c_nationkey, CAST(quartile AS INT) AS quartile,
       count(*) AS n_customers, round(sum(c_acctbal), 2) AS sum_acctbal
FROM q
GROUP BY 1, 2
"""


#: Session gap for events sessionization (microseconds).
SESSION_GAP_US = 30 * 60 * 1_000_000


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-based sessionization of the event stream (30-minute gap).

    The batch shape of `F.session_window`: a session starts where the gap
    from the previous event of the same user exceeds 30 minutes. Scale: one
    shuffle on user_id for the window sort; the rollup rides the same
    partitioning (no second exchange of fact rows).

    events.ts dtype is normalized to microsecond integers by
    session.ts_micros; both engines compare micros, so boundaries are exact.
    """
    t = load_tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    ev = t["events"].select(
        "user_id", "event_id", ts_micros(t["events"]).alias("ts_us")
    )
    marked = ev.withColumn("prev_us", F.lag("ts_us").over(w)).withColumn(
        "is_new",
        (
            F.col("prev_us").isNull()
            | (F.col("ts_us") - F.col("prev_us") > SESSION_GAP_US)
        ).cast("int"),
    )
    return marked.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("is_new").alias("n_sessions"),
    )


_SESSIONIZE_SQL = f"""
WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
),
marked AS (
  SELECT user_id,
         CASE WHEN lag(ts_us) OVER w IS NULL
                OR ts_us - lag(ts_us) OVER w > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
)
SELECT user_id, count(*) AS n_events, sum(is_new)::BIGINT AS n_sessions
FROM marked
GROUP BY user_id
"""


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated scalar subquery — per-part minimum cost.

    (Adapted: no partsupp, so lineitem bridges parts to suppliers and
    "cost" is the minimum extended price a supplier ever charged for the
    part.) Scale: the per-(part, supplier) aggregate and the per-part min
    ride the SAME shuffle key prefix (partkey) — Catalyst plans the second
    aggregate without a re-shuffle; supplier/nation dims broadcast.
    """
    t = load_tables(spark, sf_dir, "lineitem", "part", "supplier", "nation")
    p = t["part"].filter(F.col("p_size").between(10, 15))
    cost = (
        t["lineitem"]
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_partkey", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("cost"))
    )
    best = cost.groupBy("p_partkey").agg(F.min("cost").alias("best_cost"))
    return (
        cost.join(best, "p_partkey")
        .filter(F.col("cost") == F.col("best_cost"))
        .join(
            F.broadcast(t["supplier"]),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(t["nation"]),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "p_partkey",
            "s_name",
            "n_name",
            F.round("cost", 2).alias("min_cost"),
        )
    )


_Q2_SQL = """
WITH cost AS (
  SELECT p_partkey, l_suppkey, min(l_extendedprice) AS cost
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_size BETWEEN 10 AND 15
  GROUP BY p_partkey, l_suppkey
)
SELECT c.p_partkey, s_name, n_name, round(c.cost, 2) AS min_cost
FROM cost c
JOIN supplier ON c.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE c.cost = (SELECT min(cost) FROM cost c2 WHERE c2.p_partkey = c.p_partkey)
"""


def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: LIKE-filtered part, 4-way join, profit by nation/year.

    Scale: part filter prunes before the broadcast; the only big shuffle is
    lineitem⋈orders on orderkey; the groupBy rides partial aggregation.
    """
    t = load_tables(
        spark, sf_dir, "lineitem", "orders", "part", "supplier", "nation"
    )
    p = t["part"].filter(F.col("p_name").like("%gear%"))
    return (
        t["lineitem"]
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(t["supplier"]),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(t["nation"]),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            # Round per ROW to cents, then sum: the per-row product is one
            # IEEE multiplication (bit-identical across engines) and the sum
            # of integer cents is exact and order-independent — unlike
            # rounding an order-dependent fractional-double sum, which can
            # straddle a tie boundary differently per engine.
            (
                F.sum(
                    F.floor(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                        + F.lit(0.5)
                    )
                )
                / 100
            ).alias("profit")
        )
    )


_Q9_SQL = """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INT) AS o_year,
       sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)) / 100 AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%gear%'
GROUP BY n_name, year(o_orderdate)
"""


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: HAVING against a scalar-subquery fraction of total.

    (Adapted: "value" is lineitem revenue from suppliers of one nation.)
    Scale: the per-part aggregate and the global total reuse one filtered
    relation; the total is a 1-row broadcast, so the HAVING is a map-side
    filter — no second pass over the data.
    """
    t = load_tables(spark, sf_dir, "lineitem", "supplier", "nation")
    nation_supp = (
        t["supplier"]
        .join(
            F.broadcast(
                t["nation"].filter(F.col("n_name") == "NATION_3")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    value = (
        t["lineitem"]
        .join(F.broadcast(nation_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum("l_extendedprice").alias("value"))
    )
    # threshold = 1.5× the mean part value: scale-invariant (non-empty at
    # every SF), same "significant fraction of total" semantics as Q11.
    from arcane_framework_spark.operators.scale import with_broadcast_scalar

    total = value.agg(
        (F.sum("value") / F.count(F.lit(1)) * 1.5).alias("threshold")
    )
    return (
        with_broadcast_scalar(value, total)
        .filter(F.col("value") > F.col("threshold"))
        .select("l_partkey", F.round("value", 2).alias("part_value"))
    )


_Q11_SQL = """
WITH v AS (
  SELECT l_partkey, sum(l_extendedprice) AS value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY l_partkey
)
SELECT l_partkey, round(value, 2) AS part_value
FROM v
WHERE value > 1.5 * (SELECT sum(value) / count(*) FROM v)
"""


def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested semi-joins — suppliers who moved big volumes
    of the filtered parts.

    Scale: the quantity aggregate shuffles on (suppkey, partkey) once; the
    supplier list is then a broadcast-semi join; nothing is re-scanned.
    """
    t = load_tables(spark, sf_dir, "lineitem", "part", "supplier", "nation")
    p = t["part"].filter(F.col("p_name").like("small%"))
    big = (
        t["lineitem"]
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    return (
        t["supplier"]
        .join(big, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(
            F.broadcast(t["nation"]),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "n_name")
    )


_Q20_SQL = """
SELECT s_suppkey, s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'small%'
    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_suppkey, l_partkey
  HAVING sum(l_quantity) > 50
)
"""


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late shipper on a
    multi-supplier order (EXISTS + NOT EXISTS semantics).

    (Adapted: "late" = shipped more than 60 days after the order date.)
    Scale: expressed as one per-(order, supplier) aggregate + one per-order
    aggregate instead of two correlated EXISTS probes — the order-level
    stats are computed once on the orderkey shuffle and broadcast back,
    which is how the correlated form should execute anyway.
    """
    t = load_tables(spark, sf_dir, "lineitem", "orders", "supplier")
    o = t["orders"].filter(F.col("o_orderstatus") == "F")
    lo = t["lineitem"].join(
        o.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    per_supp = lo.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ).cast("int")
        ).alias("is_late")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("is_late").alias("n_late"),
    )
    waiting = (
        per_supp.filter(F.col("is_late") == 1)
        .join(
            per_order.filter((F.col("n_supp") > 1) & (F.col("n_late") == 1)),
            "l_orderkey",
        )
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    return waiting.join(
        F.broadcast(t["supplier"]),
        F.col("l_suppkey") == F.col("s_suppkey"),
    ).select("s_suppkey", "s_name", "numwait")


_Q21_SQL = """
WITH per_supp AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END) AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY l_orderkey, l_suppkey
),
per_order AS (
  SELECT l_orderkey, count(*) AS n_supp, sum(is_late) AS n_late
  FROM per_supp GROUP BY l_orderkey
)
SELECT s_suppkey, s_name, count(*) AS numwait
FROM per_supp ps
JOIN per_order po ON ps.l_orderkey = po.l_orderkey
JOIN supplier ON ps.l_suppkey = s_suppkey
WHERE ps.is_late = 1 AND po.n_supp > 1 AND po.n_late = 1
GROUP BY s_suppkey, s_name
"""


TPCH_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q9_product_type_profit": q9_product_type_profit,
    "q11_important_parts": q11_important_parts,
    "q20_excess_shippers": q20_excess_shippers,
    "q21_waiting_suppliers": q21_waiting_suppliers,
    "q4_late_shipment_priority": q4_late_shipment_priority,
    "q6_revenue_forecast": q6_revenue_forecast,
    "q7_nation_trade_volume": q7_nation_trade_volume,
    "q10_returned_items": q10_returned_items,
    "q13_order_count_distribution": q13_order_count_distribution,
    "q14_promo_revenue": q14_promo_revenue,
    "q15_top_suppliers": q15_top_suppliers,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q18_large_volume_orders": q18_large_volume_orders,
    "q19_disjunctive_predicates": q19_disjunctive_predicates,
    "q22_inactive_customers": q22_inactive_customers,
    "q8_market_share": q8_market_share,
    "q12_shipping_modes": q12_shipping_modes,
    "q16_supplier_part_counts": q16_supplier_part_counts,
    "rollup_order_priority": rollup_order_priority,
    "cube_order_status": cube_order_status,
    "ntile_customer_value": ntile_customer_value,
    "setops_repeat_customers": setops_repeat_customers,
    "events_sessionize": events_sessionize,
}

TPCH_ORACLE_SQL: dict[str, str] = {
    "q2_min_cost_supplier": _Q2_SQL,
    "q9_product_type_profit": _Q9_SQL,
    "q11_important_parts": _Q11_SQL,
    "q20_excess_shippers": _Q20_SQL,
    "q21_waiting_suppliers": _Q21_SQL,
    "q4_late_shipment_priority": _Q4_SQL,
    "q6_revenue_forecast": _Q6_SQL,
    "q7_nation_trade_volume": _Q7_SQL,
    "q10_returned_items": _Q10_SQL,
    "q13_order_count_distribution": _Q13_SQL,
    "q14_promo_revenue": _Q14_SQL,
    "q15_top_suppliers": _Q15_SQL,
    "q17_small_quantity_revenue": _Q17_SQL,
    "q18_large_volume_orders": _Q18_SQL,
    "q19_disjunctive_predicates": _Q19_SQL,
    "q22_inactive_customers": _Q22_SQL,
    "q8_market_share": _Q8_SQL,
    "q12_shipping_modes": _Q12_SQL,
    "q16_supplier_part_counts": _Q16_SQL,
    "rollup_order_priority": _ROLLUP_SQL,
    "cube_order_status": _CUBE_SQL,
    "ntile_customer_value": _NTILE_SQL,
    "setops_repeat_customers": _SETOPS_SQL,
    "events_sessionize": _SESSIONIZE_SQL,
}
