"""Mergeable probabilistic sketches with ENGINE-REPRODUCIBLE arithmetic.

The 100 TB cardinality/frequency story: exact ``COUNT(DISTINCT)`` and
exact heavy-hitter counting shuffle every value; sketches reduce both to
a bounded register table that is MERGEABLE (per-partition sketches
combine by max / element-wise add), incrementally maintainable as a side
table, and tiny to broadcast. Spark ships ``approx_count_distinct``
(HLL++), but its register layout is engine-internal — it cannot be
cross-checked by another engine, persisted portably, or merged with a
sketch built elsewhere. These implementations fix the hash (md5) and
keep EVERY intermediate in exact integer arithmetic (dyadic rationals
as ``2^(51-rank)`` numerators, BIGINT counts), so DuckDB reproduces the
full register table and the final estimate BIT-FOR-BIT — the same
determinism discipline as the rest of the catalog.

Design notes (public algorithms):
- HyperLogLog: Flajolet/Fuss/Gandouet/Meunier 2007. ``m`` registers,
  register j = max over hashed items of (leading-zero count of the
  non-bucket hash bits) + 1. Estimate = alpha_m * m^2 / sum(2^-M_j).
  The sum of ``2^-M_j`` is computed as an exact BIGINT numerator over
  2^51 (every term is a power of two), so no float-summation order can
  diverge between engines; only the final single division is floating
  point. The standard small-range linear-counting correction needs
  ``ln`` (libm, NOT cross-engine-stable — see the q9 sqrt/log rule), so
  it is deliberately left to the caller: ``n_zero_registers`` is
  emitted for exactly that purpose.
- Count-Min: Cormode/Muthukrishnan 2005. ``d`` rows x ``w`` buckets of
  BIGINT counts; estimate(x) = min over rows of the bucket count. All
  integer — exact cross-engine. Heavy hitters = top-k by CMS estimate.

Reference parity: the reference ingestion framework has no sketch
surface; this is SURVEY §2.9 extension territory (X90/X91).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: HLL bucket-count exponent: m = 2^HLL_B registers.
HLL_B = 10
HLL_M = 1 << HLL_B

#: The hashed value is 60 bits (15 hex chars of md5 — fits BIGINT with
#: headroom); HLL_B bits select the bucket, leaving 50 rank bits.
HLL_RANK_BITS = 50

#: alpha_m for m >= 128 (FFGM07 eq. 3), computed ONCE in Python IEEE
#: double and injected into both engines as the identical double literal
#: (engine-side decimal-literal parsing rules differ — Spark and DuckDB
#: both type `0.7213` as DECIMAL with their own division scale rules, so
#: the expression must not be re-evaluated per engine).
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)

#: Count-Min dimensions: d hash rows x w buckets.
CMS_D = 4
CMS_W = 256


def _hash60(col: Column) -> Column:
    """60-bit integer md5 prefix of a string column — the one hash both
    engines compute identically (md5 hex -> first 15 chars -> int)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hll_registers(items: DataFrame, value_col: str,
                  group_cols: list[str] | None = None) -> DataFrame:
    """The HLL register table: one row per (group, bucket) with the max
    rank observed. THIS is the mergeable state — union two register
    tables and re-aggregate ``max(rank)`` to merge sketches; persist it
    as the incremental side table and fold new batches in with the same
    aggregation. Duplicates need no pre-dedup: a repeated value can
    only re-observe the same rank.
    """
    group_cols = group_cols or []
    h = _hash60(F.col(value_col))
    bucket = (h % HLL_M).alias("bucket")
    # Exact integer shift (NOT `h / HLL_M`, which is double division and
    # loses integer precision above 2^53 — h is 60-bit, so the rank could
    # silently diverge from DuckDB's integer `>>`).
    rest = F.shiftright(h, HLL_B)
    # rank = leading zeros of the 50 rank bits + 1 = 51 - bitlength(rest)
    # (bit length via length(bin(x)) — identical in Spark and DuckDB;
    # rest = 0 means all 50 bits are zero -> rank 51)
    rank = F.when(rest == 0, F.lit(HLL_RANK_BITS + 1)).otherwise(
        F.lit(HLL_RANK_BITS + 1) - F.length(F.bin(rest))
    ).cast("int")
    return (
        items.select(*group_cols, bucket, rank.alias("rank"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rank").alias("rank"))
    )


def hll_estimate(registers: DataFrame,
                 group_cols: list[str] | None = None) -> DataFrame:
    """Collapse a register table to (group, estimate, n_zero_registers,
    register_checksum).

    The indicator sum ``sum(2^-rank)`` is carried as the exact BIGINT
    numerator ``sum(2^(51-rank))`` over denominator ``2^51`` — empty
    registers (buckets no value hashed into) contribute a full ``2^51``
    each — so the only floating-point step is one final division and
    the result is bit-identical across engines. ``floor(x*100+0.5)/100``
    pins the emitted estimate to cents (the catalog's money rule).
    ``register_checksum = sum((bucket+1) * rank)`` pins the (bucket, rank)
    ASSIGNMENT, not just the rank multiset, so a cross-engine oracle that
    reproduces the register table hash-fails on any divergence.
    """
    group_cols = group_cols or []
    denom_unit = 1 << (HLL_RANK_BITS + 1)  # 2^51
    # libm-free dyadic terms: 2^(51-rank) == shiftleft(1, 51-rank)
    agg = registers.groupBy(*group_cols).agg(
        F.sum(
            F.expr(f"shiftleft(1L, {HLL_RANK_BITS + 1} - rank)")
        ).alias("__present_num"),
        F.count(F.lit(1)).alias("__n_present"),
        F.sum(
            (F.col("bucket") + 1) * F.col("rank")
        ).cast("long").alias("register_checksum"),
    )
    # Association order matters for bit-identical doubles: the oracle SQL
    # must spell the same left-assoc chain ((m*m)*alpha)*2^51 / denom.
    est = (
        F.lit(float(HLL_M)) * F.lit(float(HLL_M))
        * F.lit(HLL_ALPHA)
        * F.lit(float(denom_unit))
        / (
            F.col("__present_num")
            + (F.lit(HLL_M) - F.col("__n_present")) * F.lit(denom_unit)
        ).cast("double")
    )
    return agg.select(
        *group_cols,
        (F.floor(est * 100 + F.lit(0.5)) / 100).alias("hll_estimate"),
        (F.lit(HLL_M) - F.col("__n_present")).cast("long").alias(
            "n_zero_registers"
        ),
        "register_checksum",
    )


def hll_distinct(items: DataFrame, value_col: str,
                 group_cols: list[str] | None = None) -> DataFrame:
    """``hll_registers`` -> ``hll_estimate`` in one call: the
    approximate-COUNT(DISTINCT value) per group, two map-side-combined
    shuffles whose second input is at most ``groups x m`` rows."""
    return hll_estimate(
        hll_registers(items, value_col, group_cols), group_cols
    )


def cms_counts(items: DataFrame, value_col: str,
               weight_col: str | None = None) -> DataFrame:
    """The Count-Min state: (row, bucket, cnt) — ``CMS_D`` hash rows of
    ``CMS_W`` BIGINT counters. Mergeable by element-wise addition
    (union + re-sum); incremental by the same fold. One explode of d
    rows per item, one map-side-combined aggregation."""
    rows = F.explode(
        F.sequence(F.lit(0), F.lit(CMS_D - 1))
    ).alias("row")
    w = F.col(weight_col) if weight_col else F.lit(1)
    exploded = items.select(
        F.col(value_col).alias("__v"), w.alias("__w"), rows
    )
    bucket = (
        _hash60(F.concat_ws("|", F.col("row").cast("string"), F.col("__v")))
        % CMS_W
    ).alias("bucket")
    return (
        exploded.select("row", bucket, "__w")
        .groupBy("row", "bucket")
        .agg(F.sum("__w").cast("long").alias("cnt"))
    )


def cms_estimate(items: DataFrame, counts: DataFrame,
                 value_col: str) -> DataFrame:
    """CMS point-estimate for each DISTINCT value in ``items``:
    min over the d rows of the value's bucket counter. The count table
    is at most d*w rows — always broadcastable — so the probe is a
    map-side broadcast join however large the probed set is."""
    probes = items.select(F.col(value_col).alias("value")).distinct()
    d_rows = probes.select(
        "value",
        F.explode(F.sequence(F.lit(0), F.lit(CMS_D - 1))).alias("row"),
    ).select(
        "value", "row",
        (
            _hash60(
                F.concat_ws("|", F.col("row").cast("string"), F.col("value"))
            )
            % CMS_W
        ).alias("bucket"),
    )
    return (
        d_rows.join(F.broadcast(counts), ["row", "bucket"], "left")
        .groupBy("value")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_count"))
    )


def cms_heavy_hitters(items: DataFrame, value_col: str,
                      top_k: int = 20) -> DataFrame:
    """Top-``top_k`` values by CMS estimate (ties broken by value) —
    the bounded-memory heavy-hitter query. The candidate set probed is
    the distinct values present (exact at bench scale; at 100 TB the
    caller probes a sampled or streamed candidate set against the same
    broadcastable count table — the sketch state does not change)."""
    counts = cms_counts(items, value_col)
    est = cms_estimate(items, counts, value_col)
    return (
        est.orderBy(F.col("cms_count").desc(), "value")
        .limit(top_k)
        .select("value", "cms_count")
    )
