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
- Bloom filter: Bloom 1970. ``m``-bit bitmap as 32-bit words packed in
  BIGINTs, ``k`` salted hashes; membership = all k bits set (no false
  negatives). Mergeable by ``bit_or``; the probe is k broadcast joins
  so the probe side never shuffles — scan pruning before the join.

Reference parity: the reference ingestion framework has no sketch
surface; this is SURVEY §2.9 extension territory (X90/X91/X92).
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


#: Bloom filter dimensions: m bits stored as 32-bit words inside BIGINTs
#: (mask = 1L << (bit % 32) stays positive in BOTH engines — no sign-bit
#: edge case), k salted hash rows. With n build keys, FPR ~=
#: (1 - exp(-k*n/m))^k; m=4096 / k=4 stays under ~1% up to n ~= 350.
#: Size the filter to the BUILD side: the state is m/8 bytes no matter
#: how many keys were folded in.
BLOOM_M = 4096
BLOOM_K = 4


def _bloom_bit(value: Column, j: Column) -> Column:
    """Bit position for hash row ``j`` of a value: the same md5-salt
    construction as Count-Min, namespaced ``bloom<j>``."""
    return (
        _hash60(
            F.concat_ws(
                "|",
                F.concat(F.lit("bloom"), j.cast("string")),
                value.cast("string"),
            )
        )
        % BLOOM_M
    )


def bloom_build(items: DataFrame, value_col: str) -> DataFrame:
    """The Bloom state: (word_idx, word) — an m-bit bitmap as up to
    ``BLOOM_M/32`` BIGINT words (words with no bit set are absent).

    All-integer md5 bit placement, so another engine reproduces the
    bitmap BIT-FOR-BIT. Mergeable by ``bit_or`` (union of two bitmaps =
    filter of the union of key sets), incrementally maintainable by the
    same fold, and always broadcastable (m/8 bytes regardless of how
    many keys were folded in) — which is the 100 TB use: build the
    filter over a selective dim predicate once, broadcast it, and prune
    the probe-side scan BEFORE any join shuffle moves non-matching rows.
    One explode of k rows per key, one map-side-combined aggregation.
    """
    ks = F.explode(F.sequence(F.lit(0), F.lit(BLOOM_K - 1))).alias("j")
    exploded = items.select(F.col(value_col).alias("__v"), ks)
    bit = _bloom_bit(F.col("__v"), F.col("j"))
    return (
        exploded.select(
            F.shiftright(bit, 5).alias("word_idx"),
            bit.alias("__bit"),
        )
        .select(
            "word_idx",
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(__bit % 32 AS INT))"
            ).alias("__mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("__mask").alias("word"))
    )


def bloom_probe(items: DataFrame, bloom: DataFrame,
                value_col: str) -> DataFrame:
    """``items`` + a ``bloom_passed`` boolean: true iff all k bits for
    ``value_col`` are set in the filter (i.e. the row survives pruning;
    true members ALWAYS pass — Bloom has no false negatives).

    Deliberately k broadcast left joins against the tiny word table
    instead of explode + re-group: the probe side keeps its partitioning
    and never shuffles — pruning must not cost what it saves. Catalyst
    collapses the word lookups into broadcast hash joins with the probe
    stream intact. The word table is persisted (scoped) so the k joins
    broadcast ONE materialization instead of re-aggregating the build
    side per join.
    """
    from arcane_framework_spark.operators.cache import scoped_persist

    bloom = scoped_persist(bloom)
    out = items
    passed = F.lit(True)
    for j in range(BLOOM_K):
        bit = _bloom_bit(F.col(value_col), F.lit(j))
        side = bloom.select(
            F.col("word_idx").alias(f"__w{j}"),
            F.col("word").alias(f"__word{j}"),
        )
        out = (
            out.withColumn(f"__w{j}", F.shiftright(bit, 5))
            .withColumn(f"__b{j}", bit)
            .join(F.broadcast(side), on=f"__w{j}", how="left")
        )
        mask = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(__b{j} % 32 AS INT))"
        )
        passed = passed & (
            F.coalesce(F.col(f"__word{j}"), F.lit(0)).bitwiseAND(mask) != 0
        )
    drop = [c for j in range(BLOOM_K) for c in (f"__w{j}", f"__b{j}",
                                                f"__word{j}")]
    return out.withColumn("bloom_passed", passed).drop(*drop)


#: Bottom-k quantile-sketch size: estimates from a deterministic
#: hash-ordered sample of k values per group.
BOTTOMK_K = 64


def bottomk_sample(items: DataFrame, value_col: str, id_col: str,
                   group_cols: list[str] | None = None,
                   k: int = BOTTOMK_K) -> DataFrame:
    """The mergeable quantile-sketch state: per group, the ``k`` rows
    whose md5(id) sample-rank is smallest — a DETERMINISTIC uniform
    sample (the hash plays the role of the random key in bottom-k/KMV
    sketches, fixed so another engine reproduces the exact row set).

    The rank hashes the RECORD ID, never the value: double-to-string
    formatting differs between engines, integer ids do not. Mergeable:
    the bottom-k of a union is the bottom-k of the union of bottom-ks;
    incremental by the same fold; bounded state per group. One shuffle
    with WindowGroupLimit pushing the top-k partially map-side.
    """
    from pyspark.sql import Window

    group_cols = group_cols or []
    ranked = items.select(
        *group_cols,
        F.col(value_col).alias("value"),
        F.md5(F.col(id_col).cast("string")).alias("__rk"),
    )
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy("__rk")
    return (
        ranked.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(*group_cols, "value", "__rk")
    )


def bottomk_quantiles(sample: DataFrame, qs: list[float],
                      group_cols: list[str] | None = None) -> DataFrame:
    """Collapse a bottom-k sample to quantile estimates: per group, the
    sample is VALUE-sorted and quantile q reads element
    ``floor(q * (n - 1))`` — pure index arithmetic on the deterministic
    sample, so the whole estimate is engine-exact (no interpolation, no
    float summation; the emitted values are untouched input doubles).
    Emits one row per group with ``q<percent>`` columns."""
    group_cols = group_cols or []
    agg = sample.groupBy(*group_cols).agg(
        F.array_sort(F.collect_list("value")).alias("__vals"),
        F.count(F.lit(1)).alias("sample_n"),
    )
    cols = [
        F.element_at(
            "__vals",
            (
                F.floor(F.lit(q) * (F.col("sample_n") - 1)) + 1
            ).cast("int"),
        ).alias(f"q{int(round(q * 100))}")
        for q in qs
    ]
    return agg.select(*group_cols, "sample_n", *cols)


#: KMV (k-minimum-values / theta) sketch size and the 60-bit hash-space
#: size shared with _hash60.
KMV_K = 64
KMV_H = 1 << 60


def kmv_sketch(items: DataFrame, value_col: str,
               group_cols: list[str] | None = None,
               k: int = KMV_K) -> DataFrame:
    """The KMV (theta) sketch: per group, the ``k`` smallest DISTINCT
    60-bit md5 hashes of the values — one row per retained hash.

    Mergeable (union + re-bottom-k), engine-exact (fixed hash, integer
    ordering), and it supports SET ALGEBRA no single-set sketch can:
    intersection/union cardinalities between groups via
    ``kmv_intersection``. Distinct-ness is inherent — duplicates hash
    identically and collapse in the per-group distinct."""
    from pyspark.sql import Window

    group_cols = group_cols or []
    hashed = items.select(
        *group_cols, _hash60(F.col(value_col)).alias("h")
    ).distinct()
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy("h")
    return (
        hashed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_intersection(sketch: DataFrame, group_col: str,
                     k: int = KMV_K) -> DataFrame:
    """Pairwise intersection-cardinality estimates between every two
    groups of a KMV sketch table: (group_a, group_b, n_common, theta,
    est_intersection).

    Standard theta-sketch algebra: per group, ``theta`` = the k-th
    minimum hash when the sketch is FULL (the set had >= k members),
    else the full hash space H (the sketch IS the set). For a pair,
    hashes present in BOTH sketches and below ``min(theta_a, theta_b)``
    are a uniform sample of the intersection at sampling fraction
    ``theta/H`` — so ``est = n_common * H / theta``, all-integer except
    the one final division. When both sketches are exact the estimate
    is the exact intersection count."""
    per_group = sketch.groupBy(F.col(group_col).alias("g")).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("h").alias("kth"),
    ).select(
        "g",
        F.when(F.col("n_kept") >= k, F.col("kth"))
        .otherwise(F.lit(KMV_H)).alias("theta"),
    )
    # every (a < b) pair with its combined theta — pairs whose sampled
    # intersection is EMPTY must still emit a zero-estimate row
    grid = (
        per_group.select(F.col("g").alias("group_a"),
                         F.col("theta").alias("__ta"))
        .crossJoin(
            per_group.select(F.col("g").alias("group_b"),
                             F.col("theta").alias("__tb"))
        )
        .filter(F.col("group_a") < F.col("group_b"))
        .select(
            "group_a", "group_b",
            F.least("__ta", "__tb").alias("theta"),
        )
    )
    a = sketch.select(F.col(group_col).alias("group_a"), "h")
    b = sketch.select(F.col(group_col).alias("group_b"), "h")
    common = (
        a.join(b, "h")
        .filter(F.col("group_a") < F.col("group_b"))
        .join(F.broadcast(grid), ["group_a", "group_b"])
        .filter(F.col("h") < F.col("theta"))
        .groupBy("group_a", "group_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    joined = grid.join(common, ["group_a", "group_b"], "left").select(
        "group_a", "group_b",
        F.coalesce(F.col("n_common"), F.lit(0)).cast("long").alias(
            "n_common"
        ),
        F.col("theta").cast("long").alias("theta"),
    )
    est = (
        F.col("n_common").cast("double") * F.lit(float(KMV_H))
        / F.col("theta").cast("double")
    )
    return joined.select(
        "group_a", "group_b", "n_common", "theta",
        (F.floor(est * 100 + F.lit(0.5)) / 100).alias("est_intersection"),
    )
