"""Deterministic sampling / dataset splitting for training pipelines.

``sample()``/``randomSplit()`` are seed-dependent and partition-order
sensitive — rerunning on a re-partitioned corpus moves documents between
train and validation, which silently contaminates evals. The pipeline-grade
primitive is HASH splitting: the split is a pure function of the row's key,
so it is stable across runs, engines, partitionings, and incremental
arrivals (a new doc lands in the same split forever).

Mechanics: ``md5(salt || '#' || key)`` is uniform over hex strings; the
first 8 hex chars compared LEXICALLY against precomputed hex thresholds
partition [0, 16^8) into the requested fractions. String comparison on hex
is identical in every engine — the DuckDB oracle replays it verbatim.
Map-side only: no shuffle, no state, any scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Default corpus split — tweak per pipeline.
DEFAULT_SPLITS: dict[str, float] = {"train": 0.8, "val": 0.1, "test": 0.1}


def _hex_thresholds(splits: dict[str, float]) -> list[tuple[str, str]]:
    """[(split_name, upper_hex_bound)] with cumulative 8-hex-digit bounds."""
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    out, acc = [], 0.0
    for name, frac in splits.items():
        acc += frac
        bound = min(int(acc * 16 ** 8), 16 ** 8 - 1)
        out.append((name, format(bound, "08x")))
    return out


def split_expr(key_cols: Sequence[str | Column],
               splits: dict[str, float] | None = None,
               salt: str = "split") -> Column:
    """Split-name column from a deterministic hash of the key columns.

    ``salt`` namespaces independent splits of the same corpus (choose a new
    salt to re-shuffle); same salt + key ⇒ same split, forever.
    """
    splits = splits or DEFAULT_SPLITS
    cols = [F.col(c) if isinstance(c, str) else c for c in key_cols]
    bucket = F.substring(
        F.md5(F.concat_ws("#", F.lit(salt), *[c.cast("string") for c in cols])),
        1,
        8,
    )
    # Build the when-chain inside-out: the innermost branch is the LAST
    # split; each earlier split claims buckets below its upper bound.
    expr: Column | None = None
    for name, bound in reversed(_hex_thresholds(splits)):
        expr = (
            F.lit(name)
            if expr is None
            else F.when(bucket >= F.lit(bound), expr).otherwise(F.lit(name))
        )
    return expr


def with_split(df: DataFrame, key_cols: Sequence[str],
               splits: dict[str, float] | None = None,
               salt: str = "split", column_name: str = "split") -> DataFrame:
    """Attach the deterministic split assignment (map-side projection)."""
    return df.withColumn(column_name, split_expr(key_cols, splits, salt))


def leakage_guarded_split(docs: DataFrame, pairs: DataFrame,
                          id_col: str = "doc_id",
                          splits: dict[str, float] | None = None,
                          salt: str = "split",
                          column_name: str = "split",
                          components: DataFrame | None = None) -> DataFrame:
    """Hash split where near-duplicate CLUSTERS move as one unit.

    Plain hash splitting leaks: a document in train and its near-duplicate
    in test is an eval contamination the split hash cannot see. Here each
    doc's split is hashed from its cluster key — the canonical (min) id of
    its connected component in the near-dup ``pairs`` graph — so a
    train/test boundary can never separate two near-duplicates. Docs
    outside any pair hash their own id (identical to ``with_split``).

    Scale: the component table is proportional to the number of PAIRED
    docs (usually a small fraction of the corpus), joined once to the
    corpus on the id; the split itself stays a map-side hash. Returns
    ``docs`` + (cluster_key, split).
    """
    from arcane_framework_spark.operators.graph import connected_components

    # ``components``: reuse a materialized (node, component) side table
    # instead of recomputing CC — see dedup_clusters / prep.shared_prep.
    comp = (
        components
        if components is not None
        else connected_components(pairs)
    ).select(
        F.col("node").alias(id_col), F.col("component").alias("__cluster")
    )
    return (
        docs.join(comp, id_col, "left")
        .withColumn(
            "cluster_key", F.coalesce(F.col("__cluster"), F.col(id_col))
        )
        .drop("__cluster")
        .withColumn(column_name, split_expr(["cluster_key"], splits, salt))
    )


def split_sql(key_sql: str, splits: dict[str, float] | None = None,
              salt: str = "split") -> str:
    """The identical assignment as a SQL CASE (the DuckDB oracle half)."""
    splits = splits or DEFAULT_SPLITS
    bucket = f"substr(md5('{salt}' || '#' || {key_sql}), 1, 8)"
    thresholds = _hex_thresholds(splits)
    cases = " ".join(
        f"WHEN {bucket} < '{bound}' THEN '{name}'"
        for name, bound in thresholds[:-1]
    )
    return f"CASE {cases} ELSE '{thresholds[-1][0]}' END"


def stratified_sample(df: DataFrame, strata_col: str, fraction: float,
                      id_col: str = "vec_id", salt: str = "strat",
                      num_groups: int = 32) -> DataFrame:
    """Exact deterministic stratified sample: the first
    ``floor(n_s · fraction)`` rows of every stratum in hash order — the
    class-balanced subsample a labeled-embedding pipeline takes without a
    seed-dependent ``sampleBy`` (whose output moves when partitioning
    changes).

    The per-stratum order is ``(id % num_groups, md5(salt#id), id)`` —
    hash-random but reproducible anywhere md5 exists. EXACT per-stratum
    counts need a per-stratum rank; ranking a 100 TB stratum in one
    window task is the skew trap, so the rank is two-level, the
    ``pack_documents`` shape: a local rank within (stratum, id-group) +
    broadcast offsets of preceding groups' row counts (|strata| × G
    rows, metadata-scale, the only single-partition window). Fractions
    should be binary-exact (0.25, 0.5, …) so ``floor(n·f)`` matches
    across engines bit-for-bit.

    Returns the sampled rows of ``df`` (all original columns).
    """
    from pyspark.sql import Window

    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    bucket = F.md5(
        F.concat_ws("#", F.lit(salt), F.col(id_col).cast("string"))
    )
    base = df.withColumn("__grp", F.col(id_col) % num_groups).withColumn(
        "__bk", bucket
    )
    from arcane_framework_spark.operators.scale import bucket_offsets

    w_local = Window.partitionBy(strata_col, "__grp").orderBy("__bk", id_col)
    local = base.withColumn("__rk", F.row_number().over(w_local))
    counts = bucket_offsets(
        base, [strata_col], ["__grp"], ["__grp"], with_total=True
    )
    return (
        local.join(F.broadcast(counts), [strata_col, "__grp"])
        .filter(
            F.col("__off") + F.col("__rk")
            <= F.floor(F.col("__tot") * F.lit(fraction))
        )
        .drop("__grp", "__bk", "__rk", "__off", "__tot")
    )


def pps_systematic_sample(df: DataFrame, n: int,
                          id_col: str = "doc_id",
                          weight_col: str = "n_tokens",
                          num_groups: int = 64) -> DataFrame:
    """Deterministic probability-proportional-to-size systematic sampling.

    Classic PPS: lay the documents out on a line in a deterministic order
    (``(id % num_groups, id)`` — the distributed-prefix-sum order packing
    uses), each occupying an integer-weight-length interval, then take the
    ``n`` evenly spaced ticks ``tick_j = ⌊(2j+1)·T / (2n)⌋``. A document is
    picked once per tick inside its interval, so E[picks] = n·w/T exactly —
    weighted sampling with NO floating point: every engine computes the
    identical sample (pow/ln-based weighted reservoirs are not
    bit-reproducible across libms). Documents heavier than T/n can be
    picked multiple times (reported in ``n_picks``; standard PPS
    semantics). Requires ``2·n·T < 2^63`` (n ≤ 1e5 with T ≤ 1e13 tokens) —
    ASSERTED in-plan against the computed total (`raise_error`, no driver
    action); a zero total weight (all-zero or empty input) returns an
    EMPTY sample in both engines rather than engine-divergent
    null-vs-error division behavior.

    Scale: per-group prefix windows + one broadcast of G group offsets +
    one broadcast total — the pack_documents shape; no global sort, no
    single-partition data window. Returns picked rows only:
    (id, weight, n_picks).
    """
    from arcane_framework_spark.operators.packing import pack_documents

    if n < 1:
        raise ValueError(f"sample size n must be >= 1, got {n}")
    cum = pack_documents(
        df.select(id_col, weight_col), budget=1, id_col=id_col,
        tokens_col=weight_col, num_groups=num_groups,
    ).select(
        F.col(id_col),
        F.col("n_tokens").alias("__w"),
        F.col("fill_before").alias("__c"),
    )
    total = cum.agg(F.sum("__w").cast("long").alias("__total"))
    from arcane_framework_spark.operators.scale import with_broadcast_scalar

    # Overflow precondition: the largest intermediate is 2n*x + T - 1
    # with x <= T, i.e. (2n+1)*T - 1 — so require T <= (2^63-1)/(2n+1).
    # (A bound of (2^63-1)/(2n) misses the +T-1 term: totals in the gap
    # pass the guard yet wrap, silently with ANSI off.)
    max_total = (2**63 - 1) // (2 * n + 1)
    guard = (
        F.when(
            F.col("__total") > max_total,
            F.expr(
                "raise_error('pps_systematic_sample: 2*n*T overflows "
                f"int64 (total weight > {max_total})')"
            ).cast("boolean"),
        ).otherwise(F.col("__total") > 0)  # zero/null total -> empty
    )

    # A(x) = #ticks below x = clamp(⌊(2n·x + T − 1) / (2T)⌋, ·, n);
    # picks = A(c + w) − A(c). Pure int64 arithmetic in both engines.
    below = (
        f"least(cast({n} as bigint), "
        f"(2*{n}*__x + __total - 1) div (2*__total))"
    )
    out = (
        with_broadcast_scalar(cum, total)
        .filter(guard)
        .withColumn("__hi", F.expr(below.replace("__x", "(__c + __w)")))
        .withColumn("__lo", F.expr(below.replace("__x", "__c")))
        .select(
            F.col(id_col),
            F.col("__w").alias(weight_col),
            (F.col("__hi") - F.col("__lo")).cast("int").alias("n_picks"),
        )
        .filter(F.col("n_picks") >= 1)
    )
    return out


def pps_sample_sql(n: int, weight_sql: str, id_sql: str = "doc_id",
                   num_groups: int = 64, table: str = "documents") -> str:
    """The identical PPS selection as DuckDB SQL (integer window cumsum),
    including the degenerate-input contract: zero total weight selects
    nothing (instead of a division error), an overflowing total errors."""
    max_total = (2**63 - 1) // (2 * n + 1)
    return f"""
WITH w AS (
  SELECT {id_sql} AS id, CAST({weight_sql} AS BIGINT) AS wt FROM {table}
),
cum AS (
  SELECT id, wt,
         CAST(coalesce(SUM(wt) OVER (
           ORDER BY id % {num_groups}, id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS c,
         CAST(SUM(wt) OVER () AS BIGINT) AS t
  FROM w
),
valid AS (
  SELECT * FROM cum
  WHERE CASE WHEN t > {max_total}
             THEN error('pps_systematic_sample: 2*n*T overflows int64')
             ELSE t > 0 END
)
SELECT id AS {id_sql}, wt AS n_tokens,
       CAST(least({n}, (2*{n}*(c + wt) + t - 1) // (2*t))
            - least({n}, (2*{n}*c + t - 1) // (2*t)) AS INT) AS n_picks
FROM valid
WHERE least({n}, (2*{n}*(c + wt) + t - 1) // (2*t))
      - least({n}, (2*{n}*c + t - 1) // (2*t)) >= 1
"""


#: 16^8 — the bucket space of the 8-hex-digit md5 prefix.
_BUCKET_SPACE = float(16 ** 8)


def mixture_sample(docs: DataFrame, source_col: str = "source",
                   weights: dict[str, float] | None = None,
                   key_cols: Sequence[str] = ("doc_id",),
                   salt: str = "mix") -> DataFrame:
    """Downsample each domain so the output approximates a target mixture
    (uniform across domains when ``weights`` is None) WITHOUT upsampling.

    The limiting domain is kept whole; every other domain is hash-sampled
    at ``frac_s = w_s * T / n_s`` where ``T = min_s(n_s / w_s)`` is the
    largest output size the corpus supports at the target weights. The
    sample itself is the deterministic md5-prefix filter from
    ``split_expr`` — stable across runs, partitionings, and engines — with
    the per-domain threshold attached via one broadcast join of a
    domains-sized table. Map-side otherwise: no corpus shuffle.

    Double arithmetic is ordered identically to the documented DuckDB
    oracle (``(w*T)/n`` then ``*16^8`` then floor), so thresholds are
    bit-identical cross-engine.
    """
    counts = docs.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n"))
    if weights is None:
        # Uniform target: frac_s = min(n)/n_s exactly.
        from arcane_framework_spark.operators.scale import (
            with_broadcast_scalar,
        )

        mn = counts.agg(F.min("__n").alias("__mn"))
        frac = F.col("__mn") / F.col("__n")
        fr = with_broadcast_scalar(counts, mn)
    else:
        spark = docs.sparkSession
        wdf = spark.createDataFrame(
            list(weights.items()), f"{source_col}: string, __w: double"
        )
        fr = counts.join(F.broadcast(wdf), source_col)
        t_df = fr.select(
            F.min(F.col("__n") / F.col("__w")).alias("__t")
        )
        from arcane_framework_spark.operators.scale import (
            with_broadcast_scalar,
        )

        fr = with_broadcast_scalar(fr, t_df)
        frac = F.least(
            F.lit(1.0), F.col("__w") * F.col("__t") / F.col("__n")
        )
    fr = fr.select(
        source_col,
        F.floor(frac * F.lit(_BUCKET_SPACE)).cast("long").alias("__thr"),
    )
    cols = [F.col(c).cast("string") for c in key_cols]
    bucket = F.substring(
        F.md5(F.concat_ws("#", F.lit(salt), *cols)), 1, 8
    )
    thr_hex = F.lower(F.lpad(F.hex(F.col("__thr")), 8, "0"))
    return (
        docs.join(F.broadcast(fr), source_col)
        .filter((F.col("__thr") >= F.lit(16 ** 8)) | (bucket < thr_hex))
        .drop("__thr")
    )


def top_fraction_per_group(df: DataFrame, group_col: str, score_col: str,
                           fraction: float, id_col: str = "doc_id",
                           num_groups: int = 32) -> DataFrame:
    """Per-group quality gate: keep the best ``floor(n_g · fraction)``
    rows of every group, ranked by an INTEGER score — "the top quartile
    of each source by quality", the per-domain counterpart of the global
    ``select_by_budget`` cut.

    ``score_col`` must be integral (fixed-point a float metric first):
    integer scores give identical ordering in every engine, and the
    effective per-group order is ``(score DESC, id % num_groups, id)`` —
    deterministic, with the hash-group term breaking up the one-task
    window a raw per-group rank would need. Ranking is two-level like
    ``stratified_sample``: a local row_number within (group, score,
    id-group), plus broadcast offsets from the (group, score, id-group)
    count table (metadata-scale — its window partitions per group).
    Fractions should be binary-exact (0.25, 0.5) so ``floor(n·f)``
    agrees across engines bit-for-bit.

    Returns the surviving rows of ``df`` (original columns).
    """
    from pyspark.sql import Window

    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    base = df.withColumn("__grp", F.col(id_col) % num_groups)
    w_local = Window.partitionBy(group_col, score_col, "__grp").orderBy(
        id_col
    )
    local = base.withColumn("__rk", F.row_number().over(w_local))
    from arcane_framework_spark.operators.scale import bucket_offsets

    counts = bucket_offsets(
        base, [group_col], [score_col, "__grp"],
        [F.col(score_col).desc(), "__grp"], with_total=True,
    )
    return (
        local.join(F.broadcast(counts), [group_col, score_col, "__grp"])
        .filter(
            F.col("__off") + F.col("__rk")
            <= F.floor(F.col("__tot") * F.lit(fraction))
        )
        .drop("__grp", "__rk", "__off", "__tot")
    )


# ---------------------------------------------------------------------------
# Deterministic interleaved training order
# ---------------------------------------------------------------------------

#: Hash-bucket fan-out for the distributed within-source rank. Correctness
#: is independent of the value; at 100 TB raise toward O(cluster cores).
ORDER_BUCKETS = 16


def interleaved_order(docs: DataFrame, id_col: str = "doc_id",
                      group_col: str = "source",
                      seed: str = "epoch0") -> DataFrame:
    """Deterministic, source-interleaved global training order:
    (position, id, source).

    Within each source, docs are shuffled by ``md5(seed # id)``; global
    ``position = (rank_within_source - 1) * S + source_index`` strictly
    round-robins the S sources (a training run reading by ``position``
    never sees long single-source stretches), is unique, and is a pure
    function of (seed, id, source) — rerunnable and engine-portable.

    Scale shape — NO corpus-scale single-partition window anywhere:
    the within-source rank uses the two-level scheme (cf.
    ``packing.pack_documents``): rows get a local rank inside
    (source, hash-bucket) windows; per-(source, bucket) counts (S x B
    rows, metadata-scale) produce bucket offsets via a tiny window;
    rank = offset + local rank. The source index / source count ride the
    same broadcast S-row dimension.
    """
    from pyspark.sql import Window

    key = F.md5(
        F.concat(F.lit(seed), F.lit("#"), F.col(id_col).cast("string"))
    )
    base = docs.select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("source"),
        key.alias("__key"),
    ).withColumn("__bkt", F.substring("__key", 1, 1))
    # Local rank inside (source, first-hex-digit bucket); bucket prefixes
    # order lexically, so offset(bucket) + local rank == rank over __key.
    w_local = Window.partitionBy("source", "__bkt").orderBy("__key", "id")
    local = base.withColumn("__lrk", F.row_number().over(w_local))
    from arcane_framework_spark.operators.scale import bucket_offsets

    offsets = bucket_offsets(base, ["source"], ["__bkt"], ["__bkt"])
    # S-row source dimension: alphabetical index + source count —
    # derived from the (metadata-scale) offsets table, NOT a third
    # corpus-scale docs.distinct() pass.
    w_src = Window.orderBy("source")
    srcs = (
        offsets.select("source").distinct()
        .withColumn("__sidx", F.row_number().over(w_src) - 1)
        .withColumn("__n_src", F.count(F.lit(1)).over(
            Window.partitionBy()
        ))
    )
    return (
        local.join(F.broadcast(offsets), ["source", "__bkt"])
        .join(F.broadcast(srcs), "source")
        .select(
            (
                (F.col("__off") + F.col("__lrk") - 1) * F.col("__n_src")
                + F.col("__sidx")
            ).cast("long").alias("position"),
            F.col("id").alias(id_col),
            "source",
        )
    )


# ---------------------------------------------------------------------------
# Temperature-scaled epoch allocation (data-mixture budgeting)
# ---------------------------------------------------------------------------

def epoch_allocation(docs: DataFrame, budget_tokens: int,
                     source_col: str = "source",
                     tokens_col: str = "n_tokens") -> DataFrame:
    """Per-source token budget under temperature-0.5 sampling:
    (source, n_tokens, weight, target_tokens, repeat_factor).

    The standard multi-source mixing rule (cf. multilingual-LM sampling,
    alpha-weighted): sampling weight proportional to n_tokens^alpha with
    alpha = 0.5 — up-weights small sources relative to proportional
    sampling without letting any source dominate. alpha is pinned at 0.5
    because sqrt is IEEE-exactly-rounded in every engine, while pow(x, a)
    is not — the DuckDB oracle matches bit-for-bit. The sqrt is snapped to
    integer milli-units before the normalizing sum so the sum is exact
    integer arithmetic (order-independent under Spark's partial aggs).

    ``repeat_factor`` > 1 means the source must be epoched (seen more
    than once) to fill its slice of the budget. One corpus-scale
    aggregation; everything after runs on S rows.
    """
    per_src = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.sum(F.col(tokens_col).cast("long")).alias("n_tokens")
    )
    milli = F.floor(F.sqrt(F.col("n_tokens")) * 1000 + F.lit(0.5)).cast(
        "long"
    )
    with_m = per_src.withColumn("__m", milli)
    from pyspark.sql import Window

    total_m = F.sum("__m").over(Window.partitionBy())
    w = F.col("__m") / total_m
    target = F.floor(w * F.lit(float(budget_tokens)) + F.lit(0.5)).cast(
        "long"
    )
    return with_m.select(
        "source",
        "n_tokens",
        (F.floor(w * 1e6 + F.lit(0.5)) / 1e6).alias("weight"),
        target.alias("target_tokens"),
        (
            F.floor(target / F.col("n_tokens") * 1e4 + F.lit(0.5)) / 1e4
        ).alias("repeat_factor"),
    )


def md5_bucket_expr(key: Column | str, salt: str, n_buckets: int) -> Column:
    """Deterministic bucket in [0, n_buckets) from ``md5(salt#key)`` —
    the one spelling of the repo's salted hash-bucket contract (shared
    by the CV fold assignment; the hex fold matches the DuckDB cast
    ``CAST(concat('0x', substring(md5(...), 1, 8)) AS BIGINT)``)."""
    c = F.col(key) if isinstance(key, str) else key
    return (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("#", F.lit(salt), c.cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("long")
        % n_buckets
    )


CV_FOLDS = 5


def cv_fold_stats(docs: DataFrame, n_folds: int = CV_FOLDS,
                  id_col: str = "doc_id", strata_col: str = "source",
                  tokens_col: str | None = None,
                  salt: str = "cv") -> DataFrame:
    """Deterministic k-fold assignment + balance report:
    (fold, n_docs, n_strata, n_tokens).

    fold = first 8 md5 hex digits of ``salt#id`` mod k — a pure function
    of the row key (same contract as ``split_expr``): stable across
    runs, engines, partitionings, and incremental arrivals, unlike
    ``randomSplit``. The report is the pre-flight check that folds came
    out balanced per stratum before an expensive CV run; the assignment
    expression itself is reusable map-side in any pipeline.
    """
    fold = md5_bucket_expr(id_col, salt, n_folds)
    toks = (
        F.col(tokens_col).cast("long") if tokens_col else F.lit(0)
    )
    return (
        docs.select(
            fold.alias("fold"),
            F.col(strata_col).alias("__s"),
            toks.alias("__t"),
        )
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count_distinct("__s").cast("long").alias("n_strata"),
            F.sum("__t").cast("long").alias("n_tokens"),
        )
    )
