"""Scale utilities: salted joins for skew, bucketing for co-located joins.

These are the two knobs the catalog queries don't exercise automatically:

- **Salting** — when one join key carries a disproportionate share of rows
  (hot user, null-ish default key), AQE's skew-join split helps reads but
  a deliberately salted join bounds the worst partition by construction:
  the skewed side gets a random salt in [0, buckets); the small side is
  exploded across all salt values; the join key becomes (key, salt).
- **Bucketing** — persisting both sides of a recurring equi-join bucketed
  by the key lets every future join run exchange-free (verified in tests
  by asserting no Exchange under the SortMergeJoin).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SALT_COL = "__salt"
_SCALAR_KEY = "__scalar_key"


def with_broadcast_scalar(df: DataFrame, scalar_df: DataFrame) -> DataFrame:
    """Attach a 1-row aggregate (a global total, a computed threshold, a
    derived stride) to every row of ``df``.

    Implemented as an equi-join on a constant literal key rather than a
    bare ``crossJoin``. Catalyst's constant folding still collapses the
    ``1 = 1`` condition, so the physical plan is a
    BroadcastNestedLoopJoin — but against a 1-ROW build side, which costs
    the same as a broadcast hash join. The plan audit
    (tools/explain_audit.py) recognizes the pattern structurally (a global
    aggregate inside the BNLJ subtree) so *real* nested loops are still
    flagged.
    """
    return (
        df.withColumn(_SCALAR_KEY, F.lit(1))
        .join(
            F.broadcast(scalar_df.withColumn(_SCALAR_KEY, F.lit(1))),
            _SCALAR_KEY,
        )
        .drop(_SCALAR_KEY)
    )


def bucket_offsets(df: DataFrame, part_cols: Sequence[str],
                   bucket_cols: Sequence[str],
                   offset_order: Sequence,
                   value: "F.Column | None" = None,
                   with_total: bool = False) -> DataFrame:
    """The shared middle stage of every two-level distributed rank /
    prefix sum in this package: per-(partition, bucket) totals with an
    EXCLUSIVE running offset over the buckets.

    Returns (part_cols + bucket_cols, __off [, __tot]): ``__off`` is the
    sum of all preceding buckets' totals in ``offset_order`` (within the
    partition), ``__tot`` the partition total. ``value=None`` counts
    rows (rank offsets); a Column prefix-sums it (token/byte fill
    offsets). The output is bucket-cardinality — metadata-scale — so the
    offset window is cheap and the caller broadcasts the result back
    onto per-row local ranks. Used by stratified_sample,
    top_fraction_per_group, interleaved_order, pack_documents,
    select_by_budget, and plan_compaction; keeping the offset semantics
    here means a fix lands in all of them at once.
    """
    from pyspark.sql import Window

    agg = (F.count(F.lit(1)) if value is None else F.sum(value)).alias(
        "__cnt"
    )
    w_off = (
        Window.partitionBy(*part_cols)
        .orderBy(*offset_order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        df.groupBy(*part_cols, *bucket_cols)
        .agg(agg)
        .withColumn(
            "__off", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0))
        )
    )
    if with_total:
        out = out.withColumn(
            "__tot", F.sum("__cnt").over(Window.partitionBy(*part_cols))
        )
    keep = [*part_cols, *bucket_cols, "__off"] + (
        ["__tot"] if with_total else []
    )
    return out.select(*keep)


def zorder_key_sql(x_sql: str, y_sql: str) -> str:
    """Z-order (Morton) key of two 16-bit values as ONE SQL expression
    valid in both Spark SQL and DuckDB (``<<``/``&``/``|`` only — pure
    int64, bit-identical everywhere).

    Interleaves the low 16 bits of each input so rows close in BOTH
    dimensions land close in the sort order — the data-layout key behind
    multi-column file skipping (write sorted by z, and min/max pruning
    works for either predicate column). Standard magic-number bit spread.
    """

    def spread(v: str) -> str:
        e = f"(({v}) & 65535)"
        for shift, mask in ((8, 16711935), (4, 252645135),
                            (2, 858993459), (1, 1431655765)):
            e = f"((({e}) | (({e}) << {shift})) & {mask})"
        return e

    return f"({spread(x_sql)} | ({spread(y_sql)} << 1))"


def with_zorder_key(df: DataFrame, x_col: str, y_col: str,
                    out_col: str = "zkey") -> DataFrame:
    """Attach the Morton key column (map-side; repartitionByRange on it to
    lay files out for two-column skipping)."""
    return df.withColumn(out_col, F.expr(zorder_key_sql(x_col, y_col)))


#: Join types for which replicating the small side per salt is
#: duplicate-free. Right/full-outer would emit one null-extended row PER
#: SALT for every unmatched replicated small row; right_semi/anti have
#: the same replication problem from the other direction.
_SALT_SAFE_HOW = frozenset(
    {"inner", "left", "leftouter", "left_outer", "left_semi", "leftsemi",
     "semi", "left_anti", "leftanti", "anti", "cross"}
)


def _check_salt_join_how(how: str) -> None:
    if how.lower().replace("_", "") not in {
        h.replace("_", "") for h in _SALT_SAFE_HOW
    }:
        raise ValueError(
            f"salted joins support only {sorted(_SALT_SAFE_HOW)} join "
            f"types, got {how!r}: the small side is replicated once per "
            "salt, so right/full-outer joins would emit num_salts "
            "duplicate null-extended rows per unmatched small-side row."
        )


def salted_join(skewed: DataFrame, small: DataFrame, on: str,
                num_salts: int = 16, how: str = "inner") -> DataFrame:
    """Equi-join with the skewed side salted across ``num_salts`` buckets.

    ``skewed`` gets a uniform random salt per row; ``small`` is replicated
    once per salt value (explode of a literal range — cheap when ``small``
    is the dimension side). The output drops the salt column. Worst-case
    partition size becomes ``hot_key_rows / num_salts``.
    """
    _check_salt_join_how(how)
    salted_big = skewed.withColumn(
        SALT_COL, (F.rand(seed=42) * num_salts).cast("int")
    )
    replicated = small.withColumn(
        SALT_COL,
        F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1))),
    )
    return salted_big.join(replicated, on=[on, SALT_COL], how=how).drop(SALT_COL)


def auto_salted_join(skewed: DataFrame, small: DataFrame, on: str,
                     num_salts: int = 16, skew_threshold: float = 4.0,
                     top_k: int = 20, how: str = "inner") -> DataFrame:
    """The diagnostic→remedy bridge: run :func:`skew_report` on the big
    side's join key, and salt ONLY the keys it flags.

    ``salted_join`` salts every row and replicates the entire small side
    ``num_salts``× — correct, but at 100 TB the replication cost is paid
    for the 99.9% of keys that never needed it. Here the hot-key set
    (skew ≥ ``skew_threshold`` among the ``top_k`` hottest) is broadcast
    to both sides: hot rows get a uniform salt in [0, num_salts), cold
    rows salt 0; the small side replicates hot keys ``num_salts``× and
    cold keys once. The join stays a plain equi-join on (key, salt), so
    Catalyst/AQE treat it like any other shuffle join — but the one
    reducer that would have received the hot key's entire partition now
    receives 1/num_salts of it, and the small side grows by only
    ``num_salts × |hot keys|`` rows.

    Cost: one extra map-side-combined count aggregate over the big side
    (the skew report) — the pre-flight scan you were going to run anyway
    before shuffling 100 TB on an unknown key. The hot-key set is top_k
    rows at most: metadata-scale, always broadcastable.
    """
    _check_salt_join_how(how)
    hot = (
        skew_report(skewed, on, top_k=top_k)
        .filter(F.col("skew") >= F.lit(skew_threshold))
        .select(F.col(on).alias("__hot_key"))
    )
    salted_big = (
        skewed.join(
            F.broadcast(hot), F.col(on) == F.col("__hot_key"), "left"
        )
        .withColumn(
            SALT_COL,
            F.when(
                F.col("__hot_key").isNotNull(),
                (F.rand(seed=42) * num_salts).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .drop("__hot_key")
    )
    replicated = (
        small.join(
            F.broadcast(hot), F.col(on) == F.col("__hot_key"), "left"
        )
        .withColumn(
            SALT_COL,
            F.explode(
                F.when(
                    F.col("__hot_key").isNotNull(),
                    F.sequence(F.lit(0), F.lit(num_salts - 1)),
                ).otherwise(F.array(F.lit(0)))
            ),
        )
        .drop("__hot_key")
    )
    return salted_big.join(
        replicated, on=[on, SALT_COL], how=how
    ).drop(SALT_COL)


def session_scoped_table(spark: SparkSession, base: str) -> str:
    """``base`` suffixed with the session's application id (sanitized to
    an identifier): a per-session managed-table name.

    Managed tables share one ``spark.sql.warehouse.dir`` per JVM, so two
    concurrent sessions writing the SAME table name race on the table
    location's ``_temporary/`` staging dir and one dies with
    FileNotFoundException (observed: pytest + the correctness gate
    running the disk-dedup entry simultaneously). A production side
    table is single-writer by contract; harnesses are not — scoping the
    name by application id gives every session its own location while
    repeated writes within a session still overwrite in place.
    """
    app_id = spark.sparkContext.applicationId
    safe = "".join(c if c.isalnum() else "_" for c in app_id)
    return f"{base}__{safe}"


def gc_stale_side_tables(spark: SparkSession, base: str,
                         max_age_hours: float = 6.0) -> int:
    """Best-effort sweep of ``base__*`` warehouse dirs left behind by
    DEAD sessions (session-scoped tables outlive their session on disk).

    Only dirs whose mtime is older than ``max_age_hours`` are removed —
    concurrently-live sessions write within minutes of each other, so an
    age threshold keeps the sweep from deleting a live writer's table.
    Returns the number of dirs removed.
    """
    import os
    import shutil
    import time

    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    own = session_scoped_table(spark, base).lower()
    removed = 0
    try:
        entries = os.listdir(warehouse)
    except OSError:
        return 0
    cutoff = time.time() - max_age_hours * 3600
    for name in entries:
        if not name.startswith(f"{base.lower()}__") or name == own:
            continue
        path = os.path.join(warehouse, name)
        try:
            if os.path.isdir(path) and os.path.getmtime(path) < cutoff:
                shutil.rmtree(path, ignore_errors=True)
                removed += 1
        except OSError:
            continue
    return removed


def write_bucketed(df: DataFrame, table_name: str, bucket_cols: Sequence[str],
                   num_buckets: int = 32,
                   sort_cols: Sequence[str] | None = None) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed table.

    Two tables bucketed by the same key with the same bucket count join
    without any Exchange — the physical plan goes straight to (sorted)
    bucket-wise merge join. This is the storage-level answer to recurring
    100 TB joins: pay the shuffle once at write time.

    Concurrency contract: a managed table location is single-writer.
    Callers whose table may be written by several simultaneous sessions
    (test/bench/gate harnesses) must scope the name per session via
    ``session_scoped_table``.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    # A dropped-from-catalog table can leave its managed location behind
    # (e.g. after a session restart); clear it or saveAsTable refuses.
    import os
    import shutil

    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    leftover = os.path.join(warehouse, table_name.split(".")[-1].lower())
    shutil.rmtree(leftover, ignore_errors=True)
    # Repartition ON THE BUCKET KEY before the bucketed write: Spark's
    # hash repartitioning and bucketBy use the same Murmur3 pmod, so
    # each task then holds exactly one bucket's rows and keeps ONE open
    # parquet writer instead of one per bucket (arbitrary input
    # partitioning ⇒ up to tasks × buckets concurrent writers, each
    # buffering a row group on the heap — measured as the r14
    # stress1000 OOM: two 16g runs died in this write at 5M docs while
    # every family beside it stayed flat). The added exchange is the
    # shuffle the bucketed layout conceptually pays anyway ("pay the
    # shuffle once at write time"); it also collapses the layout to one
    # file per bucket, which the bucket-aligned readers prefer.
    writer = (
        df.repartition(num_buckets, *[F.col(c) for c in bucket_cols])
        .write.mode("overwrite")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: Sequence[str], how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables (exchange-free when buckets align)."""
    return spark.table(left_table).join(
        spark.table(right_table), on=list(on), how=how
    )


def skew_report(df: DataFrame, key_col: str, top_k: int = 10) -> DataFrame:
    """Join/aggregation-key skew diagnostic: the ``top_k`` hottest keys
    with their share of the table and their skew factor vs a perfectly
    uniform key distribution.

    The operational pre-flight check before shuffling 100 TB on a key:
    a skew factor of 500 on one key means one reducer gets 500x the
    average partition and the stage runs at the speed of that straggler
    — the signal to salt (``salted``), broadcast, or AQE-split before
    launching the real job.

    Output (key, cnt, share, skew) where share = cnt/n_rows and
    skew = cnt/(n_rows/n_keys), both rounded half-up to 4 decimals.

    Scale: per-key counts are ONE shuffle with map-side partial
    aggregation (cached — both consumers read the same materialization);
    the global (n_rows, n_keys) pair rides in as a 1-row broadcast
    scalar computed FROM the counts (no second table scan); the rank ≤ k
    filter plans as a distributed ``TakeOrderedAndProject(limit=k)`` —
    per-partition top-k then a k-row merge — so the window itself ranks
    only k rows. The report is top_k rows — driver-safe at any corpus
    size.
    """
    from pyspark.sql import Window

    from arcane_framework_spark.operators.cache import scoped_persist

    # counts feeds both the totals scalar and the rank — persist so the
    # table is scanned once, not twice.
    counts = (
        df.groupBy(F.col(key_col).alias("key"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .transform(scoped_persist)
    )
    totals = counts.agg(
        F.sum("cnt").alias("__n_rows"),
        F.count(F.lit(1)).alias("__n_keys"),
    )
    w = Window.orderBy(F.col("cnt").desc(), "key")
    # Rank+filter FIRST (bare window+filter is what Spark rewrites into a
    # map-side WindowGroupLimit), then attach the scalar to the top_k
    # survivors only.
    ranked = with_broadcast_scalar(
        counts.withColumn("__rk", F.row_number().over(w)).filter(
            F.col("__rk") <= top_k
        ),
        totals,
    )
    half_up = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000  # noqa: E731
    return ranked.select(
        F.col("key").alias(key_col),
        "cnt",
        half_up(F.col("cnt") / F.col("__n_rows")).alias("share"),
        # Double before the multiply: cnt * n_keys as int64 wraps on
        # extreme-skew tables (cnt ~ 1e10, n_keys ~ 1e9) — exactly the
        # inputs this diagnostic exists to flag; the DuckDB oracle
        # multiplies as DOUBLE too.
        half_up(
            F.col("cnt").cast("double") * F.col("__n_keys")
            / F.col("__n_rows")
        ).alias("skew"),
    )


def grouped_quantiles(df: DataFrame, group_col: str, value_col: str,
                      percents: Sequence[int] = (50, 90, 99)) -> DataFrame:
    """Exact per-group quantiles (lower convention) in ONE pass over the
    frequency bands: (group, n_rows, p50_<col>, p90_<col>, ...).

    Same band trick as :func:`grouped_median` — collapse to
    (group, value, count) with map-side combine, cumulative-sum the
    band table, then every requested percent is a conditional MIN over
    the same cumulated bands: ``min(value where 100*cum >= p*total)``.
    All integer comparisons (percents are whole percents), so there is
    no cross-engine interpolation or floating threshold: the p99 you
    publish in a datacard is the p99 every other engine computes.
    Window cost is the band table (distinct values per group), never the
    row stream — the shape that holds at 100 TB.
    """
    from pyspark.sql import Window

    bands = df.filter(F.col(value_col).isNotNull()).groupBy(
        F.col(group_col).alias("group"),
        F.col(value_col).cast("long").alias("value"),
    ).agg(F.count(F.lit(1)).cast("long").alias("__cnt"))
    w_cum = (
        Window.partitionBy("group")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("group")
    cum = bands.withColumn("__cum", F.sum("__cnt").over(w_cum)).withColumn(
        "__tot", F.sum("__cnt").over(w_tot)
    )
    aggs = [
        F.min(
            F.when(
                F.lit(100) * F.col("__cum") >= F.lit(int(p)) * F.col("__tot"),
                F.col("value"),
            )
        ).alias(f"p{int(p)}_{value_col}")
        for p in percents
    ]
    return (
        cum.groupBy("group")
        .agg(F.max("__tot").alias("n_rows"), *aggs)
        .withColumnRenamed("group", group_col)
    )


def grouped_median(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Exact per-group lower median without sorting raw rows:
    (group, n_rows, median).

    The classic exact-quantile-at-scale shape: collapse the corpus to
    (group, value) frequency bands — ONE shuffle with map-side combine,
    output is value-DISTINCT scale, not row scale — then a per-group
    cumulative sum over the bands finds the first value whose cumulative
    count covers half the group. The per-group window sorts only the
    band table (distinct values per group, e.g. a few thousand document
    lengths), never the 100 TB row stream. Lower-median convention
    (element at ceil(n/2) in sorted order) keeps everything integer —
    no cross-engine interpolation semantics.
    """
    from pyspark.sql import Window

    # Median over NON-NULL values only: Spark windows sort nulls first,
    # DuckDB last — including them would make the engines pick different
    # bands (and can surface a NULL median). n_rows counts non-nulls.
    bands = df.filter(F.col(value_col).isNotNull()).groupBy(
        F.col(group_col).alias("group"), F.col(value_col).alias("value")
    ).agg(F.count(F.lit(1)).cast("long").alias("__cnt"))
    w_cum = (
        Window.partitionBy("group")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("group")
    cum = bands.withColumn("__cum", F.sum("__cnt").over(w_cum)).withColumn(
        "__tot", F.sum("__cnt").over(w_tot)
    )
    return (
        cum.filter(F.lit(2) * F.col("__cum") >= F.col("__tot"))
        .groupBy("group")
        .agg(
            F.max("__tot").alias("n_rows"),
            F.min("value").alias("median"),
        )
        .select(
            F.col("group").alias(group_col),
            "n_rows",
            F.col("median").alias(f"median_{value_col}"),
        )
    )
