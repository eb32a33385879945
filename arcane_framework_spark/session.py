"""SparkSession factory with scale-oriented defaults.

Defaults are chosen for large clusters (AQE, skew-join handling, partition
coalescing) but work identically on ``local[*]``. Tests and bench override
``master``/``shuffle_partitions`` via env.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructType,
    TimestampNTZType,
    TimestampType,
)

#: Scale-oriented Spark SQL defaults. All of these matter more at 100 TB than
#: at test scale: AQE re-plans joins/skew at runtime, partition coalescing
#: avoids thousands of tiny shuffle outputs, and Arrow keeps any pandas-UDF
#: exchange vectorized.
DEFAULT_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Parquet scans: vectorized reader + aggressive pushdown are the single
    # biggest lever for 100 TB scans.
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.parquet.enableVectorizedReader": "true",
    # Keep timestamp semantics deterministic across engines (oracle parity).
    "spark.sql.session.timeZone": "UTC",
    # Auto-broadcast small dims (10 MB default is conservative; dims like
    # region/nation/supplier stay broadcast even at large SF).
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
    "spark.ui.showConsoleProgress": "false",
}


def get_spark(app_name: str = "arcane-framework-spark", master: str | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults."""
    master = master or os.environ.get(
        "SPARK_GRAFT_MASTER",
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]",
    )
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(DEFAULT_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


#: Memo of (sf_dir, table) -> DataFrame for the CURRENT session. A
#: DataFrame is an immutable logical plan, so handing the same handle to
#: every query is safe — and skips the per-call parquet footer read +
#: schema inference that otherwise taxes EVERY catalog query (~100 ms x
#: tables x 100+ queries per bench run). Keyed by applicationId and
#: reset whenever a different session shows up: a WeakKeyDictionary
#: cannot evict here (each cached DataFrame strongly references its
#: session, pinning the weak key), so we keep at most one session's
#: worth of handles instead.
_TABLE_CACHE: dict = {"session": None, "tables": {}}


def load_tables(spark: SparkSession, sf_dir: str, *names: str):
    """Load the driver's parquet tables as temp views and return them as a dict.

    ``names`` defaults to all ten TESTDATA.md tables. Reads are memoized
    per (session, sf_dir, table); the testdata is immutable, so the plan
    snapshot taken at first read stays valid.
    """
    all_names = names or (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    )
    # Schema-drift tolerance for timestamp columns: testdata has shipped
    # events.ts both as timestamp[ns] (which Spark's parquet reader rejects
    # unless read as long) and as timestamp[us]. nanosAsLong is a no-op for
    # non-nano columns, so setting it unconditionally makes either shape load;
    # consumers normalize via ts_micros()/ts_timestamp() below, which dispatch
    # on the dtype actually read. Runtime-settable, so this also works on
    # driver-owned sessions.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Spark 4 defaults ANSI on; conditional expressions here guard their
    # error branches semantically but ANSI does not guarantee lazy branch
    # evaluation, and the DuckDB oracles use non-ANSI null semantics.
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Identity, not applicationId: spark.newSession() clones share the
    # app id but have their OWN temp-view catalogs — serving a clone the
    # first session's DataFrames would register views in the wrong
    # session. A different wrapper object resets the cache.
    if _TABLE_CACHE["session"] is not spark:
        _TABLE_CACHE["session"] = spark
        _TABLE_CACHE["tables"] = {}
    cache = _TABLE_CACHE["tables"]
    out = {}
    for name in all_names:
        key = (sf_dir, name)
        df = cache.get(key)
        if df is None:
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
            cache[key] = df
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def ts_micros(source: DataFrame | StructType, col: str = "ts") -> Column:
    """Epoch-microseconds ``long`` Column for a timestamp-ish column.

    Dispatches on the dtype actually present so queries survive testdata
    schema drift (the SURVEY §1.3 theme applied to our own inputs):

    - ``TimestampType`` / ``TimestampNTZType`` → ``unix_micros`` (session tz
      is pinned UTC, so NTZ and instant semantics agree);
    - ``LongType`` → treated as epoch NANOS (the ``nanosAsLong`` legacy read
      of ``timestamp[ns]`` parquet) and integer-divided to micros — a
      truncating div, matching DuckDB's truncating TIMESTAMP read of the
      same file;
    - anything else is an explicit error rather than a silently-wrong cast
      (a bare ``cast('long')`` on a timestamp yields SECONDS in Spark).
    """
    schema = source.schema if isinstance(source, DataFrame) else source
    dt = schema[col].dataType
    if isinstance(dt, TimestampType):
        return F.unix_micros(F.col(col))
    if isinstance(dt, TimestampNTZType):
        return F.unix_micros(F.col(col).cast("timestamp"))
    if isinstance(dt, LongType):
        return F.expr(f"{col} div 1000")
    raise TypeError(f"column {col!r} has unsupported dtype {dt}")


def ts_timestamp(source: DataFrame | StructType, col: str = "ts") -> Column:
    """``TimestampType`` Column for a timestamp-ish column (same dispatch
    as :func:`ts_micros`; long inputs are taken as epoch nanos)."""
    schema = source.schema if isinstance(source, DataFrame) else source
    dt = schema[col].dataType
    if isinstance(dt, TimestampType):
        return F.col(col)
    if isinstance(dt, TimestampNTZType):
        return F.col(col).cast("timestamp")
    if isinstance(dt, LongType):
        return F.timestamp_micros(F.expr(f"{col} div 1000"))
    raise TypeError(f"column {col!r} has unsupported dtype {dt}")
