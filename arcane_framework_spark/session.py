"""SparkSession factory with scale-oriented defaults.

Defaults are chosen for large clusters (AQE, skew-join handling, partition
coalescing) but work identically on ``local[*]``. Tests and bench override
``master``/``shuffle_partitions`` via env.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

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


def load_tables(spark: SparkSession, sf_dir: str, *names: str):
    """Load the driver's parquet tables as temp views and return them as a dict.

    ``names`` defaults to all ten TESTDATA.md tables.
    """
    all_names = names or (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    )
    # events.parquet carries nanosecond timestamps, which Spark's parquet
    # reader rejects by default; read them as long (nanos since epoch) and
    # convert with timestamp_micros(ts div 1000) where needed. Runtime-settable,
    # so this also works on driver-owned sessions.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Spark 4 defaults ANSI on; conditional expressions here guard their
    # error branches semantically but ANSI does not guarantee lazy branch
    # evaluation, and the DuckDB oracles use non-ANSI null semantics.
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    out = {}
    for name in all_names:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
