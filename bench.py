"""Benchmark harness: runs the query catalog and prints ONE JSON line.

Contract (driver): run headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and print
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``.

Each query is executed to completion via the ``noop`` sink (full pipeline
runs distributed; nothing is collected to the driver), which is the honest
way to time Spark jobs without Python-materialization overhead.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from arcane_framework_spark.queries import QUERIES
    from arcane_framework_spark.session import get_spark

    spark = get_spark("arcane-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None

    # Warm up the JVM/codegen paths once so per-query timings measure the
    # engine, not classloading.
    QUERIES["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    from arcane_framework_spark.operators.cache import cache_scope

    timings: dict[str, float] = {}
    for name, fn in QUERIES.items():
        start = time.perf_counter()
        # cache_scope releases each query's persisted intermediates after
        # its action — block-manager storage stays flat across the catalog.
        with cache_scope():
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - start, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "catalog_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
