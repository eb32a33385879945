"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given scale factor, then compares row count, column names, and
an order-insensitive value hash (columns sorted by name, rows sorted, values
stringified). Usage::

    python tools/check_correctness.py [sf_dir] [query ...]

Set ``CORRECTNESS_JSON=/path/to/out.json`` to also record the per-query
results as a JSON artifact (the driver's 50-entry sample is fixed and
predates newer entries, so each round commits the FULL gate output as
``CORRECTNESS_FULL_r{N}.json``).
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(lambda v: "NULL" if v is None or v != v else str(v))
    order = list(df.columns)
    return df.sort_values(order).reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    norm = _normalize(df)
    payload = norm.to_csv(index=False).encode()
    return hashlib.sha256(payload).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from arcane_framework_spark.session import get_spark

    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries, oracles = e.queries(), e.oracle_sql()
    failures = []
    results: dict[str, dict] = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            from arcane_framework_spark.operators.cache import cache_scope

            with cache_scope():
                sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            failures.append(name)
            results[name] = {"ok": False, "err": f"spark: {exc}"[:300]}
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"rows-only  {name}: {len(sdf)} rows")
            results[name] = {"ok": True, "rows_only": True,
                             "spark_rows": len(sdf)}
            continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            failures.append(name)
            results[name] = {"ok": False, "err": f"duckdb: {exc}"[:300]}
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} != {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} != {sorted(odf.columns)}")
        elif value_hash(sdf) != value_hash(odf):
            problems.append("value-hash mismatch")
            ns, no = _normalize(sdf), _normalize(odf)
            diff = ns.compare(no) if ns.shape == no.shape else None
            if diff is not None and not diff.empty:
                problems.append(f"first diffs:\n{diff.head(5)}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(str(p) for p in problems)}")
            failures.append(name)
        else:
            print(f"OK    {name}: {len(sdf)} rows")
        results[name] = {
            "ok": not problems,
            "rows_match": len(sdf) == len(odf),
            "schema_match": sorted(sdf.columns) == sorted(odf.columns),
            "hash_match": not problems,
            "spark_rows": len(sdf),
            "oracle_rows": len(odf),
            "err": "; ".join(str(p) for p in problems)[:300] or None,
        }
    spark.stop()
    artifact = os.environ.get("CORRECTNESS_JSON")
    if artifact:
        import json

        with open(artifact, "w") as fh:
            json.dump(
                {"sf_dir": sf_dir, "n_queries": len(results),
                 "n_failures": len(failures), "results": results},
                fh, indent=1, sort_keys=True,
            )
        print(f"wrote {artifact} ({len(results)} entries)")
    if failures:
        print(f"\n{len(failures)} failure(s): {failures}")
        return 1
    print("\nall queries match the oracle")
    return 0


if __name__ == "__main__":
    sys.exit(main())
