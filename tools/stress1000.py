"""1000x scale probe: the two 100-TB workhorses (MinHash-LSH pairs,
routed SemDeDup) plus the new exact-substring dedup, on a 5M-doc /
2M-vector corpus — with explicit memory-ceiling and spill observation.

Usage: python tools/stress1000.py [sf_dir]

Corpus construction (the round-10 verdict's shape, chosen so OUTPUT stays
bounded): copy-duplicating 1000x naively would grow the pair graph
~C(1000,2)x; instead the corpus is UNIQ unique variants x COPIES near-dup
copies — 5M docs = 5000 base x 50 variants x 20 copies (250k true
clusters x C(20,2) = ~47.5M pairs), 2M vectors = 2000 base x 100 variants
x 10 copies. Variant uniqueness is structural (every token suffixed per
variant / a large dim-0 shift per variant), so variants are NOT near-dups
of each other; copies within a variant are (append-marker / tiny dim-1
nudge).

Memory/spill instrumentation: JVM peak RSS (VmHWM) and the growth of the
Spark local block-manager directories (shuffle + spill files land there)
across each family — the observable a 128 GiB single host gives us for
"would this spill on a real executor".
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from arcane_framework_spark.operators.dedup import (  # noqa: E402
    anchored_substring_stats,
    minhash_lsh_pairs,
    minhash_lsh_pairs_bucketed,
    substring_dedup_stats,
)
from arcane_framework_spark.operators.similarity import (  # noqa: E402
    SEMDEDUP_SPLIT_FACTOR,
    semantic_dedup,
)
from arcane_framework_spark.session import get_spark  # noqa: E402

DOC_VARIANTS = 50
DOC_COPIES = 20
VEC_VARIANTS = 100
VEC_COPIES = 10


def jvm_peak_rss_mib(spark) -> int:
    """JVM VmHWM (peak resident set) in MiB — local mode: the one JVM is
    driver + all executor threads, so this IS the executor ceiling."""
    pid = spark.sparkContext._jvm.java.lang.ProcessHandle.current().pid()
    with open(f"/proc/{pid}/status", encoding="utf-8") as fh:
        for line in fh:
            if line.startswith("VmHWM"):
                return int(line.split()[1]) // 1024
    return -1


def blockmgr_bytes() -> int:
    """Bytes currently held by Spark block-manager local dirs (shuffle
    files + spills). Growth across a stage = data that hit disk."""
    total = 0
    for d in glob.glob("/tmp/blockmgr-*") + glob.glob(
        os.path.join(os.environ.get("SPARK_LOCAL_DIRS", "/tmp"), "blockmgr-*")
    ):
        for root, _dirs, files in os.walk(d):
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
    return total


def enlarged_documents(spark, sf_dir: str):
    """5000 base x DOC_VARIANTS x DOC_COPIES. Variant v suffixes EVERY
    token with 'v{v}' (shingle sets across variants are disjoint — zero
    cross-variant Jaccard); copy j appends a marker token (copies are
    near-dups of their variant base, the stress.py scheme)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    variant = spark.range(DOC_VARIANTS).select(F.col("id").alias("__v"))
    copy = spark.range(DOC_COPIES).select(F.col("id").alias("__c"))
    return (
        docs.crossJoin(variant)
        .crossJoin(copy)
        .select(
            (
                F.col("doc_id")
                + F.col("__v") * 10_000_000
                + F.col("__c") * 1_000_000_000
            ).alias("doc_id"),
            F.concat_ws(
                " ",
                F.regexp_replace(
                    "text", r"(\S+)",
                    F.concat(F.lit("$1v"), F.col("__v").cast("string")),
                ),
                F.concat(F.lit("copymarker"), F.col("__c").cast("string")),
            ).alias("text"),
        )
        .repartition(128)
        .persist()
    )


def enlarged_embeddings(spark, sf_dir: str):
    """2000 base x VEC_VARIANTS x VEC_COPIES. Variant v rotates by v%64
    dims and shifts dim 0 by 7.5*(v//64) (variants point elsewhere);
    copy j nudges dim 1 by 5e-4*j (copies are semantic near-dups)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    variant = spark.range(VEC_VARIANTS).select(
        F.col("id").alias("__v"),
        (F.col("id") % 64).alias("__rot"),
        (F.floor(F.col("id") / 64) * 7.5).alias("__shift"),
    )
    copy = spark.range(VEC_COPIES).select(
        F.col("id").alias("__c"), (F.col("id") * 5e-4).alias("__nudge")
    )
    rotated = F.concat(
        F.expr("slice(embedding, __rot + 1, 64 - __rot)"),
        F.expr("slice(embedding, 1, __rot)"),
    )
    return (
        emb.crossJoin(variant)
        .crossJoin(copy)
        .select(
            (
                F.col("vec_id")
                + F.col("__v") * 1_000_000
                + F.col("__c") * 1_000_000_000
            ).alias("vec_id"),
            F.transform(
                rotated,
                lambda x, i: (
                    x
                    + F.when(i == 0, F.col("__shift")).otherwise(0.0)
                    + F.when(i == 1, F.col("__nudge")).otherwise(0.0)
                ),
            ).alias("embedding"),
        )
        .repartition(128)
        .persist()
    )


def warehouse_bytes(spark) -> int:
    """Bytes under spark.sql.warehouse.dir — where bucketed side tables
    land. Accounted separately from blockmgr growth so routing shuffle
    through storage cannot masquerade as 'disk eliminated'."""
    root = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    total = 0
    for r, _d, files in os.walk(root):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(r, f))
            except OSError:
                pass
    return total


def timed(spark, label: str, fn, results: dict) -> dict:
    disk0 = blockmgr_bytes()
    wh0 = warehouse_bytes(spark)
    t0 = time.time()
    n = fn().count()
    sec = round(time.time() - t0, 2)
    out = {
        "rows": n,
        "sec": sec,
        "us_per_row": round(1e6 * sec / max(n, 1), 2),
        "blockmgr_growth_mib": max(0, (blockmgr_bytes() - disk0)) // 2**20,
        "warehouse_growth_mib": max(
            0, (warehouse_bytes(spark) - wh0)
        ) // 2**20,
        "jvm_peak_rss_mib": jvm_peak_rss_mib(spark),
    }
    results[label] = out
    print(f"## {label}: {json.dumps(out)}", file=sys.stderr)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("arcane-stress-1000x")

    def _warm(batches):
        import numpy as np  # noqa: F401
        yield from batches

    warm_df = spark.range(0, 256, 1, 32)
    warm_df.mapInPandas(_warm, warm_df.schema).write.format("noop").mode(
        "overwrite"
    ).save()

    results: dict = {}
    # recorded because the probe is ABOUT memory behavior: the r12 rerun
    # needed 16g (one r11-identical 8g run of the in-memory minhash
    # family OOMed mid-verification — it had passed twice at 8g), and
    # in r14 two code-identical 16g runs OOMed in the BUCKETED
    # band-table write — up to tasks × buckets concurrent parquet
    # writers each buffering a row group on the heap (r13's green 16g
    # run already peaked at 18.7 GiB RSS). That one was a real bug with
    # a real fix: write_bucketed now repartitions on the bucket key
    # first, so each task keeps ONE open writer and the probe completes
    # at 16g again (peak RSS 27.1 → 20.6 GiB, identical rows/time).
    results["driver_memory"] = spark.conf.get("spark.driver.memory", "?")
    docs = enlarged_documents(spark, sf_dir)
    emb = enlarged_embeddings(spark, sf_dir)
    results["n_docs"] = docs.count()
    results["n_vectors"] = emb.count()
    results["shape"] = {
        "doc_variants": DOC_VARIANTS, "doc_copies": DOC_COPIES,
        "vec_variants": VEC_VARIANTS, "vec_copies": VEC_COPIES,
        "true_doc_clusters": results["n_docs"] // DOC_COPIES,
    }
    results["note"] = (
        "variant-partitioned corpus: near-dup structure is 250k clusters "
        "of 20 (docs) / 200k clusters of 10 (vectors), so pair output "
        "grows ~10x vs the 100x artifact while input grows 10x — the "
        "per-OUTPUT-row cost is directly comparable to STRESS_100X "
        "(0.82 us/row minhash, 225 us/row routed semdedup). "
        "blockmgr_growth_mib is shuffle+spill bytes that hit local disk "
        "during the family; jvm_peak_rss_mib is the cumulative JVM "
        "high-water mark (monotone across families)."
    )

    # ---- workhorse 1: MinHash-LSH pair generation ---------------------
    timed(spark, "minhash_lsh_pairs", lambda: minhash_lsh_pairs(docs),
          results)

    # ---- the round-11 verdict #1 fix: bucketed side-table plan --------
    # Same pairs bit-for-bit (gate entry X181 shares the oracle); the
    # band self-join and shingle verification read bucket-aligned, the
    # multi-band distinct is gone — blockmgr growth is the headline,
    # warehouse growth the honestly-accounted storage cost.
    timed(
        spark, "minhash_lsh_pairs_bucketed",
        lambda: minhash_lsh_pairs_bucketed(
            docs, table_prefix="stress1000_mh"
        ),
        results,
    )
    if isinstance(results.get("minhash_lsh_pairs"), dict):
        base_row = results["minhash_lsh_pairs"]
        bkt_row = results["minhash_lsh_pairs_bucketed"]
        results["minhash_bucketed_vs_memory"] = {
            "rows_equal": base_row["rows"] == bkt_row["rows"],
            "blockmgr_mib_memory_path": base_row["blockmgr_growth_mib"],
            "blockmgr_mib_bucketed_path": bkt_row["blockmgr_growth_mib"],
            "warehouse_mib_bucketed_path": bkt_row["warehouse_growth_mib"],
            "sec_memory_path": base_row["sec"],
            "sec_bucketed_path": bkt_row["sec"],
        }

    # ---- exact-substring dedup: aligned (X175) + anchored (X182) ------
    timed(spark, "substring_dedup_stats",
          lambda: substring_dedup_stats(docs), results)
    timed(spark, "anchored_substring_stats",
          lambda: anchored_substring_stats(docs), results)
    # round-12 verdict #1: the production token->anchor hash (in-plan
    # xxhash64 intrinsic, no digest/string-decode per token) vs the
    # md5 gate path above — same decisions on the planted corpus
    # (tests/test_wave8.py), this row measures the constant-factor cut
    timed(spark, "anchored_substring_stats_xxhash64",
          lambda: anchored_substring_stats(docs, hash_fn="xxhash64"),
          results)

    # ---- workhorse 2: routed SemDeDup (governed k, hard cap) ----------
    # Exact twin omitted BY DESIGN: 783.7s at 200k vectors scales
    # ~N^2/T — ~100x here. The routed path IS the documented scale path;
    # its decision agreement vs exact is the committed 100x measurement
    # (99.09% where the cap binds, zero false prunes).
    dec = semantic_dedup(
        emb, k=None, threshold=0.9, iterations=2, target_cell_size=64,
        routed=True,
    ).persist()
    # the timed count EXECUTES the persisted plan, and the cell/prune
    # stats below reuse it — the multi-minute routed pipeline runs once
    timed(spark, "semantic_dedup_routed", lambda: dec, results)
    cell = (
        dec.groupBy("cid").count()
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.max("count").alias("max_cell"),
            F.round(F.avg("count"), 1).alias("avg_cell"),
            F.sum(F.col("count") * F.col("count")).alias("sum_sq"),
        )
        .first()
    )
    hard_cap = SEMDEDUP_SPLIT_FACTOR * 64
    results["semantic_dedup_routed_cells"] = {
        "n_cells": cell["n_cells"],
        "max_cell": cell["max_cell"],
        "avg_cell": float(cell["avg_cell"]),
        "pairwise_work_sum_sq": int(cell["sum_sq"]),
        "target": 64,
        "hard_cap": hard_cap,
        "cap_bound": int(cell["max_cell"]) == hard_cap,
    }
    assert cell["max_cell"] <= hard_cap, results["semantic_dedup_routed_cells"]
    n_pruned = dec.filter(F.col("pruned")).count()
    results["semantic_dedup_pruned"] = {
        "n_pruned": n_pruned,
        "prune_ppm": n_pruned * 1_000_000 // results["n_vectors"],
    }
    dec.unpersist()

    # ---- growth vs the 100x artifact ----------------------------------
    base_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "STRESS_100X_r10.json",
    )
    if os.path.exists(base_path):
        with open(base_path, encoding="utf-8") as fh:
            base = json.load(fh)
        growth = {}
        for op, base_key in (
            ("minhash_lsh_pairs", "minhash_lsh_pairs"),
            ("semantic_dedup_routed", "semantic_dedup_routed"),
        ):
            b, n = base.get(base_key), results.get(op)
            if not (isinstance(b, dict) and isinstance(n, dict)):
                continue
            growth[op] = {
                "sec_100x": b["sec"],
                "sec_1000x": n["sec"],
                "sec_growth": round(n["sec"] / max(b["sec"], 0.01), 1),
                "rows_growth": round(n["rows"] / max(b["rows"], 1), 1),
                "us_per_row_100x": b["us_per_row"],
                "us_per_row_1000x": n["us_per_row"],
                "per_row_cost_growth": round(
                    n["us_per_row"] / max(b["us_per_row"], 1e-9), 2
                ),
            }
        results["growth_vs_100x"] = growth

    print(json.dumps(results))


if __name__ == "__main__":
    main()
