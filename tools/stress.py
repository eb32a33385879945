"""Scale stress harness: run the heavy operators on synthetically enlarged
corpora (10x documents / 10x embeddings built from the sf0.1 tables) and
print one JSON line of timings.

Usage: python tools/stress.py [sf_dir]

This is the "would it survive 100x" check the per-operator docstrings cite:
near-linear growth here (output-bound for the dedup pipelines) is the
evidence the partition strategy holds; superlinear growth means a hot block
or an unexpected shuffle.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from arcane_framework_spark.operators.dedup import (  # noqa: E402
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from arcane_framework_spark.operators.graph import dedup_clusters  # noqa: E402
from arcane_framework_spark.operators.packing import pack_documents  # noqa: E402
from arcane_framework_spark.operators.similarity import (  # noqa: E402
    ivf_topk,
    knn_bruteforce,
    knn_bruteforce_vectorized,
)
from arcane_framework_spark.operators.text import token_count_expr  # noqa: E402
from arcane_framework_spark.session import get_spark  # noqa: E402


def enlarged_documents(spark, sf_dir: str, copies: int = 10):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    parts = [
        docs.select(
            (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
            F.concat_ws(" ", "text", F.lit(f"copymarker{i}")).alias("text"),
        )
        for i in range(copies)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.persist()


def enlarged_embeddings(spark, sf_dir: str, copies: int = 10):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    parts = [
        emb.select(
            (F.col("vec_id") + F.lit(i * 100_000)).alias("vec_id"),
            F.concat(
                F.slice("embedding", i + 1, 64 - i), F.slice("embedding", 1, i)
            ).alias("embedding"),
        )
        for i in range(copies)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.persist()


def timed(fn):
    t0 = time.time()
    n = fn().count()
    return {"rows": n, "sec": round(time.time() - t0, 2)}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("arcane-stress")
    docs = enlarged_documents(spark, sf_dir)
    emb = enlarged_embeddings(spark, sf_dir)
    n_docs, n_vecs = docs.count(), emb.count()
    queries = emb.filter(F.col("vec_id") % 40 == 1)
    centroids = emb.filter(F.col("vec_id") % 250 == 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    results = {
        "n_docs": n_docs,
        "n_vectors": n_vecs,
        "minhash_lsh_pairs": timed(lambda: minhash_lsh_pairs(docs)),
        "ngram_jaccard_pairs": timed(
            lambda: ngram_jaccard_pairs(docs, min_jaccard=0.5)
        ),
        "knn_bruteforce_q500": timed(
            lambda: knn_bruteforce(emb, queries, k=5)
        ),
        "knn_vectorized_q500": timed(
            lambda: knn_bruteforce_vectorized(emb, queries, k=5)
        ),
        "ivf_topk_q500": timed(lambda: ivf_topk(emb, centroids, queries, k=5)),
        # near-dup pairs -> clusters (graph closure on the pair output)
        "dedup_clusters": timed(
            lambda: dedup_clusters(minhash_lsh_pairs(docs))
        ),
        # distributed-prefix-sum packing over the enlarged corpus
        "pack_documents": timed(
            lambda: pack_documents(
                docs.select(
                    "doc_id", token_count_expr("text").alias("n_tokens")
                ),
                budget=512,
            )
        ),
    }
    print(json.dumps(results))


if __name__ == "__main__":
    main()
