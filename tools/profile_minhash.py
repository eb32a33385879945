"""Stage-level disk profile of MinHash-LSH pair generation at the 1000x
shape — the round-11 verdict's named 100 TB ceiling (20.3 GiB of shuffle
hitting local disk for 52.6M pairs).

Runs each sub-stage of ``minhash_pair_counts`` separately and records
wall time + block-manager growth around it, so the bucketed-band-table
experiment targets the stage that actually owns the bytes instead of a
guess. Usage:

    python tools/profile_minhash.py [sf_dir] [variants] [copies]

``variants``/``copies`` default to the stress1000 shape (50 x 20 = 5M
docs at sf0.1); pass smaller values for a quick iteration loop.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import tools.stress1000 as s1000  # noqa: E402
from arcane_framework_spark.operators.cache import scoped_persist  # noqa: E402
from arcane_framework_spark.operators.dedup import (  # noqa: E402
    _with_tokens,
    minhash_band_rows,
    minhash_signatures,
    shingles_from_tokens,
)
from arcane_framework_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    if len(sys.argv) > 2:
        s1000.DOC_VARIANTS = int(sys.argv[2])
    if len(sys.argv) > 3:
        s1000.DOC_COPIES = int(sys.argv[3])
    spark = get_spark("arcane-profile-minhash")
    results: dict = {
        "sf_dir": sf_dir,
        "variants": s1000.DOC_VARIANTS,
        "copies": s1000.DOC_COPIES,
    }

    def timed(label, fn):
        d0 = s1000.blockmgr_bytes()
        t0 = time.time()
        n = fn()
        out = {
            "rows": n,
            "sec": round(time.time() - t0, 2),
            "blockmgr_growth_mib": max(
                0, s1000.blockmgr_bytes() - d0
            ) // 2**20,
        }
        results[label] = out
        print(f"## {label}: {json.dumps(out)}", file=sys.stderr)
        return out

    docs = s1000.enlarged_documents(spark, sf_dir)
    results["n_docs"] = docs.count()

    # stage 1: signature table (explode -> codegen md5 -> partial-agg min)
    sig = scoped_persist(minhash_signatures(docs, "text", "doc_id"))
    timed("sig_table", sig.count)

    # stage 2: band rows, persisted (both sides of the self-join read it)
    bands = scoped_persist(minhash_band_rows(sig))
    timed("band_rows", bands.count)

    # stage 3: band self-join + distinct -> candidate pairs
    a, b = bands.alias("a"), bands.alias("b")
    cand = scoped_persist(
        a.join(b, on=["band_id", "band_hash"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    timed("band_self_join_distinct", cand.count)

    # stage 4: shingle-array table (the verification join's build side)
    sh = scoped_persist(
        _with_tokens(docs, "text", "doc_id").select(
            "id", shingles_from_tokens(F.col("toks")).alias("shingles")
        )
    )
    timed("shingle_table", sh.count)

    # stage 5: the two verification joins + intersection sizes
    verified = (
        cand.join(sh.withColumnsRenamed({"id": "id_a", "shingles": "sh_a"}),
                  "id_a")
        .join(sh.withColumnsRenamed({"id": "id_b", "shingles": "sh_b"}),
              "id_b")
        .select(
            "id_a", "id_b",
            F.size("sh_a").alias("na"),
            F.size("sh_b").alias("nb"),
            F.size(F.array_intersect("sh_a", "sh_b")).alias("ni"),
        )
    )
    timed("verification_joins", verified.count)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
