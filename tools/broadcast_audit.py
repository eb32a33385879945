"""Static scan of every hard ``F.broadcast(...)`` call site.

The round-13 verdict's one perf-weak finding — and round-14's follow-up
sweep (BM25's term-df, TF-IDF's df table, bigram-lift's unigram table,
RAKE's word stats) — were all the same bug class: a hard broadcast of a
table whose cardinality GROWS with the corpus (per-doc, shingle-type,
word-type). ``F.broadcast`` disables the planner's size check, so the
mistake only explodes at scale. This audit makes the class a
review-time catch, the ``hof_barrier_audit`` treatment applied to
broadcasts: every call site must appear in the allowlist below with a
stated boundedness class; a new or changed site prints as "to review"
and fails the run until it is reviewed and listed.

Boundedness classes:

- ``scalar``        1-row global aggregate (the with_broadcast_scalar shape)
- ``const``         fixed-size literal / LIMIT-bounded relation
- ``dim``           TPC-H dimension table (nation/region/part/supplier)
- ``typeset``       rows keyed by a type/level/group column (event types,
                    brands, sources, quantile cuts, day buckets)
- ``queryset``      fixed query / evaluation / seed set
- ``centroid``      k-row centroid / codebook / coarse-routing table
- ``topk``          rank-limited table (top-k rows by construction)
- ``delta``         incremental tick's batch or its touched-key closure —
                    bounded by batch size, not corpus size
- ``groupoffsets``  num_groups-row prefix-sum offset table
- ``sketch``        sketch-parameter-bounded (CMS rows, Bloom words,
                    per-set KMV thetas)

Keys are ``(relative file, whitespace-normalized argument expression)``
so line drift never invalidates the list, while any semantic change to
what is broadcast does.

Usage: python tools/broadcast_audit.py  → exit 0 iff nothing to review.
"""

from __future__ import annotations

import os
import re
import sys

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "arcane_framework_spark",
)

#: (file, argument) -> boundedness class. Every entry was reviewed in
#: round 14's sweep of all 85 distinct sites.
ALLOWED: dict[tuple[str, str], str] = {
    # -- operators ----------------------------------------------------
    ("operators/bpe.py", "top"): "topk",
    ("operators/bpe.py", 'top.select("l", "r")'): "topk",
    ("operators/decontam.py", "bench"): "queryset",
    ("operators/decontam.py", "eval_grams"): "queryset",
    ("operators/decontam.py", "ta"): "typeset",
    ("operators/decontam.py", "tb"): "typeset",
    ("operators/dedup.py", 'new_sigs.select("id")'): "delta",
    ("operators/drift.py", "cuts"): "typeset",
    ("operators/drift.py", "mad"): "typeset",
    ("operators/drift.py", "med"): "typeset",
    ("operators/evalmetrics.py", 'cent.select("cid", "clabel")'): "centroid",
    ("operators/evalmetrics.py", 'doubled_rank(col_a, "__r2a")'): "typeset",
    ("operators/evalmetrics.py", 'doubled_rank(col_b, "__r2b")'): "typeset",
    ("operators/evalmetrics.py", "offs"): "typeset",
    ("operators/evalmetrics.py", "rng"): "const",
    ("operators/graph.py", "touched_comps"): "delta",
    ("operators/graph.py", "touched_nodes"): "delta",
    ("operators/maintenance.py", "offsets"): "groupoffsets",
    ("operators/packing.py", "offsets"): "groupoffsets",
    ("operators/rangejoin.py", "right"): "typeset",
    ("operators/relational.py", "affected"): "delta",
    ("operators/relational.py",
     "changes.select(*pk_columns).distinct()"): "delta",
    ("operators/retrieval.py", "df_q"): "queryset",
    ("operators/retrieval.py", "q_term_set"): "queryset",
    ("operators/retrieval.py", "qstats"): "queryset",
    ("operators/retrieval.py", "qtab"): "queryset",
    ("operators/retrieval.py", "qterms"): "queryset",
    ("operators/sampling.py", "counts"): "typeset",
    ("operators/sampling.py", "fr"): "typeset",
    ("operators/sampling.py", "offsets"): "groupoffsets",
    ("operators/sampling.py", "srcs"): "typeset",
    ("operators/sampling.py", "wdf"): "typeset",
    ("operators/scale.py", "hot"): "topk",
    ("operators/scale.py",
     "scalar_df.withColumn(_SCALAR_KEY, F.lit(1))"): "scalar",
    ("operators/similarity.py", "cb"): "centroid",
    ("operators/similarity.py", "cent"): "centroid",
    ("operators/similarity.py", "coarse"): "centroid",
    ("operators/similarity.py",
     'codebooks.select("subspace", "code", "cvec")'): "centroid",
    ("operators/similarity.py",
     'f2c.select( "ccid", "cid", F.col("cvec").alias("__fv"), "__fn" )'):
        "centroid",
    ("operators/similarity.py", "lut"): "centroid",
    ("operators/similarity.py", "q"): "queryset",
    ("operators/similarity.py", "qguard"): "queryset",
    ("operators/similarity.py", "seed_ids"): "centroid",
    ("operators/sketches.py", "counts"): "sketch",
    ("operators/sketches.py", "grid"): "sketch",
    ("operators/sketches.py", "side"): "sketch",
    ("operators/temporal.py", "totals"): "typeset",
    ("operators/text.py", "vocab"): "const",
    # -- query catalog ------------------------------------------------
    ("queries.py", "b"): "queryset",
    ("queries.py", "knn"): "queryset",
    ("queries.py", "with_qlabel"): "queryset",
    ("queries_eval.py",
     'cx.select(F.col("event_type").alias("type_a"), '
     'F.col("c").alias("__ca"))'): "typeset",
    ("queries_eval.py",
     'cx.select(F.col("event_type").alias("type_b"), '
     'F.col("c").alias("__cb"))'): "typeset",
    ("queries_ext.py", "b"): "queryset",
    ("queries_ext.py",
     'build.withColumn("__member", F.lit(1))'): "queryset",
    ("queries_ext.py", "cent"): "centroid",
    ("queries_ext.py", "exact"): "typeset",
    ("queries_ext.py", "gl"): "typeset",
    ("queries_ext.py", "norms"): "centroid",
    ("queries_ext.py", "q"): "queryset",
    ("queries_tpch.py", "avg_bal"): "scalar",
    ("queries_tpch.py", "big"): "topk",
    ("queries_tpch.py", "n1"): "dim",
    ("queries_tpch.py", "n2"): "dim",
    ("queries_tpch.py", "nation_supp"): "dim",
    ("queries_tpch.py", "p"): "dim",
    ("queries_tpch.py", 't["nation"]'): "dim",
    ("queries_tpch.py",
     't["nation"].filter(F.col("n_name") == "NATION_3")'): "dim",
    ("queries_tpch.py", 't["part"]'): "dim",
    ("queries_tpch.py",
     't["part"].filter(F.col("p_type") == "PROMO")'): "dim",
    ("queries_tpch.py",
     't["region"].filter(F.col("r_name") == "ASIA")'): "dim",
    ("queries_tpch.py", 't["supplier"]'): "dim",
    ("queries_wave3.py",
     'cx.select(F.col("p_brand").alias("x"), F.col("c").alias("c_x"))'):
        "typeset",
    ("queries_wave3.py",
     'cx.select(F.col("p_brand").alias("y"), F.col("c").alias("c_y"))'):
        "typeset",
    ("queries_wave3.py", 'maps["f_val"]'): "typeset",
    ("queries_wave3.py", 'maps["m_val"]'): "typeset",
    ("queries_wave3.py", 'maps["r_val"]'): "typeset",
    ("queries_wave3.py",
     't["part"].select( F.col("p_partkey").alias("l_partkey"), "p_brand" )'):
        "dim",
    ("queries_wave5.py",
     'centroids.select( "cid", "cvec", norm_expr(F.col("cvec"))'
     '.alias("__cn") )'): "centroid",
    ("queries_wave5.py", "queries"): "queryset",
    ("queries_wave5.py",
     'spark.createDataFrame( [(p,) for p in IVF_PROBE_SET], "probes: int" )'):
        "const",
    ("queries_wave5.py", "wtab"): "typeset",
}


def scan(root: str = PKG) -> list[tuple[str, str, int]]:
    """All (relfile, normalized-arg, count) F.broadcast sites under
    ``root`` (parameterized so the parser is unit-testable on a
    synthetic tree)."""
    out: dict[tuple[str, str], int] = {}
    for dirpath, _, files in os.walk(root):
        for fn in sorted(files):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            with open(path, encoding="utf-8") as fh:
                src = fh.read()
            for m in re.finditer(r"F\.broadcast\(", src):
                i, depth, buf = m.end(), 1, ""
                while depth and i < len(src):
                    c = src[i]
                    if c == "(":
                        depth += 1
                    elif c == ")":
                        depth -= 1
                    if depth:
                        buf += c
                    i += 1
                key = (os.path.relpath(path, root), " ".join(buf.split()))
                out[key] = out.get(key, 0) + 1
    return [(f, a, n) for (f, a), n in sorted(out.items())]


def main() -> None:
    sites = scan()
    review = [(f, a, n) for f, a, n in sites if (f, a) not in ALLOWED]
    seen = {(f, a) for f, a, _ in sites}
    stale = [k for k in ALLOWED if k not in seen]
    for f, a, n in review:
        print(f"REVIEW {f}: F.broadcast({a})  x{n}")
    for f, a in stale:
        print(f"stale  {f}: {a} (allowlisted but no longer present)")
    print(
        f"{len(review)} site(s) to review "
        f"({len(sites)} present, {len(ALLOWED)} allowed, "
        f"{len(stale)} stale)"
    )
    sys.exit(1 if review else 0)


if __name__ == "__main__":
    main()
