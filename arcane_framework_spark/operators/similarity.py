"""Similarity search over embedding columns (``array<float>``).

Two tiers, mirroring what a 100 TB training-data pipeline needs:

- **Brute-force cosine top-k** — exact baseline. Query set × candidate set
  join; at scale the query side is broadcast (it is small by construction)
  so the candidate scan stays a single map-side pass, with the top-k via a
  window on the query id (one shuffle on query_id, bounded by k).
- **Hyperplane-LSH buckets** — scale path: each vector gets a ``P``-bit sign
  signature from P fixed pseudo-random hyperplanes; near neighbors collide in
  buckets, so candidate generation is a bucket equi-join instead of a cross
  product. The hyperplane weights are ±1 values derived from md5 (see
  ``hyperplane_weights``) so they are reproducible constants — identical in
  the Spark plan and the DuckDB oracle.

All arithmetic is JVM-side Column expressions (zip_with/aggregate), no Python
in the data path.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from arcane_framework_spark.operators.cache import scoped_persist

#: Default hyperplane count (LSH signature bits) — shared with the oracle.
NUM_PLANES = 16

#: Routed SemDeDup hard cell cap, as a multiple of target_cell_size: a
#: routed cell larger than FACTOR * target splits into rank-contiguous
#: sub-cells of at most that size (see semantic_dedup). 8x leaves the
#: split dormant on balanced corpora while turning the quadratic-probe
#: bound from a k-means tendency into a guarantee — at 100x stress the
#: routed argmax was measured to overfill a cell 1614 vs target 64.
SEMDEDUP_SPLIT_FACTOR = 8


@lru_cache(maxsize=None)
def hyperplane_weights(num_planes: int, dim: int) -> tuple[tuple[int, ...], ...]:
    """Deterministic ±1 hyperplane matrix.

    ``w[p][i] = +1 if md5(f"{p}:{i}")'s first hex digit < '8' else -1``.
    Rademacher (±1) hyperplanes are a valid random-projection family, and
    this construction is reproducible anywhere md5 exists.
    """
    out = []
    for p in range(num_planes):
        row = []
        for i in range(dim):
            digit = hashlib.md5(f"{p}:{i}".encode()).hexdigest()[0]
            row.append(1 if digit < "8" else -1)
        out.append(tuple(row))
    return tuple(out)


def dot_expr(a: Column, b: Column) -> Column:
    """Dot product of two float-array columns, accumulated as double in
    index order (ordered fold → deterministic across engines)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    """L2 norm of a float-array column (double)."""
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity of two float-array columns."""
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def knn_bruteforce(candidates: DataFrame, queries: DataFrame, k: int,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   query_id_col: str | None = None) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Output: (query_id, neighbor_id, cosine, rank), rank 1..k, self-matches
    excluded, ties broken by neighbor_id. The query side is broadcast —
    at scale this is one pass over the candidate corpus.

    Zero-norm vectors score 0.0 against everything (the norm is clamped to
    1 before dividing; the dot product is already 0) instead of NaN — NaN
    sorts above every real cosine under ``desc``, which would rank a
    degenerate vector as everyone's best neighbor.
    """
    from pyspark.sql import Window

    query_id_col = query_id_col or id_col

    def safe_norm(col: Column) -> Column:
        n = norm_expr(col)
        return F.when(n == 0.0, F.lit(1.0)).otherwise(n)

    # Norms are precomputed per side so each pair costs one dot product
    # instead of three array folds; dot/(qn*cn) is bitwise-identical to
    # dot/(sqrt(dot_qq)*sqrt(dot_cc)) — oracle parity preserved.
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        safe_norm(F.col(vec_col)).alias("__qn"),
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        safe_norm(F.col(vec_col)).alias("__cn"),
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                dot_expr(F.col("__qv"), F.col("__cv"))
                / (F.col("__qn") * F.col("__cn"))
            ).alias("__cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("__cos"), 6).alias("cosine"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def lsh_signature_expr(vec_col: Column, dim: int,
                       num_planes: int = NUM_PLANES) -> Column:
    """Hyperplane-LSH sign signature as a '0'/'1' string of length num_planes.

    Bit p = 1 iff ``dot(w_p, v) > 0`` with the ±1 weights of
    ``hyperplane_weights``. Map-side only — no shuffle, no Python.
    """
    weights = hyperplane_weights(num_planes, dim)
    bits = []
    for p in range(num_planes):
        w = F.array(*[F.lit(float(x)) for x in weights[p]])
        proj = F.aggregate(
            F.zip_with(vec_col, w, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_buckets(df: DataFrame, dim: int, id_col: str = "vec_id",
                vec_col: str = "embedding",
                num_planes: int = NUM_PLANES) -> DataFrame:
    """Assign each vector its LSH bucket: (id, bucket)."""
    return df.select(
        F.col(id_col).alias("id"),
        lsh_signature_expr(F.col(vec_col), dim, num_planes).alias("bucket"),
    )


def ann_banded_pairs(df: DataFrame, dim: int, min_cosine: float = 0.0,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     num_planes: int = 8, band_size: int = 4) -> DataFrame:
    """Near-dup pairs via banded (OR-amplified) hyperplane LSH + cosine check.

    Like MinHash banding: the ``num_planes``-bit signature is split into
    ``num_planes/band_size``-bit bands and a pair becomes a candidate if ANY
    band matches — much better recall than requiring the full signature to
    collide, at the cost of more (still bucket-bounded) candidates.

    Output (id_a, id_b, cosine) with id_a < id_b, cosine >= min_cosine.
    Scale: one map-side signature pass, one shuffle on (band_id, band_hash),
    per-bucket pair generation, then a distinct + verification join — the
    exact shape of the MinHash-LSH text pipeline, reused for vectors.
    """
    num_bands = num_planes // band_size
    # persisted: consumed by both the band explode and the verification
    # join — recomputing means re-running the signature HOFs over the corpus
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        lsh_signature_expr(F.col(vec_col), dim, num_planes).alias("sig"),
    ).transform(scoped_persist)
    bands = base.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.substring("sig", b * band_size + 1, band_size)
                    for b in range(num_bands)
                ]
            )
        ).alias("band_id", "band_hash"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, on=["band_id", "band_hash"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    vecs = base.select("id", "vec", norm_expr(F.col("vec")).alias("__n"))
    return (
        cand.join(
            vecs.select(
                F.col("id").alias("id_a"),
                F.col("vec").alias("va"),
                F.col("__n").alias("__na"),
            ),
            "id_a",
        )
        .join(
            vecs.select(
                F.col("id").alias("id_b"),
                F.col("vec").alias("vb"),
                F.col("__n").alias("__nb"),
            ),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.round(
                dot_expr(F.col("va"), F.col("vb"))
                / (F.col("__na") * F.col("__nb")),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= min_cosine)
    )


def hard_negatives(candidates: DataFrame, queries: DataFrame, k: int,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   label_col: str = "label",
                   max_queries: int = 10_000) -> DataFrame:
    """Contrastive hard-negative mining: for each query vector, the ``k``
    most-cosine-similar candidates with a DIFFERENT label.

    The training-data op behind embedding-model fine-tuning: easy
    negatives (random) teach nothing, so you mine the negatives the
    current embedding space confuses most. Same shape as
    :func:`knn_bruteforce` — broadcast query side, one map-side scan of
    the candidate corpus, per-query top-k via a WindowGroupLimit-capped
    rank — with the label-inequality predicate folded into the join, so
    same-label pairs are dropped before scoring ever materializes.
    Output: (query_id, query_label, neighbor_id, neighbor_label,
    cosine, rank), rank 1..k, ties broken by neighbor_id.

    Scale: the query set is small by construction (you mine negatives
    for a training batch, not the whole corpus at once); cost is one
    candidate-corpus scan per batch. Zero-norm vectors score 0.0 (norm
    clamped), never NaN.

    The small-query-side assumption is ENFORCED in-plan, not assumed:
    a broadcast 1-row count of ``queries`` is attached with
    ``assert_true(count <= max_queries)``, so a query set too large to
    broadcast-and-scan fails fast at execution time instead of silently
    materializing |C|x|Q| scored rows (the governance
    ``bm25_self_retrieval`` applies to its sample modulus). Raise
    ``max_queries`` explicitly when the broadcast genuinely fits.
    """
    from pyspark.sql import Window

    def safe_norm(col: Column) -> Column:
        n = norm_expr(col)
        return F.when(n == 0.0, F.lit(1.0)).otherwise(n)

    qguard = queries.agg(
        F.assert_true(
            F.count(F.lit(1)) <= F.lit(max_queries),
            f"hard_negatives: query side exceeds max_queries={max_queries}"
            " — mine negatives per training batch, or raise max_queries"
            " if the broadcast side genuinely fits.",
        ).alias("__guard")
    )
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(label_col).alias("query_label"),
            F.col(vec_col).alias("__qv"),
            safe_norm(F.col(vec_col)).alias("__qn"),
        )
        # 1-row scalar attach; the filter references __guard so column
        # pruning cannot elide the assertion.
        .join(F.broadcast(qguard))
        .filter(F.col("__guard").isNull())
        .drop("__guard")
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("neighbor_label"),
        F.col(vec_col).alias("__cv"),
        safe_norm(F.col(vec_col)).alias("__cn"),
    )
    scored = (
        c.join(
            F.broadcast(q),
            F.col("query_label") != F.col("neighbor_label"),
        )
        .select(
            "query_id",
            "query_label",
            "neighbor_id",
            "neighbor_label",
            (
                dot_expr(F.col("__qv"), F.col("__cv"))
                / (F.col("__qn") * F.col("__cn"))
            ).alias("__cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "query_label",
            "neighbor_id",
            "neighbor_label",
            F.round("__cos", 6).alias("cosine"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def knn_bruteforce_vectorized(candidates: DataFrame, queries: DataFrame,
                              k: int, id_col: str = "vec_id",
                              vec_col: str = "embedding",
                              query_id_col: str | None = None) -> DataFrame:
    """Exact cosine top-k via Arrow-batched numpy GEMM — the fast path for
    exact search when the query set is large.

    Same contract as ``knn_bruteforce`` (self-matches excluded, ties by
    neighbor_id) but the per-pair math runs as one ``scores = C @ Qᵀ``
    matrix multiply per Arrow batch inside ``mapInPandas`` instead of
    interpreted array-fold expressions — the 10-100× Pandas-UDF-vs-HOF
    gap the hot exact-search path needs. Each batch emits only its LOCAL
    top-k per query (candidate rows never leave the executor), then a
    window takes the global top-k over ≤ k·num_batches finalists.

    Float caveat: numpy sums pairwise, Spark HOFs fold left-to-right, so
    the last double ULP can differ from ``knn_bruteforce`` — ranking is
    unaffected except for exact float ties, which the neighbor_id
    tiebreak resolves. The SQL-oracle-gated exact baseline remains
    ``knn_bruteforce``; this is the scale path.

    Scale: the query matrix is pre-normalized on the driver and shipped
    via ``SparkContext.broadcast`` — one torrent transfer per executor,
    unpickled once per worker — rather than closure capture (which would
    re-ship and re-deserialize the matrix per task). The query set must
    fit in driver + executor memory: at 8 bytes × dim doubles per vector,
    ~1M 128-d queries ≈ 1 GiB, which is the practical bound; beyond that,
    block the queries and union the results. Zero-norm vectors (query or
    candidate) score 0.0 against everything, matching ``knn_bruteforce``'s
    null-safe contract, instead of producing NaN.
    """
    import numpy as np

    from pyspark.sql import Window

    query_id_col = query_id_col or id_col
    qrows = queries.select(query_id_col, vec_col).collect()
    Q = np.asarray([list(r[1]) for r in qrows], dtype=np.float64)
    qn = np.linalg.norm(Q, axis=1, keepdims=True)
    Qn = Q / np.where(qn == 0.0, 1.0, qn)  # zero-norm queries score 0
    qids_arr = np.asarray([int(r[0]) for r in qrows], dtype=np.int64)
    sc = queries.sparkSession.sparkContext
    bc = sc.broadcast((Qn, qids_arr))

    out_schema = "query_id long, neighbor_id long, cosine double"

    def score_batches(batches):
        import numpy as np
        import pandas as pd

        Qn, qids = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            C = np.asarray(
                [list(v) for v in pdf[vec_col]], dtype=np.float64
            )
            cn = np.linalg.norm(C, axis=1, keepdims=True)
            Cn = C / np.where(cn == 0.0, 1.0, cn)
            scores = Cn @ Qn.T  # (n_candidates, n_queries)
            scores[ids[:, None] == qids[None, :]] = -np.inf  # self-matches
            top = min(k, len(ids))
            # local top-k per query: argpartition then exact sort of the k
            part = np.argpartition(-scores, top - 1, axis=0)[:top]
            rows = []
            for qi in range(len(qids)):
                sel = part[:, qi]
                order = sel[np.lexsort((ids[sel], -scores[sel, qi]))]
                for ci in order:
                    if np.isfinite(scores[ci, qi]):
                        rows.append(
                            (int(qids[qi]), int(ids[ci]),
                             float(scores[ci, qi]))
                        )
            yield pd.DataFrame(
                rows, columns=["query_id", "neighbor_id", "cosine"]
            )

    finalists = candidates.select(id_col, vec_col).mapInPandas(
        score_batches, out_schema
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        finalists.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cosine", 6).alias("cosine"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


#: Cosine-units half-width of the GEMM argmax boundary band: candidates
#: whose GEMM cosine sits within this of the row maximum are re-ranked
#: with the exact left-to-right fold. GEMM-vs-fold error for unit-scale
#: <=1024-dim doubles is ~1e-13 (pairwise vs sequential summation), so
#: 1e-9 leaves four orders of margin while firing on ~0 real rows.
ASSIGN_GEMM_BAND = 1e-9


def _fold_dot(a, b) -> float:
    """``dot_expr``'s exact arithmetic in Python: per-component double
    product, accumulated left-to-right from 0.0 — bit-identical to the
    Spark/DuckDB fold (IEEE doubles, same operation order)."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def _gemm_argmax_cids(V, C, cn_exact, cids, band: float = ASSIGN_GEMM_BAND):
    """Per-row argmax over centroids by (cosine, -cid) — the max_by
    struct ordering — computed as one numpy GEMM with an exact-fold
    re-rank of boundary-band rows.

    ``V``: (b, d) float64 row vectors; ``C``: (k, d) float64 centroids;
    ``cn_exact``: (k,) EXACT fold norms of C's rows; ``cids``: (k,)
    centroid ids (numeric). Returns a length-b list of winning cids.

    Fast path: S = (V @ C.T) / (n_gemm ⊗ cn_exact); a row whose runner-up
    sits further than ``band`` below its max cannot flip under the
    ~1e-13 GEMM-vs-fold error, so its argmax IS the exact argmax (ties
    are impossible outside the band by construction). Rows with >1
    in-band candidate — or any non-finite score (zero norms) — are
    re-ranked with the exact contract arithmetic: fold dot / (fold-norm
    product), compared by (NaN-greatest cosine, -cid), replicating
    Spark's max_by double ordering exactly.
    """
    import math

    import numpy as np

    with np.errstate(divide="ignore", invalid="ignore"):
        n_gemm = np.sqrt((V * V).sum(axis=1))
        S = (V @ C.T) / (n_gemm[:, None] * cn_exact[None, :])
        finite = np.isfinite(S).all(axis=1)
        m = np.where(finite, S.max(axis=1, initial=-np.inf), 0.0)
        cand = S >= (m[:, None] - band)
        ncand = cand.sum(axis=1)
    out = [None] * len(V)
    easy = finite & (ncand == 1)
    if easy.any():
        win = np.argmax(S[easy], axis=1)
        for row, j in zip(np.nonzero(easy)[0], win):
            out[row] = cids[j]
    for row in np.nonzero(~easy)[0]:
        js = range(len(cids)) if not finite[row] else np.nonzero(cand[row])[0]
        n_i = math.sqrt(_fold_dot(V[row], V[row]))
        best = None
        for j in js:
            cos = _fold_dot(V[row], C[j]) / (n_i * cn_exact[j])
            key = (
                (1, 0.0, -cids[j]) if math.isnan(cos)
                else (0, cos, -cids[j])
            )
            if best is None or key > best[0]:
                best = (key, cids[j])
        out[row] = best[1]
    return out


#: Spark simpleStrings of the centroid-id types the assignment family
#: accepts. Both paths need numeric negation for the (cos, -cid)
#: tie-break (max_by struct ordering on the join path, the exact-fold
#: re-rank key on the GEMM path), and ``_centroid_arrays`` packs ids
#: into int64 — so anything non-integral is rejected loudly instead of
#: silently mis-ordering (join path: ``-string`` casts to null) or
#: crashing in the executor (GEMM path).
_INTEGRAL_CID_TYPES = ("tinyint", "smallint", "int", "bigint")


def _require_integral_cid(centroids: DataFrame, cid_col: str,
                          who: str) -> str:
    """Validate the centroid-id column type at plan construction; returns
    its simpleString for schema derivation."""
    cid_t = centroids.schema[cid_col].dataType.simpleString()
    if cid_t not in _INTEGRAL_CID_TYPES:
        raise ValueError(
            f"{who} requires an integral centroid-id column "
            f"({'/'.join(_INTEGRAL_CID_TYPES)}); got {cid_col!r}: {cid_t}"
        )
    return cid_t


def _centroid_arrays(rows):
    """(cids, C, cn_exact) numpy arrays from collected (cid, cvec) rows.
    Norms use the exact fold so boundary re-ranks divide by the same
    doubles ``norm_expr`` produces."""
    import math

    import numpy as np

    cids = np.array([r[0] for r in rows], dtype=np.int64)
    C = np.array(
        [np.asarray(r[1], dtype=np.float64) for r in rows], dtype=np.float64
    )
    cn = np.array(
        [math.sqrt(_fold_dot(row, row)) for row in C], dtype=np.float64
    )
    return cids, C, cn


def _ivf_assign_gemm(df: DataFrame, centroids: DataFrame, id_col: str,
                     vec_col: str, cid_col: str, cvec_col: str) -> DataFrame:
    """:func:`ivf_assign` as ONE ``mapInPandas`` pass — ZERO shuffles.

    The join path explodes N×k scored rows, shuffles them through a
    groupBy(id) argmax, then joins the winner back onto the vectors —
    two exchanges the assignment doesn't need: the centroid table is
    already small enough to broadcast, so ship it to every task ONCE
    (driver collect — the same k-row boundedness the join path's
    ``F.broadcast(cent)`` assumes) and emit (id, vec, cid) in place.
    Decisions are bit-identical to max_by via :func:`_gemm_argmax_cids`'
    banded exact-fold re-rank, so every consumer keeps its oracle.

    Measured (round-12 verdict #2): the interpreted HOF dot per (vector,
    centroid) was the routed SemDeDup family's remaining flat cost —
    see the committed stress numbers on ``semantic_dedup``.
    """
    import numpy as np

    cid_t = _require_integral_cid(centroids, cid_col, "ivf_assign")
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    cent_rows = centroids.select(cid_col, cvec_col).collect()
    if not cent_rows:
        # k = 0: nothing to assign against. The join path's inner join
        # onto the empty argmax table returns an empty (id, vec, cid)
        # frame — match it instead of crashing in ``V @ C.T`` (shape-(0,)
        # C) and the ``best[1]`` deref (round-13 verdict #2 / ADVICE).
        return base.select(
            "id", "vec", F.lit(None).cast(cid_t).alias("cid")
        ).limit(0)
    cids, C, cn = _centroid_arrays(cent_rows)
    schema = (
        f"id {base.schema['id'].dataType.simpleString()}, "
        f"vec {base.schema['vec'].dataType.simpleString()}, cid {cid_t}"
    )

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf["vec"]],
                dtype=np.float64,
            )
            out = pdf[["id", "vec"]].copy()
            out["cid"] = _gemm_argmax_cids(V, C, cn, cids)
            yield out

    return base.mapInPandas(assign, schema)


def ivf_assign(df: DataFrame, centroids: DataFrame,
               id_col: str = "vec_id", vec_col: str = "embedding",
               cid_col: str = "cid", cvec_col: str = "cvec",
               method: str = "gemm") -> DataFrame:
    """IVF cell assignment: each vector → its max-cosine centroid.

    Output (id, vec, cid). ``method="gemm"`` (default) computes the
    argmax as one numpy GEMM per Arrow batch inside ``mapInPandas`` —
    no exchange at all (see :func:`_ivf_assign_gemm`; decisions
    bit-identical via the banded exact-fold re-rank, so oracles are
    unchanged). ``method="join"`` is the pure-JVM fallback kept for the
    equivalence test: centroids are broadcast (they are small by
    construction — k ≪ N); the argmax is a ``max_by`` aggregation with
    map-side partial aggregation — one shuffle of one row per vector, no
    sort (a window row_number here would shuffle and sort N×k scored rows).
    Tie-break: max over (cosine, -cid) ⇒ highest cosine, then lowest cid —
    deterministic and identical to the oracle's row_number ordering.
    """
    if method == "gemm":
        return _ivf_assign_gemm(
            df, centroids, id_col, vec_col, cid_col, cvec_col
        )
    _require_integral_cid(centroids, cid_col, "ivf_assign")
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    withn = base.withColumn("__n", norm_expr(F.col("vec")))
    cent = centroids.select(
        F.col(cid_col).alias("cid"),
        F.col(cvec_col).alias("__cv"),
        norm_expr(F.col(cvec_col)).alias("__cn"),
    )
    # Skinny scored rows (id, cid, cos) only: dragging the vector array
    # through the N×k aggregation buffers costs more than re-joining it.
    # Norms precomputed per side: one dot per (vector, centroid) pair.
    scored = withn.join(F.broadcast(cent)).select(
        "id",
        "cid",
        (
            dot_expr(F.col("vec"), F.col("__cv"))
            / (F.col("__n") * F.col("__cn"))
        ).alias("__cos"),
    )
    assigned = scored.groupBy("id").agg(
        F.max_by(
            "cid", F.struct(F.col("__cos").alias("c"), (-F.col("cid")).alias("t"))
        ).alias("cid")
    )
    return base.join(assigned, "id").select("id", "vec", "cid")


def _ivf_assign_routed_gemm(df: DataFrame, coarse: DataFrame,
                            f2c: DataFrame, id_col: str,
                            vec_col: str) -> DataFrame:
    """Both routed-assignment levels as ONE ``mapInPandas`` pass — ZERO
    exchanges (round-12 verdict #2: the two broadcast-join + groupBy
    argmax stages were the family's remaining flat 209 us/row).

    The routing TABLES stay Spark plans — ``coarse`` (the rank-g subset)
    and ``f2c`` (fine->coarse argmax with the self-route pin) are k-row
    computations collected once, so their decisions come from the exact
    oracle-matched plans. Per Arrow batch: GEMM argmax onto the coarse
    matrix (banded exact-fold re-rank, :func:`_gemm_argmax_cids`), then
    rows grouped by chosen coarse cell and GEMM-argmax'd against only
    that cell's fine centroids — the same candidate sets, scores, and
    (cos, -cid) ordering as the join path, decision-for-decision.
    """
    import numpy as np

    # fine-cid type follows the centroids schema (via f2c), exactly as
    # _ivf_assign_gemm derives it — a hardcoded 'cid long' would
    # silently retype non-long ids relative to the join path.
    cid_t = f2c.schema["cid"].dataType.simpleString()
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    coarse_rows = coarse.select("ccid", "ccvec").collect()
    cells: dict = {}
    for r in f2c.select("ccid", "cid", "cvec").collect():
        cells.setdefault(r[0], []).append((r[1], r[2]))
    if not coarse_rows or not cells:
        # k = 0 (empty centroids ⇒ empty coarse subset and empty
        # fine→coarse routing): match the join path's empty result
        # instead of crashing in the coarse GEMM.
        return base.select(
            "id", "vec", F.lit(None).cast(cid_t).alias("cid")
        ).limit(0)
    ccids, CC, ccn = _centroid_arrays(coarse_rows)
    cell_arrays = {
        ccid: _centroid_arrays(rows) for ccid, rows in cells.items()
    }
    schema = (
        f"id {base.schema['id'].dataType.simpleString()}, "
        f"vec {base.schema['vec'].dataType.simpleString()}, cid {cid_t}"
    )

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf["vec"]],
                dtype=np.float64,
            )
            route = np.asarray(_gemm_argmax_cids(V, CC, ccn, ccids))
            cid_out = np.empty(len(pdf), dtype=np.int64)
            for ccid in np.unique(route):
                idx = np.nonzero(route == ccid)[0]
                fcids, FC, fcn = cell_arrays[int(ccid)]
                cid_out[idx] = _gemm_argmax_cids(V[idx], FC, fcn, fcids)
            out = pdf[["id", "vec"]].copy()
            out["cid"] = cid_out
            yield out

    return base.mapInPandas(assign, schema)


def ivf_assign_routed(df: DataFrame, centroids: DataFrame,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      cid_col: str = "cid",
                      cvec_col: str = "cvec",
                      method: str = "gemm") -> DataFrame:
    """Two-level (coarse-routed) IVF cell assignment — the scale path for
    GOVERNED centroid counts, where k grows with the corpus.

    :func:`ivf_assign` scores every vector against every centroid: N*k
    work, which with governed ``k = N/T`` is O(N²/T) — measured 31x
    runtime for 10x vectors at the 100x stress scale
    (STRESS_100X_r09.json, semantic_dedup). This routine cuts it to
    ~2*N*sqrt(k): pick every g-th centroid (g = floor(sqrt(k)), by cid
    rank) as a COARSE centroid, route each fine centroid and each vector
    to its max-cosine coarse centroid, then argmax only over the ~sqrt(k)
    fine centroids sharing the vector's coarse cell. Deterministic and
    SQL-expressible end to end (rank/argmax tie-breaks by lowest id, the
    same (cos DESC, cid ASC) order as the exact path), so the routed
    consumers keep full DuckDB oracles. Assignment is APPROXIMATE: a
    vector near a coarse boundary can land in a near-best fine cell
    instead of the globally-best one — the standard IVF trade, fine for
    cell-bounding consumers (SemDeDup) where cells only need to be
    locally coherent, wrong for exact-argmax consumers.

    Output (id, vec, cid) — drop-in for :func:`ivf_assign`.
    """
    from pyspark.sql import Window

    from arcane_framework_spark.operators.scale import with_broadcast_scalar

    _require_integral_cid(centroids, cid_col, "ivf_assign_routed")
    cent = centroids.select(
        F.col(cid_col).alias("cid"), F.col(cvec_col).alias("cvec")
    )
    g_df = cent.agg(
        F.greatest(
            F.lit(1).cast("long"),
            F.floor(F.sqrt(F.count(F.lit(1)))).cast("long"),
        ).alias("__g")
    )
    # rank-by-cid coarse selection: k rows, single-partition window is fine
    ranked = with_broadcast_scalar(cent, g_df).withColumn(
        "__rk", F.row_number().over(Window.orderBy("cid"))
    )
    coarse = ranked.filter((F.col("__rk") - 1) % F.col("__g") == 0).select(
        F.col("cid").alias("ccid"),
        F.col("cvec").alias("ccvec"),
        norm_expr(F.col("cvec")).alias("__ccn"),
    )
    fine = cent.withColumn("__fn", norm_expr(F.col("cvec")))
    f2c = (
        fine.join(F.broadcast(coarse))
        .select(
            "cid",
            "ccid",
            # A coarse centroid IS a fine centroid (coarse is a rank
            # subset of fine); pin its self-route above any computed
            # cosine so every coarse cell provably contains at least
            # one fine member (itself). Without the pin, an fp-ulp
            # anomaly between self-cos (dot/(n*n) can round below 1)
            # and a near-duplicate's cos could route a coarse centroid
            # away from itself, leaving its cell fine-empty — and the
            # inner join below would then silently DROP every vector
            # coarse-routed there. The oracle SQL pins identically.
            F.when(F.col("cid") == F.col("ccid"), F.lit(2.0))
            .otherwise(
                dot_expr(F.col("cvec"), F.col("ccvec"))
                / (F.col("__fn") * F.col("__ccn"))
            ).alias("__cos"),
        )
        .groupBy("cid")
        .agg(
            F.max_by(
                "ccid",
                F.struct(F.col("__cos").alias("c"), (-F.col("ccid")).alias("t")),
            ).alias("ccid")
        )
        .join(fine, "cid")
        .select("cid", "cvec", "__fn", "ccid")
    )
    if method == "gemm":
        return _ivf_assign_routed_gemm(
            df, coarse, f2c, id_col, vec_col
        )
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    withn = base.withColumn("__n", norm_expr(F.col("vec")))
    # vector -> coarse: N x sqrt(k) scored rows, partial-aggregated argmax
    vcoarse = (
        withn.join(F.broadcast(coarse))
        .select(
            "id",
            "ccid",
            (
                dot_expr(F.col("vec"), F.col("ccvec"))
                / (F.col("__n") * F.col("__ccn"))
            ).alias("__cos"),
        )
        .groupBy("id")
        .agg(
            F.max_by(
                "ccid",
                F.struct(F.col("__cos").alias("c"), (-F.col("ccid")).alias("t")),
            ).alias("ccid")
        )
    )
    # vector -> fine within its coarse cell: N x ~sqrt(k) scored rows
    assigned = (
        withn.join(vcoarse, "id")
        .join(
            F.broadcast(
                f2c.select(
                    "ccid", "cid", F.col("cvec").alias("__fv"), "__fn"
                )
            ),
            "ccid",
        )
        .select(
            "id",
            "cid",
            (
                dot_expr(F.col("vec"), F.col("__fv"))
                / (F.col("__n") * F.col("__fn"))
            ).alias("__cos"),
        )
        .groupBy("id")
        .agg(
            F.max_by(
                "cid",
                F.struct(F.col("__cos").alias("c"), (-F.col("cid")).alias("t")),
            ).alias("cid")
        )
    )
    return base.join(assigned, "id").select("id", "vec", "cid")


def ivf_topk(df: DataFrame, centroids: DataFrame, queries: DataFrame, k: int,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF-style ANN: top-k by cosine among vectors sharing the query's cell.

    probe=1 (search only the query's own cell). Output
    (query_id, neighbor_id, cosine, rank). Scale: the corpus is scanned once
    for assignment; the search join shuffles on cid — each query touches
    ~N/k_centroids vectors instead of N (the IVF speedup), and more probes
    are just more cid values per query.
    """
    from pyspark.sql import Window

    assigned = ivf_assign(df, centroids, id_col, vec_col).withColumn(
        "__n", norm_expr(F.col("vec"))
    )
    q = ivf_assign(queries, centroids, id_col, vec_col).select(
        F.col("id").alias("query_id"),
        F.col("vec").alias("qv"),
        norm_expr(F.col("vec")).alias("__qn"),
        "cid",
    )
    scored = (
        assigned.join(q, on="cid")
        .filter(F.col("id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            (
                dot_expr(F.col("qv"), F.col("vec"))
                / (F.col("__qn") * F.col("__n"))
            ).alias("__cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("__cos"), 6).alias("cosine"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def kmeans_fit(df: DataFrame, k: int | None, iterations: int = 3,
               id_col: str = "vec_id", vec_col: str = "embedding",
               init_stride: int | None = None,
               target_cell_size: int | None = None,
               routed: bool = False) -> DataFrame:
    """Lloyd's k-means over an embedding column, pure DataFrame ops.

    Fully deterministic: init takes the ``k`` lowest-id vectors whose id is a
    multiple of ``init_stride`` (defaulting to ``count/k``, computed INSIDE
    the plan via a broadcast scalar — no driver-side ``df.count()`` action);
    each iteration = cosine-argmax assignment (broadcast centroids, map-side)
    followed by a per-dimension mean (posexplode → groupBy(cid, pos) avg →
    re-assemble). Per iteration: one N×dim-row shuffle — the canonical
    distributed k-means cost. Returns the final centroids (cid, cvec).

    **Corpus-derived k** (``k=None, target_cell_size=T``): instead of a
    caller-fixed centroid count, the seed stride is derived IN-PLAN as
    ``max(1, floor(n / ceil(n / T)))`` from a broadcast 1-row count — every
    id divisible by the stride becomes a centroid, so k grows linearly with
    the corpus and the *average* cell stays ~T at any scale. No ``limit``
    literal appears anywhere, which is what makes the per-cell quadratic
    work of consumers like :func:`semantic_dedup` bounded at 100×: same
    code, 100× the data, 100× the cells, constant cell size.

    Scale hygiene: ``base`` is persisted once (every iteration and the
    caller's final action re-reads it); each iteration's centroids are
    persisted and materialized so Lloyd iteration i does not re-derive the
    full lineage of iterations 0..i-1, and the previous iteration's cache is
    dropped as soon as it is superseded. The small final-centroid handle is
    left cached for the caller (k rows).

    Deterministic init + fixed iteration count also make the whole fit
    SQL-expressible — the catalog's ``kmeans_embeddings`` oracle unrolls
    these exact iterations as DuckDB CTEs.
    """
    if (k is None) == (target_cell_size is None):
        raise ValueError("exactly one of k / target_cell_size is required")
    base = df.select(
        F.col(id_col).alias(id_col),
        F.col(vec_col).cast("array<double>").alias(vec_col),
    ).transform(scoped_persist)
    if target_cell_size is not None:
        from arcane_framework_spark.operators.scale import (
            with_broadcast_scalar,
        )

        t = F.lit(target_cell_size).cast("double")
        stride = base.select(
            F.greatest(
                F.lit(1).cast("long"),
                F.floor(
                    F.count(F.lit(1)) / F.ceil(F.count(F.lit(1)) / t)
                ).cast("long"),
            ).alias("__stride")
        )
        centroids = (
            with_broadcast_scalar(base, stride)
            .filter(F.col(id_col) % F.col("__stride") == 0)
            .select(
                F.col(id_col).alias("cid"),
                F.col(vec_col).alias("cvec"),
            )
            .transform(scoped_persist)
        )
    else:
        if init_stride is not None:
            seeds = base.filter(F.col(id_col) % init_stride == 0)
        else:
            from arcane_framework_spark.operators.scale import (
                with_broadcast_scalar,
            )

            stride = base.select(
                F.greatest(
                    F.lit(1), (F.count(F.lit(1)) / k).cast("long")
                ).alias("__stride")
            )
            seeds = with_broadcast_scalar(base, stride).filter(
                F.col(id_col) % F.col("__stride") == 0
            )
        # orderBy + limit = TakeOrderedAndProject: deterministic at any
        # parallelism, unlike a bare limit over an unordered filter.
        centroids = (
            seeds.orderBy(id_col)
            .limit(k)
            .select(
                F.col(id_col).alias("cid"),
                F.col(vec_col).alias("cvec"),
            )
            .transform(scoped_persist)
        )
    # routed=True swaps the exact N*k argmax for the two-level
    # ~2*N*sqrt(k) coarse-routed assignment (see ivf_assign_routed) in
    # every Lloyd iteration — the governed-k mode's scale path, since
    # k grows with N and exact assignment is then O(N²/T).
    assign = ivf_assign_routed if routed else ivf_assign
    # NOTE (r14 opt): a "known-width" variant was tried here — one
    # groupBy(cid) with `dim` F.sum(F.get(vec, i)) columns instead of
    # the posexplode + two-stage aggregation. It measured ~1.5-2x SLOWER
    # warm (5.4 vs 2.8s for k=10/iters=3 at sf0.1, A/B in one session;
    # the 64-wide sum aggregate loses codegen efficiency), so the
    # exploded form below stays ON PURPOSE.
    for _ in range(iterations):
        assigned = assign(base, centroids, id_col, vec_col)
        dims = assigned.select(
            "cid", F.posexplode("vec").alias("pos", "x")
        )
        means = (
            dims.groupBy("cid", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cid")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "m"))
                ).alias("pm")
            )
            .select(
                "cid", F.transform("pm", lambda s: s.m).alias("cvec")
            )
            .transform(scoped_persist)
        )
        # materialize the new centroids, then drop the superseded cache so
        # iteration i+1 starts from k cached rows, not re-derived lineage
        means.count()
        centroids.unpersist()
        # Routed mode MUST also truncate the LOGICAL lineage, not just
        # cache the rows: the routed assignment inlines the HOF cosine
        # into several argmax/join sites, so plan size compounds per
        # iteration and Catalyst re-optimizes the whole chain on every
        # broadcast job of the NEXT consumer — measured 17.1s vs 1.7s
        # for one 2100-row assignment against lineage vs checkpointed
        # centroids (driver-side planning, independent of data scale).
        # Same localCheckpoint pattern as operators/graph.py pointer
        # jumping; k rows only, content deterministic.
        if routed:
            centroids = means.localCheckpoint()
            # the checkpoint holds the rows now — release the scoped
            # cache immediately instead of pinning every iteration's
            # `means` until cache_scope exit (the exact path's
            # centroids.unpersist() above handles its own chain, but a
            # checkpointed DataFrame is a NEW plan, so that call is a
            # no-op on the cached `means` without this)
            means.unpersist()
        else:
            centroids = means
    base.unpersist()
    return centroids


def dimension_stats(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension global (min, max) assembled into two aligned arrays.

    One explode + one 64-row aggregate + one 1-row assembly — the
    calibration pass of scalar quantization. Returns a single row
    ``(mins: array<double>, maxs: array<double>)`` meant for
    ``with_broadcast_scalar``.
    """
    dims = df.select(
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "x")
    )
    per_dim = dims.groupBy("pos").agg(
        F.min("x").alias("mn"), F.max("x").alias("mx")
    )
    return per_dim.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mn"))),
            lambda s: s.mn,
        ).alias("mins"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mx"))),
            lambda s: s.mx,
        ).alias("maxs"),
    )


def quantize_expr(vec_col: Column, mins: Column, maxs: Column) -> Column:
    """Symmetric-range int8 scalar quantization.

    ``q_i = floor((x_i - min_i) / (max_i - min_i) * 255 + 0.5) - 128`` —
    floor(v+0.5) instead of round() so half-way codes are identical across
    engines; constant dimensions (max == min) quantize to 0.
    """
    return F.zip_with(
        vec_col.cast("array<double>"),
        F.zip_with(mins, maxs, lambda a, b: F.struct(a.alias("mn"), b.alias("mx"))),
        lambda x, s: F.when(s.mx == s.mn, F.lit(0)).otherwise(
            F.floor((x - s.mn) / (s.mx - s.mn) * 255 + F.lit(0.5)) - 128
        ).cast("int"),
    )


def dequantize_expr(q_col: Column, mins: Column, maxs: Column) -> Column:
    """Inverse of ``quantize_expr``: ``min_i + (q_i + 128) / 255 * range_i``."""
    return F.zip_with(
        q_col,
        F.zip_with(mins, maxs, lambda a, b: F.struct(a.alias("mn"), b.alias("mx"))),
        lambda q, s: s.mn + (q.cast("double") + 128) / 255 * (s.mx - s.mn),
    )


def ann_lsh_pairs(df: DataFrame, dim: int, min_cosine: float = 0.0,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  num_planes: int = NUM_PLANES) -> DataFrame:
    """Near-neighbor candidate pairs = same LSH bucket, verified by cosine.

    Output (id_a, id_b, cosine) with id_a < id_b. The join is on the bucket
    signature — at 100 TB this is the standard ANN sketch: linear scan to
    bucket, shuffle on bucket, per-bucket pair generation.
    """
    # persisted: both sides of the self-join consume base — without the cache
    # the signature HOFs run twice over the corpus (same fix as
    # ann_banded_pairs)
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        lsh_signature_expr(F.col(vec_col), dim, num_planes).alias("bucket"),
    ).transform(scoped_persist)
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(b, on="bucket")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(cosine_expr(F.col("a.vec"), F.col("b.vec")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= min_cosine)
    )


def centroid_outliers(vectors: DataFrame, id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      group_col: str = "label") -> DataFrame:
    """Semantic outlier scoring: Euclidean distance of each vector to its
    group's mean vector (the SemDeDup/mislabel-screening primitive —
    far-from-centroid rows are label noise or semantic outliers).

    Cross-engine exactness without floating-point order sensitivity:
    components are fixed-pointed to micro-units (exact longs), centroids
    are kept as (sum, count) integer pairs instead of divided means, and
    the squared distance is assembled from ``(e*cnt - sum)²`` summed as
    DECIMAL(38,0) — exact integer algebra end-to-end, so any row order and
    partitioning gives bit-identical results (DuckDB replays it in
    HUGEINT). Only the final sqrt/normalize happens in doubles, computed
    once from exact integers.

    Scale shape: one shuffle to the (group, dim) centroid table (tiny:
    groups × dims rows, broadcast back), one shuffle back per id — both
    partial-agg friendly. Returns (id, group, dist) with dist rounded
    half-up to 6 decimals.
    """
    base = vectors.select(
        id_col,
        group_col,
        F.transform(
            vec_col,
            lambda x: F.floor(x.cast("double") * F.lit(1e6) + F.lit(0.5))
            .cast("long"),
        ).alias("__e"),
    )
    dims = base.select(
        id_col, group_col, F.posexplode("__e").alias("pos", "v")
    )
    cent = dims.groupBy(group_col, "pos").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).alias("cnt")
    )
    diff = (F.col("v") * F.col("cnt") - F.col("s")).cast("decimal(19,0)")
    return (
        dims.join(F.broadcast(cent), [group_col, "pos"])
        .groupBy(id_col, group_col)
        .agg(
            F.sum(diff * diff).alias("__ss"),
            F.max("cnt").alias("__cnt"),
        )
        .select(
            id_col,
            group_col,
            (
                F.floor(
                    F.sqrt(F.col("__ss").cast("double"))
                    / (F.col("__cnt") * F.lit(1000000)).cast("double")
                    * F.lit(1e6)
                    + F.lit(0.5)
                )
                / F.lit(1e6)
            ).alias("dist"),
        )
    )


def semantic_dedup(vectors: DataFrame, k: int | None, threshold: float,
                   iterations: int = 3, id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   init_stride: int | None = None,
                   target_cell_size: int | None = None,
                   routed: bool = False,
                   split_factor: int = SEMDEDUP_SPLIT_FACTOR,
                   incell: str = "gemm",
                   centroids: DataFrame | None = None) -> DataFrame:
    """SemDeDup-style semantic deduplication over an embedding column.

    The SemDeDup recipe (Abbas et al. 2023): cluster the corpus with
    k-means, then look for near-duplicate pairs ONLY inside each cluster —
    the cells bound the quadratic pairwise work that makes global
    all-pairs cosine impossible at corpus scale. Within a cell, a vector
    is PRUNED when some cell-mate with cosine >= ``threshold`` dominates
    it: the keeper is the one closer to the cell centroid (rounded cosine
    to centroid, ties broken by lower id) — a deterministic local-maxima
    rule that needs no connected-components pass and is expressible in
    plain SQL for the oracle.

    Returns one row per vector: (id, cid, cent_cos, pruned).

    Scale: k-means is O(iters) shuffles of N rows (see ``kmeans_fit``);
    assignment broadcasts k centroids; the dedup probe is ONE
    sort-merge self-join keyed on ``cid`` — per-cell pairwise, so cost is
    sum(cell²) not N², and growing ``k`` with the corpus keeps cells
    bounded. Pass ``k=None, target_cell_size=T`` to ENFORCE that growth:
    the centroid count is then derived in-plan from the corpus count
    (``ceil(n / T)`` seeds via a broadcast-scalar stride — see
    :func:`kmeans_fit`), so at 100× the data there are 100× the cells and
    the per-cell pairwise cost stays constant. A fixed ``k`` remains
    available for callers who have sized it themselves, but the governed
    mode is the one that survives a scale-up unreviewed. Governed mode
    makes ASSIGNMENT the superlinear step (k ∝ N ⇒ N*k = O(N²/T) —
    measured 31x runtime for 10x vectors at 100x stress):
    ``routed=True`` swaps in the two-level ~2*N*sqrt(k) coarse-routed
    assignment (:func:`ivf_assign_routed`) for every Lloyd iteration and
    the final cell assignment — approximate cell membership, same
    deterministic dominance rule, still fully oracle-expressible.

    Routed mode additionally HARD-CAPS cell size. The routed argmax can
    pile vectors into fine cells inside dense coarse regions — measured
    at 100x stress: max cell 1614 vs target 64, which un-bounds the
    quadratic probe the cells exist to bound. So after the final routed
    assignment, any cell larger than ``split_factor * target_cell_size``
    (default ``SEMDEDUP_SPLIT_FACTOR``; the forced-split catalog twin
    passes 1 so the branch fires — and is cross-engine hash-checked —
    at gate scale) is split deterministically into rank-contiguous
    sub-cells (FAISS-style list capping): members are ranked by id
    within their cell, grouped ``cap`` at a time, and each sub-cell is
    re-keyed by its MINIMUM member id (collision-free across cells
    since member ids are unique, scale-safe: both windows partition by
    cid). The output ``cid`` IS the sub-cell — the unit that bounded
    the pairwise work — while ``cent_cos`` stays relative to the routed
    centroid. A cross-sub-cell duplicate pair is missed by
    construction: that is the same recall trade the cap itself makes,
    and the gate hash-checks the identical split in the DuckDB oracle.

    The dominance probe (``incell="gemm"``, default) runs as one numpy
    GEMM per cell inside ``applyInPandas`` with an exact-fold re-check
    of rounding-boundary pairs — bit-identical decisions to the
    ``incell="join"`` left-semi self-join it replaces (see
    :func:`_incell_dominance_gemm`; the join path is kept for the
    equivalence test and as the pure-JVM fallback). Either way the
    decision rounds pair cosine to 6 decimals first, which keeps it
    bit-stable across engines.

    Reference parity: the reference has no semantic dedup; this extends
    the dedup family (X1-X5) to the embedding modality the way a
    training-data pipeline needs at 100 TB.

    ``centroids`` short-circuits the k-means training with an existing
    (cid, cvec) table — the trained-model-as-side-table path (the
    ``dedup_clusters``/``components`` pattern): a production corpus
    build fits the centroids once and every SemDeDup consumer (exact
    twin, routed twin, the agreement diagnostic) assigns against the
    same table (see prep.shared_prep). The fit is deterministic, so a
    passed-in table trained with the same parameters yields the
    identical output as training in place.
    """
    if centroids is None:
        centroids = kmeans_fit(
            vectors, k=k, iterations=iterations, id_col=id_col,
            vec_col=vec_col, init_stride=init_stride,
            target_cell_size=target_cell_size, routed=routed,
        )
    cent = centroids.select(
        "cid", "cvec", norm_expr(F.col("cvec")).alias("__cn")
    )
    final_assign = ivf_assign_routed if routed else ivf_assign
    raw = final_assign(vectors, centroids, id_col, vec_col)
    if routed and target_cell_size is not None:
        from pyspark.sql import Window

        cap = split_factor * target_cell_size
        wrk = Window.partitionBy("cid").orderBy("id")
        wsub = Window.partitionBy("cid", "__sub")
        # rank-contiguous split, sub-cell re-keyed by its min member id:
        # collision-free (ids unique), deterministic, both windows
        # partitioned by cid — no single-partition stage at any scale.
        raw = (
            raw.withColumn(
                "__sub",
                F.floor((F.row_number().over(wrk) - 1) / F.lit(cap)).cast(
                    "long"
                ),
            )
            .withColumn("__cell", F.min("id").over(wsub))
        )
    else:
        raw = raw.withColumn("__cell", F.col("cid"))
    assigned = (
        raw.join(F.broadcast(cent), "cid")
        .select(
            F.col("id").alias(id_col),
            F.col("__cell").alias("cid"),
            "vec",
            # Norm precomputed ONCE per row: the pairwise probe below reads
            # it from both sides instead of re-folding vec·vec per PAIR —
            # same doubles as computing it in place (norm is per-row
            # deterministic), a third of the per-pair HOF work.
            norm_expr(F.col("vec")).alias("__n"),
            # 5 decimals, not 6: cent_cos feeds an exact dominance
            # comparison, and the centroid components are summation-order-
            # sensitive means — one extra digit of slack keeps the decision
            # bit-stable across engines.
            F.round(
                dot_expr(F.col("vec"), F.col("cvec"))
                / (norm_expr(F.col("vec")) * F.col("__cn")),
                5,
            ).alias("cent_cos"),
        )
        .transform(scoped_persist)
    )
    if incell == "gemm":
        return _incell_dominance_gemm(assigned, id_col, threshold)
    return _incell_dominance_join(assigned, id_col, threshold)


def _incell_dominance_join(assigned: DataFrame, id_col: str,
                           threshold: float) -> DataFrame:
    """The in-cell dominance probe as a pure-JVM left-semi self-join on
    ``cid`` — the reference semantics both paths must express: a row is
    pruned when some cell-mate with ``round(cos, 6) >= threshold``
    dominates it (higher ``cent_cos``, ties to the lower id). Kept as
    the equivalence-test twin and the fallback for
    :func:`_incell_dominance_gemm`."""
    a, b = assigned.alias("a"), assigned.alias("b")
    pair_cos = F.round(
        dot_expr(F.col("a.vec"), F.col("b.vec"))
        / (F.col("a.__n") * F.col("b.__n")),
        6,
    )
    dominates = (F.col("b.cent_cos") > F.col("a.cent_cos")) | (
        (F.col("b.cent_cos") == F.col("a.cent_cos"))
        & (F.col(f"b.{id_col}") < F.col(f"a.{id_col}"))
    )
    pruned = a.join(
        b,
        (F.col("a.cid") == F.col("b.cid"))
        & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}"))
        & dominates
        & (pair_cos >= F.lit(threshold)),
        "left_semi",
    ).select(F.col(f"a.{id_col}").alias(id_col), F.lit(True).alias("pruned"))
    return (
        assigned.select(id_col, "cid", "cent_cos")
        .join(pruned, id_col, "left")
        .select(
            id_col,
            "cid",
            "cent_cos",
            F.coalesce("pruned", F.lit(False)).alias("pruned"),
        )
    )


def _incell_dominance_gemm(assigned: DataFrame, id_col: str,
                           threshold: float) -> DataFrame:
    """The in-cell dominance step of :func:`semantic_dedup` as ONE numpy
    GEMM per cell inside ``applyInPandas`` — the X42 Arrow pattern on the
    catalog's costliest family (round-11 verdict #5: 521 µs/row at the
    1000x probe, dominated by the interpreted per-pair HOF dot in the
    ``cid`` self-join).

    Decisions are EXACTLY the join path's — the oracle is unchanged and
    the gate keeps hash-matching — via a banded split:

    - The GEMM cosine differs from the Spark/DuckDB left-to-right fold
      by at most ~dim·ulp (≈1e-13 for unit-scale 64-d vectors, pairwise
      vs sequential summation). A pair whose ``cos*1e6`` sits further
      than 1e-6 from a half-up rounding boundary therefore rounds the
      SAME under both summations: the integer test
      ``floor(S*1e6 + 0.5) >= round(threshold*1e6)`` is bit-equivalent
      to Spark's ``round(cos, 6) >= threshold`` there (k·1e-6 vs
      threshold double ordering agrees with the rational ordering for
      every k off the boundary).
    - The rare boundary-band pair is re-verified with the exact
      contract arithmetic: float64 left-to-right fold of per-component
      products (``dot_expr``'s accumulation order), divided by the
      precomputed norms in the same association, rounded with Java
      BigDecimal HALF_UP semantics (shortest-repr decimal, matching
      Spark's Round).

    Same shuffle shape as the join it replaces (one exchange on cid);
    cells are bounded by the split cap, so each group's matrix is at
    most cap² doubles. Measured at the 1000x probe shape (2M vectors,
    cap binding at 512): 1042s -> 496s wall, 521 -> 248 µs/row, with
    the gate's semantic-dedup entries (exact, routed, split, agreement,
    streaming twin) still hash-matched against the unchanged oracle.
    At the small-cell 100x shape the win is marginal (19.0s -> 17.9s) —
    assignment dominates there, exactly as the cell-size math predicts.
    """
    import math
    from decimal import Decimal

    import numpy as np
    import pandas as pd

    # The join path tests ``round(cos, 6) >= threshold`` where
    # ``round(cos, 6)`` is the double nearest to the decimal k/1e6 — so
    # a pair is pruned there iff its rounded-unit integer k satisfies
    # ``double(k/1e6) >= threshold``. That test is monotone in k, so the
    # bit-equivalent integer bound is the SMALLEST k with
    # ``double(k/1e6) >= threshold`` — NOT ``round(threshold*1e6)``,
    # which for a >6-decimal threshold (e.g. 0.7000004 -> 700000) admits
    # k values whose rounded double still sits BELOW the threshold and
    # over-prunes outside the boundary re-check band. ``Decimal(k) /
    # 1000000`` is exact (<= 13 significant digits), so float() of it is
    # the correctly-rounded double of the rational k/1e6.
    bound_units = math.floor(threshold * 1e6)
    while float(Decimal(bound_units) / 1000000) >= threshold:
        bound_units -= 1
    bound_units += 1

    def cell(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        out = pdf[[id_col, "cid", "cent_cos"]].copy()
        if n == 1:
            out["pruned"] = False
            return out
        V = np.asarray([np.asarray(v, dtype=np.float64)
                        for v in pdf["vec"]], dtype=np.float64)
        norms = pdf["__n"].to_numpy(dtype=np.float64)
        # No dtype coercion: integral ids arrive int64, anything else
        # (string ids the join path always accepted) stays an object
        # array whose broadcast ``<`` is the same elementwise Python
        # comparison Spark's ``b.id < a.id`` performs.
        ids = pdf[id_col].to_numpy()
        cc = pdf["cent_cos"].to_numpy(dtype=np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            S = (V @ V.T) / np.outer(norms, norms)
        # dom[a, b]: b dominates a (closer to centroid, id tiebreak)
        dom = (cc[None, :] > cc[:, None]) | (
            (cc[None, :] == cc[:, None]) & (ids[None, :] < ids[:, None])
        )
        with np.errstate(invalid="ignore"):
            scaled = S * 1e6
            above = np.floor(scaled + 0.5) >= bound_units
            band = np.abs(scaled - np.floor(scaled) - 0.5) < 1e-6
        np.fill_diagonal(band, False)
        for ai, bi in zip(*np.where(band & dom)):
            acc = 0.0
            for x, y in zip(V[ai], V[bi]):
                acc += x * y
            cos = acc / (norms[ai] * norms[bi])
            from decimal import ROUND_HALF_UP, Decimal

            rounded = float(
                Decimal(repr(cos)).quantize(
                    Decimal("0.000001"), rounding=ROUND_HALF_UP
                )
            )
            above[ai, bi] = rounded >= threshold
        out["pruned"] = np.any(dom & above, axis=1)
        return out

    # Output types follow the input frame (ids need not be integral —
    # the join path never required that, so neither may this one).
    idt = assigned.schema[id_col].dataType.simpleString()
    cidt = assigned.schema["cid"].dataType.simpleString()
    schema = f"{id_col} {idt}, cid {cidt}, cent_cos double, pruned boolean"
    return assigned.groupBy("cid").applyInPandas(cell, schema)


def embedding_dispersion(vectors: DataFrame, group_col: str = "label",
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """Per-group embedding diversity: the EXACT mean squared Euclidean
    distance over all ordered pairs within each group — without forming
    a single pair.

    The variance identity makes the O(N²) quantity a one-pass
    aggregation: sum over i≠j of ||xi−xj||² = 2N·Σ||xi||² − 2·||Σxi||².
    A diversity collapse (mode-collapsed embeddings, over-deduped data)
    shows up as a dispersion drop long before any pairwise audit could
    run at corpus scale.

    Cross-engine exactness: components are fixed-pointed to micro-units
    (exact longs), per-dimension sums and sums of squares accumulate as
    DECIMAL(38,0) integers (HUGEINT in the DuckDB oracle), so any row
    order and partitioning gives bit-identical integers; the single
    division to float happens once at the end. Output
    (group, n_vectors, dispersion) with dispersion rounded half-up to 6.

    Scale: posexplode to (group, dim) → ONE shuffle with map-side
    partial aggregation over group×dim keys → a groups-sized rollup.
    No pairs, no windows, no collect.
    """
    base = vectors.select(
        F.col(group_col).alias("group"),
        F.posexplode(
            F.transform(
                F.col(vec_col),
                lambda x: F.floor(x.cast("double") * F.lit(1e6) + F.lit(0.5))
                .cast("decimal(38,0)"),
            )
        ).alias("pos", "e"),
    )
    per_dim = base.groupBy("group", "pos").agg(
        F.sum("e").alias("s"),
        F.sum(F.col("e") * F.col("e")).alias("q"),
        F.count(F.lit(1)).alias("n"),
    )
    per_group = per_dim.groupBy("group").agg(
        F.sum(F.col("s") * F.col("s")).alias("ss"),
        F.sum("q").alias("qq"),
        F.max("n").alias("n"),
    )
    pair_sum = (
        F.lit(2).cast("decimal(38,0)") * F.col("n") * F.col("qq")
        - F.lit(2).cast("decimal(38,0)") * F.col("ss")
    )
    mean_sq = pair_sum.cast("double") / (
        F.col("n").cast("double")
        * (F.col("n") - F.lit(1)).cast("double")
        * F.lit(1e12)
    )
    return per_group.filter(F.col("n") > 1).select(
        F.col("group").alias(group_col),
        F.col("n").cast("long").alias("n_vectors"),
        (F.floor(mean_sq * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias(
            "dispersion"
        ),
    )


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection + distortion audit
# ---------------------------------------------------------------------------

JL_PLANES = 16
JL_SAMPLE_MOD = 41

#: Embedding dimensionality of the testdata contract — the single
#: definition; the query modules import it for their oracles.
EMBEDDING_DIM = 64


def jl_project(df: DataFrame, num_planes: int = JL_PLANES,
               id_col: str = "vec_id",
               vec_col: str = "embedding",
               dim: int | None = None,
               keep_components: bool = False) -> DataFrame:
    """(id, proj: array<long>) — Rademacher (±1) random projection of the
    embedding column to ``num_planes`` dimensions.

    Components are fixed-pointed to integer micro-units BEFORE the
    projection, so every projected coordinate is an exact int64 signed
    sum (integer addition is associative — partition order cannot change
    the result, and the DuckDB oracle reproduces it exactly). Map-side
    only; the projection matrix is the deterministic
    ``hyperplane_weights`` family baked into the plan as literals.
    At 100 TB this is the cheap first step of any embedding pipeline:
    a 4x-narrower vector column for downstream ANN/dedup, one scan.
    """
    dim = EMBEDDING_DIM if dim is None else dim
    w = hyperplane_weights(num_planes, dim)
    e = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.floor(x * 1e6 + F.lit(0.5)).cast("long"),
    )
    # Loud on drift: zip_with would silently NULL-pad a wrong-width
    # vector (every projected coordinate NULL); fail the task instead.
    checked = F.when(F.size(e) == dim, e).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"jl_project expects {dim}-dim vectors, got "),
                F.size(e).cast("string"),
            )
        ).cast("array<long>")
    )
    staged = df.select(
        F.col(id_col), F.explode(F.array(checked)).alias("__e")
    )
    projections = [
        F.aggregate(
            F.zip_with(
                F.col("__e"),
                F.array(*[F.lit(int(v)) for v in w[p]]),
                lambda x, s: x * s,
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        for p in range(num_planes)
    ]
    cols = [F.col(id_col), F.array(*projections).alias("proj")]
    if keep_components:
        cols.append(F.col("__e").alias("efix"))
    return staged.select(*cols)


def jl_distortion(df: DataFrame, num_planes: int = JL_PLANES,
                  sample_mod: int = JL_SAMPLE_MOD,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """One-row JL quality report: (n_pairs, mean_distortion,
    min_distortion, max_distortion), where distortion =
    ||proj(a)-proj(b)||² / (k·||a-b||²) — E[·] = 1 for Rademacher
    projections, so values near 1 mean distances survived the 4x
    compression.

    The audited pair sample is LINEAR in the corpus (consecutive
    sampled ids: v paired with v + sample_mod), never an all-pairs
    product — the bounded-measurement lesson from the LSH recall query
    applied from the start. Per-pair distortion is fixed-pointed to
    int64 micro-units before the mean, so the aggregate is exact
    integer arithmetic in both engines.
    """
    sampled = df.filter(F.col(id_col) % sample_mod == 0)
    # keep_components carries the fixed-point vector out of the same
    # pass — no rejoin, no second copy of the fixed-point transform.
    both = jl_project(
        sampled, num_planes, id_col, vec_col, keep_components=True
    ).withColumnRenamed("efix", "__e")
    a = both.select(
        F.col(id_col).alias("__ida"), F.col("proj").alias("__pa"),
        F.col("__e").alias("__ea"),
    )
    b = both.select(
        (F.col(id_col) - sample_mod).alias("__ida"),
        F.col("proj").alias("__pb"), F.col("__e").alias("__eb"),
    )
    sq = lambda u, v: F.aggregate(  # noqa: E731 — exact int64 sq-dist
        F.zip_with(u, v, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, z: acc + z,
    )
    pairs = a.join(b, "__ida").select(
        sq(F.col("__pa"), F.col("__pb")).alias("__dp"),
        sq(F.col("__ea"), F.col("__eb")).alias("__d"),
    ).filter(F.col("__d") > 0)
    m = F.floor(
        F.col("__dp") / (F.lit(num_planes) * F.col("__d")) * 1e6
        + F.lit(0.5)
    ).cast("long")
    return pairs.select(m.alias("__m")).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        (F.floor(F.sum("__m") / F.count(F.lit(1)) + F.lit(0.5)) / 1e6)
        .alias("mean_distortion"),
        (F.min("__m") / 1e6).alias("min_distortion"),
        (F.max("__m") / 1e6).alias("max_distortion"),
    )


#: Product-quantization defaults: 64 dims -> 8 subspaces of 8 dims, 8
#: centroids per subspace (3-bit codes: 64 dims of float32 compress to
#: 8 codes = 32x), 2 Lloyd iterations per codebook.
PQ_SUBSPACES = 8
PQ_CODE_K = 8
PQ_ITERS = 2


def _pq_subvectors(df: DataFrame, dim: int, subspaces: int,
                   id_col: str, vec_col: str) -> DataFrame:
    """(vec_id, vnorm, subspace, sv): each vector split into its
    contiguous sub-vectors — one explode, map-side only."""
    sub_dim = dim // subspaces
    vec = F.col(vec_col).cast("array<double>")
    return df.select(
        F.col(id_col).alias("vec_id"),
        norm_expr(vec).alias("vnorm"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(s).cast("int").alias("subspace"),
                    F.slice(vec, s * sub_dim + 1, sub_dim).alias("sv"),
                )
                for s in range(subspaces)
            ])
        ).alias("x"),
    ).select(
        "vec_id", "vnorm",
        F.col("x.subspace").alias("subspace"),
        F.col("x.sv").alias("sv"),
    )


def pq_codebooks(df: DataFrame, dim: int = 64,
                 subspaces: int = PQ_SUBSPACES, k: int = PQ_CODE_K,
                 iterations: int = PQ_ITERS, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """Product-quantization codebooks: (subspace, code, cvec) — one
    deterministic ``kmeans_fit`` per contiguous sub-vector slice.

    The whole codebook is ``subspaces * k`` tiny rows — broadcastable
    state that never grows with the corpus, the same side-table shape as
    the sketches. All ``subspaces`` Lloyd fits run JOINTLY — subspace is
    just another grouping key — so each iteration is ONE argmax
    aggregation + ONE mean aggregation over the exploded sub-vector
    table, not ``subspaces`` sequential passes (measured 8x fewer jobs
    at 10x scale). Init, assignment tie-breaks, and per-dimension means
    are identical to per-subspace ``kmeans_fit`` runs, which is what the
    unrolled per-subspace oracle chains verify. At 100 TB codebooks are
    trained on a sample and applied corpus-wide — pass the sample as
    ``df``."""
    from arcane_framework_spark.operators.scale import with_broadcast_scalar

    sub_dim = dim // subspaces
    if sub_dim * subspaces != dim:
        raise ValueError(f"dim {dim} not divisible by {subspaces}")
    subs = scoped_persist(
        _pq_subvectors(df, dim, subspaces, id_col, vec_col)
        .select("vec_id", "subspace", "sv")
    )
    # stride init, identical to kmeans_fit's k-mode: the k lowest ids
    # divisible by floor(n/k) seed EVERY subspace (ids are shared)
    ids = df.select(F.col(id_col).alias("vec_id"))
    stride = ids.select(
        F.greatest(
            F.lit(1), (F.count(F.lit(1)) / k).cast("long")
        ).alias("__stride")
    )
    seed_ids = (
        with_broadcast_scalar(ids, stride)
        .filter(F.col("vec_id") % F.col("__stride") == 0)
        .orderBy("vec_id")
        .limit(k)
        .select("vec_id")
    )
    centroids = scoped_persist(
        subs.join(F.broadcast(seed_ids), "vec_id").select(
            "subspace", F.col("vec_id").alias("cid"),
            F.col("sv").alias("cvec"),
        )
    )
    for _ in range(iterations):
        cent = centroids.select(
            "subspace", "cid", "cvec", norm_expr(F.col("cvec")).alias("__cn")
        )
        scored = subs.join(F.broadcast(cent), "subspace").select(
            "vec_id", "subspace", "cid",
            (
                dot_expr(F.col("sv"), F.col("cvec"))
                / (norm_expr(F.col("sv")) * F.col("__cn"))
            ).alias("__cos"),
        )
        assigned = scored.groupBy("vec_id", "subspace").agg(
            F.max_by(
                "cid",
                F.struct(F.col("__cos").alias("c"), (-F.col("cid")).alias("t")),
            ).alias("cid")
        )
        means = (
            assigned.join(subs, ["vec_id", "subspace"])
            .select("subspace", "cid", F.posexplode("sv").alias("pos", "x"))
            .groupBy("subspace", "cid", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("subspace", "cid")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "m"))
                ).alias("pm")
            )
            .select(
                "subspace", "cid",
                F.transform("pm", lambda s: s.m).alias("cvec"),
            )
            .transform(scoped_persist)
        )
        means.count()
        centroids.unpersist()
        centroids = means
    return centroids.select(
        "subspace", F.col("cid").alias("code"), "cvec"
    )


def pq_encode(df: DataFrame, codebooks: DataFrame, dim: int = 64,
              subspaces: int = PQ_SUBSPACES, id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """PQ encoding: (vec_id, subspace, code, pdot, pcnorm, vnorm) — the
    per-subspace max-cosine codebook assignment (ties by lowest code,
    identical to the oracle's row_number order) plus the reconstruction
    partials: ``pdot = <sv, c_code>`` and ``pcnorm = ||c_code||^2``, so
    ``cos(x, x_hat) = sum(pdot) / (vnorm * sqrt(sum(pcnorm)))`` without
    ever assembling the reconstructed vector.

    The stored representation is ``subspaces`` small codes per vector
    (3 bits each at the defaults) — a 32x compression of float32x64.
    Scale: codebooks broadcast; the argmax is one map-side-combined
    aggregation of skinny rows, same shape as ``ivf_assign``."""
    subs = _pq_subvectors(df, dim, subspaces, id_col, vec_col)
    cb = codebooks.select(
        "subspace", "code", "cvec",
        norm_expr(F.col("cvec")).alias("__cn"),
        dot_expr(F.col("cvec"), F.col("cvec")).alias("__csq"),
    )
    scored = (
        subs.join(F.broadcast(cb), "subspace")
        .select(
            "vec_id", "subspace", "vnorm", "code", "__csq",
            dot_expr(F.col("sv"), F.col("cvec")).alias("pdot"),
            (norm_expr(F.col("sv")) * F.col("__cn")).alias("__denom"),
        )
        .select(
            "vec_id", "subspace", "vnorm", "code", "__csq", "pdot",
            (F.col("pdot") / F.col("__denom")).alias("__cos"),
        )
    )
    return scored.groupBy("vec_id", "subspace").agg(
        F.max_by(
            F.struct(
                F.col("code"), F.col("pdot"),
                F.col("__csq").alias("pcnorm"),
            ),
            F.struct(F.col("__cos").alias("c"), (-F.col("code")).alias("t")),
        ).alias("b"),
        F.max("vnorm").alias("vnorm"),
    ).select("vec_id", "subspace", "b.code", "b.pdot", "b.pcnorm", "vnorm")


def pq_adc_topk(codes: DataFrame, codebooks: DataFrame,
                queries: DataFrame, k: int, dim: int = 64,
                subspaces: int = PQ_SUBSPACES, id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Asymmetric-distance top-k: (query_id, neighbor_id, adc_cos, rank)
    by APPROXIMATE cosine ``sum_s <q_s, c_code_s> / (||q|| * ||x_hat||)``
    — queries stay full-precision, the corpus is only its codes.

    The per-query lookup table (queries x subspaces x k partial dots) is
    broadcast; scoring the corpus is then a code-table join + one
    aggregation of ``subspaces`` rows per (query, vector) — the corpus
    vectors themselves are never read, which is the entire point of PQ
    at 100 TB: the scan is over the 32x-smaller code table."""
    from pyspark.sql import Window

    qsubs = _pq_subvectors(queries, dim, subspaces, id_col, vec_col)
    lut = qsubs.join(
        F.broadcast(codebooks.select("subspace", "code", "cvec")),
        "subspace",
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("vnorm").alias("qnorm"),
        "subspace", "code",
        dot_expr(F.col("sv"), F.col("cvec")).alias("qpdot"),
    )
    adc = (
        codes.join(F.broadcast(lut), ["subspace", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(
            (
                F.sum("qpdot")
                / (F.max("qnorm") * F.sqrt(F.sum("pcnorm")))
            ).alias("adc_cos"),
            F.count(F.lit(1)).alias("__n_sub"),
        )
        # a (query, vector) pair scores only if ALL subspaces joined —
        # always true (every vector has one code per subspace), asserted
        # in-plan so a broken encode fails loudly instead of mis-ranking
        .filter(F.col("__n_sub") == subspaces)
        .drop("__n_sub")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_cos").desc(), F.col("vec_id")
    )
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                "adc_cos", "rank")
    )


def ivfpq_topk(df: DataFrame, centroids: DataFrame, codes: DataFrame,
               codebooks: DataFrame, queries: DataFrame, k: int,
               dim: int = 64, subspaces: int = PQ_SUBSPACES,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """IVF-PQ (the FAISS composition): coarse cell assignment restricts
    the search, PQ-ADC scores the survivors — (query_id, neighbor_id,
    adc_cos, rank).

    At 100 TB this is the only ANN shape that fits: the corpus is
    stored as (cid, codes) — a few bytes per vector — the query probes
    ONE cell (~N/k_cells of the code table), and scoring is the
    broadcast-LUT aggregation, so per-query work is
    ``subspaces * N / k_cells`` skinny rows. Cell restriction happens
    IN the join keys (cid rides the broadcast LUT), never as a
    post-filter."""
    from pyspark.sql import Window

    assigned = ivf_assign(df, centroids, id_col, vec_col).select(
        F.col("id").alias("vec_id"), "cid"
    )
    coded = codes.join(assigned, "vec_id")
    qass = ivf_assign(queries, centroids, id_col, vec_col).select(
        F.col("id").alias("query_id"), "cid"
    )
    qsubs = _pq_subvectors(queries, dim, subspaces, id_col, vec_col)
    lut = (
        qsubs.join(
            F.broadcast(codebooks.select("subspace", "code", "cvec")),
            "subspace",
        )
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("vnorm").alias("qnorm"),
            "subspace", "code",
            dot_expr(F.col("sv"), F.col("cvec")).alias("qpdot"),
        )
        .join(qass, "query_id")  # cid rides the LUT into the join keys
    )
    adc = (
        coded.join(F.broadcast(lut), ["cid", "subspace", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(
            (
                F.sum("qpdot")
                / (F.max("qnorm") * F.sqrt(F.sum("pcnorm")))
            ).alias("adc_cos"),
            F.count(F.lit(1)).alias("__n_sub"),
        )
        .filter(F.col("__n_sub") == subspaces)
        .drop("__n_sub")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_cos").desc(), F.col("vec_id")
    )
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                "adc_cos", "rank")
    )


#: MMR defaults: relevance/diversity trade-off (exact binary double) and
#: the relevance-ranked candidate pool fed to the greedy loop.
MMR_LAMBDA = 0.5
MMR_POOL = 20


def mmr_topk(candidates: DataFrame, queries: DataFrame, k: int,
             pool: int = MMR_POOL, lam: float = MMR_LAMBDA,
             id_col: str = "vec_id", vec_col: str = "embedding",
             query_id_col: str | None = None) -> DataFrame:
    """Maximal-marginal-relevance diversified top-k (Carbonell &
    Goldstein 1998): greedily pick ``argmax λ·cos(q,d) − (1−λ)·max_{s∈S}
    cos(d,s)`` — the de-duplicating re-rank every RAG/retrieval stack
    runs so the k results aren't k copies of the same document.

    Two stages: (1) a relevance top-``pool`` per query (here brute-force
    cosine — at scale feed any ANN stage's output instead; the pool is
    the contract, not the scan), then (2) ``k`` unrolled greedy steps
    over the pool-sized candidate table. Every step is candidate ⋈
    selected on query_id (both sides ≤ pool rows per query, selected ≤
    step rows), a max-sim aggregate, and a ``max_by`` argmax with the
    deterministic (score, −id) tie-break — no driver loop state beyond
    plan construction, no window over corpus rows. Step 1 is the pure
    relevance argmax (S empty). All score arithmetic is mirrored
    operand-order doubles; the DuckDB oracle unrolls the same steps.

    Returns (query_id, vec_id, rank, relevance, mmr_score) with rank
    1..k; ``mmr_score`` of rank 1 is its relevance (no diversity term).
    """
    from pyspark.sql import Window

    query_id_col = query_id_col or id_col

    def safe_norm(col: Column) -> Column:
        n = norm_expr(col)
        return F.when(n == 0.0, F.lit(1.0)).otherwise(n)

    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        safe_norm(F.col(vec_col)).alias("__qn"),
    )
    c = candidates.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("__cv"),
        safe_norm(F.col(vec_col)).alias("__cn"),
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("id"))
        .select(
            "query_id",
            "id",
            "__cv",
            "__cn",
            (
                dot_expr(F.col("__qv"), F.col("__cv"))
                / (F.col("__qn") * F.col("__cn"))
            ).alias("rel"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("rel").desc(), "id")
    cand = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= pool)
        .drop("__rn")
    )
    from arcane_framework_spark.operators.cache import scoped_persist

    cand = scoped_persist(cand)

    lam_l, lam_d = F.lit(float(lam)), F.lit(float(1.0 - lam))
    # step 1: pure relevance argmax
    sel = cand.groupBy("query_id").agg(
        F.max_by(
            F.struct("id", "__cv", "__cn", "rel"),
            F.struct(F.col("rel").alias("s"), (-F.col("id")).alias("t")),
        ).alias("p")
    ).select(
        "query_id",
        F.col("p.id").alias("id"),
        F.col("p.__cv").alias("__cv"),
        F.col("p.__cn").alias("__cn"),
        F.col("p.rel").alias("rel"),
        F.lit(1).alias("rank"),
        F.col("p.rel").alias("mmr_score"),
    )
    for step in range(2, k + 1):
        rem = cand.join(
            sel.select("query_id", "id"), ["query_id", "id"], "left_anti"
        )
        pairs = rem.join(
            sel.select(
                "query_id",
                F.col("__cv").alias("__sv"),
                F.col("__cn").alias("__sn"),
            ),
            "query_id",
        ).select(
            "query_id",
            "id",
            "__cv",
            "__cn",
            "rel",
            (
                dot_expr(F.col("__cv"), F.col("__sv"))
                / (F.col("__cn") * F.col("__sn"))
            ).alias("__sim"),
        )
        msim = pairs.groupBy("query_id", "id", "__cv", "__cn", "rel").agg(
            F.max("__sim").alias("__msim")
        )
        picked = (
            msim.withColumn(
                "__score", lam_l * F.col("rel") - lam_d * F.col("__msim")
            )
            .groupBy("query_id")
            .agg(
                F.max_by(
                    F.struct("id", "__cv", "__cn", "rel", "__score"),
                    F.struct(
                        F.col("__score").alias("s"), (-F.col("id")).alias("t")
                    ),
                ).alias("p")
            )
            .select(
                "query_id",
                F.col("p.id").alias("id"),
                F.col("p.__cv").alias("__cv"),
                F.col("p.__cn").alias("__cn"),
                F.col("p.rel").alias("rel"),
                F.lit(step).alias("rank"),
                F.col("p.__score").alias("mmr_score"),
            )
        )
        # Each step references sel TWICE (anti-join + selected-set join):
        # without lineage truncation the logical plan doubles per step
        # (the connected-components lesson, operators/graph.py).
        sel = sel.unionByName(picked).localCheckpoint(eager=False)
    return sel.select(
        "query_id",
        F.col("id").alias("vec_id"),
        F.col("rank").cast("int").alias("rank"),
        F.round("rel", 6).alias("relevance"),
        F.round("mmr_score", 6).alias("mmr_score"),
    )
