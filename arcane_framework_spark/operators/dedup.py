"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

Scale design
------------
- **Exact dedup** — one hash-aggregate on the fingerprint (a single shuffle on
  an evenly-distributed md5 key → no skew by construction).
- **MinHash-LSH** — the canonical near-dup pipeline for 100 TB corpora:
  shingle → K minhashes (map-side, per-row, no shuffle) → band → bucket-join.
  The only shuffle is on (band_id, band_hash); candidate pairs are generated
  per-bucket, never via an all-pairs product. Bucket skew (degenerate texts)
  is bounded because identical texts collapse to identical signatures and AQE
  skew-join splits hot buckets.
- **SimHash** — per-row signature, dedup = equality/band-match on the
  signature (same bucket-join shape).

Hash-function contract: md5 over explicit strings, so the DuckDB oracle in
``arcane_framework_spark.queries`` reproduces results bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from arcane_framework_spark.operators.cache import scoped_persist

from arcane_framework_spark.operators.text import fingerprint_expr, tokens_expr

#: MinHash parameters — shared with the SQL oracle generator.
NUM_HASHES = 16
BAND_SIZE = 4
NUM_BANDS = NUM_HASHES // BAND_SIZE
SHINGLE_WORDS = 3

#: Universal-hash family for MinHash permutations: each shingle is hashed
#: ONCE (first 8 md5 hex digits as an int, reduced into Z_P), then
#: permutation i is the affine map ``(A[i]*h + B[i]) mod P`` over the field
#: Z_P with P = 2^31 − 1 (Mersenne prime). This is the standard Broder
#: construction; vs salting md5 per permutation it cuts hashing cost
#: NUM_HASHES× — the dominant map-side cost of a 100 TB dedup scan. The
#: modulus must sit just above the base-hash range so ``a*h`` wraps it many
#: times (a map that never wraps is monotonic in h, all permutations pick
#: the same min shingle, and banding floods with false candidates).
#: ``A[i]*h + B[i] ≤ (P−1)² + (P−1) < 2^62`` — never overflows signed
#: 64-bit in either engine (Spark would wrap silently, DuckDB would raise;
#: neither happens).
MINHASH_P = (1 << 31) - 1
MINHASH_A = [((i * 2654435761 + 1) % (MINHASH_P - 1)) + 1
             for i in range(NUM_HASHES)]
MINHASH_B = [(i * 1779033703 + 144) % MINHASH_P for i in range(NUM_HASHES)]

#: SimHash parameters: 32 bits, one per md5 hex digit of each token.
#: 16 bits saturates already at a few thousand same-vocabulary docs
#: (measured: 89k spurious hamming-0 pairs over 5.7k docs); 32 bits keeps
#: collisions to genuine near-dups while still being one md5 per token.
SIMHASH_BITS = 32


def shingles_from_tokens(toks: Column) -> Column:
    """Distinct word-``SHINGLE_WORDS``-gram shingles from a token array.

    Documents shorter than one shingle contribute their whole normalized text
    as a single shingle, so no document silently drops out of dedup.

    ``toks`` should be a *materialized* column (see ``_with_tokens``): this
    expression references it ~3× per shingle, and if it is an inlined
    tokenizer expression the regex split re-runs per reference in the
    interpreted higher-order-function path (measured 10× slowdown).
    """
    n = F.size(toks)
    k = SHINGLE_WORDS
    # greatest(..., 1) keeps the sequence ascending even for short docs (the
    # when() below discards it, but both branches may be evaluated).
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", *[F.get(toks, i + j - 1) for j in range(k)]),
    )
    whole = F.array(F.concat_ws(" ", toks))
    return F.array_distinct(F.when(n >= k, grams).otherwise(whole))


def shingles_expr(text_col: str | Column = "text") -> Column:
    """Shingles straight from a text column (convenience; see the note above —
    prefer ``_with_tokens`` + ``shingles_from_tokens`` in operator pipelines)."""
    return shingles_from_tokens(tokens_expr(text_col))


def _with_tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, toks) with the token array materialized exactly once per row.

    The ``explode(array(...))`` wrapper inserts a Generate barrier that
    Catalyst's CollapseProject cannot inline through, so the tokenizer regex
    runs once per row regardless of how many times downstream expressions
    reference ``toks``. A plain two-step projection is NOT enough — Catalyst
    collapses it and re-inlines the split into every reference.
    """
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array(tokens_expr(text_col))).alias("toks"),
    )


def shingle_hash_expr(s: Column) -> Column:
    """Base hash of one shingle in Z_P: first 8 md5 hex digits as an int,
    reduced mod ``MINHASH_P``. The single md5 all ``NUM_HASHES``
    permutations derive from.
    """
    return (
        F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")
        % F.lit(MINHASH_P)
    )


def minhash_signature_expr(text_col: str | Column = "text",
                           num_hashes: int = NUM_HASHES) -> Column:
    """MinHash signature array: permutation i = ``min((A[i]*h + B[i]) % P)``
    over shingle base hashes ``h`` (see ``MINHASH_A``).

    Expression (HOF) form for per-row use; NOTE the base-hash transform is
    re-inlined per permutation by CollapseProject here, so the hot dedup
    path uses the exploded ``minhash_signatures`` DataFrame form, which
    computes the md5 once per shingle inside codegen.
    """
    sh = shingles_expr(text_col)
    hashes = F.transform(sh, shingle_hash_expr)

    def perm(i: int):
        # NB: a closure, not a default arg — PySpark infers higher-order-fn
        # arity from the lambda signature, so `lambda h, i=i` would be
        # treated as the binary (element, index) form.
        a, b = MINHASH_A[i], MINHASH_B[i]
        return lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_P)

    sigs = [
        F.array_min(F.transform(hashes, perm(i))) for i in range(num_hashes)
    ]
    return F.array(*sigs)


def band_hashes_expr(sig_col: Column, num_bands: int = NUM_BANDS,
                     band_size: int = BAND_SIZE) -> Column:
    """LSH band hashes: md5 of each band's concatenated signature slice."""
    bands = []
    for b in range(num_bands):
        parts = [F.element_at(sig_col, b * band_size + j + 1) for j in range(band_size)]
        bands.append(F.md5(F.concat_ws("|", *parts)))
    return F.array(*bands)


def simhash_expr(text_col: str | Column = "text",
                 bits: int = SIMHASH_BITS) -> Column:
    """SimHash signature as a ``bits``-char '0'/'1' string.

    Bit *p* = sign of ``sum over tokens of (+1 if hex digit p of md5(token)
    >= '8' else -1)`` — i.e. the top bit of each md5 nibble is the per-token
    bit, aggregated with ±1 voting. Ties (sum == 0) resolve to '0'.
    """
    toks = tokens_expr(text_col)

    def voter(p: int):
        # Closure (not default arg) to keep the lambda binary — see salted().
        return lambda acc, t: acc + F.when(
            F.substring(F.md5(t), p, 1) >= F.lit("8"), F.lit(1)
        ).otherwise(F.lit(-1))

    bit_cols = []
    for p in range(1, bits + 1):
        vote = F.aggregate(toks, F.lit(0), voter(p))
        bit_cols.append(F.when(vote > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bit_cols)


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: keep the lowest-id document per normalized-text fingerprint.

    Returns (fingerprint, keep_id, n_dupes). One shuffle on the md5 key.
    """
    return (
        df.select(fingerprint_expr(text_col).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dupes"),
        )
    )


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       num_hashes: int = NUM_HASHES) -> DataFrame:
    """Per-document MinHash signature as columns ``s0..s{K-1}``.

    Implemented explode-then-aggregate rather than with array higher-order
    functions: HOFs are evaluated interpreted (outside whole-stage codegen),
    and a signature expression referenced N times is recomputed N times. The
    exploded form computes ONE md5 per shingle inside codegen, derives the
    K permutations as integer multiply-add-mod (see ``MINHASH_A``), and
    takes mins via map-side partial aggregation — at 100 TB this is one
    scan + one shuffle of (id, K longs), the canonical signature-table
    build, with md5 cost independent of K.
    """
    exploded = _with_tokens(df, text_col, id_col).select(
        "id", F.explode(shingles_from_tokens(F.col("toks"))).alias("s")
    )
    hashed = exploded.select("id", shingle_hash_expr(F.col("s")).alias("h"))
    return hashed.groupBy("id").agg(
        *[
            F.min(
                (F.lit(MINHASH_A[i]) * F.col("h") + F.lit(MINHASH_B[i]))
                % F.lit(MINHASH_P)
            ).alias(f"s{i}")
            for i in range(num_hashes)
        ]
    )


def minhash_pair_counts(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """MinHash-LSH candidate pairs with the EXACT integer overlap counts
    ``(id_a, id_b, na, nb, ni)`` — |A|, |B|, |A∩B| over distinct
    shingles. The integer form is what threshold logic should consume
    (``jaccard >= t`` ⟺ ``ni*10 >= t10*(na+nb-ni)``, no float boundary
    ties); ``minhash_lsh_pairs`` derives the rounded Jaccard view.

    Pipeline: signature table (explode → codegen md5 → partial-agg min) →
    band rows → bucket self-join → distinct pairs → exact shingle
    intersection sizes.

    The signature table is persisted for the duration of the job: it is
    consumed by both sides of the bucket self-join, and re-deriving it means
    re-hashing the corpus — at scale you materialize the signature table
    (here: Spark block-manager persistence; in production: a parquet/Delta
    side table).
    """
    sig = minhash_signatures(df, text_col, id_col)
    bands = minhash_band_rows(sig).transform(scoped_persist)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, on=["band_id", "band_hash"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    # persisted: joined by both the id_a and id_b side of the verification
    sh = _with_tokens(df, text_col, id_col).select(
        "id", shingles_from_tokens(F.col("toks")).alias("shingles")
    ).transform(scoped_persist)
    return (
        cand.join(sh.withColumnsRenamed({"id": "id_a", "shingles": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({"id": "id_b", "shingles": "sh_b"}), "id_b")
        .select(
            "id_a",
            "id_b",
            F.size("sh_a").alias("na"),
            F.size("sh_b").alias("nb"),
            F.size(F.array_intersect("sh_a", "sh_b")).alias("ni"),
        )
    )


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Candidate near-duplicate pairs via MinHash-LSH, with exact Jaccard.

    Output: (id_a, id_b, jaccard) with id_a < id_b — the rounded view of
    ``minhash_pair_counts``; |A∪B| = |A|+|B|-|A∩B| (shingle arrays are
    distinct).

    SCALE DEFAULT (round-12 verdict #3, the committed decision): this
    in-memory path is for INTERACTIVE corpora — up to roughly 1M docs on
    an 8 GiB executor heap. Beyond that, use
    :func:`minhash_lsh_pairs_bucketed` (bit-identical output, shared
    oracle): at the 5M-doc stress shape the in-memory path OOMed an
    8 GiB heap (STRESS_1000X_r12.json, in-artifact note), needs 16 GiB,
    pushes ~17 GiB of shuffle through the block manager, and its
    per-row cost grows 2.09x per 10x input — while the bucketed path
    holds FLAT with ZERO block-manager growth, paying instead ~2.8 GiB
    of durable warehouse side tables, which a production pipeline wants
    anyway (they ARE the corpus state ``incremental_minhash_pairs``
    consumes). The catalog keeps both: gate/bench corpora sit far below
    the boundary, and running both keeps the equality contract tested.
    """
    sized = minhash_pair_counts(df, text_col, id_col)
    return sized.select(
        "id_a",
        "id_b",
        F.round(
            F.col("ni").cast("double")
            / (F.col("na") + F.col("nb") - F.col("ni")).cast("double"),
            6,
        ).alias("jaccard"),
    )


def minhash_band_rows(sig: DataFrame, num_bands: int = NUM_BANDS,
                      band_size: int = BAND_SIZE,
                      with_signature: bool = False) -> DataFrame:
    """Exploded LSH band rows (id, band_id, band_hash) from a signature
    table (the ``minhash_signatures`` layout ``id, s0..s{K-1}``).

    ``with_signature=True`` additionally carries the full K-component
    signature as an array column ``sig`` on every band row — a map-side
    attach (~K·8 bytes/row) that lets a downstream band join compute the
    Jaccard ESTIMATOR in place instead of re-joining signatures by id.
    """
    band_cols = []
    for b in range(num_bands):
        parts = [F.col(f"s{b * band_size + j}") for j in range(band_size)]
        band_cols.append(F.md5(F.concat_ws("|", *parts)))
    extra = (
        [F.array(*[F.col(f"s{i}") for i in range(
            num_bands * band_size)]).alias("sig")]
        if with_signature else []
    )
    return sig.select(
        "id", *extra,
        F.posexplode(F.array(*band_cols)).alias("band_id", "band_hash"),
    )


def minhash_pair_counts_bucketed(df: DataFrame, text_col: str = "text",
                                 id_col: str = "doc_id",
                                 table_prefix: str = "minhash_batch",
                                 num_buckets: int = 32) -> DataFrame:
    """``minhash_pair_counts`` with the two heavy intermediates routed
    through BUCKETED parquet side tables — the full-corpus batch shape
    for 100 TB (round-11 verdict #1: the in-memory path sent 20.3 GiB of
    shuffle+spill to executor disk at the 1000x probe; stage profile:
    7.4 GiB band self-join + distinct, 8.7 GiB shingle-array persist
    spill, 3.3 GiB verification joins).

    Same output and bit-identical values as ``minhash_pair_counts``
    (gate entry shares its oracle verbatim); two structural changes:

    1. **Band table bucketed+sorted on (band_id, band_hash)** — the
       candidate self-join reads both sides bucket-aligned: no Exchange
       (the X87 ``incremental_dedup_disk`` layout applied to the batch
       path). Multi-band collisions still fold through ``distinct()`` —
       the emit-once-from-first-colliding-band alternative (carry the
       K-long signature on every band row, re-derive earlier bands'
       equality per joined row) was MEASURED SLOWER on both axes at the
       1000x shape: sig-carried filter 127s (``F.filter``+``slice``) /
       80s (``F.exists`` early-exit) per self-join vs 23.6s for the
       column-pruned scan + distinct, and the carried sig bloats the
       parquet scan both sides decode. The distinct's pair-stream
       exchange (~2.8 GiB) is the same magnitude the verification joins
       shuffle anyway.
    2. **Shingle arrays bucketed+sorted on id** — the exact-verification
       joins read the array side exchange-free; only the (id_a, id_b)
       pair stream shuffles, never the corpus's shingle arrays, and the
       block manager never holds them (parquet does, compressed).

    Cost moved, not hidden: the two side tables land in the warehouse
    (one corpus-proportional parquet write each — the state a production
    pipeline materializes anyway); ``tools/stress1000.py`` accounts
    warehouse growth separately from block-manager growth. Measured at
    the 1000x shape (5M docs, 52.6M pairs, idle host, standalone JVM):
    block-manager growth 19,032 MiB -> 4,296 MiB (4.4x less; what
    remains is the pair-stream exchanges — inherent to emitting 52.6M
    pairs — plus the signature aggregate; the corpus's arrays and the
    band exchange are off the shuffle path entirely), warehouse side
    tables 2,780 MiB, wall 90.2s -> 82.1s — strictly better than the
    in-memory path on BOTH axes (the corpus tokenizes once: the
    signature chain re-reads the written shingle table instead of
    re-hashing text, and nothing re-derives the 8.7 GiB shingle persist
    spill). The in-memory path remains for one-shot jobs whose
    executors comfortably hold the corpus state; this is the default
    scale path, and its shingle/band tables are the durable corpus
    state the incremental path (X87) consumes.
    """
    from arcane_framework_spark.operators.scale import (
        gc_stale_side_tables,
        session_scoped_table,
        write_bucketed,
    )

    spark = df.sparkSession
    bands_tbl = session_scoped_table(spark, f"{table_prefix}_bands")
    sh_tbl = session_scoped_table(spark, f"{table_prefix}_sh")
    gc_stale_side_tables(spark, f"{table_prefix}_bands")
    gc_stale_side_tables(spark, f"{table_prefix}_sh")

    # ONE tokenize+shingle pass over the corpus: the shingle table is
    # written first, and the signature chain re-reads it from parquet
    # (explode -> one md5 per shingle in codegen -> partial-agg min) —
    # the same signatures as minhash_signatures, minus the second full
    # text scan the two-table prep would otherwise pay.
    write_bucketed(
        _with_tokens(df, text_col, id_col).select(
            "id", shingles_from_tokens(F.col("toks")).alias("shingles")
        ),
        sh_tbl, ["id"], num_buckets, sort_cols=["id"],
    )
    hashed = spark.table(sh_tbl).select(
        "id", F.explode("shingles").alias("s")
    ).select("id", shingle_hash_expr(F.col("s")).alias("h"))
    sig = hashed.groupBy("id").agg(
        *[
            F.min(
                (F.lit(MINHASH_A[i]) * F.col("h") + F.lit(MINHASH_B[i]))
                % F.lit(MINHASH_P)
            ).alias(f"s{i}")
            for i in range(NUM_HASHES)
        ]
    )
    write_bucketed(
        minhash_band_rows(sig), bands_tbl,
        ["band_id", "band_hash"], num_buckets,
        sort_cols=["band_id", "band_hash"],
    )

    bands = spark.table(bands_tbl)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, on=["band_id", "band_hash"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sh = spark.table(sh_tbl)
    return (
        cand.join(sh.withColumnsRenamed({"id": "id_a", "shingles": "sh_a"}),
                  "id_a")
        .join(sh.withColumnsRenamed({"id": "id_b", "shingles": "sh_b"}),
              "id_b")
        .select(
            "id_a",
            "id_b",
            F.size("sh_a").alias("na"),
            F.size("sh_b").alias("nb"),
            F.size(F.array_intersect("sh_a", "sh_b")).alias("ni"),
        )
    )


def minhash_lsh_pairs_bucketed(df: DataFrame, text_col: str = "text",
                               id_col: str = "doc_id",
                               table_prefix: str = "minhash_batch") -> DataFrame:
    """``minhash_lsh_pairs`` through the bucketed side-table plan —
    (id_a, id_b, jaccard), bit-identical to the in-memory path.

    THE SCALE DEFAULT past ~1M docs (see ``minhash_lsh_pairs`` for the
    measured boundary and the committed decision): zero block-manager
    growth at the 5M-doc shape, flat per-row cost, and the bucketed
    band/shingle tables double as the durable corpus state the
    incremental path joins against."""
    sized = minhash_pair_counts_bucketed(df, text_col, id_col, table_prefix)
    return sized.select(
        "id_a",
        "id_b",
        F.round(
            F.col("ni").cast("double")
            / (F.col("na") + F.col("nb") - F.col("ni")).cast("double"),
            6,
        ).alias("jaccard"),
    )


def incremental_minhash_pairs(new_docs: DataFrame,
                              corpus_sigs: DataFrame | None = None,
                              text_col: str = "text",
                              id_col: str = "doc_id",
                              min_est: float = 0.5,
                              corpus_bands: DataFrame | None = None
                              ) -> DataFrame:
    """Incremental dedup: near-dup pairs of a NEW batch against an existing
    corpus — without touching the corpus text.

    The continuous-ingest shape: a production pipeline materializes the
    corpus's signature table once (``minhash_signatures`` → parquet/Delta
    side table, O(K·longs) per doc); each arriving batch is signed, banded,
    and joined against the stored bands. Verification uses the MinHash
    Jaccard ESTIMATOR — the fraction of agreeing signature components —
    so the old corpus is never re-tokenized (its text may be long gone).
    Estimator resolution is 1/K; with K=16, ``min_est=0.5`` keeps pairs
    sharing ≥8 components.

    Output: (id_a, id_b, pair_type, est_jaccard) with id_a < id_b and
    pair_type ∈ {'new_old', 'new_new'} — new batches can contain their own
    duplicates, which a corpus-only join would miss.

    Scale: ONE pipelined job whose only shuffles are keyed on
    (band_id, band_hash) — each band row carries its doc's K-long
    signature array (map-side attach, ~K·8 bytes per row), so the
    estimator is computed directly inside the band join (K integer
    equalities in codegen) and no id-keyed join over the signature
    table exists at all. The de-signed-doc anti-join broadcasts the
    batch ids (batch-proportional). Nothing rescans corpus text; the
    signature side table is the only corpus state.

    Pass ``corpus_bands`` instead of ``corpus_sigs`` when the corpus
    state is MATERIALIZED in its banded layout — a parquet side table
    of ``minhash_band_rows(sigs, with_signature=True)`` rows, ideally
    bucketed on the (band_id, band_hash) join key (see
    ``operators.scale.write_bucketed``): the band join then reads the
    corpus side exchange-free and only the (small) new batch shuffles,
    which is the whole point of the side table at 100 TB.
    """
    if (corpus_sigs is None) == (corpus_bands is None):
        raise ValueError(
            "pass exactly one of corpus_sigs (signature layout) or "
            "corpus_bands (materialized banded layout)"
        )
    new_sigs = scoped_persist(
        minhash_signatures(new_docs, text_col, id_col)
    )
    # A re-signed doc (same id in batch and corpus) takes its NEW
    # signature everywhere: anti-join the stale corpus row out, so the
    # id spaces are disjoint by construction and the band join below
    # cannot duplicate pairs.
    nb = minhash_band_rows(new_sigs, with_signature=True)
    if corpus_bands is not None:
        cb = corpus_bands.join(
            F.broadcast(new_sigs.select("id")), "id", "anti"
        )
    else:
        corpus_sigs = corpus_sigs.join(
            F.broadcast(new_sigs.select("id")), "id", "anti"
        )
        cb = minhash_band_rows(corpus_sigs, with_signature=True)

    def est(sa, sb) -> Column:
        agree = F.size(
            F.filter(F.zip_with(sa, sb, lambda x, y: x == y), lambda v: v)
        )
        # Denominator = the carried signature's actual component count,
        # not the global NUM_HASHES: a caller banding a subset of the
        # components (num_bands*band_size < K) would otherwise cap the
        # estimator at subset/K and silently drop every true duplicate.
        return F.round(agree.cast("double") / F.size(sa).cast("double"), 6)

    cross = (
        nb.alias("n")
        .join(cb.alias("c"), ["band_id", "band_hash"])
        .filter(F.col("n.id") != F.col("c.id"))
        .select(
            F.least("n.id", "c.id").alias("id_a"),
            F.greatest("n.id", "c.id").alias("id_b"),
            F.lit("new_old").alias("pair_type"),
            est(F.col("n.sig"), F.col("c.sig")).alias("est_jaccard"),
        )
    )
    self_pairs = (
        nb.alias("a")
        .join(nb.alias("b"), ["band_id", "band_hash"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.lit("new_new").alias("pair_type"),
            est(F.col("a.sig"), F.col("b.sig")).alias("est_jaccard"),
        )
    )
    # filter first (band collisions below the threshold never shuffle),
    # then one distinct to fold multi-band collisions of the same pair
    return (
        cross.unionByName(self_pairs)
        .filter(F.col("est_jaccard") >= F.lit(min_est))
        .distinct()
    )


#: Character n-gram width for the n-gram-Jaccard dedup path.
CHAR_NGRAM = 4


def char_ngrams_from_norm(norm: Column) -> Column:
    """Distinct character ``CHAR_NGRAM``-grams of a normalized text column.

    Texts shorter than one gram contribute the whole text (same no-drop rule
    as word shingles). ``norm`` must be materialized (see ``_with_tokens``) —
    it is referenced once per gram position.
    """
    n = F.length(norm)
    k = CHAR_NGRAM
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1))),
        lambda i: F.substring(norm, i, k),
    )
    return F.array_distinct(F.when(n >= k, grams).otherwise(F.array(norm)))


#: Bottom-k sketch size for n-gram-Jaccard blocking. 5 keeps planted-near-dup
#: recall ≈ 94% on the low-vocabulary test corpus while bounding candidate
#: pairs ~10× below k=3 (measured at sf0.1: 351k → 30k pairs, max block
#: 386 → 85). Larger corpora with real vocabularies shatter far better.
NGRAM_SKETCH_K = 5

#: Degenerate-block guard: blocks larger than this are skipped entirely.
#: A block of b docs costs b²/2 verifications, so one pathological key
#: (boilerplate-heavy corpora) would dominate the whole job at scale; capping
#: bounds per-block work at CAP²/2 and keeps the pipeline linear in corpus
#: size. Measured at a 50k-doc 10×-duplicated stress corpus: 92s → linear.
NGRAM_MAX_BLOCK = 64


def norm_grams(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """(id, s, grams): normalized text + its distinct char-n-gram set.

    The shared base of every char-gram family operator (sketch blocking,
    sorted-neighborhood, edit blocking). Each consumer builds EXACTLY
    this subtree and projects on top, so a session that persists
    ``norm_grams(corpus)`` once (prep.shared_prep) serves the gram build
    — the O(len(s)) gram extraction + distinct per doc — to all of
    them via CacheManager plan matching.

    Gram extraction runs as an Arrow-batched Python map (guide §4.2, the
    decode-path pattern), not the ``char_ngrams_from_norm`` column
    expression: a transform-over-sequence HOF evaluates interpreted, one
    boxed substring per gram position (~len(s) per doc), and measured 2×
    slower than the batched Python slice+dict build at sf0.1 (2.2s →
    1.1s per corpus build). ``dict.fromkeys`` preserves first-occurrence
    order, so the output — including array ORDER — is byte-identical to
    the expression form (verified row-for-row on both planted corpora);
    the normalization itself stays in the JVM scan.

    NOTE (r15 opt): the remaining codegen-friendly JVM formulation —
    posexplode(sequence) + per-position substring (whole-stage codegen)
    + min(ord)-per-gram aggregate + ordered re-collect — was A/B'd at
    sf0.1: byte-identical (exceptAll both ways = 0) but 4.7-5.1s vs
    0.67-0.71s per corpus build, ~7x SLOWER: the first-occurrence
    distinct needs a shuffle of one row per gram POSITION (~5M rows)
    where the batched map needs none. Do not re-try."""
    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    norm = df.select(
        F.col(id_col).alias("id"),
        F.regexp_replace(
            F.lower(F.trim(F.col(text_col))), r"\s+", " "
        ).alias("s"),
    )
    k = CHAR_NGRAM
    # StructType.add mutates the DataFrame's cached schema — build fresh.
    schema = StructType(
        list(norm.schema.fields)
        + [StructField("grams", ArrayType(StringType()))]
    )

    def _gram_batches(batches):
        for pdf in batches:
            out = []
            for s in pdf["s"]:
                if s is None:
                    out.append([None])
                    continue
                n = len(s)
                if n >= k:
                    out.append(
                        list(dict.fromkeys(s[i:i + k] for i in range(n - k + 1)))
                    )
                else:
                    # whole-text fallback, same no-drop rule as shingles
                    out.append([s])
            yield pdf.assign(grams=out)

    return norm.mapInPandas(_gram_batches, schema)


def _ngram_keyed(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, grams, block_key) with the bottom-k sketch blocking key,
    repartitioned on the key and persisted.

    The gram + sketch build is map-only (row-local HOFs, zero shuffles);
    the single repartition on block_key then pre-positions the table for
    EVERYTHING downstream: the block-size window, and both sides of the
    pair self-join, all inherit HashPartitioning(block_key), so Catalyst
    inserts no further exchange. (Measured against the alternatives —
    explode-to-codegen gram build + groupBy, or a separate size
    aggregation joined back — this one-shuffle shape is the fastest; the
    sketch is identical either way so the oracle is unaffected.)
    Persisted: consumed by the window and BOTH sides of the pair join."""
    return (
        norm_grams(df, text_col, id_col).select(
            "id",
            "grams",
            F.array_join(
                F.slice(
                    F.array_sort(F.transform("grams", lambda g: F.md5(g))),
                    1,
                    NGRAM_SKETCH_K,
                ),
                "|",
            ).alias("block_key"),
        )
        .repartition("block_key")
        .transform(scoped_persist)
    )


def ngram_block_stats(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      max_block: int = NGRAM_MAX_BLOCK) -> DataFrame:
    """One-row diagnostic for the blocking guard: how much the
    ``max_block`` cap actually bites on this corpus.

    Emits (n_docs, n_blocks, max_block_size, capped_blocks,
    docs_dropped): capped blocks are skipped entirely by
    ``ngram_jaccard_pairs``, so a growing ``docs_dropped`` is the early
    signal that boilerplate is defeating the sketch blocking (recall
    loss), while a growing ``max_block_size`` under the cap tracks the
    superlinear-work risk. The stress harness records this next to the
    ngram_jaccard timing so round-over-round drift is visible."""
    sizes = _ngram_keyed(df, text_col, id_col).groupBy("block_key").agg(
        F.count(F.lit(1)).alias("n")
    )
    return sizes.agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.count(F.lit(1)).alias("n_blocks"),
        F.max("n").cast("long").alias("max_block_size"),
        F.sum(
            F.when(F.col("n") > max_block, 1).otherwise(0)
        ).cast("long").alias("capped_blocks"),
        F.sum(
            F.when(F.col("n") > max_block, F.col("n")).otherwise(0)
        ).cast("long").alias("docs_dropped"),
    )


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id",
                        min_jaccard: float = 0.0,
                        max_block: int | None = NGRAM_MAX_BLOCK) -> DataFrame:
    """Character-n-gram Jaccard near-dup pairs with bottom-k sketch blocking.

    Blocking key = the ``NGRAM_SKETCH_K`` smallest md5s over a document's
    distinct char n-grams, concatenated. A single MinHash key degenerates on
    low-vocabulary corpora (one globally-popular gram captures everything);
    requiring the whole bottom-k sketch to match keeps near-dup recall high
    (a Jaccard-j pair shares the sketch with probability ≈ j^k) while
    shattering hot blocks (measured: max block 344 → 36 on the test corpus).
    One shuffle on the key, per-cell pair generation, exact Jaccard
    verification. Output (id_a, id_b, jaccard) with id_a < id_b.
    """
    keyed = _ngram_keyed(df, text_col, id_col)
    if max_block is not None:
        # degenerate-block guard (see NGRAM_MAX_BLOCK): a count window over
        # the existing block_key partitioning — no aggregation shuffle, no
        # join, rides the one exchange above.
        from pyspark.sql import Window

        keyed = (
            keyed.withColumn(
                "__blk",
                F.count(F.lit(1)).over(Window.partitionBy("block_key")),
            )
            .filter(F.col("__blk") <= max_block)
            .drop("__blk")
        )
    a = keyed.select(
        F.col("id").alias("id_a"), F.col("grams").alias("g_a"), "block_key"
    )
    b = keyed.select(
        F.col("id").alias("id_b"), F.col("grams").alias("g_b"), "block_key"
    )
    # Size-ratio prefilter: jaccard ≤ min(|A|,|B|)/max(|A|,|B|), so pairs
    # whose gram-set sizes differ too much cannot pass min_jaccard — drop
    # them BEFORE the O(|A|+|B|) intersection. The 1e-6 slack keeps pairs
    # whose rounded jaccard could still reach the threshold; the oracle
    # applies the identical arithmetic, so result sets stay equal.
    paired = a.join(b, on="block_key").filter(F.col("id_a") < F.col("id_b"))
    if min_jaccard > 0.0:
        paired = paired.filter(
            F.least(F.size("g_a"), F.size("g_b")).cast("double")
            >= (min_jaccard - 1e-6)
            * F.greatest(F.size("g_a"), F.size("g_b")).cast("double")
        )
    # |A∪B| = |A|+|B|-|A∩B| (arrays are distinct) — half the array work of
    # materializing array_union per pair. Two-step projection so the
    # intersection is evaluated once (CollapseProject keeps non-cheap
    # multi-referenced aliases in their own project).
    sized = (
        paired.select(
            "id_a",
            "id_b",
            F.size("g_a").alias("__na"),
            F.size("g_b").alias("__nb"),
            F.size(F.array_intersect("g_a", "g_b")).alias("__ni"),
        )
    )
    return (
        sized.select(
            "id_a",
            "id_b",
            F.round(
                F.col("__ni").cast("double")
                / (F.col("__na") + F.col("__nb") - F.col("__ni")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )


#: SimHash near-dup parameters: band count and max Hamming distance. With
#: 2 bands over 32 bits, any pair at Hamming distance ≤ 1 shares at least
#: one intact 16-bit band (pigeonhole), so banding loses no such pair —
#: and 16-bit bands have 65k bucket values, keeping buckets sparse.
SIMHASH_BANDS = 2
SIMHASH_MAX_HAMMING = 1


def simhash_neardup_pairs(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id",
                          max_hamming: int = SIMHASH_MAX_HAMMING) -> DataFrame:
    """Near-dup pairs by SimHash banding + exact Hamming verification.

    Same shuffle shape as MinHash banding: signature (map-side) → band rows
    → bucket self-join → distinct pairs → per-pair Hamming count. Output
    (id_a, id_b, hamming) with id_a < id_b, hamming <= max_hamming.
    """
    bits = SIMHASH_BITS
    band_w = bits // SIMHASH_BANDS
    sig = simhash_signatures(df, text_col, id_col).transform(scoped_persist)
    bands = sig.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.substring("simhash", b * band_w + 1, band_w)
                    for b in range(SIMHASH_BANDS)
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
    hamming = sum(
        (
            F.substring("sig_a", p, 1) != F.substring("sig_b", p, 1)
        ).cast("int")
        for p in range(1, bits + 1)
    )
    return (
        cand.join(sig.select(F.col("id").alias("id_a"),
                             F.col("simhash").alias("sig_a")), "id_a")
        .join(sig.select(F.col("id").alias("id_b"),
                         F.col("simhash").alias("sig_b")), "id_b")
        .select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       bits: int = SIMHASH_BITS) -> DataFrame:
    """Per-document SimHash signature: (id, simhash bit-string).

    Explode-then-aggregate for the same codegen reason as
    ``minhash_signatures``: one md5 per token (codegen), ±1 votes summed via
    map-side partial aggregation, bits assembled from the vote sums.
    """
    # Per-bit vote = top bit of hex nibble p ("digit >= '8'"), read with
    # integer shifts over 8-nibble chunks parsed ONCE per row (F.conv)
    # instead of 32 per-bit substring+string-compares — same values
    # (verified bit-identical at sf0.1), ~30% faster aggregation: the
    # string path allocated a UTF8String per bit per token row.
    assert bits % 8 == 0, "chunked nibble parse assumes 8-nibble chunks"
    base = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(tokens_expr(text_col)).alias("t"),
        )
        .withColumn("h", F.md5("t"))
        .select(
            "id",
            *[
                F.conv(F.substring("h", 1 + 8 * c, 8), 16, 10)
                .cast("long")
                .alias(f"c{c}")
                for c in range(bits // 8)
            ],
        )
    )
    votes = base.groupBy("id").agg(
        *[
            F.sum(
                F.shiftright(F.col(f"c{(p - 1) // 8}"),
                             (7 - (p - 1) % 8) * 4 + 3)
                .bitwiseAND(F.lit(1)) * 2 - 1
            ).alias(f"v{p}")
            for p in range(1, bits + 1)
        ]
    )
    bit_cols = [
        F.when(F.col(f"v{p}") > 0, F.lit("1")).otherwise(F.lit("0"))
        for p in range(1, bits + 1)
    ]
    return votes.select("id", F.concat(*bit_cols).alias("simhash"))


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer/Wilkerson/Aiken local fingerprinting)
# ---------------------------------------------------------------------------

#: Token k-gram width for winnowing (the unit of local similarity).
WINNOW_K = 4
#: Window of consecutive gram hashes a fingerprint is selected from.
#: Guarantee: any shared token run of >= K + W - 1 tokens yields at least
#: one shared fingerprint (the winnowing theorem).
WINNOW_W = 5
#: Stop-fingerprint cap: a fingerprint present in more docs than this is
#: boilerplate, not similarity signal, and would explode the pair join.
WINNOW_MAX_DOCS_PER_FP = 50


def winnow_fingerprints(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", k: int = WINNOW_K,
                        w: int = WINNOW_W) -> DataFrame:
    """(id, fp): DISTINCT winnowing fingerprints per document.

    The MOSS selection scheme: hash every token k-gram, slide a window
    of ``w`` hashes, keep each window's minimum — documents sharing any
    sufficiently long run share a fingerprint with certainty (unlike
    MinHash's probabilistic bands), while storing only ~2/(w+1) of the
    gram hashes. Entirely map-side HOF expressions (three Generate
    barriers: tokens, gram hashes, fingerprint explode; no shuffle until
    the caller's join/aggregate); fingerprints are 16-hex md5 prefixes
    so the min is a plain lexicographic min in both engines. Documents
    shorter than k tokens emit nothing; those with fewer than ``w``
    grams emit their single global minimum. Callers consuming the
    output more than once should persist it — the tokenize+hash lineage
    is the expensive part (see ``winnow_pairs``).
    """
    from arcane_framework_spark.operators.text import _with_token_barrier

    base = _with_token_barrier(
        docs.filter(F.length(F.trim(F.col(text_col))) > 0), text_col
    )
    t = F.col("__toks")
    gram_idx = F.sequence(F.lit(1), F.size(t) - (k - 1))
    gh = F.transform(
        gram_idx,
        lambda i: F.substring(F.md5(F.array_join(F.slice(t, i, k), " ")), 1, 16),
    )
    staged = base.filter(F.size(t) >= k).select(
        F.col(id_col), F.explode(F.array(gh)).alias("__gh")
    )
    g = F.col("__gh")
    win_idx = F.sequence(F.lit(1), F.size(g) - (w - 1))
    fps = F.when(
        F.size(g) >= w,
        F.transform(win_idx, lambda i: F.array_min(F.slice(g, i, w))),
    ).otherwise(F.array(F.array_min(g)))
    return staged.select(
        id_col, F.explode(F.array_distinct(fps)).alias("fp")
    )


def winnow_pairs(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", min_shared: int = 2,
                 k: int = WINNOW_K, w: int = WINNOW_W,
                 max_docs_per_fp: int = WINNOW_MAX_DOCS_PER_FP) -> DataFrame:
    """(id_a, id_b, shared_fps): document pairs sharing >= ``min_shared``
    winnowing fingerprints — deterministic local-similarity dedup.

    Scale shape: the fingerprint table is ~2/(w+1) the gram table and
    is materialized ONCE (repartitioned on fp + persisted — it feeds the
    frequency aggregate, the pruning join, and both sides of the pair
    self-join; without the persist the tokenize+md5+window-min lineage
    executes up to 8x, measured on the physical plan). The stop-
    fingerprint cap bounds the self-join fan-out at C(cap, 2) per
    fingerprint, the same degenerate-block defense as
    ``ngram_jaccard_pairs``; the repartition pre-positions every
    consumer on the fp key.
    """
    fps = (
        winnow_fingerprints(docs, id_col, text_col, k, w)
        .repartition("fp")
        .transform(scoped_persist)
    )
    ok = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("__nd"))
        .filter(F.col("__nd") <= max_docs_per_fp)
        .select("fp")
    )
    pruned = fps.join(ok, "fp")
    a = pruned.select(F.col(id_col).alias("id_a"), "fp")
    b = pruned.select(F.col(id_col).alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )


#: Edit-distance near-dup: maximum Levenshtein distance for a verified
#: pair, over the whitespace-normalized text. 3 admits typo-level and
#: small-append variants while keeping the banded verify O(3·n) per pair.
EDIT_MAX_DIST = 3


def edit_distance_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id",
                        max_dist: int = EDIT_MAX_DIST,
                        sketch_k: int = NGRAM_SKETCH_K,
                        max_block: int = NGRAM_MAX_BLOCK) -> DataFrame:
    """Levenshtein near-dup pairs: bottom-k gram-sketch blocking, then a
    banded edit-distance verify. Reference parity: extends the exact /
    MinHash dedup family (src/Services/Base/MetadataMerge.cs merge-key
    equality) with the classic typo-tolerant variant.

    Blocking differs from ``ngram_jaccard_pairs`` on purpose: a d-edit
    change perturbs up to ``d·CHAR_NGRAM`` grams, so requiring the WHOLE
    bottom-k sketch to match would miss most true pairs. Instead each of
    the k sketch grams is its own blocking key (a pair is a candidate if
    ANY sketch gram is shared — recall ≈ 1−(miss)^k), with the same
    degenerate-block cap per key. Candidates then pass a length
    prefilter (|len_a−len_b| ≤ d is necessary) and the exact verify uses
    Spark's THRESHOLDED ``levenshtein(a, b, max_dist)`` — O(d·n) banded
    DP instead of O(n²), the difference between feasible and not on a
    100 TB corpus; the oracle's plain ``levenshtein() <= d`` filter
    keeps the kept-pair set identical.

    One shuffle on the blocking key (docs appear k times), one distinct
    on the candidate pair, zero Python. Output (id_a, id_b,
    edit_distance) with id_a < id_b.
    """
    # One persisted gram table serves the sketch build AND the text
    # join-back below (norm_grams is one row per id).
    ng = scoped_persist(norm_grams(df, text_col, id_col))
    keyed = (
        ng.select(
            "id",
            F.length("s").alias("__l"),
            F.explode(
                F.slice(
                    F.array_sort(
                        F.transform("grams", lambda g: F.md5(g))
                    ),
                    1,
                    sketch_k,
                )
            ).alias("bk"),
        )
        .repartition("bk")
    )
    from pyspark.sql import Window

    # Persist the capped table: it feeds BOTH sides of the candidate
    # self-join, and without it the whole normalize+gram+md5-sketch build
    # runs twice (once per side). Built on norm_grams so a prepped
    # session additionally serves the gram build from the shared cache.
    ok = (
        keyed.withColumn(
            "__blk", F.count(F.lit(1)).over(Window.partitionBy("bk"))
        )
        .filter(F.col("__blk") <= max_block)
        .drop("__blk")
        .transform(scoped_persist)
    )
    # The self-join sides carry LENGTHS, not texts: the candidate
    # distinct then shuffles (int, int) pairs instead of two full
    # normalized documents per row, and the texts join back from the
    # cached per-doc table only for the surviving candidates.
    a = ok.select(
        F.col("id").alias("id_a"), F.col("__l").alias("__la"), "bk"
    )
    b = ok.select(
        F.col("id").alias("id_b"), F.col("__l").alias("__lb"), "bk"
    )
    cand = (
        a.join(b, "bk")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.abs(F.col("__la") - F.col("__lb")) <= F.lit(max_dist))
        .select("id_a", "id_b")
        .distinct()
    )
    texts = ng.select("id", "s")
    return (
        cand.join(
            texts.select(F.col("id").alias("id_a"), F.col("s").alias("sa")),
            "id_a",
        )
        .join(
            texts.select(F.col("id").alias("id_b"), F.col("s").alias("sb")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.levenshtein("sa", "sb", max_dist).alias("__d"),
        )
        .filter(F.col("__d") >= 0)
        .select(
            "id_a", "id_b", F.col("__d").cast("long").alias("edit_distance")
        )
    )


#: Sorted-neighborhood method: prefix length of the block key, window
#: width (neighbors compared per doc), and verify threshold.
SNM_PREFIX = 2
SNM_WINDOW = 3
SNM_MIN_JACCARD = 0.5


def sorted_neighborhood_pairs(df: DataFrame, text_col: str = "text",
                              id_col: str = "doc_id",
                              prefix: int = SNM_PREFIX,
                              window: int = SNM_WINDOW,
                              min_jaccard: float = SNM_MIN_JACCARD
                              ) -> DataFrame:
    """Blocked sorted-neighborhood dedup (Hernández & Stolfo 1995): sort
    by the normalized text within prefix blocks, compare each doc to its
    next ``window`` neighbors, verify with exact char-n-gram Jaccard.

    The third classic blocking strategy next to LSH (minhash/simhash)
    and sketch blocking (ngram/edit) — cheap and strong when near-dups
    share prefixes (crawl URLs, versioned titles, templated records);
    blind to edits inside the first ``prefix`` chars, by design.

    Scale shape: the classic method needs ONE GLOBAL sort; this is the
    distributed adaptation — sort only within ``prefix``-char blocks
    (the window partitions by block, so no single-task global window).
    Block skew follows the corpus' prefix distribution; raise ``prefix``
    to shatter hot prefixes (each +1 char ≈ ×alphabet fan-out). The
    neighbor step is ``window`` LEADs over the sorted block — map-side
    after the block sort, no self-join at all, O(n·window) candidates
    total regardless of block sizes (the property that distinguishes
    SNM from equality blocking).

    Returns (id_a, id_b, jaccard) with id_a < id_b, Jaccard ≥ threshold.
    """
    from pyspark.sql import Window

    # Built on the shared norm_grams subtree so a prepped session serves
    # the gram build from cache (see norm_grams).
    keyed = norm_grams(df, text_col, id_col).select(
        "id",
        "s",
        F.col("grams").alias("g"),
        F.substring("s", 1, prefix).alias("block"),
    )
    w = Window.partitionBy("block").orderBy("s", "id")
    neighbors = keyed.select(
        "id",
        "g",
        F.array(
            *[
                F.struct(
                    F.lead("id", j).over(w).alias("nid"),
                    F.lead("g", j).over(w).alias("ng"),
                )
                for j in range(1, window + 1)
            ]
        ).alias("__nb"),
    )
    pairs = (
        neighbors.select(
            "id", "g", F.explode("__nb").alias("nb")
        )
        .filter(F.col("nb.nid").isNotNull())
        .select(
            F.least("id", F.col("nb.nid")).alias("id_a"),
            F.greatest("id", F.col("nb.nid")).alias("id_b"),
            F.size("g").alias("__na"),
            F.size(F.col("nb.ng")).alias("__nb_sz"),
            F.size(F.array_intersect("g", F.col("nb.ng"))).alias("__ni"),
        )
    )
    jac = F.round(
        F.col("__ni").cast("double")
        / (F.col("__na") + F.col("__nb_sz") - F.col("__ni")).cast("double"),
        6,
    )
    # No distinct needed: each pair comes from one unique (position,
    # offset) in the block's total (s, id) order.
    return (
        pairs.select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= F.lit(min_jaccard))
    )


#: Prefix-filtering similarity join threshold as an exact rational
#: (Jaccard >= 3/5) — verification is integer cross-multiplication,
#: zero floats anywhere in the pipeline.
PREFIX_JACCARD_NUM = 3
PREFIX_JACCARD_DEN = 5


def prefix_filter_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id",
                        num: int = PREFIX_JACCARD_NUM,
                        den: int = PREFIX_JACCARD_DEN) -> DataFrame:
    """EXACT all-pairs shingle-set Jaccard join via prefix filtering
    (Chaudhuri/Bayardo AllPairs): unlike the LSH family this loses NO
    true pair — the classic trade of a bigger candidate set for a
    recall guarantee.

    The theorem: order every token by global rarity ((df, token) — any
    total order works); two sets with Jaccard ≥ t MUST share a token
    among each set's first ``n − ⌈t·n⌉ + 1`` rarest tokens. So: rank
    tokens within each doc by rarity (per-doc windows), keep each doc's
    prefix, self-join on the prefix token (blocks are rare-token-sized
    by construction — a hot token only appears in prefixes of docs
    whose OTHER tokens are even hotter), distinct the candidate pairs,
    and verify ``ni·den ≥ num·(na+nb−ni)`` by integer cross-multiply.

    Three shuffles (df aggregate, prefix join, pair verify); everything
    is exact integers. The rarity (``dfreq``) and per-doc size tables
    join RELATIONALLY — no forced broadcast: ``dfreq`` has one row per
    distinct shingle (the LARGEST table this op builds — it grows
    faster than word types) and ``sizes`` one row per document, so at
    corpus scale both are corpus-cardinality and a hard
    ``F.broadcast`` would be a driver-collect bomb. AQE still picks
    broadcast when a side is actually small — the same treatment
    :func:`containment_pairs` documents (round-13 verdict #1).
    Returns (id_a, id_b, jaccard) with jaccard ≥ num/den, 6dp.
    """
    from pyspark.sql import Window

    # Sets are word-SHINGLES, not raw tokens: on low-vocabulary corpora
    # nearly every doc pair shares 60% of its token SET (measured: 94k
    # "pairs" at sf0.01) while 3-gram shingles keep sets discriminative —
    # the same reason the MinHash family shingles. Built via the ARRAY
    # projection first (not a fused explode): that inner subtree is the
    # byte-identical plan prep.shared_prep persists as ``shingles``, so a
    # warmed session serves the whole tokenize+shingle pass from cache,
    # and the arrays feed the array_intersect verification below without
    # a second explode join.
    sh = scoped_persist(
        _with_tokens(df, text_col, id_col).select(
            "id", shingles_from_tokens(F.col("toks")).alias("shingles")
        )
    )
    toks = sh.select("id", F.explode("shingles").alias("tok"))
    toks = scoped_persist(toks)
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("__df"))
    # Per-doc size as an unordered window over the SAME partitioning the
    # rank window establishes — one exchange on id serves both, where a
    # separate sizes aggregate + join cost an extra exchange and a join
    # per self-join side (r14 measurement: the whole ranked pipeline ran
    # TWICE, once per candidate-join side). Identical value: the dfreq
    # join is inner on a key every tok row has.
    ranked = (
        toks.join(dfreq, "tok")
        .withColumn(
            "__n", F.count(F.lit(1)).over(Window.partitionBy("id"))
        )
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("id").orderBy("__df", "tok")
            ),
        )
    )
    # prefix length L = n - ceil(t*n) + 1; the float ceil is computed
    # identically on both engines (same double product), and a smaller
    # ceil only ENLARGES the prefix — the no-false-negative guarantee
    # is preserved either way.
    t = float(num) / float(den)
    # Persisted: the candidate self-join reads this table on BOTH sides;
    # unpersisted, each side re-ran the dfreq join + both windows.
    prefix = scoped_persist(
        ranked.filter(
            F.col("__rn")
            <= F.col("__n") - F.ceil(F.lit(t) * F.col("__n")) + F.lit(1)
        ).select("tok", "id", "__n", "__rn")
    )
    a = prefix.select(
        F.col("id").alias("id_a"), F.col("__n").alias("__na"),
        F.col("__rn").alias("__ra"), "tok"
    )
    b = prefix.select(
        F.col("id").alias("id_b"), F.col("__n").alias("__nb"),
        F.col("__rn").alias("__rb"), "tok"
    )
    # Required overlap: J >= num/den ⟺ O·den >= num·(na+nb−O) ⟺
    # O >= num·(na+nb)/(num+den); O is an integer, so O >= alpha with
    # alpha the ceiling divide (expressed as -floor(-x/q), all integer).
    alpha = -F.floor(
        -(F.col("__na") + F.col("__nb")) * F.lit(num) / F.lit(num + den)
    )
    cand = (
        a.join(b, "tok")
        .filter(F.col("id_a") < F.col("id_b"))
        # size filter: jaccard <= min/max, so n_a*den >= num*n_b (and
        # symmetric) is necessary — integer cross-multiply
        .filter(
            (F.least("__na", "__nb") * F.lit(den))
            >= (F.greatest("__na", "__nb") * F.lit(num))
        )
        # positional filter (PPJoin): every shared token of a pair sits at
        # within-doc rank >= the rarest shared token's rank (both docs
        # rank by the same global rarity order), so the overlap is
        # bounded by O <= 1 + min(na−ra, nb−rb) at the rarest shared
        # token's ranks (ra, rb). That token is itself a prefix⋈prefix
        # match row whenever J >= t (the AllPairs prefix guarantee names
        # a shared prefix token, and the rarest shared token precedes it
        # in both prefixes), and on that row the bound is >= O >= alpha —
        # so a true pair always keeps at least one row and the distinct
        # below yields it. Rows pruned here could never certify a pair
        # the verify join wouldn't reject: candidates shrink, output is
        # identical.
        .filter(
            F.lit(1)
            + F.least(
                F.col("__na") - F.col("__ra"), F.col("__nb") - F.col("__rb")
            )
            >= alpha
        )
        .select("id_a", "id_b", "__na", "__nb")
        .distinct()
    )
    # Verification via array_intersect over the per-doc shingle ARRAYS
    # (distinct by construction): two id-equi-joins and an O(|A|+|B|)
    # intersect per candidate, where the explode formulation shuffled
    # candidates × doc-length rows into a tok-join + groupBy (measured
    # ~14M rows / 3.4s at sf0.1 for 87k candidates). Identical __ni: the
    # row-join counted distinct shared (id_a, id_b, tok) rows, which IS
    # the set-intersection size.
    sa = sh.select(F.col("id").alias("id_a"), F.col("shingles").alias("__sa"))
    sb = sh.select(F.col("id").alias("id_b"), F.col("shingles").alias("__sb"))
    inter = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a", "id_b", "__na", "__nb",
            F.size(F.array_intersect("__sa", "__sb")).alias("__ni"),
        )
    )
    union_sz = F.col("__na") + F.col("__nb") - F.col("__ni")
    return (
        inter.filter(F.col("__ni") * F.lit(den) >= F.lit(num) * union_sz)
        .select(
            "id_a",
            "id_b",
            F.round(F.col("__ni").cast("double") / union_sz.cast("double"), 6)
            .alias("jaccard"),
        )
    )


#: Containment-join threshold: |A ∩ B| / |A| >= 9/10.
CONTAIN_NUM = 9
CONTAIN_DEN = 10


def containment_pairs(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      num: int = CONTAIN_NUM,
                      den: int = CONTAIN_DEN) -> DataFrame:
    """EXACT asymmetric shingle-set CONTAINMENT join: all ordered pairs
    with ``|A ∩ B| / |A| >= num/den`` — "document A is quoted inside
    document B". Jaccard-based dedup misses exactly this case: a short
    document pasted into a much longer one has tiny Jaccard (the union
    is dominated by B) but containment ~1.0, which is why quote /
    boilerplate-inclusion detection needs the asymmetric measure.

    Prefix filtering still applies on the CONTAINED side: order tokens
    by global rarity; if A shares >= ceil(t*|A|) tokens with B it must
    share one among A's first ``|A| - ceil(t*|A|) + 1`` rarest tokens.
    The CONTAINER side cannot be prefix-shortened (containment puts no
    lower bound on which of B's tokens participate), so B is indexed in
    full — the classic AllPairs containment trade. The only admissible
    size prune is ``|B| >= t*|A|`` (intersection <= |B|), applied by
    integer cross-multiply before verification.

    Shuffles: shingle aggregate, prefix-vs-postings join, pair verify —
    same shape as ``prefix_filter_pairs``; no broadcast of per-doc
    tables (sizes/dfreq join relationally; AQE picks broadcast when the
    side is small). Returns (contained_id, container_id, containment >=
    num/den, 6dp), exact integers until the single final division.
    """
    from pyspark.sql import Window

    # Shingle ARRAYS first (the prep-cached subtree — see
    # prefix_filter_pairs), exploded rows derived from them; the arrays
    # also feed the array_intersect verification below.
    sh = scoped_persist(
        _with_tokens(df, text_col, id_col).select(
            "id", shingles_from_tokens(F.col("toks")).alias("shingles")
        )
    )
    toks = sh.select("id", F.explode("shingles").alias("tok"))
    toks = scoped_persist(toks)
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("__df"))
    sizes = toks.groupBy("id").agg(F.count(F.lit(1)).alias("__n"))
    ranked = (
        toks.join(dfreq, "tok")
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("id").orderBy("__df", "tok")
            ),
        )
        .join(sizes, "id")
    )
    t = float(num) / float(den)
    # Prefix length |A| - ceil(t*|A|) + 1 (same double ceil both engines;
    # a smaller ceil only enlarges the prefix — recall is preserved).
    prefix = ranked.filter(
        F.col("__rn")
        <= F.col("__n") - F.ceil(F.lit(t) * F.col("__n")) + F.lit(1)
    ).select(
        "tok", F.col("id").alias("id_a"), F.col("__n").alias("__na"),
        F.col("__rn").alias("__ra"),
    )
    postings = toks.join(sizes, "id").select(
        F.col("id").alias("id_b"), F.col("__n").alias("__nb"), "tok"
    )
    # Required overlap O >= ceil(t·|A|) (integer ceiling divide).
    alpha = -F.floor(-F.col("__na") * F.lit(num) / F.lit(den))
    cand = (
        prefix.join(postings, "tok")
        .filter(F.col("id_a") != F.col("id_b"))
        .filter(F.col("__nb") * F.lit(den) >= F.lit(num) * F.col("__na"))
        # positional filter on the PREFIX side only (postings carry no
        # rank): every shared token sits at A-rank >= the rarest shared
        # token's rank, so O <= 1 + (na − ra) on that token's row — and
        # the rarest shared token of a true pair is in A's prefix (the
        # AllPairs guarantee) and always in B's full postings, so the
        # pair keeps at least one row. Pruned rows could never certify a
        # pair the verification wouldn't reject.
        .filter(F.lit(1) + F.col("__na") - F.col("__ra") >= alpha)
        .select("id_a", "id_b", "__na")
        .distinct()
    )
    # array_intersect verification (see prefix_filter_pairs: identical
    # count, no candidates × doc-length row shuffle).
    sa = sh.select(F.col("id").alias("id_a"), F.col("shingles").alias("__sa"))
    sb = sh.select(F.col("id").alias("id_b"), F.col("shingles").alias("__sb"))
    inter = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a", "id_b", "__na",
            F.size(F.array_intersect("__sa", "__sb")).alias("__ni"),
        )
    )
    return (
        inter.filter(F.col("__ni") * F.lit(den) >= F.lit(num) * F.col("__na"))
        .select(
            F.col("id_a").alias("contained_id"),
            F.col("id_b").alias("container_id"),
            F.round(
                F.col("__ni").cast("double") / F.col("__na").cast("double"), 6
            ).alias("containment"),
        )
    )


# ---------------------------------------------------------------------------
# Exact-substring dedup (Lee et al. 2021, "Deduplicating Training Data
# Makes Language Models Better": after MinHash doc-level dedup, remove
# every LATER occurrence of any verbatim repeated span, keeping exactly
# one copy — the first)
# ---------------------------------------------------------------------------


def exact_substring_segments(docs: DataFrame, id_col: str = "doc_id",
                             text_col: str = "text",
                             width: int | None = None,
                             carry: tuple[str, ...] = ()) -> DataFrame:
    """Per-segment removal decisions for exact-substring dedup:
    (id, *carry, seg_idx, seg_tokens, removed).

    Non-overlapping ``width``-token segments stand in for the paper's
    >=50-token spans (a suffix array is a single-machine structure; the
    segment table IS the distributable equivalent, at the cost of
    alignment sensitivity — a repeated span is caught when it covers a
    segment boundary-aligned window, which planted/boilerplate repeats
    at fixed offsets always do). An occurrence is REMOVED iff the same
    segment content appears earlier in the corpus order (doc id, then
    position); the globally-first occurrence is the one copy kept.

    Scale plan — aggregation, not a window: a row_number over seg_hash
    would sort every partition and serialize each hot hash through one
    reducer. Instead the first occurrence per DUPLICATED hash is a
    map-side-combinable ``min(struct(id, seg_idx))`` aggregate, filtered
    to ``count > 1`` — so the "firsts" side table is proportional to the
    DUPLICATED content only (tiny on real corpora), broadcast by AQE
    back onto the segment table. One shuffle on the 16-byte hash, no
    per-key sort, no skew cliff on degenerate boilerplate hashes.
    """
    from arcane_framework_spark.operators.text import (
        SEGMENT_WIDTH,
        positioned_segment_hashes,
    )

    width = SEGMENT_WIDTH if width is None else width
    segs = positioned_segment_hashes(docs, id_col, text_col, width, carry)
    return _keep_first_removal(segs, id_col, carry)


def anchored_substring_segments(docs: DataFrame, id_col: str = "doc_id",
                                text_col: str = "text",
                                carry: tuple[str, ...] = (),
                                hash_fn: str = "md5") -> DataFrame:
    """``exact_substring_segments`` with CONTENT-DEFINED boundaries
    (``operators.text.anchored_segment_hashes``) — offset-invariant: a
    verbatim span copied at ANY token offset reproduces its interior
    segments, so the keep-first aggregate removes the later copies the
    aligned fixed-width variant provably misses (round-11 verdict #2;
    Lee et al. 2021's suffix array catches any >=k repeat — this is the
    distributable equivalent with a content-defined-chunking anchor rule
    instead of a single-machine suffix array). Same output columns and
    the same one-shuffle min-struct scale shape.

    ``hash_fn="xxhash64"`` swaps the token->anchor hash for Spark's
    in-plan xxHash intrinsic — the production choice at corpus scale
    (round-12 verdict #1; see ``anchored_segment_hashes`` for the
    md5-for-oracle-parity / xxhash64-for-throughput trade and why the
    segment equality key stays md5 in both modes)."""
    from arcane_framework_spark.operators.text import (
        anchored_segment_hashes,
    )

    segs = anchored_segment_hashes(
        docs, id_col, text_col, carry=carry, hash_fn=hash_fn
    )
    return _keep_first_removal(segs, id_col, carry)


def anchored_substring_stats(docs: DataFrame, id_col: str = "doc_id",
                             text_col: str = "text",
                             hash_fn: str = "md5") -> DataFrame:
    """Per-doc removal accounting over the anchored segmentation — same
    columns as :func:`substring_dedup_stats`. ``hash_fn`` as in
    :func:`anchored_substring_segments`."""
    flagged = anchored_substring_segments(
        docs, id_col, text_col, hash_fn=hash_fn
    )
    return _substring_stats_agg(flagged, id_col)


def _keep_first_removal(segs: DataFrame, id_col: str,
                        carry: tuple[str, ...] = ()) -> DataFrame:
    """Keep-first removal decisions over ANY positioned segment table
    (id, *carry, seg_idx, seg_hash, seg_tokens): flags every occurrence
    whose content appeared earlier in (doc id, position) corpus order.
    One shuffle on the 16-byte hash; the firsts side is proportional to
    DUPLICATED content only (min-struct over count>1 hashes, map-side
    combinable, no per-key sort — see ``exact_substring_segments``)."""
    firsts = (
        segs.groupBy("seg_hash")
        .agg(
            F.min(F.struct(id_col, "seg_idx")).alias("__first"),
            F.count(F.lit(1)).alias("__n"),
        )
        .filter(F.col("__n") > 1)
        .select(
            "seg_hash",
            F.col(f"__first.{id_col}").alias("__fdoc"),
            F.col("__first.seg_idx").alias("__fidx"),
        )
    )
    return (
        segs.join(firsts, "seg_hash", "left")
        .select(
            id_col,
            *carry,
            "seg_idx",
            "seg_tokens",
            (
                F.col("__fdoc").isNotNull()
                & ~(
                    (F.col(id_col) == F.col("__fdoc"))
                    & (F.col("seg_idx") == F.col("__fidx"))
                )
            ).alias("removed"),
        )
    )


def substring_dedup_stats(docs: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text",
                          width: int | None = None) -> DataFrame:
    """Per-doc exact-substring removal accounting: (id, n_segments,
    n_removed_segments, removed_tokens, kept_tokens, removed_idxs) —
    ``removed_idxs`` is the comma-joined sorted list of removed segment
    positions, i.e. the complement of the doc's kept-token ranges."""
    flagged = exact_substring_segments(docs, id_col, text_col, width)
    return _substring_stats_agg(flagged, id_col)


def corpus_segment_hashes(docs: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text",
                          width: int | None = None) -> DataFrame:
    """The corpus's segment-content PRESENCE set: one distinct 16-byte
    ``seg_hash`` per segment content — the materialized side table
    incremental exact-substring dedup joins arrivals against (positions
    are irrelevant for the corpus side: ANY corpus occurrence precedes
    every arrival in corpus order, so presence alone decides removal).
    At 100 TB this is the bucketed parquet side table of the
    ``incremental_dedup_disk`` pattern; distinct() here is one exchange
    on the hash."""
    from arcane_framework_spark.operators.text import (
        SEGMENT_WIDTH,
        positioned_segment_hashes,
    )

    width = SEGMENT_WIDTH if width is None else width
    return (
        positioned_segment_hashes(docs, id_col, text_col, width)
        .select("seg_hash")
        .distinct()
    )


def anchored_corpus_segment_hashes(docs: DataFrame, id_col: str = "doc_id",
                                   text_col: str = "text") -> DataFrame:
    """The corpus's ANCHORED segment-content presence set (one distinct
    seg_hash per content) — ``corpus_segment_hashes``'s twin for the
    offset-invariant segmentation; the side table incremental anchored
    dedup joins arrivals against (X87 bucketed layout at scale)."""
    from arcane_framework_spark.operators.text import (
        anchored_segment_hashes,
    )

    return (
        anchored_segment_hashes(docs, id_col, text_col)
        .select("seg_hash")
        .distinct()
    )


def incremental_substring_stats(batch: DataFrame, corpus_index: DataFrame,
                                id_col: str = "doc_id",
                                text_col: str = "text",
                                width: int | None = None,
                                anchored: bool = False) -> DataFrame:
    """Exact-substring removal for a NEW batch against an existing
    corpus's segment index — the continuous-ingest shape: corpus text is
    never re-segmented; only the (small) arriving batch tokenizes.

    Decision rule, provably identical to running the batch operator on
    (corpus UNION batch) and keeping the batch rows — because every
    corpus doc precedes every arrival in (doc_id, seg_idx) order:

    - segment content present in the corpus index → REMOVED (the kept
      first copy lives in the corpus);
    - content new to the corpus but repeated WITHIN the batch → first
      batch occurrence kept, the rest removed;
    - content unique overall → kept.

    Scale: the arrival side is batch-sized; the corpus index joins as a
    presence set on the 16-byte hash (bucketed side table at scale, so
    only the batch shuffles); the within-batch firsts aggregate is
    batch-sized. Same output columns as :func:`substring_dedup_stats`.

    ``anchored=True`` segments the batch with the content-defined
    anchored rule instead (the ``corpus_index`` must then be built from
    :func:`anchored_corpus_segment_hashes` — presence decisions are only
    meaningful when both sides segment identically).
    """
    from arcane_framework_spark.operators.text import (
        SEGMENT_WIDTH,
        anchored_segment_hashes,
        positioned_segment_hashes,
    )

    if anchored:
        segs = anchored_segment_hashes(batch, id_col, text_col)
    else:
        width = SEGMENT_WIDTH if width is None else width
        segs = positioned_segment_hashes(batch, id_col, text_col, width)
    in_corpus = corpus_index.select(
        "seg_hash", F.lit(True).alias("__in_corpus")
    )
    firsts = (
        segs.groupBy("seg_hash")
        .agg(
            F.min(F.struct(id_col, "seg_idx")).alias("__first"),
            F.count(F.lit(1)).alias("__n"),
        )
        .filter(F.col("__n") > 1)
        .select(
            "seg_hash",
            F.col(f"__first.{id_col}").alias("__fdoc"),
            F.col("__first.seg_idx").alias("__fidx"),
        )
    )
    flagged = (
        segs.join(in_corpus, "seg_hash", "left")
        .join(firsts, "seg_hash", "left")
        .select(
            id_col,
            "seg_idx",
            "seg_tokens",
            (
                F.coalesce(F.col("__in_corpus"), F.lit(False))
                | (
                    F.col("__fdoc").isNotNull()
                    & ~(
                        (F.col(id_col) == F.col("__fdoc"))
                        & (F.col("seg_idx") == F.col("__fidx"))
                    )
                )
            ).alias("removed"),
        )
    )
    return _substring_stats_agg(flagged, id_col)


def _substring_stats_agg(flagged: DataFrame, id_col: str) -> DataFrame:
    """Shared per-doc rollup over a flagged segment table."""
    rm = F.col("removed")
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        F.sum(F.when(rm, 1).otherwise(0)).cast("long").alias(
            "n_removed_segments"
        ),
        F.sum(F.when(rm, F.col("seg_tokens")).otherwise(0)).cast("long")
        .alias("removed_tokens"),
        F.sum(F.when(~rm, F.col("seg_tokens")).otherwise(0)).cast("long")
        .alias("kept_tokens"),
        F.array_join(
            F.array_sort(F.collect_list(F.when(rm, F.col("seg_idx")))), ","
        ).alias("removed_idxs"),
    )
