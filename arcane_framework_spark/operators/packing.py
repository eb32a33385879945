"""Sequence packing: assign documents to fixed-token-budget training packs.

LLM training consumes documents concatenated into fixed-length context
windows; the pipeline step is "give every doc a pack id such that packs hold
~budget tokens". Exact bin packing is inherently sequential, so the
scalable formulation is cumulative-sum bucketing over a deterministic doc
order: ``pack_id = floor(prefix_tokens_before_doc / budget)``. Every pack
except possibly the last reaches at least ``budget`` tokens and overflows by
less than one document — the standard streaming approximation.

The prefix sum itself is computed DISTRIBUTED, not with one global window
(a single-partition sort dies at 100 TB):

1. docs hash into ``num_groups`` deterministic groups (``id % G``);
2. a per-group window (shuffle on the group key) computes local prefix
   sums in (group, id) order;
3. group token totals — G rows — get a tiny window pass for group offsets;
4. global prefix = group offset + local prefix (broadcast hash join).

Same arithmetic is plain SQL window algebra, so the DuckDB oracle
reproduces pack ids exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Default group count for the distributed prefix sum. At 100 TB raise to
#: O(cluster cores); correctness is independent of the value.
DEFAULT_PREFIX_GROUPS = 32


def pack_documents(df: DataFrame, budget: int,
                   id_col: str = "doc_id",
                   tokens_col: str = "n_tokens",
                   num_groups: int = DEFAULT_PREFIX_GROUPS) -> DataFrame:
    """(id, n_tokens, fill_before, pack_id) with deterministic global order.

    The effective document order is ``(id % num_groups, id)`` — arbitrary
    but deterministic, which is all packing needs. ``fill_before`` is the
    exact number of tokens before this doc in that order;
    ``pack_id = floor(fill_before / budget)``. Documents longer than
    ``budget`` occupy their own pack(s) naturally.
    """
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
        (F.col(id_col) % num_groups).alias("__grp"),
    )
    w_local = (
        Window.partitionBy("__grp")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = base.withColumn(
        "__local_before", F.coalesce(F.sum("n_tokens").over(w_local), F.lit(0))
    )
    # Group totals: G rows — the only single-partition window, over G rows.
    from arcane_framework_spark.operators.scale import bucket_offsets

    offsets = bucket_offsets(
        base, [], ["__grp"], ["__grp"], value=F.col("n_tokens")
    ).withColumnRenamed("__off", "__offset")
    return (
        local.join(F.broadcast(offsets), "__grp")
        .select(
            F.col("id").alias(id_col),
            "n_tokens",
            (F.col("__local_before") + F.col("__offset")).alias("fill_before"),
            F.floor(
                (F.col("__local_before") + F.col("__offset")) / budget
            ).cast("long").alias("pack_id"),
        )
    )


def select_by_budget(df: DataFrame, budget: int,
                     score_col: str = "score",
                     id_col: str = "doc_id",
                     tokens_col: str = "n_tokens",
                     num_groups: int = DEFAULT_PREFIX_GROUPS) -> DataFrame:
    """Budget-capped corpus selection: take documents in descending-score
    order until the token budget fills — "the best N-tokens worth of the
    corpus", the final step of a quality-ranked data mix.

    No global sort: ``score_col`` must be INTEGER (fixed-point a caller's
    quality metric — ints keep the order identical in every engine). The
    effective document order is ``(score DESC, id % num_groups, id)``:
    within a score band the hash-group sub-order is arbitrary but
    deterministic, which is all a budget cut needs. Fixed-point scores
    are coarse by design, so one hot band (think "score=0") can hold most
    of the corpus — partitioning the local window by (score, group)
    bounds the worst task at ``band/num_groups`` rows, the same two-level
    shape as ``pack_documents``. Sub-band totals (≤ |score domain| × G
    rows, metadata-scale) get the only single-partition window, then a
    broadcast join attaches the offsets. A document is kept while the
    tokens BEFORE it fit the budget (the straddling doc is kept — budgets
    are lower bounds in practice); zero remaining budget excludes
    everything else deterministically.

    Returns (id, score, n_tokens, fill_before) for the selected docs.
    """
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(score_col).cast("long").alias("score"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
        (F.col(id_col) % num_groups).alias("__grp"),
    )
    w_local = (
        Window.partitionBy("score", "__grp")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = base.withColumn(
        "__local_before",
        F.coalesce(F.sum("n_tokens").over(w_local), F.lit(0)),
    )
    # Sub-band totals: one row per (score, group); the only
    # single-partition window runs over those (metadata-scale).
    from arcane_framework_spark.operators.scale import bucket_offsets

    offsets = bucket_offsets(
        base, [], ["score", "__grp"],
        [F.col("score").desc(), F.col("__grp")], value=F.col("n_tokens"),
    ).withColumnRenamed("__off", "__offset")
    return (
        local.join(F.broadcast(offsets), ["score", "__grp"])
        .select(
            F.col("id").alias(id_col),
            "score",
            "n_tokens",
            (F.col("__local_before") + F.col("__offset")).alias("fill_before"),
        )
        .filter(F.col("fill_before") < budget)
    )


def pack_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-pack aggregate: docs, tokens, and fill ratio vs the budget."""
    return (
        packed.groupBy("pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
        )
        .select(
            "pack_id",
            "n_docs",
            "pack_tokens",
            F.round(F.col("pack_tokens") / budget, 4).alias("fill_ratio"),
        )
    )


#: Sliding-window chunking defaults: window width and stride in tokens
#: (overlap = width - stride). 128/96 keeps the catalog query cheap; real
#: pipelines use e.g. 2048/1536 — the plan shape is identical.
CHUNK_WIDTH = 128
CHUNK_STRIDE = 96


def chunk_tokens(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", width: int = CHUNK_WIDTH,
                 stride: int = CHUNK_STRIDE) -> DataFrame:
    """(id, chunk_id, n_tokens, chunk_hash) sliding token windows per doc.

    RAG / training chunking: overlapping windows of ``width`` tokens every
    ``stride`` tokens. The number of chunks is closed-form —
    ``1 + max(0, ceil((n - width) / stride))`` — so chunk ids come from one
    ``explode(sequence(...))`` with NO window function and no shuffle: the
    whole operator is map-side (Generate + Project), embarrassingly
    parallel at any scale. The final (short) chunk covers the tail;
    documents shorter than ``width`` yield exactly one chunk.

    The token array is materialized behind the explode barrier so the
    tokenizer regex runs once per document (not once per chunk).
    """
    from arcane_framework_spark.operators.text import tokens_expr

    if stride <= 0 or width <= 0:
        raise ValueError("width and stride must be positive")
    toks = docs.select(
        id_col, F.explode(F.array(tokens_expr(text_col))).alias("__toks")
    )
    n = F.size("__toks")
    n_chunks = (
        F.lit(1)
        + F.greatest(F.lit(0), F.floor((n - width + stride - 1) / F.lit(stride)))
    ).cast("int")
    chunks = toks.select(
        id_col,
        "__toks",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    start = F.col("chunk_id") * stride + 1
    chunk = F.slice("__toks", start, width)
    return chunks.select(
        id_col,
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.size(chunk).alias("n_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_hash"),
    )
