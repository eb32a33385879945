"""Distributed BPE merge training (Sennrich et al. 2016, ACL).

The canonical tokenizer-training loop, Spark-first: learn the top-k
byte-pair merges over a corpus. The 100 TB shape is the standard BPE
trick — the ONLY corpus-sized work is one word-frequency aggregation
(one shuffle with map-side combine); every merge iteration then runs
over the DISTINCT-WORD table (vocabulary-sized, orders of magnitude
smaller than the corpus) with pair counts weighted by word frequency.
Iterations are fixed-count and fully deterministic (ties broken by
count DESC, then pair lexicographically), so a SQL oracle can unroll
the identical k steps — the merge table is exact integer arithmetic.

Token representation: a word's symbol sequence is stored as the string
``{l}{o}{w}{#}`` (``#`` = end-of-word marker; tokens only ever contain
``[a-z#]``, so ``{`` / ``}`` never collide). Merging pair (l, o) is
``replace(s, '{l}{o}', '{lo}')`` — and because adjacent tokens share NO
delimiter characters, engine ``replace`` (left-to-right,
non-overlapping in both Spark and DuckDB) merges repeated pairs
identically to the reference algorithm: ``{a}{a}{a}{a}`` -> two merges,
``{a}{a}{a}`` -> one.

Reference parity: the reference ingestion framework has no tokenizer
surface — SURVEY §2.9 extension territory (X96).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from arcane_framework_spark.operators.cache import scoped_persist

#: Fixed merge count and word filter for the oracle-gated entry.
BPE_MERGES = 8
BPE_MAX_WORD_LEN = 15


def bpe_word_frequencies(docs: DataFrame,
                         text_col: str = "text") -> DataFrame:
    """(s, cnt): the distinct-word table in symbol representation —
    the one corpus-sized aggregation of BPE training."""
    return (
        docs.select(
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("w")
        )
        .filter(
            F.col("w").rlike("^[a-z]+$")
            & (F.length("w") <= BPE_MAX_WORD_LEN)
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.concat(
                F.lit("{"),
                F.concat_ws("}{", F.split(F.col("w"), "")),
                F.lit("}{#}"),
            ).alias("s"),
            "cnt",
        )
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """(l, r, c): adjacent-symbol pair counts weighted by word count."""
    toked = words.withColumn(
        "__t",
        F.split(F.expr("substring(s, 2, length(s) - 2)"), r"\}\{"),
    )
    # guard: a fully-merged single-token word has no pairs (explode of
    # the null array emits nothing; an unguarded sequence(0, -1) would
    # fabricate a [0, -1] index pair)
    pairs = toked.select(
        F.explode(
            F.when(
                F.size("__t") >= 2,
                F.expr(
                    "transform(sequence(0, size(__t) - 2), "
                    "i -> struct(__t[i] AS l, __t[i + 1] AS r))"
                ),
            )
        ).alias("p"),
        "cnt",
    )
    return pairs.groupBy(
        F.col("p.l").alias("l"), F.col("p.r").alias("r")
    ).agg(F.sum("cnt").alias("c"))


def _merge_rewrite(s_col):
    """replace('{l}{r}' -> '{lr}') against the broadcast winner's l/r."""
    return F.replace(
        s_col,
        F.concat(F.lit("{"), F.col("l"), F.lit("}{"),
                 F.col("r"), F.lit("}")),
        F.concat(F.lit("{"), F.col("l"), F.col("r"), F.lit("}")),
    )


def bpe_train(docs: DataFrame, text_col: str = "text",
              merges: int = BPE_MERGES,
              tops: "list[DataFrame] | None" = None) -> DataFrame:
    """Learn the top-``merges`` BPE merges; returns the merge table
    (step, left_tok, right_tok, merged, pair_count) ordered by step.

    Each iteration: one vocabulary-sized pair aggregation, argmax with
    the (count DESC, l, r) tie-break, then an in-plan broadcast of the
    1-row winner into the replace() rewrite — no merge pair ever leaves
    the cluster as a driver literal. Each round's vocabulary ends in a
    ``localCheckpoint`` (the graph.py rule: a loop that references its
    previous round TWICE — here in the pair count AND the rewrite —
    doubles the logical plan per round and OOMs the driver at plan
    construction without lineage truncation).

    ``tops`` short-circuits the training loop with the per-step winner
    DataFrames from an earlier ``bpe_train_tops`` run over the same
    corpus (the trained-model-as-side-table path — see
    prep.shared_prep); the loop is deterministic, so the result is
    identical either way.
    """
    if tops is None:
        tops = bpe_train_tops(docs, text_col, merges)
    steps = [
        top.select(
            F.lit(step).alias("step"),
            F.col("l").alias("left_tok"),
            F.col("r").alias("right_tok"),
            F.concat("l", "r").alias("merged"),
            F.col("c").cast("long").alias("pair_count"),
        )
        for step, top in enumerate(tops, start=1)
    ]
    out = steps[0]
    for sdf in steps[1:]:
        out = out.unionByName(sdf)
    return out


def bpe_train_and_apply(docs: DataFrame, group_col: str,
                        text_col: str = "text",
                        merges: int = BPE_MERGES,
                        tops: "list[DataFrame] | None" = None) -> DataFrame:
    """Train merges globally, then TOKENIZE per group with them:
    (group, n_words, n_chars, n_tokens_bpe, tokens_per_word).

    The train->apply split mirrors production: merges are learned once
    over the global word table, then replayed (the same in-plan
    broadcast replace chain, in step order) over the per-group word
    table — the corpus text is never re-scanned per merge. The output
    is the fertility accounting a pipeline actually tracks for a
    LEARNED tokenizer: how many BPE tokens per word each source costs
    under the shared vocabulary.

    ``tops`` injects a pre-trained merge sequence exactly as in
    :func:`bpe_train` (training reads only ``text_col``, so tops trained
    from any projection of the same corpus are identical)."""
    if tops is None:
        tops = bpe_train_tops(docs, text_col, merges)
    grouped = (
        docs.select(
            F.col(group_col).alias("grp"),
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("w"),
        )
        .filter(
            F.col("w").rlike("^[a-z]+$")
            & (F.length("w") <= BPE_MAX_WORD_LEN)
        )
        .groupBy("grp", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "grp",
            F.length("w").alias("n_chars_w"),
            F.concat(
                F.lit("{"),
                F.concat_ws("}{", F.split(F.col("w"), "")),
                F.lit("}{#}"),
            ).alias("s"),
            "cnt",
        )
    )
    for top in tops:
        grouped = grouped.crossJoin(
            F.broadcast(top.select("l", "r"))
        ).select(
            "grp", "n_chars_w", _merge_rewrite(F.col("s")).alias("s"), "cnt"
        )
    toked = grouped.select(
        "grp", "n_chars_w", "cnt",
        F.size(
            F.split(F.expr("substring(s, 2, length(s) - 2)"), r"\}\{")
        ).alias("n_tok"),
    )
    return toked.groupBy(F.col("grp").alias(group_col)).agg(
        F.sum("cnt").cast("long").alias("n_words"),
        F.sum(F.col("cnt") * F.col("n_chars_w")).cast("long").alias(
            "n_chars"
        ),
        F.sum(F.col("cnt") * F.col("n_tok")).cast("long").alias(
            "n_tokens_bpe"
        ),
        (
            F.floor(
                F.sum(F.col("cnt") * F.col("n_tok")).cast("double")
                / F.sum("cnt").cast("double") * 10000 + F.lit(0.5)
            ) / 10000
        ).alias("tokens_per_word"),
    )


def bpe_train_tops(docs: DataFrame, text_col: str = "text",
                   merges: int = BPE_MERGES) -> list[DataFrame]:
    """The training loop of ``bpe_train``, returning the k persisted
    1-row winner DataFrames in step order (for replaying the merge
    chain over another table)."""
    words = bpe_word_frequencies(docs, text_col).localCheckpoint(
        eager=False
    )
    tops = []
    for step in range(1, merges + 1):
        top = scoped_persist(
            _pair_counts(words)
            .orderBy(F.col("c").desc(), "l", "r")
            .limit(1)
        )
        top.count()
        tops.append(top)
        if step < merges:
            words = words.crossJoin(F.broadcast(top)).select(
                _merge_rewrite(F.col("s")).alias("s"), "cnt"
            ).localCheckpoint(eager=False)
    return tops
