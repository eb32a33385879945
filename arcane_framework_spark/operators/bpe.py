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


def bpe_train(docs: DataFrame, text_col: str = "text",
              merges: int = BPE_MERGES) -> DataFrame:
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
    """
    words = bpe_word_frequencies(docs, text_col).localCheckpoint(
        eager=False
    )
    steps = []
    for step in range(1, merges + 1):
        top = scoped_persist(
            _pair_counts(words)
            .orderBy(F.col("c").desc(), "l", "r")
            .limit(1)
        )
        top.count()  # materialize the winner before it is read twice
        steps.append(
            top.select(
                F.lit(step).alias("step"),
                F.col("l").alias("left_tok"),
                F.col("r").alias("right_tok"),
                F.concat("l", "r").alias("merged"),
                F.col("c").cast("long").alias("pair_count"),
            )
        )
        if step < merges:
            words = words.crossJoin(F.broadcast(top)).select(
                F.replace(
                    F.col("s"),
                    F.concat(
                        F.lit("{"), F.col("l"), F.lit("}{"),
                        F.col("r"), F.lit("}"),
                    ),
                    F.concat(
                        F.lit("{"), F.col("l"), F.col("r"), F.lit("}")
                    ),
                ).alias("s"),
                "cnt",
            ).localCheckpoint(eager=False)
    out = steps[0]
    for sdf in steps[1:]:
        out = out.unionByName(sdf)
    return out
