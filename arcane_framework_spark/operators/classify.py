"""Trained text-quality classification: multinomial Naive Bayes over
whitespace tokens, trained and scored fully inside the engine.

The missing piece between the heuristic quality filters (Gopher rules,
stopword ratios) and a real learned quality signal: CCNet (Wenzek et al.
2020) and GPT-3 (Brown et al. 2020) both train a linear classifier on a
high-quality seed corpus and filter web data by its score, and fastText
(Joulin et al. 2017) shows a linear bag-of-words model is enough for
this job. Multinomial NB is the closed-form member of that family — its
training pass is two exact integer aggregations, which makes it the one
learned classifier whose train→score loop can run as a deterministic
relational plan with a DuckDB oracle (no SGD, no iteration order).

The reference framework has no analog (it is an ingestion library,
SURVEY.md §0) — this is LLM-pipeline extension surface, reference
parity: none (cited for the §0 boundary only).

Shape at 100 TB:

- training is two shuffles: (doc, token) term frequencies, then
  per-token class counts keyed on the token — both partial-agg
  friendly, no collect;
- the per-token log-likelihood-ratio table is VOCABULARY-cardinality,
  so it joins relationally (never ``F.broadcast`` — the r14 sweep rule;
  AQE picks a broadcast when the vocabulary is actually small);
- corpus-level totals (class token totals, vocabulary size, class doc
  counts) ride as 1-row broadcast scalars;
- scoring reuses the SAME tf subtree the trainer aggregated (Spark's
  ReuseExchange dedupes the physical shuffle), then one shuffle back on
  the doc id.

Cross-engine determinism (the ``unigram_nll`` convention,
operators/text.py:302): each distinct token's class log-probabilities
are computed ONCE from exact integer counts, fixed-pointed SEPARATELY
to micro-nats (``floor(1e6·ln(p) + 0.5)``) and differenced as longs —
per-doc sums are exact integer arithmetic, independent of row order and
partitioning. Laplace(+1) smoothing keeps every probability strictly
positive, so ``ln`` is total.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from arcane_framework_spark.operators.text import tokens_expr

#: Fixed-point scale for log-probabilities: micro-nats.
NB_LLR_SCALE = 1_000_000


def _lp_micro(num, den):
    """floor(1e6·ln(num/den) + 0.5) as a long — num/den is an exact
    long→double IEEE division (identical in DuckDB), computed once per
    distinct token."""
    return F.floor(
        F.lit(float(NB_LLR_SCALE)) * F.log(num / den) + F.lit(0.5)
    ).cast("long")


def _doc_tf(docs: DataFrame, label_col: str, id_col: str,
            text_col: str) -> DataFrame:
    """(doc, label, token) term frequencies — the ONE tokenization
    subtree both training and scoring aggregate. ``nb_train`` and
    ``nb_score`` build it with byte-identical projections, so when the
    batch entry composes them over the same ``docs`` frame, Spark's
    ReuseExchange dedupes the physical shuffle and the corpus is
    tokenized once."""
    return (
        docs.select(
            F.col(id_col).alias("__id"),
            F.col(label_col).cast("int").alias("__pos"),
            F.explode(tokens_expr(text_col)).alias("tok"),
        )
        .groupBy("__id", "__pos", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def nb_token_counts(docs: DataFrame, label_col: str = "is_pos",
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Per-token class counts ``(tok, cpos, cneg)`` — NB's sufficient
    statistics for the token side. COUNT-ADDITIVE: the counts of a
    corpus union are the per-token sums of the parts, which is what
    makes the incremental twin exact (merge arriving counts into a
    persisted count table; the corpus text is never re-scanned)."""
    tf = _doc_tf(docs, label_col, id_col, text_col)
    return tf.groupBy("tok").agg(
        F.sum(F.when(F.col("__pos") == 1, F.col("tf")).otherwise(F.lit(0)))
        .alias("cpos"),
        F.sum(F.when(F.col("__pos") == 0, F.col("tf")).otherwise(F.lit(0)))
        .alias("cneg"),
    )


def nb_doc_counts(docs: DataFrame,
                  label_col: str = "is_pos") -> tuple[int, int]:
    """Per-class doc counts ``(dpos, dneg)`` — NB's other sufficient
    statistic, driver-held by the 2-value boundedness contract. The
    1-row action reads two pruned columns."""
    lab = F.col(label_col).cast("int")
    row = docs.agg(
        F.sum(lab).alias("dpos"),
        F.sum(F.lit(1) - lab).alias("dneg"),
    ).first()
    return int(row["dpos"] or 0), int(row["dneg"] or 0)


def nb_merge_counts(base: DataFrame, delta: DataFrame) -> DataFrame:
    """Merge two ``(tok, cpos, cneg)`` count tables by exact integer
    addition — the incremental model update. Full-outer join on the
    token key: when ``base`` is a BUCKETED side table on ``tok``, its
    side reads exchange-free and only the (small) delta shuffles, no
    matter how large the accumulated vocabulary grows."""
    d = delta.select(
        F.col("tok"),
        F.col("cpos").alias("__dcpos"),
        F.col("cneg").alias("__dcneg"),
    )
    return base.join(d, "tok", "full_outer").select(
        "tok",
        (
            F.coalesce(F.col("cpos"), F.lit(0))
            + F.coalesce(F.col("__dcpos"), F.lit(0))
        ).alias("cpos"),
        (
            F.coalesce(F.col("cneg"), F.lit(0))
            + F.coalesce(F.col("__dcneg"), F.lit(0))
        ).alias("cneg"),
    )


def nb_model_from_counts(vocab: DataFrame, dpos: int,
                         dneg: int) -> tuple[DataFrame, int]:
    """Model from sufficient statistics: the per-token micro-nat LLR
    table + the integer ln doc-count prior. Both classes must be
    non-empty (raises ``ValueError`` otherwise — an empty seed class
    means the caller wired the label wrong, and silently emitting
    all-one-class scores would look like a trained model)."""
    from arcane_framework_spark.operators.scale import with_broadcast_scalar

    if not dpos or not dneg:
        raise ValueError(
            "nb_train needs BOTH classes non-empty; got "
            f"dpos={dpos} dneg={dneg}"
        )
    prior_micro = int(
        math.floor(NB_LLR_SCALE * math.log(dpos / dneg) + 0.5)
    )
    tot = vocab.agg(
        F.sum("cpos").alias("__npos"),
        F.sum("cneg").alias("__nneg"),
        F.count(F.lit(1)).alias("__v"),
    )
    # Vocabulary-cardinality ⇒ relational join, never F.broadcast.
    lp = with_broadcast_scalar(vocab, tot).select(
        "tok",
        (
            _lp_micro(F.col("cpos") + 1, F.col("__npos") + F.col("__v"))
            - _lp_micro(F.col("cneg") + 1, F.col("__nneg") + F.col("__v"))
        ).alias("llr_micro"),
    )
    return lp, prior_micro


def nb_train(docs: DataFrame, label_col: str = "is_pos",
             id_col: str = "doc_id",
             text_col: str = "text") -> tuple[DataFrame, int]:
    """Fit the binary multinomial NB: returns ``(lp, prior_micro)``
    where ``lp`` is the per-token ``(tok, llr_micro)`` model table
    (vocabulary-cardinality — join it relationally, never broadcast)
    and ``prior_micro`` the integer micro-nat ln doc-count prior.

    This is the freeze point for the production shape: train once on
    the corpus, persist ``lp`` as a side table, then score arriving
    data against the frozen model (``nb_score`` — the streaming twin
    does exactly this per micro-batch). Composes the sufficient-
    statistic halves (``nb_token_counts`` / ``nb_doc_counts`` /
    ``nb_model_from_counts``) the incremental twin reuses; the
    validate-before-train doc-count action catches a mis-wired label
    BEFORE the tokenization pass.
    """
    dpos, dneg = nb_doc_counts(docs, label_col)
    vocab = nb_token_counts(docs, label_col, id_col, text_col)
    return nb_model_from_counts(vocab, dpos, dneg)


def nb_score(docs: DataFrame, lp: DataFrame, prior_micro: int,
             label_col: str = "is_pos", id_col: str = "doc_id",
             text_col: str = "text") -> DataFrame:
    """Score ``docs`` against a frozen NB model ``(lp, prior_micro)``
    from ``nb_train``.

    Returns ``(id, is_pos, n_tokens, llr_micro, pred_pos)``:
    ``llr_micro`` is the integer micro-nat log-odds
    ``Σ_t tf(t)·(lp⁺(t) − lp⁻(t)) + ln-prior``, ``pred_pos`` is
    ``llr_micro > 0``. Tokens absent from the model vocabulary drop out
    of the inner join (and of ``n_tokens``) — when scoring the training
    corpus itself the vocabulary covers every token, so ``n_tokens`` is
    the full count. Per-doc stateless given the frozen model, which is
    what makes the streaming twin batch-split independent.
    """
    tf = _doc_tf(docs, label_col, id_col, text_col)
    return (
        tf.join(lp, "tok")
        .groupBy("__id", "__pos")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("llr_micro")).alias("__s"),
        )
        .select(
            F.col("__id").alias(id_col),
            F.col("__pos").alias("is_pos"),
            "n_tokens",
            (F.col("__s") + F.lit(prior_micro)).cast("long")
            .alias("llr_micro"),
            (F.col("__s") + F.lit(prior_micro) > 0).cast("int")
            .alias("pred_pos"),
        )
    )


def nb_quality_scores(docs: DataFrame, label_col: str = "is_pos",
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Train-and-score in one plan: ``nb_train`` + ``nb_score`` over
    the same corpus (the resubstitution setup the catalog entry uses).
    The two halves build the byte-identical tf subtree, so the corpus
    is tokenized and shuffled once (ReuseExchange)."""
    lp, prior_micro = nb_train(docs, label_col, id_col, text_col)
    return nb_score(docs, lp, prior_micro, label_col, id_col, text_col)


def nb_confusion(scores: DataFrame) -> DataFrame:
    """Train-set confusion card for ``nb_quality_scores`` output:
    ``(is_pos, pred_pos, n_docs, share_ppm)`` — the resubstitution
    check that the learned signal actually separates the seed class
    (the CCNet sanity gate before the filter is trusted on 100 TB).

    ``share_ppm`` is exact integer floor-division parts-per-million of
    the total doc count (engine-identical for positive longs). One
    shuffle on the 2×2 key; the total rides as a broadcast scalar.
    """
    from arcane_framework_spark.operators.scale import with_broadcast_scalar

    cells = scores.groupBy("is_pos", "pred_pos").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    tot = cells.agg(F.sum("n_docs").alias("__t"))
    return with_broadcast_scalar(cells, tot).select(
        "is_pos",
        "pred_pos",
        "n_docs",
        F.expr("n_docs * 1000000 div __t").cast("long").alias("share_ppm"),
    )
