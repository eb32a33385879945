"""Model-evaluation metrics over labeled embeddings: exact ROC-AUC and
calibration bins / expected calibration error (ECE).

A training-data pipeline that mines hard negatives, scores quality, or
gates a corpus on a classifier needs these next to the retrieval evals
(bm25_self_retrieval MRR, knn label purity). Reference parity: the
reference (an ingestion framework) has no eval surface — these extend
SURVEY §2.9's LLM-pipeline family.

Scale design
------------
- **ROC-AUC** is the Mann-Whitney statistic: the fraction of
  (positive, negative) pairs ranked correctly, ties counted half. The
  naive form is a quadratic pair join; the sorted form needs a global
  rank. Here: group by exact score (distinct-score-sized), then a
  TWO-LEVEL prefix sum of negatives below each score — a local window
  inside monotone score bands plus broadcast band offsets
  (``bucket_offsets``, the same shape as pack_documents) — no global
  sort, no single-partition corpus window.
- **Exactness** — correctly-ordered pairs and ties are pure INTEGER
  counts (long sums are order-independent, so both engines agree
  bit-for-bit); the single final division happens once per group in
  doubles with fixed operand order. Long arithmetic holds while
  ``n_pos·n_neg < 2^63`` (≈3·10⁹ rows of each class — beyond that,
  switch to binned approximate AUC).
- **Calibration** — per-row fixed-point micro-probabilities, one
  hash-aggregate onto ≤ ``n_bins`` rows; ECE attaches via a broadcast
  1-row scalar.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Monotone score bands for the AUC prefix sum — the fan-out of the
#: metadata-scale offsets table per score function.
AUC_BANDS = 64


def roc_auc(scored: DataFrame, score_col: str = "score",
            y_col: str = "y", group_col: str = "score_name",
            bands: int = AUC_BANDS) -> DataFrame:
    """Exact tie-corrected ROC-AUC per ``group_col``.

    ``scored`` has one row per example with a double score, a 0/1 label
    ``y_col`` and a group key (several score functions evaluated side by
    side). Returns (group_col, n_pos, n_neg, auc) with
    ``auc = (#correct pairs + #ties/2) / (n_pos·n_neg)`` rounded
    half-up to 6 decimals; NULL-safe: groups with an empty class emit
    ``auc = NULL`` rather than a division error.
    """
    from arcane_framework_spark.operators.scale import bucket_offsets
    from pyspark.sql import Window

    y = F.col(y_col).cast("long")
    g = scored.groupBy(group_col, score_col).agg(
        F.sum(y).alias("n_pos"),
        F.sum(F.lit(1) - y).alias("n_neg"),
    )
    rng = g.groupBy(group_col).agg(
        F.min(score_col).alias("__mn"), F.max(score_col).alias("__mx")
    )
    s = F.col(score_col)
    band = F.when(F.col("__mx") == F.col("__mn"), F.lit(0)).otherwise(
        F.least(
            F.lit(bands - 1),
            F.floor(
                (s - F.col("__mn")) / (F.col("__mx") - F.col("__mn"))
                * F.lit(float(bands))
            ).cast("int"),
        )
    )
    banded = (
        g.join(F.broadcast(rng), group_col)
        .withColumn("__band", band)
        .drop("__mn", "__mx")
    )
    offs = bucket_offsets(
        banded, [group_col], ["__band"], ["__band"], value=F.col("n_neg")
    )
    w_loc = (
        Window.partitionBy(group_col, "__band")
        .orderBy(score_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = banded.join(F.broadcast(offs), [group_col, "__band"]).withColumn(
        "__cum_neg",
        F.col("__off") + F.coalesce(F.sum("n_neg").over(w_loc), F.lit(0)),
    )
    agg = cum.groupBy(group_col).agg(
        F.sum("n_pos").alias("n_pos"),
        F.sum("n_neg").alias("n_neg"),
        F.sum(F.col("n_pos") * F.col("__cum_neg")).alias("__pairs"),
        F.sum(F.col("n_pos") * F.col("n_neg")).alias("__ties"),
    )
    auc = (
        F.lit(2.0) * F.col("__pairs").cast("double")
        + F.col("__ties").cast("double")
    ) / (
        F.lit(2.0)
        * F.col("n_pos").cast("double")
        * F.col("n_neg").cast("double")
    )
    return agg.select(
        group_col,
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.floor(auc * 1e6 + F.lit(0.5)) / 1e6,
        ).alias("auc"),
    )


#: Calibration histogram width.
CALIB_BINS = 10


def calibration_bins(scored: DataFrame, p_col: str = "p",
                     y_col: str = "y",
                     n_bins: int = CALIB_BINS) -> DataFrame:
    """Reliability diagram + ECE for a probability column in [0, 1].

    Per equal-width bin: count, mean predicted probability, empirical
    positive rate, |gap|; plus the scalar ECE (confidence-weighted mean
    gap) attached to every row. Probabilities are fixed-pointed to
    micro-units per row BEFORE summing so both engines aggregate exact
    longs in any order. Returns (bin, n, mean_score, frac_pos, abs_gap,
    ece) — ≤ ``n_bins`` rows.
    """
    from arcane_framework_spark.operators.scale import with_broadcast_scalar

    p = F.col(p_col).cast("double")
    y = F.col(y_col).cast("long")
    rows = scored.select(
        F.least(
            F.lit(n_bins - 1), F.floor(p * F.lit(float(n_bins))).cast("int")
        ).alias("bin"),
        F.floor(p * F.lit(1e6) + F.lit(0.5)).cast("long").alias("__p_fp"),
        y.alias("__y"),
    )
    bins = rows.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__p_fp").alias("__sp"),
        F.sum("__y").alias("__pos"),
    )
    mean_score = (
        F.floor(
            F.col("__sp").cast("double") / F.col("n").cast("double")
            + F.lit(0.5)
        )
        / 1e6
    )
    frac_pos = (
        F.floor(
            F.col("__pos").cast("double") * F.lit(1e6)
            / F.col("n").cast("double")
            + F.lit(0.5)
        )
        / 1e6
    )
    with_gap = bins.select(
        "bin",
        "n",
        mean_score.alias("mean_score"),
        frac_pos.alias("frac_pos"),
    ).withColumn(
        "__gap_fp",
        F.floor(
            F.abs(F.col("frac_pos") - F.col("mean_score")) * F.lit(1e6)
            + F.lit(0.5)
        ).cast("long"),
    )
    # n·gap_fp stays exact in longs while n ≤ ~9·10¹² rows (gap_fp ≤ 1e6);
    # the one division is double with fixed operand order on both engines.
    ece_scalar = with_gap.agg(
        (
            F.floor(
                F.sum(F.col("n") * F.col("__gap_fp")).cast("double")
                / F.sum("n").cast("double")
                + F.lit(0.5)
            )
            / 1e6
        ).alias("ece")
    )
    return (
        with_broadcast_scalar(with_gap, ece_scalar)
        .select(
            "bin",
            "n",
            "mean_score",
            "frac_pos",
            (F.col("__gap_fp").cast("double") / 1e6).alias("abs_gap"),
            "ece",
        )
    )


def prototype_classifier_eval(vectors: DataFrame, stride: int,
                              id_col: str = "vec_id",
                              vec_col: str = "embedding",
                              label_col: str = "label") -> DataFrame:
    """Per-class precision/recall/F1 of a nearest-prototype classifier:
    every ``stride``-th vector is a labeled prototype, every other
    vector is classified by its max-cosine prototype (the ``ivf_assign``
    argmax — prototypes broadcast, one map-side-combined shuffle).

    The end-to-end eval loop a labeled-embedding pipeline runs after
    distillation/quantization: does nearest-neighbor structure still
    predict labels? F1 uses the exact identity ``2·tp/(n_pred+n_true)``
    (one fixed-order division instead of composing two rounded ratios).
    Classes never predicted get precision NULL; classes absent from the
    test split get recall NULL.

    Returns (label, n_true, n_pred, tp, precision, recall, f1).
    """
    from arcane_framework_spark.operators.similarity import ivf_assign

    cent = vectors.filter(F.col(id_col) % stride == 0).select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).alias("cvec"),
        F.col(label_col).alias("clabel"),
    )
    test = vectors.filter(F.col(id_col) % stride != 0)
    assigned = ivf_assign(test, cent)
    joined = (
        assigned.select("id", "cid")
        .join(F.broadcast(cent.select("cid", "clabel")), "cid")
        .join(
            test.select(F.col(id_col).alias("id"), label_col), "id"
        )
    )
    n_true = joined.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n_true")
    )
    n_pred = joined.groupBy(F.col("clabel").alias("label")).agg(
        F.count(F.lit(1)).alias("n_pred")
    )
    tp = (
        joined.filter(F.col(label_col) == F.col("clabel"))
        .groupBy(F.col(label_col).alias("label"))
        .agg(F.count(F.lit(1)).alias("tp"))
    )
    base = (
        n_true.join(n_pred, "label", "full_outer")
        .join(tp, "label", "left")
        .select(
            "label",
            F.coalesce("n_true", F.lit(0)).cast("long").alias("n_true"),
            F.coalesce("n_pred", F.lit(0)).cast("long").alias("n_pred"),
            F.coalesce("tp", F.lit(0)).cast("long").alias("tp"),
        )
    )
    ratio6 = lambda num, den: (  # noqa: E731
        F.floor(num.cast("double") * F.lit(1e6) / den.cast("double") + F.lit(0.5))
        / 1e6
    )
    return base.select(
        "label",
        "n_true",
        "n_pred",
        "tp",
        F.when(
            F.col("n_pred") > 0, ratio6(F.col("tp"), F.col("n_pred"))
        ).alias("precision"),
        F.when(
            F.col("n_true") > 0, ratio6(F.col("tp"), F.col("n_true"))
        ).alias("recall"),
        ratio6(
            F.lit(2.0) * F.col("tp"), F.col("n_pred") + F.col("n_true")
        ).alias("f1"),
    )


def two_proportion_ztest(units: DataFrame, cohort_col: str = "cohort",
                         converted_col: str = "converted") -> DataFrame:
    """Pooled two-proportion z-test between cohorts 0 (control) and 1
    (treatment): the A/B readout a pipeline runs on a per-unit
    conversion flag. All inputs are integer counts; the statistic uses
    only ratios and ``sqrt`` (IEEE exactly-rounded — the one transcen-
    dental that is engine-safe), in mirrored operand order.

    One global conditional-sum aggregate (map-side combined). Returns a
    single row (n_a, x_a, n_b, x_b, rate_a, rate_b, z); z is NULL when
    either cohort is empty or the pooled rate is degenerate (0 or 1 —
    zero variance).
    """
    is_a = F.col(cohort_col) == 0
    is_b = F.col(cohort_col) == 1
    conv = F.col(converted_col).cast("long")
    agg = units.agg(
        F.sum(F.when(is_a, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(is_a, conv).otherwise(0)).cast("long").alias("x_a"),
        F.sum(F.when(is_b, 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(is_b, conv).otherwise(0)).cast("long").alias("x_b"),
    )
    na, xa = F.col("n_a").cast("double"), F.col("x_a").cast("double")
    nb, xb = F.col("n_b").cast("double"), F.col("x_b").cast("double")
    p1, p2 = xa / na, xb / nb
    pool = (xa + xb) / (na + nb)
    z = (p1 - p2) / F.sqrt(
        pool * (F.lit(1.0) - pool) * (F.lit(1.0) / na + F.lit(1.0) / nb)
    )
    r6 = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)) / 1e6  # noqa: E731
    return agg.select(
        "n_a",
        "x_a",
        "n_b",
        "x_b",
        r6(p1).alias("rate_a"),
        r6(p2).alias("rate_b"),
        F.when(
            (F.col("n_a") > 0)
            & (F.col("n_b") > 0)
            & (F.col("x_a") + F.col("x_b") > 0)
            & (F.col("x_a") + F.col("x_b") < F.col("n_a") + F.col("n_b")),
            r6(z),
        ).alias("z"),
    )


def spearman_corr(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Tie-corrected Spearman rank correlation between two columns
    WITHOUT a global row sort (the AUC/Gini two-level pattern): per-
    distinct-value counts -> DOUBLED average ranks (``2*cum_prev + m +
    1`` keeps .5 ties integer) over value LEVELS, broadcast value->rank
    maps joined back, ranks centered by their exact integer mean (n+1
    in doubled units). Products are int64-exact to n ~ 1e9 rows and
    summed as DECIMAL(38,0) (DuckDB mirrors with HUGEINT) — exact at
    any corpus size; rho is one IEEE sqrt + division at the end.

    Returns a single row (n_rows, spearman_rho)."""
    from pyspark.sql import Window

    from arcane_framework_spark.operators.scale import with_broadcast_scalar

    def doubled_rank(col: str, out: str) -> DataFrame:
        levels = df.groupBy(col).agg(F.count(F.lit(1)).alias("m"))
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, 0)
        return levels.select(
            col,
            (2 * (F.sum("m").over(w) - F.col("m")) + F.col("m") + 1)
            .alias(out),
        )

    n = df.agg(F.count(F.lit(1)).alias("__n"))
    ranked = (
        with_broadcast_scalar(df.select(col_a, col_b), n)
        .join(F.broadcast(doubled_rank(col_a, "__r2a")), col_a)
        .join(F.broadcast(doubled_rank(col_b, "__r2b")), col_b)
        .select(
            F.col("__n"),
            (F.col("__r2a") - (F.col("__n") + 1)).alias("__ca"),
            (F.col("__r2b") - (F.col("__n") + 1)).alias("__cb"),
        )
    )
    agg = ranked.agg(
        F.max("__n").alias("n"),
        F.sum((F.col("__ca") * F.col("__cb")).cast("decimal(38,0)"))
        .alias("sab"),
        F.sum((F.col("__ca") * F.col("__ca")).cast("decimal(38,0)"))
        .alias("saa"),
        F.sum((F.col("__cb") * F.col("__cb")).cast("decimal(38,0)"))
        .alias("sbb"),
    )
    return agg.select(
        F.col("n").cast("long").alias("n_rows"),
        F.round(
            F.col("sab").cast("double")
            / F.sqrt(
                F.col("saa").cast("double") * F.col("sbb").cast("double")
            ),
            6,
        ).alias("spearman_rho"),
    )


def youden_threshold(scored: DataFrame, score_col: str = "score",
                     y_col: str = "y", group_col: str = "score_name",
                     bands: int = AUC_BANDS) -> DataFrame:
    """Optimal operating point per score function: the threshold
    maximizing Youden's J = TPR - FPR (classify positive when score >=
    threshold) — the deliverable practitioners actually set after
    reading an AUC. The argmax key is the exact integer cross-multiply
    ``tp*n_neg - fp*n_pos`` (J scaled by n_pos*n_neg — no division
    before the argmax), candidate thresholds are the distinct STORED
    scores, and the cumulative counts reuse the ROC two-level pattern
    (local windows inside monotone score bands + broadcast band
    offsets — no global row sort). Ties break toward the smallest
    threshold. Returns per group: threshold, tp/fp/fn/tn, youden_j,
    precision, recall (each ONE final division, floor(x*1e6+0.5)/1e6
    tie-safe rounding)."""
    from pyspark.sql import Window

    y = F.col(y_col).cast("long")
    g = scored.groupBy(group_col, score_col).agg(
        F.sum(y).alias("n_pos"),
        F.sum(F.lit(1) - y).alias("n_neg"),
    )
    rng = g.groupBy(group_col).agg(
        F.min(score_col).alias("__mn"), F.max(score_col).alias("__mx")
    )
    s = F.col(score_col)
    band = F.when(F.col("__mx") == F.col("__mn"), F.lit(0)).otherwise(
        F.least(
            F.lit(bands - 1),
            F.floor(
                (s - F.col("__mn")) / (F.col("__mx") - F.col("__mn"))
                * F.lit(float(bands))
            ).cast("int"),
        )
    )
    banded = (
        g.join(F.broadcast(rng), group_col)
        .withColumn("__band", band)
        .drop("__mn", "__mx")
    )
    w_off = (
        Window.partitionBy(group_col)
        .orderBy("__band")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = (
        banded.groupBy(group_col, "__band")
        .agg(F.sum("n_pos").alias("__bp"), F.sum("n_neg").alias("__bn"))
        .withColumn(
            "__off_pos", F.coalesce(F.sum("__bp").over(w_off), F.lit(0))
        )
        .withColumn(
            "__off_neg", F.coalesce(F.sum("__bn").over(w_off), F.lit(0))
        )
        .select(group_col, "__band", "__off_pos", "__off_neg")
    )
    w_loc = (
        Window.partitionBy(group_col, "__band")
        .orderBy(score_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wt = Window.partitionBy(group_col)
    cum = (
        banded.join(F.broadcast(offs), [group_col, "__band"])
        .withColumn(
            "__cum_pos",
            F.col("__off_pos")
            + F.coalesce(F.sum("n_pos").over(w_loc), F.lit(0)),
        )
        .withColumn(
            "__cum_neg",
            F.col("__off_neg")
            + F.coalesce(F.sum("n_neg").over(w_loc), F.lit(0)),
        )
        .withColumn("__tot_pos", F.sum("n_pos").over(wt))
        .withColumn("__tot_neg", F.sum("n_neg").over(wt))
    )
    tp = F.col("__tot_pos") - F.col("__cum_pos")
    fp = F.col("__tot_neg") - F.col("__cum_neg")
    j = tp * F.col("__tot_neg") - fp * F.col("__tot_pos")
    pick = Window.partitionBy(group_col).orderBy(
        j.desc(), F.col(score_col).asc()
    )
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731

    return (
        cum.withColumn("__rn", F.row_number().over(pick))
        .filter(F.col("__rn") == 1)
        .select(
            group_col,
            F.col(score_col).alias("threshold"),
            tp.cast("long").alias("tp"),
            fp.cast("long").alias("fp"),
            (F.col("__tot_pos") - tp).cast("long").alias("fn"),
            (F.col("__tot_neg") - fp).cast("long").alias("tn"),
            r6(
                j.cast("double")
                / (F.col("__tot_pos") * F.col("__tot_neg")).cast("double")
            ).alias("youden_j"),
            r6(tp.cast("double") / (tp + fp).cast("double")).alias(
                "precision"
            ),
            r6(tp.cast("double") / F.col("__tot_pos").cast("double")).alias(
                "recall"
            ),
        )
    )
