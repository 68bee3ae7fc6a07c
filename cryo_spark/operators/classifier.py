"""Model-based document quality filtering (fastText-classifier shape).

The heuristic `text.quality_score` is stage one of a production
quality pipeline; stage two is a learned classifier (GPT-3/LLaMA-style
"does this look like the reference corpus?") scored over every
document. This module is that second stage on Spark MLlib:

- ``featurize``      hashed bag-of-{uni,bi}gram term-frequency vector
                     (the fastText input representation) — HashingTF
                     is a JVM-side narrow projection, no shuffle
- ``train_quality_classifier``
                     logistic regression over a (small) labeled frame
                     — positives = reference-corpus docs, negatives =
                     raw-crawl sample; LBFGS over treeAggregate
- ``score_quality``  broadcast-coefficient scoring of the full corpus
                     (model application is a narrow projection: the
                     100 TB side is never shuffled, exactly like the
                     DSIR ratio broadcast)

Scale: training data for such filters is small by construction (the
reference corpus is the scarce resource); the corpus-sized pass is
`score_quality`, which is embarrassingly parallel. Scores are floats
from an iteratively-fit model, so the contract check is an in-entry
ranking-quality (AUC) gate rather than a value-hash oracle — the same
driver-visible-gate pattern as the ANN entries.
"""

from __future__ import annotations

from pyspark.ml.classification import LogisticRegression, LogisticRegressionModel
from pyspark.ml.feature import HashingTF, NGram, Tokenizer
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_FEATURES = 1 << 14


def featurize(
    df: DataFrame,
    text_col: str = "text",
    n_features: int = DEFAULT_FEATURES,
    out_col: str = "features",
) -> DataFrame:
    """Append a sparse hashed-TF vector over unigrams + bigrams.

    All three stages (tokenize, ngram, hashingTF) are JVM-side narrow
    transformations — featurizing 100 TB is a map-only pass."""
    toks = Tokenizer(inputCol=text_col, outputCol="__toks").transform(df)
    bi = NGram(n=2, inputCol="__toks", outputCol="__bi").transform(toks)
    both = bi.withColumn("__grams", F.concat("__toks", "__bi"))
    tf = HashingTF(
        inputCol="__grams", outputCol=out_col, numFeatures=n_features
    ).transform(both)
    return tf.drop("__toks", "__bi", "__grams")


def train_quality_classifier(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    n_features: int = DEFAULT_FEATURES,
    reg_param: float = 1e-3,
    max_iter: int = 50,
) -> LogisticRegressionModel:
    """Fit the filter on a labeled frame (label 1 = looks like the
    target corpus). L2-regularized logistic regression ~ fastText's
    linear classifier over hashed n-grams."""
    feats = featurize(labeled, text_col, n_features)
    lr = LogisticRegression(
        featuresCol="features",
        labelCol=label_col,
        regParam=reg_param,
        maxIter=max_iter,
        standardization=False,
    )
    return lr.fit(feats)


def score_quality(
    df: DataFrame,
    model: LogisticRegressionModel,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_features: int | None = None,
) -> DataFrame:
    """(id, quality_prob): P(target-like) per document. The model's
    coefficient vector rides to executors in the closure (one sparse
    vector, broadcast-sized); the corpus pass is narrow.

    ``n_features`` defaults to ``model.numFeatures``: scoring must
    featurize with the SAME hash width the model was trained with — a
    model trained at a non-default width scored at the default would
    silently mismatch every bucket. An explicit value that disagrees
    with the model raises up front."""
    from pyspark.ml.functions import vector_to_array

    if n_features is None:
        n_features = model.numFeatures
    elif n_features != model.numFeatures:
        raise ValueError(
            f"n_features={n_features} does not match the model's "
            f"training width ({model.numFeatures}) — scoring would "
            "hash into different buckets than training did"
        )
    feats = featurize(df, text_col, n_features)
    scored = model.transform(feats)
    prob1 = F.element_at(vector_to_array(F.col("probability")), 2)
    return scored.select(F.col(id_col), prob1.alias("quality_prob"))


def auc(
    scored: DataFrame,
    label_col: str = "label",
    score_col: str = "quality_prob",
) -> float:
    """Area under the ROC curve via the Mann-Whitney rank-sum
    identity. The global-order window is single-partition by nature —
    acceptable here because AUC is only ever computed over the
    (small, by construction) labeled evaluation frame, never the
    corpus; used by tests and the in-entry contract gate."""
    from pyspark.sql import Window

    # AVERAGE ranks for tied scores (rank() gives the group minimum;
    # adding (ties-1)/2 centers it) — with row_number a tie-break on
    # the label would maximally inflate AUC: a constant-score model
    # would score 1.0 instead of the correct 0.5, defeating the gate
    r = (
        F.rank().over(Window.orderBy(score_col))
        + (F.count(F.lit(1)).over(Window.partitionBy(score_col)) - 1) / 2.0
    )
    ranked = scored.select(F.col(label_col).alias("__y"), r.alias("__r"))
    row = ranked.groupBy().agg(
        F.sum(F.when(F.col("__y") == 1, F.col("__r"))).alias("rp"),
        F.sum(F.when(F.col("__y") == 1, 1).otherwise(0)).alias("np"),
        F.sum(F.when(F.col("__y") == 0, 1).otherwise(0)).alias("nn"),
    ).first()
    if not row.np or not row.nn:
        return float("nan")
    u = row.rp - row.np * (row.np + 1) / 2.0
    return float(u / (row.np * row.nn))


def choose_threshold(
    scored: DataFrame,
    target_precision: float,
    label_col: str = "label",
    score_col: str = "quality_prob",
) -> dict:
    """Calibrate the keep/drop cutoff: the SMALLEST score threshold
    whose precision (P[label=1 | score >= t]) meets
    ``target_precision`` — i.e. maximize recall subject to the
    precision floor, the standard operating point for a corpus filter
    ("keep as much as possible while X% of what you keep is good").

    Pass a HELD-OUT scored frame — calibrating on training docs
    overstates precision (see :func:`train_calibrated_filter` for the
    leak-free split + train + calibrate composition).

    Distributed shape: group by distinct score (partial agg), one
    cumulative window ordered score-desc over the distinct-score frame
    (small by construction — it is bounded by the labeled eval set,
    like :func:`auc`), driver takes one row. Returns
    ``{"threshold", "precision", "recall", "kept_frac"}``.

    Raises ValueError when no cutoff reaches the target (a filter that
    cannot be made precise enough should fail loudly, not silently
    keep everything)."""
    from pyspark.sql import Window

    per_score = scored.groupBy(score_col).agg(
        F.sum(F.when(F.col(label_col) == 1, 1).otherwise(0)).alias("__p"),
        F.sum(F.when(F.col(label_col) == 0, 1).otherwise(0)).alias("__n"),
    )
    w = Window.orderBy(F.col(score_col).desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per_score.select(
        F.col(score_col),
        F.sum("__p").over(w).alias("tp"),
        F.sum("__n").over(w).alias("fp"),
    )
    totals = scored.agg(
        F.sum(F.when(F.col(label_col) == 1, 1).otherwise(0)).alias("pos"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    best = (
        cum.filter(
            F.col("tp") / (F.col("tp") + F.col("fp")) >= target_precision
        )
        .orderBy(F.col(score_col).asc())
        .first()
    )
    if best is None:
        raise ValueError(
            f"no threshold reaches precision {target_precision} on the "
            "held-out frame"
        )
    return {
        "threshold": float(best[score_col]),
        "precision": float(best["tp"] / (best["tp"] + best["fp"])),
        "recall": float(best["tp"] / totals["pos"]) if totals["pos"] else float("nan"),
        "kept_frac": float((best["tp"] + best["fp"]) / totals["n"]),
    }


def train_calibrated_filter(
    labeled: DataFrame,
    target_precision: float,
    text_col: str = "text",
    label_col: str = "label",
    id_col: str = "doc_id",
    holdout_frac: float = 0.25,
    seed: str = "calib0",
    n_features: int = DEFAULT_FEATURES,
) -> tuple[LogisticRegressionModel, dict]:
    """Leak-free train + calibrate: deterministically hash-split the
    labeled frame (md5(seed:id) threshold — same primitive as the
    sampling module, so the split is reproducible on any cluster
    layout and no training doc can appear in the calibration half),
    fit on the train side, score the held-out side, and pick the
    cutoff with :func:`choose_threshold`.

    Returns ``(model, stats)``; apply downstream as
    ``score_quality(corpus, model).filter(F.col("quality_prob") >=
    stats["threshold"])`` — a narrow broadcast-coefficient pass."""
    from cryo_spark.operators.sampling import _bucket, _threshold

    is_holdout = _bucket(id_col, seed) < F.lit(_threshold(holdout_frac))
    train = labeled.filter(~is_holdout)
    holdout = labeled.filter(is_holdout)
    model = train_quality_classifier(
        train, text_col, label_col, n_features=n_features
    )
    scored = score_quality(holdout, model, text_col, id_col, n_features).join(
        holdout.select(id_col, label_col), id_col
    )
    stats = choose_threshold(scored, target_precision, label_col)
    return model, stats
