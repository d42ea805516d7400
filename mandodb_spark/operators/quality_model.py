"""Trained document-quality classifier — the CCNet/fastText-style filter
that complements the heuristic gates in :mod:`operators.text`
(``quality_score`` is rule-based; this learns the boundary from weak
labels such as "looks like curated reference text" vs "looks like raw
crawl").

Spark-first shape: feature extraction is hashed bag-of-words + bigrams
(``HashingTF`` — fixed-width, vocabulary-free, exactly fastText's hashing
trick) and training is ``pyspark.ml`` logistic regression (JVM-side
distributed L-BFGS over the executors — the driver never sees rows).
Scoring is a pure model transform: one map-side projection per document,
no shuffle, Arrow-free.

At 100 TB: training normally runs on a SAMPLE (weak labels are cheap to
over-collect; a few million rows saturate a linear model — pass
``docs.sample(...)``), while scoring streams over the full corpus
map-side.  The model is a tiny coefficient vector (``num_features``
doubles) broadcast to executors; persist/load via ``save_model`` /
``load_model`` for reuse across jobs, exactly like the IVF codebooks.

Weak-label bootstrap: ``weak_labels_from_heuristics`` derives a label
column from the existing heuristic gates (top/bottom quantiles of the
rule-based score), the standard trick when no human labels exist — the
classifier then generalizes past the rules' blind spots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pipeline(text_col: str, label_col: str, num_features: int,
              reg_param: float):
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, NGram, RegexTokenizer, VectorAssembler

    tok = RegexTokenizer(inputCol=text_col, outputCol="__words",
                         pattern=r"[^\w]+", minTokenLength=1,
                         toLowercase=True)
    bi = NGram(n=2, inputCol="__words", outputCol="__bigrams")
    tf1 = HashingTF(inputCol="__words", outputCol="__f1",
                    numFeatures=num_features)
    tf2 = HashingTF(inputCol="__bigrams", outputCol="__f2",
                    numFeatures=num_features)
    feats = VectorAssembler(inputCols=["__f1", "__f2"], outputCol="__feats")
    lr = LogisticRegression(featuresCol="__feats", labelCol=label_col,
                            regParam=reg_param, maxIter=50,
                            probabilityCol="__prob",
                            rawPredictionCol="__raw",
                            predictionCol="__pred")
    return Pipeline(stages=[tok, bi, tf1, tf2, feats, lr])


def train_quality_classifier(docs: DataFrame, text_col: str = "text",
                             label_col: str = "label",
                             num_features: int = 1 << 16,
                             reg_param: float = 1e-3):
    """Fit the hashed-ngram logistic model on ``docs`` (``label_col``:
    1.0 = keep-quality, 0.0 = reject).  Returns a fitted PipelineModel.
    Training is one JVM L-BFGS run over the executors; pass a sample at
    corpus scale."""
    return _pipeline(text_col, label_col, num_features, reg_param).fit(docs)


def score_quality(docs: DataFrame, model, out_col: str = "quality_prob") -> DataFrame:
    """Score documents: P(quality) per row.  Map-side only — the model's
    coefficients broadcast once; no shuffle, no Python row loop."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(docs)
    return scored.withColumn(
        out_col, vector_to_array(F.col("__prob")).getItem(1)
    ).drop("__words", "__bigrams", "__f1", "__f2", "__feats", "__prob",
           "__raw", "__pred")


def weak_labels_from_heuristics(docs: DataFrame, text_col: str = "text",
                                lo_q: float = 0.3, hi_q: float = 0.7) -> DataFrame:
    """Bootstrap (doc, label) training rows from the rule-based
    ``text.quality_score``: rows in the top ``1-hi_q`` quantile get label
    1.0, the bottom ``lo_q`` quantile 0.0, the ambiguous middle is
    DROPPED (standard weak-supervision margin).  The two cutoffs are one
    approxQuantile on the driver (two doubles), the labeling itself is a
    map-side filter."""
    from . import text as T

    scored = docs.withColumn("__h", T.quality_score(F.col(text_col)))
    lo, hi = scored.approxQuantile("__h", [lo_q, hi_q], 0.001)
    return (
        scored.filter((F.col("__h") <= lo) | (F.col("__h") >= hi))
        .withColumn("label",
                    F.when(F.col("__h") >= hi, 1.0).otherwise(0.0))
        .drop("__h")
    )


def hash_split(df: DataFrame, key_col: str, test_frac: float = 0.2,
               salt: str = "qsplit") -> tuple[DataFrame, DataFrame]:
    """Deterministic (train, test) split keyed on row IDENTITY: a row
    routes by ``xxhash64(salt + key)``, so the assignment is stable
    across runs, partitionings, and cluster sizes — unlike
    ``randomSplit``, whose per-row draw depends on partition layout.
    The same discipline as the engine's other hash-deterministic
    sampling (``operators.sampling``); no shuffle, two scan-side
    filters."""
    if not (0.0 < test_frac < 1.0):
        raise ValueError(f"test_frac must be in (0, 1), got {test_frac}")
    h = F.pmod(
        F.xxhash64(F.concat_ws("\x1f", F.lit(salt),
                               F.col(key_col).cast("string"))),
        F.lit(10_000))
    cut = int(test_frac * 10_000)
    return df.filter(h >= cut), df.filter(h < cut)


def evaluate_quality_classifier(test_docs: DataFrame, model,
                                label_col: str = "label",
                                k: int = 100) -> dict:
    """Held-out evaluation of a trained quality model — the curation
    gate's quality as a NUMBER per run, not an assumption (r8 verdict
    #7).  Returns ``{auc, accuracy, precision_at_k, base_rate, n, k}``.

    Distributed shape: scoring is the same map-side transform as
    :func:`score_quality`; AUC is ``BinaryClassificationEvaluator`` over
    the score column (JVM-side rank statistic); accuracy/base-rate is one
    aggregate; precision@k is a ``TakeOrdered`` of k rows (never a full
    sort).  Deterministic for a fixed (model, test set): every metric is
    a pure function of the scored rows."""
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    scored = score_quality(test_docs, model, out_col="__qp").select(
        F.col("__qp").cast("double").alias("__qp"),
        F.col(label_col).cast("double").alias("__y"))
    auc = float(BinaryClassificationEvaluator(
        rawPredictionCol="__qp", labelCol="__y",
        metricName="areaUnderROC").evaluate(scored))
    row = scored.agg(
        F.avg(F.when((F.col("__qp") >= 0.5) == (F.col("__y") >= 0.5), 1.0)
              .otherwise(0.0)).alias("acc"),
        F.avg("__y").alias("base"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    top = scored.orderBy(F.col("__qp").desc()).limit(int(k))
    p_at_k = top.agg(F.avg("__y")).collect()[0][0]
    return {
        "auc": auc,
        "accuracy": float(row["acc"]),
        "precision_at_k": float(p_at_k) if p_at_k is not None else 0.0,
        "base_rate": float(row["base"]),
        "n": int(row["n"]),
        "k": int(k),
    }


def save_model(model, path: str) -> None:
    model.write().overwrite().save(path)


def load_model(spark, path: str):
    from pyspark.ml import PipelineModel

    return PipelineModel.load(path)
