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


def save_model(model, path: str) -> None:
    model.write().overwrite().save(path)


def load_model(spark, path: str):
    from pyspark.ml import PipelineModel

    return PipelineModel.load(path)
