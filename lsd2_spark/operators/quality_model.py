"""Model-based document quality filtering (CCNet / GPT-3-style).

The heuristic quality signals (``text_analysis.quality_score``,
``lm_score``) are rule-based; the classic large-corpus filter is a
LINEAR classifier over hashed bag-of-words features trained to
separate a trusted reference corpus (books, wiki) from random web
text, then applied as a per-document keep probability (GPT-3 appendix
A; CCNet; fastText-style supervised linear model).

Spark-first: tokenization, feature hashing, and logistic regression
all run JVM-side through ``pyspark.ml`` (HashingTF → LogisticRegression
— distributed L-BFGS over partial gradients, the textbook data-parallel
shape).  Scoring is one ml-pipeline transform: a projection per row, no
shuffle, no Python in the hot path.

At 100 TB: training reads only the (small) labeled sample; scoring is
embarrassingly parallel and composes with every other curation pass in
one projection chain.  The fitted model is ~2^18 doubles (~2 MB) —
broadcast once.  ``save``/``load`` use Spark ML's native persistence,
engine-neutral parquet + JSON metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lsd2_spark.functions.portable_hash import WS

__all__ = [
    "train_quality_model",
    "score_quality",
    "save_quality_model",
    "load_quality_model",
]

_N_FEATURES = 1 << 18


def _featurizer(text_col: str):
    from pyspark.ml.feature import HashingTF, RegexTokenizer

    tok = RegexTokenizer(
        inputCol=text_col, outputCol="_qm_tokens", pattern=WS, toLowercase=True
    )
    tf = HashingTF(
        inputCol="_qm_tokens", outputCol="_qm_features", numFeatures=_N_FEATURES
    )
    return tok, tf


def train_quality_model(
    positive: DataFrame,
    negative: DataFrame,
    text_col: str = "text",
    reg_param: float = 1e-4,
    max_iter: int = 50,
):
    """Fit the linear quality model: ``positive`` = trusted reference
    docs, ``negative`` = random corpus docs.  Returns a fitted
    ``pyspark.ml.PipelineModel`` (tokenize → hash → logistic
    regression).  NULL-text rows are dropped from TRAINING only
    (scoring stays total — see :func:`score_quality`)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression

    pos = positive.select(F.col(text_col)).filter(F.col(text_col).isNotNull())
    neg = negative.select(F.col(text_col)).filter(F.col(text_col).isNotNull())
    train = pos.withColumn("_qm_label", F.lit(1.0)).unionByName(
        neg.withColumn("_qm_label", F.lit(0.0))
    )
    tok, tf = _featurizer(text_col)
    lr = LogisticRegression(
        featuresCol="_qm_features",
        labelCol="_qm_label",
        regParam=reg_param,
        maxIter=max_iter,
    )
    return Pipeline(stages=[tok, tf, lr]).fit(train)


def score_quality(
    df: DataFrame,
    model,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document quality probability in [0, 1] (P(reference-like)).

    Total: NULL-text rows come back with ``quality_prob`` NULL instead
    of being dropped.  One projection chain — tokenizer, hashed
    features, and the broadcast coefficient vector all evaluate
    JVM-side; no shuffle."""
    from pyspark.ml.functions import vector_to_array

    # the ml transform keeps its input columns, so the NULL marker rides
    # through it — no rejoin, the whole score is one projection chain
    scored = model.transform(
        df.select(
            F.col(id_col),
            F.col(text_col).isNull().alias("_qm_null"),
            F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
        )
    )
    prob = vector_to_array(F.col("probability")).getItem(1)
    return scored.select(
        F.col(id_col),
        F.when(~F.col("_qm_null"), prob).alias("quality_prob"),
    )


def save_quality_model(model, path: str) -> None:
    model.write().overwrite().save(path)


def load_quality_model(spark: SparkSession, path: str):
    from pyspark.ml import PipelineModel

    return PipelineModel.load(path)
