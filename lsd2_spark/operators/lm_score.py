"""Character n-gram language-model scoring — the perplexity-proxy
quality filter (the role KenLM plays in CCNet/RedPajama-style
pipelines, built here from corpus statistics alone).

Train: one pass over a reference corpus counts character trigrams and
their bigram contexts; the conditional log-probability table
``log P(c | bigram)`` (with add-one smoothing over the observed
alphabet) is itself a DataFrame — persist it, broadcast it, reuse it.

Score: explode each document's trigrams, broadcast-join the logprob
table, average per document.  Gibberish and non-reference-language
text draw from unseen contexts and score sharply lower, so a single
threshold separates them — exactly how the real pipelines gate.

Scale shape: training is two partial-aggregable groupBys over the
reference sample (reference corpora are samples, not the full 100 TB);
scoring is explode → broadcast join → per-doc avg, shuffling only the
(doc, trigram) stream reduced by map-side combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lsd2_spark.functions.numeric import round6

__all__ = ["train_char_lm", "lm_score"]

# floor for unseen trigrams: log(1/(context_count + V)) bounded by the
# global unseen penalty so scores stay finite and comparable
_UNSEEN_PENALTY = -12.0


def _char_ngrams(text_col: str, n: int) -> "F.Column":
    """All overlapping character ``n``-grams of the lower-cased,
    whitespace-collapsed text (pure Column: substring over a start
    sequence)."""
    t = F.concat(
        F.lit(" "),  # BOS pad so leading chars get context
        F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "),
    )
    m = F.length(t) - F.lit(n - 1)
    return F.when(
        m >= 1,
        F.transform(
            F.sequence(F.lit(1), m), lambda i: F.substring(t, i, n)
        ),
    ).otherwise(F.array().cast("array<string>"))


def train_char_lm(corpus: DataFrame, text_col: str, n: int = 3) -> DataFrame:
    """Train the conditional table: one row per observed ``n``-gram
    with ``logp = ln((count + 1) / (context_count + V))``, where the
    context is the n-gram's ``n-1``-char prefix and V the distinct
    final-character alphabet (add-one smoothing)."""
    grams = corpus.select(
        F.explode(_char_ngrams(text_col, n)).alias("gram")
    )
    counts = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("c"))
    withctx = counts.withColumn("ctx", F.substring(F.col("gram"), 1, n - 1))
    ctx_tot = withctx.groupBy("ctx").agg(F.sum("c").alias("ctx_c"))
    v = counts.select(
        F.count_distinct(F.substring(F.col("gram"), n, 1)).alias("v")
    )
    return (
        withctx.join(ctx_tot, "ctx")
        .crossJoin(F.broadcast(v))
        .select(
            "gram",
            F.log((F.col("c") + 1.0) / (F.col("ctx_c") + F.col("v"))).alias(
                "logp"
            ),
        )
    )


def lm_score(
    docs: DataFrame,
    model: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
) -> DataFrame:
    """Average per-trigram log-probability of each document under the
    trained model (unseen trigrams take the fixed floor penalty).
    Higher = more like the reference corpus; threshold to filter.

    Total over the input: documents too short to produce a trigram
    (or with NULL text) keep their row with ``n_grams = 0`` and a NULL
    score, so downstream joins never silently drop them.

    Returns (id, n_grams, avg_logp)."""
    grams = docs.select(
        F.col(id_col), F.explode(_char_ngrams(text_col, n)).alias("gram")
    )
    scored = grams.join(F.broadcast(model), "gram", "left").select(
        F.col(id_col),
        F.coalesce(F.col("logp"), F.lit(_UNSEEN_PENALTY)).alias("logp"),
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        round6(F.avg("logp")).alias("avg_logp"),
    )
    return (
        docs.select(F.col(id_col))
        .join(agg, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
            F.col("avg_logp"),
        )
    )
