"""Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
arXiv:2302.03169).

Select pretraining documents from a large raw corpus so their
distribution matches a small *target* corpus (e.g. Wikipedia + books),
without training a classifier: fit two bag-of-hashed-ngrams models —
one on the target, one on the raw pool — and weight every raw document
by its log importance ratio

    log w(x) = sum over ngrams g of x:  log p_target(g) - log p_raw(g)

then resample the pool with Gumbel-top-k on the weights (a without-
replacement sample proportional to ``exp(w/T)``).

Spark-first shape, 100 TB lens:

- **Featurize**: tokens (portable-whitespace split, lowercased) plus
  word bigrams, each hashed into ``n_buckets`` (paper: 10k) buckets —
  all JVM higher-order array functions, zero Python.
- **Train**: one ``groupBy(bucket)`` per corpus; distinct keys are
  capped at ``n_buckets`` so the shuffle moves at most that many rows
  per map partition (map-side combine) and the model is plan-sized by
  construction.
- **Score**: explode ngrams → broadcast-join the ≤n_buckets ratio
  table → one ``groupBy(doc)`` sum.  Two shuffles total, no driver
  loop, total over null/empty documents.
- **Resample**: deterministic Gumbel noise from the portable hash of
  the document id (no RNG state), then ``orderBy(key).limit(n)`` —
  Spark plans TakeOrdered (per-partition top-n + merge), never a
  global sort.

The model is a plan-sized DataFrame (``bucket, log_ratio``) plus two
scalars, parquet-persistable via :func:`save_dsir` / :func:`load_dsir`.
"""

from __future__ import annotations

import json
import math
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from lsd2_spark.functions.portable_hash import WS, hash64

__all__ = [
    "featurize_buckets",
    "hashed_ngram_counts",
    "train_dsir",
    "dsir_score",
    "dsir_resample",
    "save_dsir",
    "load_dsir",
]


def _ngrams(text: Column) -> Column:
    """Lowercased unigrams + word bigrams as one string array.
    Bigrams are joined with a single space; empty tokens from leading/
    trailing whitespace are dropped first."""
    toks = F.filter(
        F.split(F.lower(F.coalesce(text, F.lit(""))), WS, -1),
        lambda t: t != "",
    )
    n = F.size(toks)
    bi = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bi)


def _bucket(ngram: Column, n_buckets: int) -> Column:
    return (hash64(ngram) % int(n_buckets)).alias("bucket")


def featurize_buckets(
    df: DataFrame, text_col: str, id_col: str, n_buckets: int = 10_000
) -> DataFrame:
    """The shared DSIR featurization: one ``(_did, bucket)`` row per
    hashed ngram INSTANCE of every document.  Every other DSIR stage
    (target counts, raw counts, scoring) is a cheap aggregation over
    this frame — compute it once, cut its lineage (``localCheckpoint``),
    and feed it to :func:`train_dsir` / :func:`dsir_score` via their
    ``buckets=`` parameters so the tokenize + portable-hash pass over
    the corpus runs ONCE instead of once per consumer (train ran it
    over both corpora and scoring again — ~3 full passes for the
    standard train-then-score composition)."""
    from lsd2_spark.operators.common import spread_partitions

    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    df = spread_partitions(df)
    return df.select(
        F.col(id_col).alias("_did"),
        F.explode(_ngrams(F.col(text_col))).alias("_ng"),
    ).select("_did", _bucket(F.col("_ng"), n_buckets))


def hashed_ngram_counts(
    df: DataFrame, text_col: str, n_buckets: int = 10_000,
    buckets: DataFrame | None = None,
) -> DataFrame:
    """Corpus-level hashed-ngram histogram: ``(bucket, n)`` with at
    most ``n_buckets`` rows.  ONE shuffle, map-side combined.
    ``buckets``: a precomputed :func:`featurize_buckets` frame for this
    corpus — skips the tokenize+hash pass (identical counts)."""
    from lsd2_spark.operators.common import spread_partitions

    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    if buckets is None:
        df = spread_partitions(df)
        buckets = df.select(
            F.explode(_ngrams(F.col(text_col))).alias("_ng")
        ).select(_bucket(F.col("_ng"), n_buckets))
    return buckets.groupBy("bucket").agg(F.count("*").alias("n"))


def train_dsir(
    target: DataFrame,
    raw: DataFrame,
    text_col: str,
    n_buckets: int = 10_000,
    smoothing: float = 1.0,
    target_buckets: DataFrame | None = None,
    raw_buckets: DataFrame | None = None,
) -> dict:
    """Fit the importance model: per hash bucket,
    ``log_ratio = log p_target(bucket) - log p_raw(bucket)`` with
    add-``smoothing`` estimates.  Returns
    ``{"ratios": DataFrame(bucket, log_ratio), "n_buckets", "default"}``
    where ``default`` is the log-ratio of a bucket unseen in BOTH
    corpora (pure smoothing mass) — applied at scoring time to ngrams
    that miss the ratio table.

    ``target_buckets``/``raw_buckets``: precomputed
    :func:`featurize_buckets` frames for the two corpora — skip the
    per-corpus tokenize+hash passes (counts, and therefore the model,
    are identical; see featurize_buckets for when this pays)."""
    if smoothing <= 0.0:
        raise ValueError(f"smoothing must be > 0, got {smoothing}")
    tc = hashed_ngram_counts(target, text_col, n_buckets, buckets=target_buckets)
    rc = hashed_ngram_counts(raw, text_col, n_buckets, buckets=raw_buckets)
    s, b = float(smoothing), int(n_buckets)
    joined = tc.withColumnRenamed("n", "n_t").join(
        rc.withColumnRenamed("n", "n_r"), on="bucket", how="full"
    )
    # ONE collect replaces the former three (two total-count aggs +
    # the ratio collect — each a full job over the same two corpus
    # histograms, pure scheduler latency): the full join carries every
    # non-empty bucket of BOTH corpora, so the totals are exact integer
    # sums over the collected rows, and the per-bucket log() values are
    # still computed JVM-side.  The final log-ratio arithmetic
    # (((log_t - denom_t) - log_r) + denom_r) runs driver-side over the
    # SAME IEEE doubles in the SAME left-to-right order the former
    # Spark expression used, and denom_t/denom_r were already Python
    # math.log values — bit-identical model, three jobs -> one.
    rows = joined.select(
        "bucket",
        F.coalesce(F.col("n_t"), F.lit(0)).alias("n_t"),
        F.coalesce(F.col("n_r"), F.lit(0)).alias("n_r"),
        F.log(F.coalesce(F.col("n_t"), F.lit(0)) + s).alias("log_t"),
        F.log(F.coalesce(F.col("n_r"), F.lit(0)) + s).alias("log_r"),
    ).collect()
    tot_t = sum(r["n_t"] for r in rows)
    tot_r = sum(r["n_r"] for r in rows)
    denom_t = math.log(tot_t + s * b)
    denom_r = math.log(tot_r + s * b)
    # Materialize: the table is plan-sized (<= n_buckets rows) but its
    # LINEAGE is two full corpus scans — without this, every scoring
    # action would re-read both corpora.
    spark = target.sparkSession
    ratios = spark.createDataFrame(
        [
            (r["bucket"], ((r["log_t"] - denom_t) - r["log_r"]) + denom_r)
            for r in rows
        ],
        "bucket long, log_ratio double",
    )
    default = (math.log(s) - denom_t) - (math.log(s) - denom_r)
    return {"ratios": ratios, "n_buckets": b, "default": default}


def dsir_score(
    df: DataFrame,
    text_col: str,
    id_col: str,
    model: dict,
    out_col: str = "dsir_logweight",
    normalize: str = "sum",
    buckets: DataFrame | None = None,
) -> DataFrame:
    """Per-document log importance weight: the sum of the model's
    bucket log-ratios over the document's hashed ngrams.  Returns the
    input columns plus ``out_col`` and ``n_ngrams`` — total over
    null/empty documents (weight 0.0, n_ngrams 0).

    ``normalize="sum"`` is the paper's weight (they chunk the raw pool
    to uniform lengths first, so length never dominates).  Over a
    corpus of mixed lengths the sum makes long off-target documents
    outrank short on-target ones; ``normalize="mean"`` (per-ngram
    average log-ratio) is the length-robust variant for that case.

    Plan: explode → broadcast join on the ≤n_buckets ratio table →
    one groupBy(doc) — the quadratic-free scoring pass of the paper.

    ``buckets``: a precomputed :func:`featurize_buckets` frame for
    ``df`` — skips the tokenize+hash pass (identical scores).
    """
    from lsd2_spark.operators.common import spread_partitions

    if normalize not in ("sum", "mean"):
        raise ValueError(f"normalize must be 'sum' or 'mean', got {normalize!r}")
    # single-file inputs arrive as ONE partition and the broadcast join
    # preserves it — without the spread, explode+join+partial-agg (the
    # whole map side) runs in a single task.  Only the exploding
    # featurize branch needs the spread: routing the totality join
    # below through it stacked a RoundRobin exchange under the join's
    # hash exchange (the full-width frame shuffled twice), and with a
    # precomputed ``buckets`` frame the spread had no consumer at all.
    base = df
    ratios = F.broadcast(model["ratios"])
    if buckets is not None:
        ex = buckets
    else:
        df = spread_partitions(df)
        ex = df.select(
            F.col(id_col).alias("_did"),
            F.explode(_ngrams(F.col(text_col))).alias("_ng"),
        ).select("_did", _bucket(F.col("_ng"), model["n_buckets"]))
    per_doc = (
        ex.join(ratios, on="bucket", how="left")
        .groupBy("_did")
        .agg(
            F.sum(F.coalesce(F.col("log_ratio"), F.lit(model["default"]))).alias(
                out_col
            ),
            F.count("*").alias("n_ngrams"),
        )
    )
    out = base.join(per_doc, base[id_col] == per_doc["_did"], "left").drop("_did")
    out = out.withColumn(out_col, F.coalesce(F.col(out_col), F.lit(0.0))).withColumn(
        "n_ngrams", F.coalesce(F.col("n_ngrams"), F.lit(0)).cast("bigint")
    )
    if normalize == "mean":
        out = out.withColumn(
            out_col,
            F.when(F.col("n_ngrams") > 0, F.col(out_col) / F.col("n_ngrams"))
            .otherwise(F.lit(0.0)),
        )
    return out


def dsir_resample(
    df: DataFrame,
    text_col: str,
    id_col: str,
    model: dict,
    n: int,
    temperature: float = 1.0,
    normalize: str = "sum",
    buckets: DataFrame | None = None,
) -> DataFrame:
    """Gumbel-top-k importance resampling: a deterministic without-
    replacement sample of ``n`` documents with probability proportional
    to ``exp(logweight / temperature)``.  ``normalize`` is forwarded to
    :func:`dsir_score` — use ``"mean"`` when the pool has mixed
    document lengths (see there).

    The Gumbel noise ``-ln(-ln(u))`` uses ``u`` derived from the
    portable hash of the document id — reproducible across runs,
    sessions, and engines, no RNG state.  Selection is
    ``orderBy desc limit n`` (TakeOrdered — per-partition top-n, no
    global sort)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if temperature <= 0.0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    scored = dsir_score(
        df, text_col, id_col, model, normalize=normalize, buckets=buckets
    )
    u = (hash64(F.col(id_col)) % 1_000_003 + 0.5) / 1_000_003.0
    key = F.col("dsir_logweight") / float(temperature) - F.log(-F.log(u))
    return (
        scored.withColumn("_gumbel_key", key)
        .orderBy(F.desc("_gumbel_key"), F.col(id_col))
        .limit(int(n))
        .drop("_gumbel_key")
    )


def save_dsir(model: dict, path: str) -> None:
    """Persist the ratio table (parquet) + scalars (json sidecar)."""
    model["ratios"].coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "ratios")
    )
    meta = {"n_buckets": model["n_buckets"], "default": model["default"]}
    with open(os.path.join(path, "dsir.json"), "w") as f:
        json.dump(meta, f)


def load_dsir(spark: SparkSession, path: str) -> dict:
    with open(os.path.join(path, "dsir.json")) as f:
        meta = json.load(f)
    return {
        "ratios": spark.read.parquet(os.path.join(path, "ratios")),
        "n_buckets": int(meta["n_buckets"]),
        "default": float(meta["default"]),
    }
