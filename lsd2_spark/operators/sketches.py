"""Distinct-count sketches for 100 TB-scale cardinality estimation.

KMV (k-minimum-values, "bottom-k") sketch: hash every value with the
portable 60-bit md5 hash, keep the k smallest DISTINCT hashes per
group, and estimate the cardinality from the k-th smallest normalized
hash as ``(k-1) / u_k``.  Groups with fewer than k distinct hashes are
EXACT (the estimate is just the count).

Why KMV and not HyperLogLog here: Spark's native
``approx_count_distinct`` (HLL++) is the right call when engine
portability doesn't matter, but its estimate is implementation-
specific and cannot be replayed by another engine.  KMV with a
portable hash is fully deterministic — the DuckDB oracle reproduces
the exact same sketch and estimate, so the gate hash-matches —
while keeping the properties that matter at scale: bounded size (k
values per group), mergeable (bottom-k of bottom-ks is the global
bottom-k), one-pass.

Distributed shape: a shuffle-free ``mapInPandas`` partial pass keeps
at most k distinct hashes per (group, input partition), so the only
shuffle moves ≤ k rows per group per partition — never the raw value
stream.  The partial step is lossless for the final sketch.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lsd2_spark.functions.portable_hash import hash64

__all__ = [
    "kmv_distinct",
    "kmv_sketch",
    "kmv_set_stats",
    "corpus_quantiles",
    "profile_table",
]

_TWO60 = float(1 << 60)


def _bottom_k_rows(
    df: DataFrame, col: str, group_cols: list[str], k: int
) -> DataFrame:
    """The global per-group bottom-k DISTINCT hash rows (``group_cols +
    _h``) — the KMV sketch in row form, shared by the estimate and the
    sketch-table builders."""
    assert k >= 2
    proj = df.select(*group_cols, hash64(F.col(col)).alias("_h")).filter(
        F.col("_h").isNotNull()
    )
    schema = proj.schema

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-input-partition bottom-k of DISTINCT hashes per group —
        # state across Arrow batches, emitted once at iterator end
        acc: dict[tuple, np.ndarray] = {}
        for pdf in batches:
            for key, grp in pdf.groupby(group_cols, dropna=False, sort=False):
                key = key if isinstance(key, tuple) else (key,)
                hs = grp["_h"].to_numpy(dtype=np.int64)
                prev = acc.get(key)
                merged = np.unique(hs if prev is None else np.concatenate([prev, hs]))
                acc[key] = merged[:k]  # np.unique sorts ascending
        if acc:
            keys = list(acc.keys())
            counts = [len(acc[kk]) for kk in keys]
            out = {
                c: np.repeat([kk[i] for kk in keys], counts)
                for i, c in enumerate(group_cols)
            }
            out["_h"] = np.concatenate([acc[kk] for kk in keys])
            yield pd.DataFrame(out)

    partials = proj.mapInPandas(partial, schema)
    # global merge: bottom-k of the per-partition bottom-ks (≤ k rows
    # per group per partition enter this shuffle)
    w = Window.partitionBy(*group_cols).orderBy(F.col("_h").asc())
    return (
        partials.dropDuplicates([*group_cols, "_h"])
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k)
        .drop("_r")
    )


def kmv_distinct(
    df: DataFrame, col: str, group_cols: list[str], k: int = 64
) -> DataFrame:
    """Per-group distinct-count estimate via a deterministic KMV
    sketch over ``col``.  Returns ``group_cols + (n_kept, est_distinct)``
    where ``n_kept`` is the sketch occupancy (= exact distinct count
    when below k) and ``est_distinct`` the cardinality estimate."""
    kept = _bottom_k_rows(df, col, group_cols, k)
    agg = kept.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_kept"), F.max("_h").alias("_hk")
    )
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(_TWO60) / F.col("_hk").cast("double")
    )
    return agg.select(*group_cols, "n_kept", est.alias("est_distinct"))


def kmv_sketch(
    df: DataFrame, col: str, group_cols: list[str], k: int = 64
) -> DataFrame:
    """Materialize the per-group KMV sketch itself: ``group_cols +
    sketch`` where ``sketch`` is the ascending array of the group's
    bottom-k distinct hashes (``size(sketch) < k`` means the group is
    EXACT).  Sketch tables are tiny (k longs per group), persistable,
    and mergeable — the input to :func:`kmv_set_stats`."""
    kept = _bottom_k_rows(df, col, group_cols, k)
    return kept.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list("_h")).alias("sketch")
    )


def _est_from(sketch, k: int):
    occ = F.size(sketch)
    return F.when(occ < k, occ.cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(_TWO60) / F.element_at(sketch, k).cast("double")
    )


def kmv_set_stats(
    left: DataFrame,
    right: DataFrame,
    group_cols: list[str],
    k: int = 64,
) -> DataFrame:
    """Cross-corpus set-cardinality estimates from two KMV sketch
    tables (both built by :func:`kmv_sketch` with the SAME ``k``):
    per group, ``est_left``, ``est_right``, ``est_union``,
    ``est_intersection``, and ``jaccard_est``.

    The estimator is the standard KMV set algebra: the union sketch is
    the bottom-k of the merged hash sets (bottom-k of bottom-ks — the
    sketch's mergeability), and with ``L`` = union sketch,
    ``J = |L ∩ A ∩ B| / |L|`` estimates Jaccard, so
    ``est_intersection = J · est_union``.  When BOTH groups are below
    occupancy their sketches are the complete hash sets, so every
    number is EXACT — including the union and intersection, which are
    then computed from the full merged sets rather than the k-sliced
    sketch (a union of two complete 40-element sets is its true size,
    not a bottom-64 estimate).

    100 TB shape: the heavy lifting happened in ``kmv_sketch`` (one
    bounded-shuffle pass per corpus); this join moves only k-long
    arrays per group — compare two petabyte corpora with a
    kilobyte-per-group exchange.  Groups present in one corpus only
    get an empty sketch on the other side (union = that side,
    intersection = 0).
    """
    if not group_cols:
        raise ValueError(
            "group_cols must be non-empty; for a whole-corpus comparison "
            "add a constant group column before kmv_sketch"
        )
    empty = F.array().cast("array<long>")
    a = left.select(*group_cols, F.col("sketch").alias("_a"))
    b = right.select(*group_cols, F.col("sketch").alias("_b"))
    j = (
        a.join(b, on=group_cols, how="full")
        .withColumn("_a", F.coalesce(F.col("_a"), empty))
        .withColumn("_b", F.coalesce(F.col("_b"), empty))
    )
    both_exact = (F.size(F.col("_a")) < k) & (F.size(F.col("_b")) < k)
    merged = F.array_sort(F.array_union(F.col("_a"), F.col("_b")))
    # exact path: both sketches are the complete hash sets — never
    # slice, the merged set IS the union
    j = j.withColumn("_u", F.when(both_exact, merged).otherwise(F.slice(merged, 1, k)))
    common_in_u = F.size(
        F.array_intersect(F.col("_u"), F.array_intersect(F.col("_a"), F.col("_b")))
    )
    occ_u = F.size(F.col("_u"))
    jaccard = F.when(
        occ_u > 0, F.try_divide(common_in_u.cast("double"), occ_u)
    ).otherwise(F.lit(0.0))
    est_union = F.when(both_exact, occ_u.cast("double")).otherwise(
        _est_from(F.col("_u"), k)
    )
    return j.select(
        *group_cols,
        _est_from(F.col("_a"), k).alias("est_left"),
        _est_from(F.col("_b"), k).alias("est_right"),
        est_union.alias("est_union"),
        (jaccard * est_union).alias("est_intersection"),
        jaccard.alias("jaccard_est"),
    )


def corpus_quantiles(
    df: DataFrame,
    col: str,
    group_cols: list[str] | None = None,
    probs: list[float] = (0.5, 0.9, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group approximate quantiles of a numeric column — the
    "what's the p50/p99 document length of this corpus slice" statistic
    an LLM-data pipeline computes before setting filter thresholds.

    Deliberately NOT a hand-rolled sketch: Spark's native
    ``percentile_approx`` is a JVM-side Greenwald-Khanna sketch with
    map-side partial aggregation and a rank-error bound of
    ``1/accuracy`` — at 100 TB the shuffle moves one bounded sketch
    per group per partition, never the value stream.  (Contrast KMV
    above, which is hand-rolled only because the estimate must be
    engine-portable for the oracle gate; quantile estimates are
    checked by rank-error bound instead.)
    """
    group_cols = list(group_cols or [])
    agg = df.groupBy(*group_cols) if group_cols else df.groupBy()
    out = agg.agg(
        F.count(F.col(col)).alias("n"),
        F.percentile_approx(
            F.col(col), F.array(*[F.lit(p) for p in probs]), accuracy
        ).alias("_q"),
    )
    return out.select(
        *group_cols,
        "n",
        *[
            F.col("_q")[i].alias("p" + format(p * 100, "g").replace(".", "_"))
            for i, p in enumerate(probs)
        ],
    )


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One-pass data profile: per column, the null fraction, an
    approximate distinct count (native HLL++ — this is a diagnostic,
    not an oracle-gated value), and min/max rendered as strings —
    the "what is actually in this table" report run before designing
    filters for a new corpus drop.

    ONE aggregation job total: all columns' statistics are computed in
    a single partial-aggregable pass (no per-column jobs), then
    unpivoted driver-side from the single result row.  At 100 TB the
    shuffle carries one sketch+4 scalars per column per partition.
    """
    cols = columns or df.columns
    types = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        col = F.col(c)
        # maps are not orderable in Spark — profile them without min/max
        ordered = not types[c].startswith("map<")
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"_nn_{c}"),
            F.approx_count_distinct(col).alias(f"_d_{c}"),
            (F.min(col).cast("string") if ordered else F.lit(None).cast("string")).alias(f"_mn_{c}"),
            (F.max(col).cast("string") if ordered else F.lit(None).cast("string")).alias(f"_mx_{c}"),
        ]
    row = df.agg(*aggs).collect()[0]
    n = row["_n"] or 0
    spark = df.sparkSession
    out = [
        (
            c,
            types[c],
            float(row[f"_nn_{c}"] / n) if n else 0.0,
            int(row[f"_d_{c}"]),
            row[f"_mn_{c}"],
            row[f"_mx_{c}"],
        )
        for c in cols
    ]
    return spark.createDataFrame(
        out,
        "column string, dtype string, null_frac double, "
        "approx_distinct long, min string, max string",
    )
