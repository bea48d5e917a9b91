"""Deterministic sampling and dataset splitting for training-data
pipelines.

Reproducibility is the contract: the keep/assign decision for a row
depends only on its id (portable 60-bit md5 hash → uniform in [0, 1)),
so re-runs, engine changes, and cluster re-shuffles never change the
sample — and a DuckDB oracle replays the decisions exactly.  Everything
is a pure Column expression over one scan: no shuffle, no RNG state,
trivially parallel at 100 TB.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lsd2_spark.functions.portable_hash import hash64, hash64_sql

__all__ = [
    "deterministic_uniform",
    "stratified_sample",
    "stratified_keep",
    "assign_splits",
    "weighted_sample",
    "cap_per_stratum",
    "cluster_balanced_sample",
    "temperature_mixture",
    "plan_token_mixture",
    "apply_token_mixture",
]

_DENOM = float(1 << 60)


def deterministic_uniform(id_col: Column, salt: str = "") -> Column:
    """Uniform-in-[0,1) derived from the id (+ optional salt): the same
    id always draws the same value, in any engine."""
    return hash64(F.concat(id_col.cast("string"), F.lit(salt))) / F.lit(_DENOM)


def deterministic_uniform_sql(id_expr: str, salt: str = "") -> str:
    """The DuckDB twin of :func:`deterministic_uniform`."""
    inner = f"CAST({id_expr} AS VARCHAR) || '{salt}'"
    return f"{hash64_sql(inner)} / {_DENOM!r}"


def stratified_sample(
    df: DataFrame,
    id_col: str,
    fractions: "dict[str, float] | float",
    strata_col: str | None = None,
    salt: str = "",
) -> DataFrame:
    """Reproducible (stratified) sampling: keep a row iff its
    deterministic uniform is below the stratum's fraction.

    ``fractions`` is a single float, or a {stratum value: fraction}
    dict with ``strata_col`` set (absent strata default to 0 — an
    explicit mixture spec, the "source mixing" primitive of training
    corpora)."""
    return df.filter(stratified_keep(id_col, fractions, strata_col, salt))


def stratified_keep(
    id_col: str,
    fractions: "dict[str, float] | float",
    strata_col: str | None = None,
    salt: str = "",
) -> Column:
    """The keep-decision of :func:`stratified_sample` as a boolean
    Column — usable as a flag in a wider projection without a join."""
    u = deterministic_uniform(F.col(id_col), salt)
    if isinstance(fractions, dict):
        assert strata_col is not None, "strata_col required with a fractions dict"
        frac: Column = F.lit(0.0)
        for value, f in sorted(fractions.items()):
            frac = F.when(F.col(strata_col) == value, F.lit(float(f))).otherwise(frac)
    else:
        frac = F.lit(float(fractions))
    return u < frac


def assign_splits(
    df: DataFrame,
    id_col: str,
    weights: "dict[str, float] | None" = None,
    salt: str = "",
) -> DataFrame:
    """Deterministic train/val/test assignment: partition [0, 1) into
    cumulative ranges ordered by split name and bucket each row by its
    uniform.  Weights must sum to 1 (asserted to 1e-9)."""
    weights = weights or {"test": 0.05, "train": 0.9, "val": 0.05}
    total = sum(weights.values())
    assert abs(total - 1.0) < 1e-9, f"split weights sum to {total}, not 1"
    u = deterministic_uniform(F.col(id_col), salt)
    expr: Column | None = None
    cum = 0.0
    names = sorted(weights)
    for name in names:
        cum += weights[name]
        cond = u < F.lit(cum)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    # float-roundoff guard: u exactly at the top edge lands in the last split
    return df.withColumn("split", expr.otherwise(names[-1]))


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    n: int,
    strata_col: str | None = None,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (A-Res,
    Efraimidis-Spirakis): each row draws priority ``u^(1/w)`` from its
    deterministic uniform and the top ``n`` priorities win — inclusion
    probability proportional to weight, reproducible across engines
    and re-runs (no RNG state), and SQL-replayable.

    With ``strata_col``, the top-n is PER STRATUM (e.g. n docs per
    source).  Rows with NULL/non-positive weights are excluded.

    Scale shape: the stratified form is one shuffle on the stratum key
    for the ranking window; the global form is a distributed
    TakeOrdered (per-partition partial top-n, merged on the driver
    side of the exchange — ``orderBy().limit(n)``), with the rank
    window running over only the n winners.  Adds ``priority`` and
    ``rnk``."""
    from pyspark.sql.window import Window

    u = deterministic_uniform(F.col(id_col), salt)
    w = F.col(weight_col).cast("double")
    pri = F.pow(u, F.lit(1.0) / w)
    base = df.filter(w.isNotNull() & (w > 0)).withColumn("priority", pri)
    order = [F.desc("priority"), F.col(id_col).asc()]
    if strata_col is None:
        # TakeOrderedAndProject: every partition keeps its local top-n,
        # only n rows per partition reach the merge — never a full sort
        top = base.orderBy(*order).limit(n)
        win = Window.orderBy(*order)  # over ≤ n rows
        return top.withColumn("rnk", F.row_number().over(win))
    win = Window.partitionBy(strata_col).orderBy(*order)
    return base.withColumn("rnk", F.row_number().over(win)).filter(
        F.col("rnk") <= n
    )


def cap_per_stratum(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    cap: int,
    salt: str = "",
) -> DataFrame:
    """Per-stratum quota: keep at most ``cap`` rows per stratum (e.g.
    per source/domain — the over-represented-source guard of corpus
    curation), chosen by the deterministic hash uniform so the kept set
    is reproducible across engines and re-runs.  One shuffle on the
    stratum key; adds ``kept_rank``."""
    from pyspark.sql.window import Window

    u = deterministic_uniform(F.col(id_col), salt)
    w = Window.partitionBy(strata_col).orderBy(u.asc(), F.col(id_col).asc())
    return df.withColumn("kept_rank", F.row_number().over(w)).filter(
        F.col("kept_rank") <= cap
    )


def cluster_balanced_sample(
    df: DataFrame,
    id_col: str,
    *,
    vec_col: str | None = None,
    text_col: str | None = None,
    n_clusters: int = 16,
    cap: int | None = None,
    total: int | None = None,
    n_iters: int = 2,
    embed_dim: int = 64,
    sample_stride: int = 1,
    nprobe: int | None = None,
    salt: str = "",
) -> DataFrame:
    """Topic-balanced subsampling: cluster the corpus in embedding
    space (the package's deterministic k-means) and keep a quota per
    cluster — the diversity-preserving selection step of curation
    recipes that would otherwise let the dominant topic swamp a
    uniformly-sampled corpus.

    Vectors come from ``vec_col`` (an existing ``array<float/double>``
    embedding column) or, with ``text_col``, from
    :func:`~lsd2_spark.operators.doc_embed.doc_embeddings` (hashed
    bag-of-words, ``embed_dim`` dims) computed on the fly.  Exactly one
    of the two must be given.

    Quota: ``cap`` rows per cluster, or ``total`` split evenly
    (``max(1, total // n_clusters)`` per cluster, so the real clusters
    together never exceed ``total`` when ``total >= n_clusters``;
    clusters smaller than their share under-fill, making ``total`` a
    ceiling, not a target).  Within a cluster the kept rows are chosen
    by the deterministic hash uniform (same reproducibility contract
    as the rest of this module).  Rows whose embedding is invalid
    (NULL/empty text) form their own NULL stratum, capped at the same
    quota ON TOP of the budget — filter ``cluster_id IS NOT NULL``
    when strict budget accounting matters.  The operator is total over
    real corpora either way.

    Returns the kept rows with ``cluster_id`` and ``kept_rank``.

    Scale shape: centroid build is the k-means' per-iteration
    plan-sized exchange over a strided sample; assignment is one
    broadcast Arrow pass (``nprobe`` switches it hierarchical when
    n_clusters scales with the corpus); then ONE id-equi-join to carry
    the input columns and ONE shuffle on ``cluster_id`` for the quota
    window.  Nothing all-pairs, nothing corpus-sized on the driver.
    """
    if (vec_col is None) == (text_col is None):
        raise ValueError("give exactly one of vec_col / text_col")
    if (cap is None) == (total is None):
        raise ValueError("give exactly one of cap / total")
    if cap is None:
        cap = max(1, total // n_clusters)

    from lsd2_spark.operators.similarity import kmeans_assign, kmeans_centroids

    if vec_col is None:
        from lsd2_spark.operators.doc_embed import doc_embeddings

        vecs = doc_embeddings(df, text_col, id_col, dim=embed_dim)
        vcol = "embedding"
    else:
        vecs = df.select(id_col, vec_col)
        vcol = vec_col

    cents = kmeans_centroids(
        vecs, vcol, id_col, n_lists=n_clusters,
        n_iters=n_iters, sample_stride=sample_stride,
        init_order="spread",  # one seed per separated cluster, not
        # wherever id/crawl-order locality happens to put them
    )
    assigned = kmeans_assign(vecs, vcol, id_col, cents, nprobe=nprobe)
    tagged = df.join(assigned, id_col, "left")
    return cap_per_stratum(tagged, id_col, "cluster_id", cap, salt=salt)


def temperature_mixture(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    alpha: float = 0.7,
    target_rows: int | None = None,
    salt: str = "",
    frac_round: int | None = None,
) -> "tuple[DataFrame, dict[str, float]]":
    """Temperature-scaled source mixing (the multinomial ``p_i ∝
    n_i^alpha`` re-weighting used to up-sample small sources in
    pre-training mixtures): compute per-stratum keep fractions so the
    sampled corpus approaches the alpha-tempered distribution, then
    apply the deterministic stratified sample.

    ``alpha=1`` keeps natural proportions; ``alpha→0`` approaches
    uniform across sources.  ``target_rows`` caps the expected output
    size (default: as many rows as the tempered weights allow without
    up-sampling any stratum past fraction 1.0).

    Driver work is one plan-sized groupBy-count collect (#strata
    rows); the sample itself is the zero-shuffle Column decision from
    :func:`stratified_sample`.  Returns ``(sampled_df, fractions)`` so
    the mixture spec can be logged/persisted.

    ``frac_round``: snap each fraction to ``frac_round`` decimals via
    ``floor(f * 10^k + 0.5) / 10^k`` — the exact idiom another engine
    (DuckDB, Trino) writes as ``FLOOR(f * 1e6 + 0.5) / 1e6`` — so the
    keep decisions can be replayed bit-for-bit elsewhere: last-ulp
    drift in ``pow`` and float-sum ordering in the normalizer Z can
    perturb a raw fraction by ~1e-16, and a replayed ``u < frac``
    comparison must not fork on it.  Six decimals shifts each stratum's
    expected kept count by at most n_s * 5e-7 — noise next to the
    sampling variance itself.
    """
    # NULL strata can't participate: the keep expression's equality
    # never matches NULL, so counting them would misstate the fractions
    # and undershoot the target — drop them from the math AND the output
    df = df.filter(F.col(strata_col).isNotNull())
    counts = {
        r[strata_col]: int(r["n"])
        for r in df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    if not counts:
        return df, {}
    weights = {s: n**alpha for s, n in counts.items()}
    z = sum(weights.values())
    # expected rows per stratum = target * w_i/Z, capped at the stratum
    # size; without a target, scale so the most-constrained stratum
    # just reaches fraction 1.0 (pure down-sampling elsewhere)
    if target_rows is None:
        target_rows = int(min(counts[s] * z / w for s, w in weights.items()))
    fractions = {
        s: min(1.0, (target_rows * weights[s] / z) / counts[s]) for s in counts
    }
    if frac_round is not None:
        q = 10.0 ** frac_round
        fractions = {s: math.floor(f * q + 0.5) / q for s, f in fractions.items()}
    return (
        stratified_sample(df, id_col, fractions, strata_col=strata_col, salt=salt),
        fractions,
    )


def plan_token_mixture(
    df: DataFrame,
    strata_col: str,
    token_count: Column,
    budget_tokens: int,
    alpha: float = 0.7,
    max_epochs: float = 4.0,
) -> dict:
    """Token-budget mixture planning — the pre-training question
    "how do I fill a B-token budget from these sources?" (multinomial
    ``t_i ∝ n_i^alpha``, each source capped at ``max_epochs`` passes so
    small sources are up-sampled but never over-repeated; the cap
    discipline follows the public data-constrained-scaling guidance of
    Muennighoff et al. 2023, ~4 epochs before repetition stops helping).

    Water-filling: allocate the budget by tempered weight; sources
    hitting their epoch cap are frozen at it and the remainder is
    re-allocated over the uncapped pool (repeats <= #sources times,
    driver-side over #sources numbers).  Returns per-source
    ``{"tokens": n_i, "target_tokens": t_i, "epochs": t_i/n_i}`` plus
    ``"_total": {...}``; driver work is ONE plan-sized aggregate
    (#sources rows), the corpus is never collected.
    """
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    if max_epochs <= 0:
        raise ValueError("max_epochs must be positive")
    rows = (
        df.filter(F.col(strata_col).isNotNull())
        .groupBy(strata_col)
        .agg(F.sum(token_count).alias("_tok"))
        .collect()
    )
    tokens = {r[strata_col]: int(r["_tok"]) for r in rows if r["_tok"]}
    if not tokens:
        return {"_total": {"budget_tokens": int(budget_tokens), "planned_tokens": 0}}

    alloc: dict = {}
    pool = dict(tokens)
    remaining = float(budget_tokens)
    while pool and remaining > 0:
        weights = {s: n**alpha for s, n in pool.items()}
        z = sum(weights.values())
        capped = {
            s for s in pool
            if remaining * weights[s] / z >= max_epochs * pool[s]
        }
        if not capped:
            for s in pool:
                alloc[s] = remaining * weights[s] / z
            remaining = 0.0
            break
        for s in capped:
            alloc[s] = max_epochs * pool[s]
            remaining -= alloc[s]
            del pool[s]
    plan = {
        s: {
            "tokens": tokens[s],
            "target_tokens": int(alloc.get(s, 0.0)),
            "epochs": alloc.get(s, 0.0) / tokens[s],
        }
        for s in tokens
    }
    plan["_total"] = {
        "budget_tokens": int(budget_tokens),
        "planned_tokens": int(sum(alloc.values())),
        "alpha": alpha,
        "max_epochs": max_epochs,
    }
    return plan


def apply_token_mixture(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    plan: dict,
    salt: str = "",
) -> DataFrame:
    """Materialize a :func:`plan_token_mixture` plan: every kept row
    comes back once per epoch with an ``epoch`` column (0-based) so
    downstream packing/shuffling can distinguish copies.

    Per row in source i with epochs e_i: floor(e_i) guaranteed copies
    plus one more iff the row's deterministic uniform (id + salt) is
    below frac(e_i) — expected per-source token mass = e_i · n_i,
    reproducible across engines and re-runs.  Pure Column work: one
    small CASE over sources + one explode; zero shuffle, no RNG
    state."""
    sources = [s for s in plan if s != "_total"]
    if not sources:
        return df.limit(0).withColumn("epoch", F.lit(0))
    e = F.lit(None).cast("double")
    for s in sources:
        e = F.when(F.col(strata_col) == s, F.lit(float(plan[s]["epochs"]))).otherwise(e)
    u = deterministic_uniform(F.col(id_col), salt)
    n_copies = F.floor(e).cast("int") + (u < (e - F.floor(e))).cast("int")
    return (
        df.withColumn("_e", e)
        .filter(F.col("_e").isNotNull())
        .withColumn("_n", n_copies)
        .filter(F.col("_n") > 0)
        .withColumn("epoch", F.explode(F.sequence(F.lit(0), F.col("_n") - 1)))
        .drop("_e", "_n")
    )
