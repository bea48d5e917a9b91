"""Deduplication operators for large-scale document corpora.

Beyond the reference's surface (it has no text operators) — these are
the training-data-pipeline components, designed Spark-first:

- **exact**: md5-hash groupBy; one shuffle on the hash.
- **minhash + LSH**: distinct-token shingles → k affine permutations of
  a portable 60-bit hash → banded signatures → candidate pairs via a
  self-equi-join on (band, band-hash).  All expressed with built-in
  higher-order array functions (``transform``/``aggregate``) — no
  Python in the hot path.
- **simhash**: 64-bit sign-aggregated token-hash fingerprint, via a
  single explode + groupBy with 64 conditional sums.
- **n-gram jaccard**: exact character-shingle overlap for candidate
  pairs (bounded by a grouping key to avoid the quadratic blowup).

At 100 TB: every operator is shuffle-bounded by its key (hash, band
bucket, group key); none collects rows to the driver.  LSH bands
replace the O(n²) pair space with bucket-local joins; AQE handles
bucket skew (a hot band bucket = near-duplicate cluster).
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lsd2_spark.functions.numeric import round6
from lsd2_spark.operators.common import cut_lineage, spread_partitions
from lsd2_spark.functions.portable_hash import MINHASH_PERMS, MOD, hash64, WS

log = logging.getLogger(__name__)

__all__ = [
    "exact_dedup",
    "ngram_pair_count_estimate",
    "tokens_col",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "normalize_text_col",
    "normalized_dedup",
    "hamming_band_candidates",
    "hamming_neardup_pairs",
    "connected_components",
    "dedup_clusters",
    "simhash",
    "ngram_jaccard_pairs",
]


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-row exact-duplicate annotation: content hash, the canonical
    (minimum) id holding that content, and whether this row is it.
    ``filter(is_canonical)`` is the deduplicated corpus."""
    h = F.md5(F.col(text_col).cast("string")).alias("text_hash")
    w = Window.partitionBy("text_hash")
    return (
        df.select(F.col(id_col), h)
        .withColumn("canonical_id", F.min(id_col).over(w))
        .withColumn("is_canonical", (F.col(id_col) == F.col("canonical_id")).cast("int"))
    )


def tokens_col(text: Column) -> Column:
    """Distinct whitespace tokens (shingle set for minhash/simhash)."""
    return F.array_distinct(F.split(text, WS))


def _token_hashes(text: Column) -> Column:
    # portable per-token 60-bit hash, then reduce mod MOD once
    return F.transform(
        tokens_col(text),
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long") % MOD,
    )


def minhash_signatures(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """k-permutation minhash signature per document (k = len(MINHASH_PERMS)).

    sig_i = min over distinct tokens of (a_i * h(token) + b_i) mod MOD.
    """
    th = _token_hashes(F.col(text_col)).alias("_th")

    def perm(a: int, b: int):
        return lambda h: (h * a + b) % MOD

    # ONE projection for all k signature rows: the former per-column
    # withColumn loop re-analyzed the whole plan k times (driver-side
    # O(k·plan) latency per call — guide §7.3 planning cost); the
    # expressions and output columns are identical
    return df.select(F.col(id_col), th).select(
        F.col(id_col),
        *[
            F.array_min(F.transform(F.col("_th"), perm(a, b))).alias(f"mh{i}")
            for i, (a, b) in enumerate(MINHASH_PERMS)
        ],
    )


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bands: int = 4,
    cut_signatures: bool = False,
) -> DataFrame:
    """Near-duplicate candidate pairs: documents sharing any minhash
    band bucket, with the estimated jaccard (signature agreement rate).

    Band buckets turn the O(n²) pair space into per-bucket equi-joins.

    ``cut_signatures=True`` materializes the per-document signature
    frame (``cut_lineage``) before the banded self-join, so the
    md5-per-token minhash pass runs ONCE instead of once per consumer
    of the returned frame times both self-join sides — the signature
    frame is one narrow row per document (k ints), so the cut is
    corpus-linear and tiny, unlike materializing the near-quadratic
    candidate set (measured a loss).  The cut only materializes; row
    content and therefore results are unchanged.
    """
    k = len(MINHASH_PERMS)
    if bands < 1:
        # a negative divisor of k would pass the modulo check below and
        # silently emit zero bands (= no candidate pairs at all)
        raise ValueError(f"bands must be >= 1, got {bands}")
    if k % bands:
        raise ValueError(
            f"bands={bands} must divide the signature length k={k}; "
            "a non-dividing band count would silently drop trailing rows"
        )
    rows_per_band = k // bands
    if rows_per_band > 2:
        # bucket packing is expr*MOD + p per extra row; MOD^2 < 2^40 fits
        # int64 for at most 2 rows/band — beyond that the packing overflows
        # long and scrambles buckets
        raise ValueError(
            f"bands={bands} gives {rows_per_band} rows/band; bucket packing "
            f"fits int64 only for <=2 rows/band (use bands >= {(k + 1) // 2})"
        )
    sig = minhash_signatures(spread_partitions(df), text_col, id_col)
    if cut_signatures:
        # localCheckpoint/checkpoint preserves the round-robin spread
        # partitioning, so the self-join's stream side keeps emitting
        # pairs evenly (the bucket-key repartition alternative clusters
        # mega-buckets onto straggler tasks — see the NOTE below)
        sig = cut_lineage(sig)

    def bucket_of(prefix: str, b: int):
        parts = [
            F.col(f"{prefix}mh{i}")
            for i in range(b * rows_per_band, (b + 1) * rows_per_band)
        ]
        expr = parts[0]
        for p in parts[1:]:
            expr = expr * MOD + p  # fits: MOD² < 2^40
        return expr

    band_cols = [
        F.struct(F.lit(b).alias("band"), bucket_of("", b).alias("bucket"))
        for b in range(bands)
    ]
    # signatures ride the band rows through ONE shuffle; measured faster
    # than a narrow pair join + signature re-attach at both toy and
    # sf0.1 scale (the extra 16 ints per row are cheaper than two more
    # exchanges over the near-quadratic pair set)
    tagged = sig.withColumn("_band", F.explode(F.array(*band_cols))).select(
        F.col(id_col), *[f"mh{i}" for i in range(k)], "_band.band", "_band.bucket"
    )
    # NOTE: deliberately NOT repartitioned on (band, bucket) before the
    # self-join.  An exchange there would let AQE compute the signature
    # stage once for both sides — but hashpartitioning on the bucket
    # key CLUSTERS each near-dup bucket into one partition, and a
    # boilerplate mega-cluster then emits its ~n² candidate pairs from
    # a single straggler task (measured: q32 6.5 -> 9+ s).  The
    # broadcast self-join keeps the stream side round-robin, so pair
    # emission stays evenly spread; the duplicated signature pass on
    # the build side is one linear corpus pass and the cheaper side of
    # that trade (hamming_band_candidates takes the opposite branch —
    # its upstream simhash is far heavier per row and its band values
    # do not concentrate mass the way min-hash buckets do).
    l = tagged.alias("l")
    r = tagged.alias("r")
    pairs = l.join(
        r,
        (F.col("l.band") == F.col("r.band"))
        & (F.col("l.bucket") == F.col("r.bucket"))
        & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
    ).select(
        F.col(f"l.{id_col}").alias("id1"),
        F.col(f"r.{id_col}").alias("id2"),
        F.col("l.band").alias("band"),
        *[F.col(f"l.mh{i}").alias(f"lmh{i}") for i in range(k)],
        *[F.col(f"r.mh{i}").alias(f"rmh{i}") for i in range(k)],
    )
    # emit each pair only from its FIRST matching band — an in-stage
    # filter on the carried signatures that replaces the dropDuplicates
    # exchange over the near-quadratic pair set (measured 2× on the
    # sf0.1 bench: 10.7s → 4.8s warm)
    keep = F.when(F.col("band") == 0, F.lit(True))
    for b in range(1, bands):
        no_earlier = F.lit(True)
        for bp in range(b):
            no_earlier = no_earlier & (bucket_of("l", bp) != bucket_of("r", bp))
        keep = keep.when(F.col("band") == b, no_earlier)
    pairs = pairs.filter(keep.otherwise(F.lit(False)))
    agree = sum(
        F.when(F.col(f"lmh{i}") == F.col(f"rmh{i}"), 1).otherwise(0) for i in range(k)
    )
    return pairs.select(
        "id1", "id2", (agree.cast("double") / F.lit(float(k))).alias("jaccard_est")
    )


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str,
    n_steps: int = 50,
    lineage_cut: str | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components by min-label propagation, run to fixpoint:
    each round every vertex takes the minimum label in its 1-hop
    neighborhood, and the loop exits as soon as a round changes zero
    labels (label monotonicity makes "no change" exactly the fixpoint).
    ``n_steps`` is a safety CAP on rounds, not a target — hitting it
    before convergence warns, because an under-merged chain-shaped
    component is silent wrongness otherwise.  Convergence needs at most
    graph-diameter rounds (near-duplicate clusters are dense; measured
    fixpoint ≤ 2 on the corpus fixtures).

    Each round is one equi-join + partial-aggregated min — the standard
    scalable CC shape.  The per-round convergence count forces an
    action anyway, so labels are checkpointed every round: the count
    reads the materialized blocks for free and lineage never grows
    with the iteration count (a 100-round chain would otherwise build
    a 100-deep plan).  ``lineage_cut`` picks the checkpoint flavor —
    ``"local"`` (executor-local, fastest) or ``"reliable"``
    (cluster-survivable; see :func:`~lsd2_spark.operators.common.
    cut_lineage`, also settable session-wide via its conf key; the
    ``"auto"`` default resolves to reliable whenever a checkpoint dir
    is set).  Under ``"reliable"`` the fixpoint manages its own
    checkpoint files: round N−1's directory is deleted as soon as
    round N materializes (monotone min-labels — a superseded round is
    never re-read), so the job store holds at most two rounds' files
    at any instant instead of one corpus-scale snapshot per round;
    only the LAST round's files outlive the call (they back the
    returned DataFrame).

    Round-count vs skew (bench ``cc_skew`` probe): min-label
    propagation needs graph-DIAMETER rounds, and the adversarial crawl
    shape — one boilerplate mega-cluster holding ~10% of the corpus —
    is a near-CLIQUE under LSH banding (every member shares a band
    bucket with most others), so its diameter stays 1-2 and the
    fixpoint converges in ~3 rounds regardless of cluster SIZE; per-
    round work is |edges| (one equi-join + partial-agg min), never
    |component|².  The shape that would need many rounds is a long
    CHAIN of near-dups each similar only to its neighbors (measured by
    the bench ``cc_chain`` probe: rounds = diameter + 1 exactly — a
    diameter-24 path converges in 25 rounds; capped at ``n_steps=8``
    it stops unconverged with the corpus split into 9 under-merged
    fragments and the RuntimeWarning below fired).

    Upgrade decision (recorded with the cc_chain/cc_skew data): stay
    on min-label propagation with the loud cap rather than move to
    hash-to-min / star-contraction (O(log n) rounds, Kiveris et al.
    "Connected Components in MapReduce and Beyond", SoCC'14).  The
    dense shapes real near-dup corpora produce converge in 2-3 rounds
    (cc_skew: the 10%-of-corpus mega-cluster takes the SAME rounds as
    the uniform corpus) where the alternation's doubled shuffles per
    round would cost more than they save; a >50-diameter chain needs
    50 docs each similar ONLY to its two neighbors — a measured-zero
    occurrence in the organic corpus (largest component 1,370 members,
    fixpoint ≤ 3 rounds) — and if one ever appears the cap converts it
    to a warning plus a raised ``n_steps``, not silent wrongness.
    Revisit if a real corpus ever warns here with rounds tracking
    diameter.

    ``stats``, if given, is filled with ``{"rounds": int, "converged":
    bool}`` — the probe/observability hook (the ``cc_skew`` bench
    probe reads it; edge volume is countable on the caller's edge
    frame, so it is not re-counted here).

    ``edges`` must have columns ``id1``/``id2``; returns
    (id_col, cluster_id).
    """
    from lsd2_spark.operators.common import (
        checkpoint_file_of,
        remove_checkpoint_file,
        resolve_cut_mode,
    )

    spark = vertices.sparkSession
    # resolve once so the per-round file management below knows whether
    # reliable checkpoints (and thus deletable round files) are in play
    cut_mode = resolve_cut_mode(spark, lineage_cut)
    sym = edges.select(
        F.col("id1").alias("a"), F.col("id2").alias("b")
    ).unionByName(edges.select(F.col("id2").alias("a"), F.col("id1").alias("b")))
    # Materialize the edge list ONCE: every round joins `sym`, and the
    # union's two branches each re-derive `edges` — for LSH-proposed
    # edges that is the whole signature + band-join pipeline, re-run
    # 2x per round without the cut (the labels are already cut per
    # round; the edges were not).  The cut stores two ids per edge row;
    # its reliable-mode file is deleted after the fixpoint (the
    # returned labels are their own checkpoint and never re-read sym).
    sym = cut_lineage(sym, mode=cut_mode, eager=False)
    labels = vertices.select(
        F.col(id_col).alias("v"), F.col(id_col).cast("long").alias("cluster_id")
    )
    converged = False
    rounds = 0
    prev_ckpt_file: str | None = None
    for _ in range(n_steps):
        nbr_min = (
            sym.join(labels.withColumnRenamed("v", "_bv"), F.col("b") == F.col("_bv"))
            .groupBy("a")
            .agg(F.min("cluster_id").alias("_nl"))
        )
        stepped = (
            labels.join(
                nbr_min.withColumnRenamed("a", "_av"),
                F.col("v") == F.col("_av"),
                "left",
            )
            .select(
                "v",
                F.least(
                    F.col("cluster_id"), F.coalesce(F.col("_nl"), F.col("cluster_id"))
                ).alias("new_cluster_id"),
                (
                    F.coalesce(F.col("_nl"), F.col("cluster_id"))
                    < F.col("cluster_id")
                ).alias("_changed"),
            )
        )
        stepped = cut_lineage(stepped, mode=cut_mode, eager=True)
        changed = stepped.filter(F.col("_changed")).count()
        rounds += 1
        if cut_mode == "reliable":
            # round N is materialized (eager checkpoint + the count
            # above); round N-1's files are now unreferenced — delete
            # them so the job store holds <= 2 rounds, not one
            # corpus-scale snapshot per round
            cur = checkpoint_file_of(stepped, expect_reliable=True)
            if prev_ckpt_file and prev_ckpt_file != cur:
                remove_checkpoint_file(spark, prev_ckpt_file)
            prev_ckpt_file = cur
        labels = stepped.select(
            "v", F.col("new_cluster_id").alias("cluster_id")
        )
        if changed == 0:
            converged = True
            break
    if cut_mode == "reliable" and rounds > 0:
        # the fixpoint is done and the returned labels never re-read
        # the edge list — reclaim its checkpoint files now instead of
        # leaving one edge-scale snapshot per call in the job store
        sym_ckpt = checkpoint_file_of(sym, expect_reliable=True)
        if sym_ckpt:
            remove_checkpoint_file(spark, sym_ckpt)
    if stats is not None:
        stats["rounds"] = rounds
        stats["converged"] = converged
    if not converged:
        import warnings

        warnings.warn(
            f"connected_components hit the round cap n_steps={n_steps} before "
            "converging — component labels may be under-merged; raise n_steps",
            stacklevel=2,
        )
    return labels.select(F.col("v").alias(id_col), "cluster_id")


def dedup_clusters(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_jaccard: float = 0.9,
    n_steps: int = 50,
    bands: int = 4,
    score_col: str | None = None,
    lineage_cut: str | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """End-to-end fuzzy dedup: LSH candidate pairs → jaccard threshold
    → connected components (run to fixpoint; ``n_steps`` caps the
    rounds) → canonical survivor per cluster.
    ``filter(is_canonical = 1)`` is the deduplicated corpus with
    transitive near-duplicates collapsed.

    Canonical selection: the minimum id by default; with ``score_col``
    the HIGHEST-scoring member wins (ties → smaller id) — the
    keep-the-best-quality-duplicate policy of corpus curation (pair
    with ``text_analysis.quality_score``).  The score path adds one
    partial-aggregable max per cluster — same shuffle count.
    ``lineage_cut`` picks the CC fixpoint's per-round checkpoint
    flavor (see :func:`connected_components`; the ``"auto"`` default
    resolves to reliable whenever a checkpoint dir is set).
    ``stats``, if given, receives the fixpoint's ``rounds``/
    ``converged`` — log it in production so an approaching ``n_steps``
    cap is visible before it warns."""
    # cut_signatures: the sym edge frame below is itself cut once per
    # fixpoint, but WITHIN that one materialization the union's two
    # branches times the self-join's two sides re-ran the md5-per-token
    # minhash pass up to 4x; cutting the narrow per-doc signature frame
    # first makes it one corpus pass
    edges = lsh_candidate_pairs(
        df, text_col, id_col, bands, cut_signatures=True
    ).filter(F.col("jaccard_est") >= min_jaccard)
    cc = connected_components(
        df.select(id_col), edges, id_col, n_steps, lineage_cut=lineage_cut,
        stats=stats,
    )
    if score_col is None:
        return cc.select(
            F.col(id_col),
            "cluster_id",
            (F.col(id_col) == F.col("cluster_id")).cast("int").alias("is_canonical"),
        )
    scored = cc.join(df.select(id_col, score_col), id_col)
    # argmax(score, then min id) per cluster via one windowed
    # max(struct) — negate the id so the struct max prefers the SMALLER
    # id on ties.  A window, not the former groupBy-argmax + join-back:
    # that shape consumed `scored` TWICE (Spark re-executes a common
    # subplan per consumer — the cc-labels join and everything feeding
    # it ran once per branch), where the window is a single-consumer
    # pass with one shuffle on the cluster id and identical verdicts.
    key = F.struct(F.col(score_col).alias("s"), (-F.col(id_col)).alias("negid"))
    best = F.max(key).over(Window.partitionBy("cluster_id"))
    return scored.select(
        F.col(id_col),
        "cluster_id",
        (key == best).cast("int").alias("is_canonical"),
    )


def simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 60) -> DataFrame:
    """SimHash fingerprint: bit b is the sign of Σ_tokens (±1 by token-
    hash bit b).  Hamming-close simhashes ⇒ similar token sets.
    ``bits`` ≤ 62 so the packed value stays in signed-64 range.

    Total over the input: documents with no tokens (NULL or empty
    text) keep their row with ``simhash = 0`` — the explode+groupBy
    would otherwise silently drop them, losing rows across pipeline
    joins.  The left join back is on the id and the sum table is
    grouped, so this adds no extra shuffle beyond the aggregation's."""
    assert 1 <= bits <= 62
    exploded = df.select(
        F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("_tok")
    ).withColumn("_h", hash64(F.col("_tok")))
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("_h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"_s{b}")
        for b in range(bits)
    ]
    summed = exploded.groupBy(id_col).agg(*aggs)
    sh = F.lit(0).cast("long")
    for b in range(bits):
        sh = sh + F.when(F.col(f"_s{b}") > 0, F.lit(1 << b).cast("long")).otherwise(0)
    hashed = summed.select(F.col(id_col), sh.alias("simhash"))
    return df.select(id_col).join(hashed, id_col, "left").select(
        F.col(id_col), F.coalesce(F.col("simhash"), F.lit(0).cast("long")).alias("simhash")
    )


def ngram_pair_count_estimate(
    df: DataFrame,
    text_col: str,
    id_col: str,
    group_cols: list[str],
    n: int = 3,
) -> DataFrame:
    """Debug counter for the UNRESTRICTED :func:`ngram_jaccard_pairs`
    path: per group, the number of shared-gram join rows the self-join
    would materialize (``Σ_gram C(count, 2)``) plus the distinct-doc
    count.  Plan-sized output (one row per group), computed with two
    partial aggregations — run this BEFORE an unrestricted call to see
    whether the group bound actually bounds anything ("no silent caps":
    the quadratic cost is made visible instead of discovered in a stage
    that never finishes)."""
    grams = _gram_rows(df, text_col, id_col, group_cols, n)
    per_gram = grams.groupBy(*group_cols, "ng").agg(
        F.count("*").alias("_cnt")
    )
    return (
        per_gram.groupBy(*group_cols)
        .agg(
            F.sum(F.col("_cnt") * (F.col("_cnt") - 1) / 2)
            .cast("long")
            .alias("est_join_rows"),
        )
        .join(
            df.groupBy(*group_cols).agg(F.count("*").alias("n_docs")),
            group_cols,
        )
    )


def _grams_array(text_col: str, n: int) -> Column:
    """Distinct character n-grams of a text column, as an array."""
    return F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(length({text_col}) - {n - 1}, 1)),"
            f" i -> substr({text_col}, i, {n}))"
        )
    )


def _gram_rows(
    df: DataFrame, text_col: str, id_col: str, group_cols: list[str], n: int
) -> DataFrame:
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in group_cols],
        F.explode(_grams_array(text_col, n)).alias("ng"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    group_cols: list[str],
    n: int = 3,
    candidates: DataFrame | None = None,
    prune_members: bool = False,
) -> DataFrame:
    """Exact character-n-gram jaccard, either over proposed candidate
    pairs (the scale path) or over all pairs within each group (the
    bounded forensic path).

    ``candidates``: an ``(id1, id2)`` frame (e.g.
    :func:`lsh_candidate_pairs` output) restricting which pairs are
    scored — the 100 TB composition: LSH proposes, exact jaccard
    verifies.  The plan is candidate-DRIVEN and the all-pairs-sharing-
    a-gram self-join never exists in it: (1) slim ``(id, group)``
    projections group-bound the pair set first, so nothing heavier
    than two ids and the group key rides a shuffle for pairs the group
    bound would drop; (2) each surviving pair picks up both documents'
    distinct-gram ARRAYS by id-equi-join and the shared count is one
    JVM-side ``array_intersect`` — per-pair JOIN cost is O(doc length),
    linear in ``|candidates|``, no explode.  The gram projection itself
    is one linear corpus pass (the same order as the banding that
    proposed the candidates); ``prune_members=True`` adds a distinct
    member semi-join restricting it to candidate participants — worth
    it when candidates are SPARSE relative to the corpus (the typical
    production banding regime), pure overhead when they touch most
    documents (measured +6 s on the dense sf0.1 bench corpus vs the
    one corpus-wide transform pass it saves).  Results are identical
    either way.  Pairs are normalized to ``id1 < id2``; a candidate
    pair outside the group bound or sharing zero grams simply never
    surfaces.

    **WARNING — candidates=None is quadratic within groups.** The
    unrestricted path self-joins gram rows bounded only by
    ``group_cols``; within-group join volume grows with the SQUARE of
    group size (100× corpus → ~10,000× rows per group).  It exists for
    bounded forensic use (small curated groups, oracle verification).
    Before running it on anything sizeable, measure the blowup with
    :func:`ngram_pair_count_estimate`; a ``log.warning`` fires on every
    unrestricted call.
    """
    if candidates is not None:
        cand = candidates.select(
            F.least(F.col("id1"), F.col("id2")).alias("id1"),
            F.greatest(F.col("id1"), F.col("id2")).alias("id2"),
        )
        # a degenerate (x, x) candidate (symmetric-join input) would
        # survive normalization and score itself at jaccard 1.0; the
        # unrestricted path excludes self-pairs structurally (id1<id2)
        cand = cand.filter(F.col("id1") != F.col("id2"))
        # group-bound FIRST with slim (id, group) projections — gram
        # arrays must never ride a shuffle for a pair the group bound
        # drops (measured 79x pair reduction on the bench corpus).
        # The broadcast joins + group filter are pipelined (no
        # exchange), so the pair-set DEDUP below shuffles only the
        # group-bounded survivors: deduping before bounding shuffled
        # the RAW candidate multiset — 9.7M rows vs 124k at sf0.1,
        # measured 4.2 s -> 0.9 s on the q32 ngram half.  The slim
        # tables are unique per id, so joining cannot multiply rows
        # and dedup-after-bound keeps the pair set identical.
        s1 = df.select(
            F.col(id_col).alias("id1"),
            *[F.col(c).alias(f"_l_{c}") for c in group_cols],
        )
        s2 = df.select(
            F.col(id_col).alias("id2"),
            *[F.col(c).alias(f"_r_{c}") for c in group_cols],
        )
        bounded = cand.join(s1, "id1").join(s2, "id2")
        for c in group_cols:
            bounded = bounded.filter(F.col(f"_l_{c}") == F.col(f"_r_{c}"))
        # explicit partition count: the deduped pair set is small in
        # BYTES (two ids per row), and an AQE-coalescable exchange
        # under it shrinks to one partition — which would serialize
        # the per-pair array_intersect stage above (measured 5x on the
        # q32 ngram half).  The pair key is near-unique, so hash
        # partitioning on it cannot skew.
        bounded = (
            bounded.select("id1", "id2")
            .repartition(
                df.sparkSession.sparkContext.defaultParallelism, "id1", "id2"
            )
            .dropDuplicates(["id1", "id2"])
        )
        src = df
        if prune_members:
            # gram arrays ONLY for candidate participants: distinct()
            # first (the raw union carries 2 heavily-duplicated rows
            # per pair; deduplicated to <= n_docs ids, AQE can turn
            # the semi-join into a broadcast), and the gram projection
            # sits ABOVE the join so it computes only for survivors.
            # See the docstring for when this pays for itself.
            members = (
                bounded.select(F.col("id1").alias(id_col))
                .union(bounded.select(F.col("id2").alias(id_col)))
                .distinct()
            )
            src = df.join(members, id_col, "left_semi")
        garr = src.select(F.col(id_col), _grams_array(text_col, n).alias("_g"))
        a1 = garr.select(F.col(id_col).alias("id1"), F.col("_g").alias("_g1"))
        a2 = garr.select(F.col(id_col).alias("id2"), F.col("_g").alias("_g2"))
        return (
            bounded.join(a1, "id1")
            .join(a2, "id2")
            .select(
                "id1",
                "id2",
                F.size(F.array_intersect("_g1", "_g2")).alias("shared"),
                F.size("_g1").alias("n1"),
                F.size("_g2").alias("n2"),
            )
            .filter(F.col("shared") > 0)
            .select(
                "id1",
                "id2",
                round6(
                    F.col("shared").cast("double")
                    / (F.col("n1") + F.col("n2") - F.col("shared"))
                ).alias("jaccard"),
            )
        )

    log.warning(
        "ngram_jaccard_pairs called WITHOUT candidates=: the shared-gram "
        "self-join is quadratic within %s groups — pass "
        "candidates=lsh_candidate_pairs(...) at scale, or size the blast "
        "radius first with ngram_pair_count_estimate()",
        group_cols,
    )
    grams = _gram_rows(df, text_col, id_col, group_cols, n)
    sizes = grams.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    g1 = grams.alias("g1")
    g2 = grams.alias("g2")
    cond = (F.col("g1.ng") == F.col("g2.ng")) & (
        F.col(f"g1.{id_col}") < F.col(f"g2.{id_col}")
    )
    for c in group_cols:
        cond = cond & (F.col(f"g1.{c}") == F.col(f"g2.{c}"))
    paired = g1.join(g2, cond).select(
        F.col(f"g1.{id_col}").alias("id1"), F.col(f"g2.{id_col}").alias("id2")
    )
    shared = paired.groupBy("id1", "id2").agg(F.count("*").alias("shared"))
    s1 = sizes.select(F.col(id_col).alias("id1"), F.col("n_grams").alias("n1"))
    s2 = sizes.select(F.col(id_col).alias("id2"), F.col("n_grams").alias("n2"))
    return (
        shared.join(s1, "id1")
        .join(s2, "id2")
        .select(
            "id1",
            "id2",
            round6(
                F.col("shared").cast("double")
                / (F.col("n1") + F.col("n2") - F.col("shared"))
            ).alias("jaccard"),
        )
    )


def normalize_text_col(text: Column) -> Column:
    """Canonical text normalization for dedup: lowercase, collapse all
    whitespace runs to single spaces, strip leading/trailing space, and
    drop punctuation-class ASCII.  Pure Column expression (one codegen
    stage, no UDF) with an exact SQL twin — near-identical documents
    differing only in case/spacing/punctuation hash together."""
    t = F.lower(text)
    t = F.regexp_replace(t, r"[!-/:-@\[-`{-~]", "")  # ASCII punctuation
    t = F.regexp_replace(t, WS, " ")
    return F.trim(t)


def normalized_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup over NORMALIZED text — catches the near-duplicates
    exact_dedup misses (case/whitespace/punctuation variants) at the
    same one-shuffle cost.  Same output contract as exact_dedup with a
    ``norm_hash`` column."""
    h = F.md5(normalize_text_col(F.col(text_col))).alias("norm_hash")
    w = Window.partitionBy("norm_hash")
    return (
        df.select(F.col(id_col), h)
        .withColumn("canonical_id", F.min(id_col).over(w))
        .withColumn("is_canonical", (F.col(id_col) == F.col("canonical_id")).cast("int"))
    )


def hamming_band_candidates(
    hashes: DataFrame,
    id_col: str,
    hash_col: str,
    bits: int = 64,
    max_hamming: int = 6,
) -> DataFrame:
    """The pre-popcount candidate stage of :func:`hamming_neardup_pairs`
    — every distinct pair sharing at least one band value, with both
    hashes attached: ``(id1, id2, h1, h2)``.

    Exposed separately because candidate COUNT (band-collision volume),
    not output-pair count, is the quantity that grows when banding
    degrades at scale — the density probes and the collision-bound
    regression measure this stage directly.  For uniformly distributed
    ``bits``-bit hashes the expected candidate count over n unrelated
    fingerprints is ``~ C(n,2) · Σ_b 2^-width(b)`` (bands of
    ``bits // (max_hamming+1)`` bits, the last absorbing the
    remainder) — a tested analytic bound.
    """
    n_bands = max_hamming + 1
    band_bits = bits // n_bands
    if band_bits < 1:
        raise ValueError(f"max_hamming={max_hamming} too large for {bits}-bit hashes")
    h = hashes.select(F.col(id_col), F.col(hash_col)).filter(
        F.col(hash_col).isNotNull()
    )

    def band_val(col: Column, b: int) -> Column:
        return F.shiftrightunsigned(col, b * band_bits).bitwiseAND(
            F.lit(
                -1  # final band absorbs remainder incl. bit 63
                if b == n_bands - 1 and bits - b * band_bits >= 64
                else (1 << (bits - b * band_bits)) - 1
                if b == n_bands - 1
                else (1 << band_bits) - 1
            )
        )

    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                band_val(F.col(hash_col), b).alias("val"),
            )
            for b in range(n_bands)
        ]
    )
    banded = h.select(
        F.col(id_col), F.col(hash_col), F.explode(bands).alias("_b")
    ).select(
        F.col(id_col), F.col(hash_col),
        F.col("_b.band").alias("band"), F.col("_b.val").alias("val"),
    )
    # one Exchange on the join keys -> AQE stage reuse computes the
    # banded table (and everything below it, e.g. a simhash pipeline)
    # once instead of once per self-join side; the join itself is then
    # co-partitioned.  Explicit partition count, same rationale as
    # lsh_candidate_pairs: an AQE-coalescable exchange would serialize
    # the CPU-bound popcount join above it.
    banded = banded.repartition(
        hashes.sparkSession.sparkContext.defaultParallelism, "band", "val"
    )
    l, r = banded.alias("l"), banded.alias("r")
    # emit each pair only from its FIRST matching band — every earlier
    # band's value is recomputable from the carried hashes with one
    # shift+mask each, so the duplicate-drop is an in-stage filter on
    # the join output instead of the former dropDuplicates exchange
    # over the raw collision multiset (duplicate rows of a pair are
    # value-identical — same ids, same hashes — so keeping the
    # first-band row is result-identical; same device as
    # lsh_candidate_pairs / embedding_neardup_candidates).
    keep = F.when(F.col("band") == 0, F.lit(True))
    for b in range(1, n_bands):
        no_earlier = F.lit(True)
        for bp in range(b):
            no_earlier = no_earlier & (
                band_val(F.col("h1"), bp) != band_val(F.col("h2"), bp)
            )
        keep = keep.when(F.col("band") == b, no_earlier)
    pairs = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.val") == F.col("r.val"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id1"),
            F.col(f"r.{id_col}").alias("id2"),
            F.col(f"l.{hash_col}").alias("h1"),
            F.col(f"r.{hash_col}").alias("h2"),
            F.col("l.band").alias("band"),
        )
        .filter(keep.otherwise(F.lit(False)))
        .select("id1", "id2", "h1", "h2")
    )
    return pairs


def hamming_neardup_pairs(
    hashes: DataFrame,
    id_col: str,
    hash_col: str,
    bits: int = 64,
    max_hamming: int = 6,
) -> DataFrame:
    """Generic near-dup pairs over an integer fingerprint column (a
    simhash, image dHash, audio fingerprint...): pairs within
    ``max_hamming`` bits, found without all-pairs work.

    Pigeonhole banding (:func:`hamming_band_candidates`): the
    ``bits``-bit hash splits into ``max_hamming + 1`` bands, so any
    pair within budget agrees EXACTLY on at least one band; candidates
    equi-join on (band index, band value) and survive an exact
    popcount filter.  Same bucketed-join scale shape as the
    MinHash-LSH text path — one shuffle on the band key, skew handled
    by AQE like any hot bucket.
    """
    pairs = hamming_band_candidates(hashes, id_col, hash_col, bits, max_hamming)
    ham = F.bit_count(F.col("h1").bitwiseXOR(F.col("h2")))
    return (
        pairs.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id1", "id2", "hamming")
    )
