"""Product quantization (PQ / IVF-PQ) — compressed-vector ANN.

At 10^10+ vectors, even the IVF path's raw float arrays dominate scan
cost: 64-dim float32 is 256 bytes/vector.  Product quantization
(Jégou et al. 2011, "Product Quantization for Nearest Neighbor
Search") splits each vector into ``m`` subspaces and replaces every
subvector with the id of its nearest per-subspace centroid: ``m``
bytes per vector (32× here), scored against a query by summing ``m``
table lookups (ADC — asymmetric distance computation).

Spark-first shape:

- **train**: ``m`` independent runs of the existing deterministic
  ``kmeans_centroids`` over sliced subvectors (build-once; each run is
  the one-Arrow-pass-per-iteration kernel from the IVF path);
- **encode**: ONE Arrow pass assigning all ``m`` codes per vector —
  the output table is (id, codes) and is what you persist and scan;
- **score**: queries are bounded and broadcast as ADC lookup tables
  (nq × m × n_codes floats); a ``mapInPandas`` kernel streams the code
  table, scores every candidate with pure uint8 gathers + adds, and
  emits only its per-partition top-k per query — the final exchange
  moves n_partitions × nq × k rows, never the full score matrix;
- **IVF-PQ**: the same coarse quantizer as ``ivf_topk`` prunes the
  candidate stream to ``nprobe`` lists per query (equi-join on
  list_id) before ADC scoring — the canonical billion-scale layout.

Approximation contract: PQ returns approximate neighbors; tests pin
recall@k against the exact scan on clustered data rather than
asserting exact equality.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lsd2_spark.operators.similarity import (
    _l2_assign,
    _probe_dim,
    _valid_vectors,
)

__all__ = [
    "train_pq",
    "pq_encode",
    "pq_topk",
    "ivf_pq_topk",
    "save_pq_codebooks",
    "load_pq_codebooks",
]


def _check_geometry(dim: int, m: int) -> int:
    if dim % m:
        raise ValueError(f"m={m} must divide dim={dim}")
    return dim // m


def train_pq(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    m: int = 8,
    n_codes: int = 16,
    n_iters: int = 2,
    sample_stride: int = 1,
    dim: int | None = None,
) -> np.ndarray:
    """Per-subspace codebooks, shape (m, n_codes, dim/m): ``m``
    independent deterministic k-means (the kmeans_centroids contract —
    6dp-rounded components, first-n init by id, half-up rounded-L2
    argmin, exact integer-micro-unit means), FUSED so every iteration
    is ONE Arrow pass assigning all ``m`` subspaces at once and the
    shuffle moves m × n_codes partial rows — not ``m`` separate jobs.
    Bit-identical to running kmeans_centroids per sliced subspace
    (parity-tested) for corpora without zero-norm subvectors — the
    fused sample filters on the FULL vector, so a vector whose slice-j
    happens to be all zeros still trains space j (the per-space path
    dropped it there; the fused behavior is the consistent one).
    Build-once: train on a stride sample at scale."""
    from lsd2_spark.functions.numeric import round6

    if dim is None:
        dim = _probe_dim(df, vec_col)
    sub = _check_geometry(dim, m)
    spark = df.sparkSession
    samp = _valid_vectors(df, vec_col, dim).select(
        F.col(id_col).alias("_vid"),
        F.transform(F.col(vec_col), lambda x: round6(x.cast("double"))).alias("_v"),
    )
    if sample_stride > 1:
        samp = samp.filter(F.col("_vid") % sample_stride == 0)
    samp = samp.cache()

    init_rows = samp.orderBy("_vid").limit(n_codes).collect()
    full = np.array([r["_v"] for r in init_rows], dtype=np.float64)
    # cents[space] = n_codes × sub
    cents = np.stack([full[:, j * sub : (j + 1) * sub] for j in range(m)])

    partial_schema = "_space int, _code int, _cnt long, _smicro array<long>"

    for _ in range(n_iters):
        bc = spark.sparkContext.broadcast(cents)

        def assign_and_sum(batches):
            cb = bc.value
            sums = np.zeros((m, n_codes, sub), dtype=np.int64)
            cnts = np.zeros((m, n_codes), dtype=np.int64)
            for pdf in batches:
                if not len(pdf):
                    continue
                mat = np.array(pdf["_v"].tolist(), dtype=np.float64)
                micro = np.rint(mat * 1e6).astype(np.int64)
                for j in range(m):
                    sl = slice(j * sub, (j + 1) * sub)
                    a = np.argmin(_l2_assign(mat[:, sl], cb[j]), axis=1)
                    np.add.at(sums[j], a, micro[:, sl])
                    cnts[j] += np.bincount(a, minlength=n_codes)
            sp, co = np.nonzero(cnts)
            yield pd.DataFrame(
                {
                    "_space": sp.astype(np.int32),
                    "_code": co.astype(np.int32),
                    "_cnt": cnts[sp, co],
                    "_smicro": pd.Series(list(sums[sp, co]), dtype=object),
                }
            )

        means = (
            samp.select("_v")
            .mapInPandas(assign_and_sum, partial_schema)
            .select(
                "_space", "_code", "_cnt",
                F.posexplode("_smicro").alias("_j", "_m"),
            )
            .groupBy("_space", "_code", "_j")
            .agg(
                (
                    # same exact-decimal de-scaling as kmeans_centroids:
                    # order-free integer sums, then one double division
                    (
                        F.sum(F.col("_m").cast("decimal(38,0)")).cast(
                            "decimal(38,6)"
                        )
                        / F.lit(1_000_000)
                    ).cast("double")
                    / F.sum("_cnt")
                ).alias("_w")
            )
            .collect()
        )
        new = cents.copy()  # empty codes keep their previous centroid
        for r in means:
            new[r["_space"], r["_code"], r["_j"]] = r["_w"]
        cents = new
    samp.unpersist()
    return cents



def _id_type(df: DataFrame, col: str) -> str:
    """DDL type of an id column — the mapInPandas/createDataFrame output
    schemas carry the INPUT's id type (long doc ids and string doc ids
    both work; the old hard-coded ``long`` crashed on string ids)."""
    return df.schema[col].dataType.simpleString()

def pq_encode(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    codebooks: np.ndarray,
) -> DataFrame:
    """(id, codes array<int> length m): every vector's per-subspace
    nearest-centroid ids.  One shuffle-free Arrow pass; rows with
    NULL/ragged vectors get NULL codes (total)."""
    m, n_codes, sub = codebooks.shape
    dim = m * sub
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(np.asarray(codebooks, dtype=np.float64))

    def encode(batches):
        cb = bc.value
        for pdf in batches:
            n = len(pdf)
            out_codes: list = [None] * n
            ok = [
                v is not None and len(v) == dim for v in pdf["_v"]
            ]
            idxs = [i for i, o in enumerate(ok) if o]
            if idxs:
                mat = np.array(pdf["_v"].iloc[idxs].tolist(), dtype=np.float64)
                codes = np.empty((len(idxs), m), dtype=np.int64)
                for j in range(m):
                    d2 = _l2_assign(mat[:, j * sub : (j + 1) * sub], cb[j])
                    codes[:, j] = np.argmin(d2, axis=1)
                for row, i in enumerate(idxs):
                    out_codes[i] = codes[row].tolist()
            yield pd.DataFrame({"_id": pdf["_id"], "codes": out_codes})

    src = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    return src.mapInPandas(
        encode, f"_id {_id_type(df, id_col)}, codes array<int>"
    ).select(F.col("_id").alias(id_col), "codes")


def _adc_tables(qvecs: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """nq × m × n_codes partial squared distances: T[q, j, c] =
    ||query_sub_j - centroid_{j,c}||²."""
    m, n_codes, sub = codebooks.shape
    nq = len(qvecs)
    t = np.empty((nq, m, n_codes), dtype=np.float64)
    for j in range(m):
        qs = qvecs[:, j * sub : (j + 1) * sub]
        diff = qs[:, None, :] - codebooks[j][None, :, :]
        t[:, j, :] = (diff * diff).sum(axis=2)
    return t


def _topk_kernel(bc_tables, bc_qids, m: int, k: int):
    """Per-partition ADC top-k: score every candidate against every
    query via uint8 gathers, keep only k per query.  Self-matches are
    excluded PER PAIR (query q skips only candidate q) — a candidate
    that happens to also be a query still serves every other query."""

    def kernel(batches):
        tables = bc_tables.value  # nq × m × n_codes
        qids = bc_qids.value
        nq = len(qids)
        for pdf in batches:
            rows = [
                (i, c) for i, c in enumerate(pdf["codes"]) if c is not None
            ]
            if not rows:
                continue
            idx = np.array([i for i, _ in rows])
            codes = np.stack([np.asarray(c, dtype=np.int64) for _, c in rows])
            nb = len(idx)
            d = np.zeros((nq, nb), dtype=np.float64)
            for j in range(m):
                # gather the j-th partial distance for every (q, cand)
                d += tables[:, j, :][:, codes[:, j]]
            ids = pdf["_id"].to_numpy()[idx]
            # mask each query's own row out of ITS candidate set only
            id_pos = {v: i for i, v in enumerate(ids.tolist())}
            for qi, q in enumerate(qids):
                pos = id_pos.get(q)
                if pos is not None:
                    d[qi, pos] = np.inf
            kk = min(k, nb)
            part = np.argpartition(d, kk - 1, axis=1)[:, :kk]
            out_q, out_c, out_d = [], [], []
            for qi in range(nq):
                sel = [p for p in part[qi] if np.isfinite(d[qi, p])]
                out_q.extend([qids[qi]] * len(sel))
                out_c.extend(ids[sel].tolist())
                out_d.extend(d[qi, sel].tolist())
            yield pd.DataFrame(
                {"query_id": out_q, "cand_id": out_c, "approx_d2": out_d}
            )

    return kernel


_MAX_QUERIES = 4096


def pq_topk(
    encoded: DataFrame,
    queries: DataFrame,
    vec_col: str,
    qid: str,
    codebooks: np.ndarray,
    k: int = 10,
    id_col: str | None = None,
) -> DataFrame:
    """Approximate k-NN over the compressed code table: for every query
    (bounded at 4096; route bigger query sets through
    :func:`ivf_pq_topk` batch-wise), the ``k`` candidates with the
    smallest ADC distance.  Returns (query_id, cand_id, approx_d2, rnk).

    The kernel emits per-partition top-k only; the final exchange is
    n_partitions × nq × k rows."""
    m, n_codes, sub = codebooks.shape
    dim = m * sub
    id_col = id_col or encoded.columns[0]
    out_ids = (
        f"query_id {_id_type(queries, qid)}, cand_id {_id_type(encoded, id_col)}"
    )
    qrows = (
        _valid_vectors(queries, vec_col, dim)
        .select(F.col(qid), F.col(vec_col))
        .limit(_MAX_QUERIES + 1)
        .collect()
    )
    if len(qrows) > _MAX_QUERIES:
        raise ValueError(
            f"pq_topk is bounded at {_MAX_QUERIES} query vectors"
        )
    if not qrows:
        return encoded.sparkSession.createDataFrame(
            [], f"{out_ids}, approx_d2 double, rnk int"
        )
    qvecs = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in qrows])
    qids = [r[qid] for r in qrows]
    spark = encoded.sparkSession
    bc_t = spark.sparkContext.broadcast(_adc_tables(qvecs, codebooks))
    bc_q = spark.sparkContext.broadcast(qids)

    # no global qid exclusion: a candidate that is also a query must
    # still serve every OTHER query (the kernel masks self-pairs)
    src = encoded.select(F.col(id_col).alias("_id"), F.col("codes"))
    part = src.mapInPandas(
        _topk_kernel(bc_t, bc_q, m, k),
        f"{out_ids}, approx_d2 double",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("approx_d2"), F.asc("cand_id")
    )
    return (
        part.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def ivf_pq_topk(
    candidates: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    codebooks: np.ndarray,
    coarse_centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """The billion-scale layout: coarse IVF pruning + PQ-compressed
    scoring.  Candidates are assigned to their nearest coarse list and
    PQ-encoded (both one Arrow pass); each query probes its ``nprobe``
    nearest lists and ADC-scores only those lists' codes via an
    equi-join on list_id — never the full corpus."""
    from lsd2_spark.operators.similarity import kmeans_assign

    m, n_codes, sub = codebooks.shape
    dim = m * sub
    spark = candidates.sparkSession

    assigned = kmeans_assign(candidates, vec_col, id_col, coarse_centroids)
    enc = pq_encode(candidates, vec_col, id_col, codebooks)
    table = enc.join(assigned, id_col).filter(
        F.col("codes").isNotNull() & F.col("cluster_id").isNotNull()
    )

    qrows = (
        _valid_vectors(queries, vec_col, dim)
        .select(F.col(id_col), F.col(vec_col))
        .limit(_MAX_QUERIES + 1)
        .collect()
    )
    if len(qrows) > _MAX_QUERIES:
        raise ValueError(f"ivf_pq_topk is bounded at {_MAX_QUERIES} queries")
    out_ids = (
        f"query_id {_id_type(queries, id_col)}, "
        f"cand_id {_id_type(candidates, id_col)}"
    )
    if not qrows:
        return spark.createDataFrame(
            [], f"{out_ids}, approx_d2 double, rnk int"
        )
    qvecs = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in qrows])
    qids = [r[id_col] for r in qrows]
    # nprobe nearest coarse lists per query (driver-side: nq × n_lists)
    d2 = ((qvecs[:, None, :] - coarse_centroids[None, :, :]) ** 2).sum(axis=2)
    probes = np.argsort(d2, axis=1, kind="stable")[:, :nprobe]
    probe_rows = [
        (qids[i], int(l)) for i in range(len(qids)) for l in probes[i]
    ]
    probe_df = F.broadcast(
        spark.createDataFrame(
            probe_rows, f"query_id {_id_type(queries, id_col)}, cluster_id int"
        )
    )

    bc_t = spark.sparkContext.broadcast(_adc_tables(qvecs, codebooks))
    cand = table.join(probe_df, "cluster_id").filter(
        F.col(id_col) != F.col("query_id")
    )

    # score the pruned stream: each row already carries its query, so
    # the ADC is a single gather-sum per row batch
    def score(batches):
        tables = bc_t.value
        qindex = {q: i for i, q in enumerate(qids)}
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.stack(
                [np.asarray(c, dtype=np.int64) for c in pdf["codes"]]
            )
            qi = np.array([qindex[q] for q in pdf["query_id"]])
            d = np.zeros(len(pdf), dtype=np.float64)
            for j in range(m):
                d += tables[qi, j, codes[:, j]]
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    "cand_id": pdf[id_col],
                    "approx_d2": d,
                }
            )

    scored = cand.select("query_id", F.col(id_col), "codes").mapInPandas(
        score, f"{out_ids}, approx_d2 double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("approx_d2"), F.asc("cand_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def save_pq_codebooks(codebooks: np.ndarray, path: str) -> None:
    """Engine-neutral parquet persistence (same pattern as the IVF
    index): one row per (subspace, code) with the centroid array."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    m, n_codes, sub = codebooks.shape
    tbl = pa.table(
        {
            "subspace": np.repeat(np.arange(m), n_codes),
            "code": np.tile(np.arange(n_codes), m),
            "centroid": list(codebooks.reshape(m * n_codes, sub)),
        }
    )
    pq_.write_table(tbl, path)


def load_pq_codebooks(path: str) -> np.ndarray:
    import pyarrow.parquet as pq_

    t = pq_.read_table(path).to_pandas().sort_values(["subspace", "code"])
    m = int(t["subspace"].max()) + 1
    n_codes = int(t["code"].max()) + 1
    sub = len(t["centroid"].iloc[0])
    return np.stack(
        [np.asarray(c, dtype=np.float64) for c in t["centroid"]]
    ).reshape(m, n_codes, sub)
