"""The unrolled (codegen) dot/norm chain must be BIT-identical to the
higher-order fold it replaces on the similarity hot paths — the round-13
optimization switches between the two forms on estimated pair volume, so
any divergence would make results depend on a cost estimate.

Also pins the ANSI-safety contract: the unrolled form indexes a[i] up to
dim, which throws on shorter arrays under ANSI mode — operators must
keep ragged/null/zero vectors on the HOF validity filter and stay total
even when the unroll switch is forced on.
"""

import struct

import pytest
from pyspark.sql import functions as F

from lsd2_spark.operators import similarity as simm


def _mkvecs(spark, rows):
    return spark.createDataFrame(rows, "id long, a array<float>, b array<float>")


def _bits(x):
    return None if x is None else struct.pack("<d", x)


@pytest.fixture()
def vec_df(spark):
    import random

    rng = random.Random(7)
    rows = []
    for i in range(500):
        scale = 10.0 ** rng.randint(-20, 20)
        rows.append(
            (
                i,
                [rng.uniform(-1, 1) * scale for _ in range(16)],
                [rng.uniform(-1, 1) * scale for _ in range(16)],
            )
        )
    # cancellation-heavy row: large alternating terms
    rows.append((500, [1e8, -1e8] * 8, [1.0] * 16))
    return _mkvecs(spark, rows)


def test_unrolled_dot_norm_bit_identical(vec_df):
    hof = vec_df.select(
        "id",
        simm._dot(F.col("a"), F.col("b")).alias("d"),
        simm._norm(F.col("a")).alias("n"),
    ).collect()
    unrolled = vec_df.select(
        "id",
        simm._dot("a", "b", 16).alias("d"),
        simm._norm("a", 16).alias("n"),
    ).collect()
    for r1, r2 in zip(
        sorted(hof, key=lambda r: r["id"]), sorted(unrolled, key=lambda r: r["id"])
    ):
        assert _bits(r1["d"]) == _bits(r2["d"])
        assert _bits(r1["n"]) == _bits(r2["n"])


def _messy_corpus(spark):
    """Valid vectors plus every invalid shape the validity filter must
    absorb: NULL, empty, zero-norm, and RAGGED (shorter/longer) — the
    ragged ones are what would throw under ANSI if the unrolled a[i]
    ever ran before the size filter."""
    rows = [(i, [float((i * 7 + j * 3) % 11 - 5) or 1.0 for j in range(8)]) for i in range(40)]
    rows += [
        (100, None),
        (101, []),
        (102, [0.0] * 8),
        (103, [1.0, 2.0]),  # ragged short
        (104, [1.0] * 12),  # ragged long
    ]
    return spark.createDataFrame(rows, "vid long, v array<float>")


def _force(monkeypatch, on):
    monkeypatch.setattr(simm, "_UNROLL_MIN_PAIRS", 0 if on else 1 << 62)


@pytest.mark.parametrize("forced", [False, True])
def test_neardup_pairs_total_and_identical_under_forced_unroll(
    spark, monkeypatch, forced
):
    df = _messy_corpus(spark)
    _force(monkeypatch, forced)
    got = sorted(
        simm.embedding_neardup_pairs(
            df, "v", "vid", threshold=0.2, n_bits=2, n_tables=4
        ).collect()
    )
    _force(monkeypatch, False)
    want = sorted(
        simm.embedding_neardup_pairs(
            df, "v", "vid", threshold=0.2, n_bits=2, n_tables=4
        ).collect()
    )
    assert got == want
    assert len(want) > 0  # non-vacuous: some pairs actually scored


def test_topk_identical_under_forced_unroll(spark, monkeypatch):
    df = _messy_corpus(spark)
    queries = df.filter(F.col("vid") < 5)
    outs = {}
    for forced in (False, True):
        _force(monkeypatch, forced)
        outs[forced] = {
            "cos": sorted(simm.cosine_topk(df, queries, "v", "vid", k=3).collect()),
            "lsh": sorted(
                simm.hyperplane_lsh_topk(
                    df, queries, "v", "vid", k=3, n_bits=2, n_tables=4
                ).collect()
            ),
            "ivf": sorted(
                simm.ivf_topk(
                    df, queries, "v", "vid", k=3, n_lists=4, nprobe=2
                ).collect()
            ),
        }
    assert outs[True] == outs[False]
    assert all(len(v) > 0 for v in outs[False].values())


def test_unroll_switch_respects_dim_cap(monkeypatch):
    monkeypatch.setattr(simm, "_UNROLL_MIN_PAIRS", 0)
    assert simm._unroll_dim(16, 1e9) == 16
    assert simm._unroll_dim(simm._UNROLL_MAX_DIM + 1, 1e9) is None
    monkeypatch.setattr(simm, "_UNROLL_MIN_PAIRS", 10)
    assert simm._unroll_dim(16, 9) is None
