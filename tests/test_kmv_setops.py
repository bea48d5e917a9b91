"""KMV sketch tables and set algebra: exact below occupancy, accurate
above it, mergeable, partition-independent, one-sided-group totality."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from lsd2_spark.operators.sketches import kmv_set_stats, kmv_sketch


def _h(v) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)


def _mkdf(spark, vals, grp="g"):
    return spark.createDataFrame([(grp, str(v)) for v in vals], "g string, v string")


def test_sketch_matches_reference_and_is_partition_independent(spark):
    vals = [f"item{i}" for i in range(40)] * 3  # dups collapse
    df = _mkdf(spark, vals)
    want = sorted({_h(v) for v in set(vals)})  # occupancy 40 < k
    got = kmv_sketch(df, "v", ["g"], k=64).collect()[0]["sketch"]
    assert got == want
    got2 = kmv_sketch(df.repartition(13), "v", ["g"], k=64).collect()[0]["sketch"]
    assert got2 == want


def test_exact_below_occupancy(spark):
    a = _mkdf(spark, [f"a{i}" for i in range(30)] + ["shared0", "shared1"])
    b = _mkdf(spark, [f"b{i}" for i in range(10)] + ["shared0", "shared1"])
    sa, sb = (kmv_sketch(d, "v", ["g"], k=64) for d in (a, b))
    r = kmv_set_stats(sa, sb, ["g"], k=64).collect()[0]
    assert r["est_left"] == 32.0
    assert r["est_right"] == 12.0
    assert r["est_union"] == 42.0
    assert r["est_intersection"] == 2.0
    assert abs(r["jaccard_est"] - 2.0 / 42.0) < 1e-12


def test_exact_even_when_union_exceeds_k(spark):
    """Both inputs below occupancy -> sketches are COMPLETE sets, so
    the union is exact even when the merged size exceeds k."""
    a = _mkdf(spark, [f"a{i}" for i in range(40)])
    b = _mkdf(spark, [f"b{i}" for i in range(40)] + ["a0", "a1", "a2"])
    sa, sb = (kmv_sketch(d, "v", ["g"], k=64) for d in (a, b))
    r = kmv_set_stats(sa, sb, ["g"], k=64).collect()[0]
    assert r["est_left"] == 40.0 and r["est_right"] == 43.0
    assert r["est_union"] == 80.0  # exact, not a bottom-64 estimate
    assert r["est_intersection"] == 3.0
    assert abs(r["jaccard_est"] - 3.0 / 80.0) < 1e-12


def test_estimates_above_occupancy(spark):
    # |A|=20k, |B|=20k, |A∩B|=10k, |A∪B|=30k, J=1/3
    a = _mkdf(spark, range(0, 20_000))
    b = _mkdf(spark, range(10_000, 30_000))
    k = 256
    sa, sb = (kmv_sketch(d, "v", ["g"], k=k) for d in (a, b))
    r = kmv_set_stats(sa, sb, ["g"], k=k).collect()[0]
    # KMV rel-error ~ 1/sqrt(k) ≈ 6%; allow 4 sigma
    for got, want in [
        (r["est_left"], 20_000), (r["est_right"], 20_000),
        (r["est_union"], 30_000),
    ]:
        assert abs(got - want) / want < 0.25, (got, want)
    assert abs(r["jaccard_est"] - 1 / 3) < 0.15
    assert abs(r["est_intersection"] - 10_000) / 10_000 < 0.35


def test_mergeability(spark):
    """bottom-k of bottom-ks == bottom-k of the union: the union
    sketch inside kmv_set_stats must equal the directly-built sketch
    of the concatenated corpus."""
    k = 32
    a_vals = [f"x{i}" for i in range(500)]
    b_vals = [f"y{i}" for i in range(500)] + a_vals[:100]
    direct = kmv_sketch(
        _mkdf(spark, a_vals + b_vals), "v", ["g"], k=k
    ).collect()[0]["sketch"]
    sa = kmv_sketch(_mkdf(spark, a_vals), "v", ["g"], k=k)
    sb = kmv_sketch(_mkdf(spark, b_vals), "v", ["g"], k=k)
    merged = (
        sa.select("g", F.col("sketch").alias("_a"))
        .join(sb.select("g", F.col("sketch").alias("_b")), "g")
        .select(
            F.slice(F.array_sort(F.array_union("_a", "_b")), 1, k).alias("u")
        )
        .collect()[0]["u"]
    )
    assert merged == direct
    # and the union estimate from parts tracks the direct estimate
    r = kmv_set_stats(sa, sb, ["g"], k=k).collect()[0]
    assert abs(r["est_union"] - 900) / 900 < 0.5


def test_one_sided_groups_total(spark):
    a = spark.createDataFrame(
        [("g1", "x"), ("g1", "y"), ("both", "p")], "g string, v string"
    )
    b = spark.createDataFrame(
        [("g2", "z"), ("both", "p")], "g string, v string"
    )
    sa, sb = (kmv_sketch(d, "v", ["g"], k=8) for d in (a, b))
    rows = {r["g"]: r for r in kmv_set_stats(sa, sb, ["g"], k=8).collect()}
    assert set(rows) == {"g1", "g2", "both"}
    assert rows["g1"]["est_left"] == 2.0 and rows["g1"]["est_right"] == 0.0
    assert rows["g1"]["est_union"] == 2.0 and rows["g1"]["est_intersection"] == 0.0
    assert rows["g2"]["est_left"] == 0.0 and rows["g2"]["est_union"] == 1.0
    assert rows["both"]["jaccard_est"] == 1.0


def test_group_cols_required(spark):
    df = _mkdf(spark, ["a"])
    s = kmv_sketch(df, "v", ["g"], k=8)
    with pytest.raises(ValueError):
        kmv_set_stats(s, s, [], k=8)


def test_kmv_distinct_unchanged_by_refactor(spark):
    """The shared _bottom_k_rows refactor must not move kmv_distinct's
    numbers (it is oracle-gated as q57)."""
    from lsd2_spark.operators.sketches import kmv_distinct

    df = _mkdf(spark, range(5000))
    r = kmv_distinct(df, "v", ["g"], k=64).collect()[0]
    assert r["n_kept"] == 64
    assert abs(r["est_distinct"] - 5000) / 5000 < 0.3
    # exact path
    r2 = kmv_distinct(_mkdf(spark, range(10)), "v", ["g"], k=64).collect()[0]
    assert r2["n_kept"] == 10 and r2["est_distinct"] == 10.0
