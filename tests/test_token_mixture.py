"""Token-budget mixture planning + materialization: water-filling
correctness, epoch caps, determinism, and expected token mass."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lsd2_spark.operators.sampling import (
    apply_token_mixture,
    plan_token_mixture,
)


def _corpus(spark):
    # big: 100 docs x 100 tokens; mid: 20 x 100; small: 4 x 100
    rows = []
    for i in range(100):
        rows.append((i, "big", " ".join(["w"] * 100)))
    for i in range(20):
        rows.append((1000 + i, "mid", " ".join(["w"] * 100)))
    for i in range(4):
        rows.append((2000 + i, "small", " ".join(["w"] * 100)))
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def _tok():
    return F.size(F.split(F.col("text"), r"\s+"))


def test_plan_respects_budget_and_caps(spark):
    df = _corpus(spark)
    plan = plan_token_mixture(df, "source", _tok(), budget_tokens=8000,
                              alpha=0.5, max_epochs=4.0)
    total = plan.pop("_total")
    assert total["planned_tokens"] <= total["budget_tokens"]
    # feasible budget (8000 < 4*12400) -> fully planned within rounding
    assert total["planned_tokens"] >= 8000 - len(plan)
    for s, p in plan.items():
        assert p["epochs"] <= 4.0 + 1e-9, s
    # tempering up-samples the small source relative to natural share
    nat = {s: p["tokens"] for s, p in plan.items()}
    share = {s: p["target_tokens"] / 8000 for s, p in plan.items()}
    nat_share = {s: n / sum(nat.values()) for s, n in nat.items()}
    assert share["small"] > nat_share["small"]
    assert share["big"] < nat_share["big"]


def test_waterfill_caps_and_redistributes(spark):
    """With a budget big enough to cap every source, each lands exactly
    at max_epochs; with only the small source capped, its excess flows
    to the others."""
    df = _corpus(spark)
    # 12400 total tokens; budget 2x max -> everything capped at 2 epochs
    plan = plan_token_mixture(df, "source", _tok(), budget_tokens=100_000,
                              alpha=0.5, max_epochs=2.0)
    for s in ("big", "mid", "small"):
        assert plan[s]["epochs"] == pytest.approx(2.0)
    assert plan["_total"]["planned_tokens"] == pytest.approx(2 * 12400, abs=3)

    # alpha=0 (uniform weights) with a mid budget: small caps first and
    # the remainder goes to big+mid
    plan2 = plan_token_mixture(df, "source", _tok(), budget_tokens=9000,
                               alpha=0.0, max_epochs=4.0)
    assert plan2["small"]["epochs"] == pytest.approx(4.0)
    assert plan2["big"]["target_tokens"] == plan2["mid"]["target_tokens"]
    assert plan2["_total"]["planned_tokens"] == pytest.approx(9000, abs=3)


def test_apply_materializes_expected_token_mass(spark):
    df = _corpus(spark)
    plan = plan_token_mixture(df, "source", _tok(), budget_tokens=8000,
                              alpha=0.5, max_epochs=4.0)
    out = apply_token_mixture(df, "doc_id", "source", plan)
    got = {
        r["source"]: int(r["t"])
        for r in out.withColumn("_tok", _tok())
        .groupBy("source").agg(F.sum("_tok").alias("t")).collect()
    }
    import math

    n_docs = {"big": 100, "mid": 20, "small": 4}
    for s in ("big", "mid", "small"):
        target = plan[s]["target_tokens"]
        frac = plan[s]["epochs"] % 1
        # fractional epochs are per-doc Bernoulli draws: allow 4 sigma
        # (plus one doc) of binomial noise in token units; an off-by-one
        # epoch error shifts the mass by n_docs*100 and still fails
        tol = 100 * (4 * math.sqrt(n_docs[s] * frac * (1 - frac)) + 1)
        assert abs(got[s] - target) <= tol, (s, got[s], target, tol)
    # epoch column: contiguous 0..floor(e) per doc, deterministic re-run
    again = apply_token_mixture(df, "doc_id", "source", plan)
    assert sorted(out.select("doc_id", "epoch").collect()) == sorted(
        again.select("doc_id", "epoch").collect()
    )
    small_epochs = {
        r["epoch"] for r in out.filter("source='small'").select("epoch").collect()
    }
    assert small_epochs == set(range(int(plan["small"]["epochs"]) + (
        1 if plan["small"]["epochs"] % 1 else 0)))


def test_apply_plan_is_zero_shuffle(spark):
    df = _corpus(spark)
    plan = plan_token_mixture(df, "source", _tok(), budget_tokens=8000)
    out = apply_token_mixture(df, "doc_id", "source", plan)
    plan_str = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan_str
    assert "Join" not in plan_str


def test_validation_and_empty(spark):
    df = _corpus(spark)
    with pytest.raises(ValueError):
        plan_token_mixture(df, "source", _tok(), budget_tokens=0)
    with pytest.raises(ValueError):
        plan_token_mixture(df, "source", _tok(), budget_tokens=10, max_epochs=0)
    empty = df.limit(0)
    p = plan_token_mixture(empty, "source", _tok(), budget_tokens=100)
    assert p["_total"]["planned_tokens"] == 0
    assert apply_token_mixture(empty, "doc_id", "source", p).count() == 0
