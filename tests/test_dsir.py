"""DSIR importance resampling: exact Python-reference parity for the
full featurize→train→score chain, enrichment behavior, determinism,
persistence, totality, and plan shape."""

from __future__ import annotations

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

from lsd2_spark.operators.dsir import (
    dsir_resample,
    dsir_score,
    hashed_ngram_counts,
    load_dsir,
    save_dsir,
    train_dsir,
)

B = 64  # tiny bucket count -> collisions exercised
S = 1.0

CHEM = [
    "benzene ring aromatic compound",
    "titration of the acid solution",
    "covalent bond energy in molecules",
    "oxidation state of the transition metal",
    "benzene and toluene solvent mixture",
]
SPORT = [
    "the striker scored a late goal",
    "midfield pressing won the match",
    "penalty shootout decided the final",
    "the goalkeeper saved a header",
    "corner kick led to the winning goal",
]


# ---- Python reference implementation (mirrors the docstring math) ----

def _ngrams(text: str) -> list[str]:
    toks = [t for t in re.split(r"[ \t\n\r\f]+", (text or "").lower()) if t]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _bucket(ng: str) -> int:
    return int(hashlib.md5(ng.encode()).hexdigest()[:15], 16) % B


def _ref_counts(texts: list[str]) -> dict[int, int]:
    c: dict[int, int] = {}
    for t in texts:
        for ng in _ngrams(t):
            b = _bucket(ng)
            c[b] = c.get(b, 0) + 1
    return c


def _ref_model(target: list[str], raw: list[str]):
    tc, rc = _ref_counts(target), _ref_counts(raw)
    tot_t, tot_r = sum(tc.values()), sum(rc.values())
    dt, dr = math.log(tot_t + S * B), math.log(tot_r + S * B)

    def ratio(b: int) -> float:
        return (math.log(tc.get(b, 0) + S) - dt) - (math.log(rc.get(b, 0) + S) - dr)

    return ratio


def _ref_score(text: str, ratio) -> float:
    return sum(ratio(_bucket(ng)) for ng in _ngrams(text))


@pytest.fixture(scope="module")
def corpora(spark):
    target = spark.createDataFrame([(i, t) for i, t in enumerate(CHEM)],
                                   "doc_id long, text string")
    raw_rows = [(100 + i, t) for i, t in enumerate(CHEM * 3)] + [
        (500 + i, t) for i, t in enumerate(SPORT * 9)
    ]
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    return target, raw


def test_hashed_counts_match_reference(spark):
    texts = [
        "Hello   World\thello",
        "unicode café naïve café",
        "",
        "single",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = {r["bucket"]: r["n"] for r in hashed_ngram_counts(df, "text", B).collect()}
    assert got == _ref_counts(texts)


def test_score_matches_reference_end_to_end(spark, corpora):
    target, raw = corpora
    model = train_dsir(target, raw, "text", n_buckets=B, smoothing=S)
    ratio = _ref_model(CHEM, CHEM * 3 + SPORT * 9)
    # the model default must equal the reference ratio of any bucket
    # unseen in both corpora (if the tiny B leaves one)
    seen = set(_ref_counts(CHEM)) | set(_ref_counts(CHEM * 3 + SPORT * 9))
    for b in range(B):
        if b not in seen:
            assert abs(model["default"] - ratio(b)) < 1e-12
            break
    got = {
        r["doc_id"]: (r["dsir_logweight"], r["n_ngrams"])
        for r in dsir_score(raw, "text", "doc_id", model).collect()
    }
    for did, text in [(100 + i, t) for i, t in enumerate(CHEM * 3)] + [
        (500 + i, t) for i, t in enumerate(SPORT * 9)
    ]:
        w, nng = got[did]
        assert abs(w - _ref_score(text, ratio)) < 1e-9, did
        assert nng == len(_ngrams(text))
    # chemistry docs must outscore sports docs under a chemistry target
    chem_min = min(got[d][0] for d in got if d < 500)
    sport_max = max(got[d][0] for d in got if d >= 500)
    assert chem_min > sport_max


def test_resample_enriches_toward_target(spark, corpora):
    target, raw = corpora
    model = train_dsir(target, raw, "text", n_buckets=B, smoothing=S)
    picked = dsir_resample(raw, "text", "doc_id", model, n=12, temperature=0.2)
    ids = [r["doc_id"] for r in picked.collect()]
    assert len(ids) == 12
    chem_share = sum(1 for i in ids if i < 500) / 12
    assert chem_share >= 0.8  # raw pool is only 25% chemistry
    # determinism
    ids2 = [r["doc_id"] for r in
            dsir_resample(raw, "text", "doc_id", model, n=12, temperature=0.2).collect()]
    assert sorted(ids) == sorted(ids2)


def test_mean_normalize_is_length_robust(spark, corpora):
    """With sum weights, a LONG off-target doc can outrank a short
    on-target one; per-ngram mean scoring must not."""
    target, raw = corpora
    model = train_dsir(target, raw, "text", n_buckets=B, smoothing=S)
    df = spark.createDataFrame(
        [
            (1, CHEM[0]),  # short, on-target
            (2, " ".join(SPORT * 20)),  # very long, off-target
        ],
        "doc_id long, text string",
    )
    sum_scores = {
        r["doc_id"]: r["dsir_logweight"]
        for r in dsir_score(df, "text", "doc_id", model).collect()
    }
    mean_scores = {
        r["doc_id"]: r["dsir_logweight"]
        for r in dsir_score(df, "text", "doc_id", model, normalize="mean").collect()
    }
    assert mean_scores[1] > mean_scores[2]
    # mean == sum / n_ngrams exactly
    nng = {
        r["doc_id"]: r["n_ngrams"]
        for r in dsir_score(df, "text", "doc_id", model).collect()
    }
    for d in (1, 2):
        assert abs(mean_scores[d] - sum_scores[d] / nng[d]) < 1e-12
    with pytest.raises(ValueError):
        dsir_score(df, "text", "doc_id", model, normalize="median")


def test_save_load_parity(spark, corpora, tmp_path):
    target, raw = corpora
    model = train_dsir(target, raw, "text", n_buckets=B, smoothing=S)
    save_dsir(model, str(tmp_path / "m"))
    loaded = load_dsir(spark, str(tmp_path / "m"))
    a = sorted(map(tuple, dsir_score(raw, "text", "doc_id", model)
                   .select("doc_id", "dsir_logweight").collect()))
    b = sorted(map(tuple, dsir_score(raw, "text", "doc_id", loaded)
                   .select("doc_id", "dsir_logweight").collect()))
    assert a == b


def test_null_and_empty_totality(spark, corpora):
    target, raw = corpora
    model = train_dsir(target, raw, "text", n_buckets=B)
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   \t  "), (4, "benzene ring")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in dsir_score(df, "text", "doc_id", model).collect()}
    assert set(rows) == {1, 2, 3, 4}
    for d in (1, 2, 3):
        assert rows[d]["dsir_logweight"] == 0.0 and rows[d]["n_ngrams"] == 0
    assert rows[4]["n_ngrams"] == 3


def test_validation(spark, corpora):
    target, raw = corpora
    with pytest.raises(ValueError):
        train_dsir(target, raw, "text", n_buckets=1)
    with pytest.raises(ValueError):
        train_dsir(target, raw, "text", smoothing=0.0)
    model = train_dsir(target, raw, "text", n_buckets=B)
    with pytest.raises(ValueError):
        dsir_resample(raw, "text", "doc_id", model, n=0)
    with pytest.raises(ValueError):
        dsir_resample(raw, "text", "doc_id", model, n=5, temperature=0.0)


def test_plan_broadcast_and_topk(spark, corpora):
    target, raw = corpora
    model = train_dsir(target, raw, "text", n_buckets=B)
    scored = dsir_score(raw, "text", "doc_id", model)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    sel = dsir_resample(raw, "text", "doc_id", model, n=5)
    plan2 = sel._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan2  # top-n, not a global sort
