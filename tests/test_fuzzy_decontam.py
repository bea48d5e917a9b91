"""Fuzzy (MinHash) decontamination: catches edited eval leakage that
exact n-gram matching misses, exact-Jaccard parity with a Python
oracle, thresholds, totality, determinism, and plan shape."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from lsd2_spark.operators.decontam import decontaminate, fuzzy_decontaminate

WS = r"[ \t\n\r\f]+"

EVAL_DOC = (
    "the mitochondria is the powerhouse of the cell and produces energy "
    "through oxidative phosphorylation while ribosomes synthesize proteins "
    "from messenger rna templates inside every living organism on earth"
)


def _edit_every_kth(text: str, k: int) -> str:
    """Replace every k-th token — breaks all n-grams of length >= k
    while keeping token-set Jaccard high."""
    toks = text.split()
    return " ".join(
        f"EDIT{i}" if i % k == 0 else t for i, t in enumerate(toks)
    )


def _shingles(t: str, n: int = 3) -> set:
    toks = re.split(WS, t.lower())
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def _jaccard(a: str, b: str) -> float:
    sa, sb = _shingles(a), _shingles(b)
    return len(sa & sb) / len(sa | sb)


@pytest.fixture(scope="module")
def data(spark):
    edited = _edit_every_kth(EVAL_DOC, 6)
    train = spark.createDataFrame(
        [
            (1, EVAL_DOC),                       # verbatim leak
            (2, edited),                         # edited leak
            (3, "completely unrelated text about football matches and goals"),
            (4, None),                           # null text
            (5, EVAL_DOC + " extra suffix words appended here"),  # superset leak
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(100, EVAL_DOC), (101, "another benchmark question entirely different")],
        "doc_id long, text string",
    )
    return train, eval_df, edited


def test_catches_what_exact_ngrams_miss(spark, data):
    """THE motivating case: every-6th-token edits kill all 8-grams, so
    exact decontamination misses doc 2 — fuzzy flags it."""
    train, eval_df, edited = data
    exact = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(train, eval_df, "text", "doc_id", n=8).collect()
    }
    assert exact[1] is True and exact[2] is False  # exact misses the edit
    fuzzy = {
        r["doc_id"]: r
        for r in fuzzy_decontaminate(
            train, eval_df, "text", "doc_id", min_jaccard=0.2
        ).collect()
    }
    assert fuzzy[1]["fuzzy_contaminated"] is True
    assert fuzzy[2]["fuzzy_contaminated"] is True  # fuzzy catches it
    assert fuzzy[3]["fuzzy_contaminated"] is False
    assert fuzzy[4]["fuzzy_contaminated"] is False  # null text: clean, kept
    assert fuzzy[5]["fuzzy_contaminated"] is True
    # exact-Jaccard parity with the Python oracle, matched id correct
    assert fuzzy[1]["matched_eval_id"] == 100
    assert abs(fuzzy[1]["jaccard"] - 1.0) < 1e-12
    assert abs(fuzzy[2]["jaccard"] - _jaccard(edited, EVAL_DOC)) < 1e-12
    assert abs(
        fuzzy[5]["jaccard"] - _jaccard(EVAL_DOC + " extra suffix words appended here", EVAL_DOC)
    ) < 1e-12


def test_threshold_respected(spark, data):
    train, eval_df, edited = data
    j_edit = _jaccard(edited, EVAL_DOC)
    strict = {
        r["doc_id"]: r["fuzzy_contaminated"]
        for r in fuzzy_decontaminate(
            train, eval_df, "text", "doc_id", min_jaccard=j_edit + 0.05
        ).collect()
    }
    assert strict[1] is True  # verbatim still flagged
    assert strict[2] is False  # edited falls below the raised bar


def test_empty_eval_and_determinism(spark, data):
    train, _, _ = data
    empty = train.filter("doc_id < 0").select("doc_id", "text")
    out = fuzzy_decontaminate(train, empty, "text", "doc_id")
    assert out.filter("fuzzy_contaminated").count() == 0
    assert out.count() == train.count()
    _, eval_df, _ = data
    a = sorted(map(tuple, fuzzy_decontaminate(train, eval_df, "text", "doc_id").collect()))
    b = sorted(map(tuple, fuzzy_decontaminate(train, eval_df, "text", "doc_id").collect()))
    assert a == b


def test_string_ids_and_tiebreak(spark):
    """Two identical eval docs: the match must tie to the smaller id,
    with string ids working end to end."""
    train = spark.createDataFrame([("t1", EVAL_DOC)], "doc_id string, text string")
    eval_df = spark.createDataFrame(
        [("e9", EVAL_DOC), ("e1", EVAL_DOC)], "doc_id string, text string"
    )
    r = fuzzy_decontaminate(train, eval_df, "text", "doc_id").collect()[0]
    assert r["fuzzy_contaminated"] is True and r["matched_eval_id"] == "e1"


def test_validation(spark, data):
    train, eval_df, _ = data
    with pytest.raises(ValueError):
        fuzzy_decontaminate(train, eval_df, "text", "doc_id", min_jaccard=0.0)
    # non-positive bands would emit ZERO band rows -> an
    # everything-clean no-op
    for bad in (-1, -8, 0):
        with pytest.raises(ValueError):
            fuzzy_decontaminate(train, eval_df, "text", "doc_id", bands=bad)
    # bucket packing of MOD-reduced rows fits int64 only to MOD^3
    for bad_r in (0, -1, 4):
        with pytest.raises(ValueError):
            fuzzy_decontaminate(
                train, eval_df, "text", "doc_id", rows_per_band=bad_r
            )
    # wider bands are legal now (signature length = bands*rows)
    got = fuzzy_decontaminate(
        train, eval_df, "text", "doc_id", min_jaccard=0.9, bands=4,
        rows_per_band=2,
    )
    assert got.filter("doc_id = 1 AND fuzzy_contaminated").count() == 1


def test_long_doc_band_collisions_bounded(spark):
    """The 60-bit XOR minhash keeps band buckets of long UNRELATED
    docs from colliding — the mod-2^20 family concentrates long-doc
    minima near zero and false-collides at ~m/(2*MOD)."""
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30_000)]

    def long_doc():
        return " ".join(rng.choice(vocab) for _ in range(8_000))

    train = spark.createDataFrame(
        [(i, long_doc()) for i in range(30)], "doc_id long, text string"
    )
    eval_df = spark.createDataFrame(
        [(100 + i, long_doc()) for i in range(30)], "doc_id long, text string"
    )
    out = fuzzy_decontaminate(train, eval_df, "text", "doc_id", min_jaccard=0.2)
    assert out.filter("fuzzy_contaminated").count() == 0


def test_candidates_superset_and_distinct(spark, data):
    """The exposed candidate stage (the quantity the fuzzy_decontam_x10
    density probe measures) is (a) distinct pairs and (b) a SUPERSET of
    the verified matches — every (train, matched_eval) pair the full
    operator flags must have band-collided first."""
    from lsd2_spark.operators.decontam import fuzzy_decontam_candidates

    train, eval_df, _ = data
    cands = fuzzy_decontam_candidates(train, eval_df, "text", "doc_id")
    rows = cands.collect()
    pairs = {(r["_tid"], r["_eid"]) for r in rows}
    assert len(rows) == len(pairs)  # distinct
    flagged = fuzzy_decontaminate(
        train, eval_df, "text", "doc_id", min_jaccard=0.3
    ).filter("fuzzy_contaminated").collect()
    assert flagged  # fixture plants leaks; vacuous superset would hide a bug
    for r in flagged:
        assert (r["doc_id"], r["matched_eval_id"]) in pairs


def test_plan_broadcast_no_cartesian(spark, data):
    train, eval_df, _ = data
    plan = fuzzy_decontaminate(
        train, eval_df, "text", "doc_id"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_exact_jaccard_on_repetitious_docs(spark):
    """Heavy internal shingle repetition (where array_distinct
    collapses the most) and a strict-subset doc (|A∪B| = |B|) are the
    inputs that would expose any multiset-vs-set drift in the verify
    stage's intersect/union arithmetic — exact parity with the Python
    set oracle pins both."""
    doubled = EVAL_DOC + " " + EVAL_DOC  # every interior shingle twice
    half = " ".join(EVAL_DOC.split()[: len(EVAL_DOC.split()) // 2])
    train = spark.createDataFrame(
        [(1, doubled), (2, half)], "doc_id long, text string"
    )
    eval_df = spark.createDataFrame([(100, EVAL_DOC)], "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in fuzzy_decontaminate(
            train, eval_df, "text", "doc_id", min_jaccard=0.1
        ).collect()
    }
    assert out[1]["fuzzy_contaminated"] is True
    assert abs(out[1]["jaccard"] - _jaccard(doubled, EVAL_DOC)) < 1e-12
    assert out[2]["fuzzy_contaminated"] is True  # subset doc: |A∪B| = |B|
    assert abs(out[2]["jaccard"] - _jaccard(half, EVAL_DOC)) < 1e-12
