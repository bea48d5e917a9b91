"""ExactSubstr-style repeated-substring removal, verified against a
brute-force Python oracle implementing the same window semantics."""

from __future__ import annotations

import pytest

from lsd2_spark.operators.substring_dedup import (
    remove_repeated_spans,
    repeated_spans,
)


def _oracle_spans(rows, L, keep="first"):
    """Brute force: count every length-L token window, elect the
    min-(doc, start) owner, merge removable window intervals."""
    wins: dict[tuple, list[tuple[int, int]]] = {}
    toks = {i: t.split() for i, t in rows if t is not None}
    for i, t in toks.items():
        for s in range(len(t) - L + 1):
            wins.setdefault(tuple(t[s : s + L]), []).append((i, s + 1))
    removable: dict[int, set[int]] = {}
    for occ in wins.values():
        if len(occ) < 2:
            continue
        owner = min(occ)
        for o in occ:
            if keep == "first" and o == owner:
                continue
            removable.setdefault(o[0], set()).add(o[1])
    spans = {}
    for i, starts in removable.items():
        covered = set()
        for s in starts:
            covered.update(range(s, s + L))
        merged, cur = [], None
        for p in sorted(covered):
            if cur and p == cur[1]:
                cur[1] = p + 1
            else:
                cur = [p, p + 1]
                merged.append(cur)
        spans[i] = {(a, b) for a, b in merged}
    return spans


CORPUS = [
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    # doc 2 repeats doc 1's middle run (beta..theta, 7 tokens)
    (2, "prefix one two beta gamma delta epsilon zeta eta theta suffix here"),
    # doc 3 repeats the SAME run again plus doc 2's "suffix here" tail? (too short)
    (3, "beta gamma delta epsilon zeta eta theta and unrelated trailing words"),
    # doc 4: internal repetition (same 5-gram twice in one doc)
    (4, "red green blue cyan magenta filler words red green blue cyan magenta"),
    # doc 5: fully unique
    (5, "totally unique content that appears nowhere else in this corpus"),
]


@pytest.mark.parametrize("keep", ["first", "none"])
@pytest.mark.parametrize("L", [3, 5])
def test_spans_match_bruteforce(spark, L, keep):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got: dict[int, set] = {}
    for r in repeated_spans(df, "text", "doc_id", min_tokens=L, keep=keep).collect():
        got.setdefault(r["doc_id"], set()).add((r["span_start"], r["span_end"]))
    assert got == _oracle_spans(CORPUS, L, keep)


def test_keep_first_preserves_one_copy(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in remove_repeated_spans(df, "text", "doc_id", min_tokens=5).collect()
    }
    # doc 1 owns the repeated run — untouched
    assert out[1]["clean_text"] == CORPUS[0][1]
    assert out[1]["n_spans"] == 0
    # docs 2 and 3 lose exactly the 7-token run
    assert "beta gamma delta epsilon zeta" not in out[2]["clean_text"]
    assert out[2]["clean_text"].startswith("prefix one two")
    assert out[2]["clean_text"].endswith("suffix here")
    assert out[2]["n_tokens_removed"] == 7
    assert "beta" not in out[3]["clean_text"]
    assert out[3]["clean_text"].endswith("and unrelated trailing words")
    # doc 4 keeps its first internal copy, loses the second
    assert out[4]["clean_text"] == "red green blue cyan magenta filler words"
    assert out[4]["n_tokens_removed"] == 5
    # unique doc untouched
    assert out[5]["clean_text"] == CORPUS[4][1]
    assert out[5]["n_tokens_removed"] == 0


def test_keep_none_scrubs_every_copy(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    out = {
        r["doc_id"]: r["clean_text"]
        for r in remove_repeated_spans(
            df, "text", "doc_id", min_tokens=5, keep="none"
        ).collect()
    }
    for i in (1, 2, 3):
        assert "gamma delta epsilon" not in out[i]
    assert out[4] == "filler words"


def test_total_over_null_and_short_docs(spark):
    rows = [
        (1, None),
        (2, "short doc"),
        (3, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (4, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in remove_repeated_spans(df, "text", "doc_id", min_tokens=5).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["clean_text"] is None and out[1]["n_tokens_removed"] == 0
    assert out[2]["clean_text"] == "short doc"
    assert out[3]["clean_text"] == rows[2][1]  # owner copy survives
    assert out[4]["clean_text"] == "" and out[4]["n_tokens_removed"] == 10


def test_overlapping_repeats_merge_into_one_span(spark):
    """Two duplicated windows overlapping in one doc must merge into a
    single maximal span, not double-remove tokens."""
    rows = [
        (1, "a b c d e f g h"),
        (2, "x a b c d e y"),    # shares window (a b c d e)? L=4: a b c d / b c d e
        (3, "z b c d e f w"),    # shares b c d e / c d e f
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["span_start"], r["span_end"])
        for r in repeated_spans(df, "text", "doc_id", min_tokens=4).collect()
    }
    assert got == _oracle_spans_single(rows, 4)


def _oracle_spans_single(rows, L):
    spans = _oracle_spans(rows, L)
    assert all(len(v) == 1 for v in spans.values())
    return {i: next(iter(v)) for i, v in spans.items()}


def test_plan_is_one_window_shuffle_no_cartesian(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    out = remove_repeated_spans(df, "text", "doc_id", min_tokens=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_validation(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    with pytest.raises(ValueError):
        repeated_spans(df, "text", "doc_id", keep="bogus")
    with pytest.raises(ValueError):
        repeated_spans(df, "text", "doc_id", min_tokens=0)


def test_window_keys_respect_token_boundaries(spark):
    """Different tokenizations whose characters concatenate identically
    must NOT be treated as repeated windows ('ab c d e' vs 'a bc d e'
    would collide under a separator-free window key)."""
    rows = [
        (1, "ab c d e w1 w2 w3"),
        (2, "a bc d e v1 v2 v3"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert repeated_spans(df, "text", "doc_id", min_tokens=4).count() == 0
