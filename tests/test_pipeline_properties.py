"""Property tests: packing and decontamination against brute-force
Python references on randomized corpora."""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


def _text(rng_ints):
    return " ".join(WORDS[i % len(WORDS)] for i in rng_ints)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 1),  # shard
            st.lists(st.integers(0, 7), min_size=1, max_size=30),  # token ids
        ),
        min_size=1,
        max_size=25,
    )
)
def test_pack_sequences_matches_python_reference(spark, docs):
    from lsd2_spark.operators.packing import pack_sequences

    seq_len = 8
    rows = [
        (f"s{shard}", i, _text(toks)) for i, (shard, toks) in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    got = {
        (r["source"], r["seq_id"]): (
            r["n_docs"], r["n_tokens"], r["first_doc"], r["last_doc"]
        )
        for r in pack_sequences(
            df, "doc_id", F.size(F.split(F.col("text"), r"\s+")), seq_len, "source"
        ).collect()
    }

    # python reference: per-shard prefix sums in doc_id order
    ref: dict = {}
    for shard in sorted({r[0] for r in rows}):
        cum = 0
        for src, did, text in sorted(rows):
            if src != shard:
                continue
            n = len(text.split(" "))
            seq = cum // seq_len
            key = (shard, seq)
            nd, nt, fd, ld = ref.get(key, (0, 0, did, did))
            ref[key] = (nd + 1, nt + n, min(fd, did), max(ld, did))
            cum += n
    assert got == ref
    # conservation: every doc lands in exactly one sequence
    assert sum(v[0] for v in got.values()) == len(rows)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(st.lists(st.integers(0, 5), min_size=1, max_size=12), min_size=2, max_size=16),
    st.integers(2, 4),  # n-gram order
)
def test_decontaminate_matches_python_reference(spark, token_lists, n):
    from lsd2_spark.operators.decontam import decontaminate

    rows = [(i, _text(toks)) for i, toks in enumerate(token_lists)]
    eval_rows = [r for r in rows if r[0] % 3 == 0]
    train_rows = [r for r in rows if r[0] % 3 != 0]
    if not train_rows or not eval_rows:
        return
    ev = spark.createDataFrame(eval_rows, "doc_id long, text string")
    tr = spark.createDataFrame(train_rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_eval_ngram_hits"], r["contaminated"])
        for r in decontaminate(tr, ev, "text", "doc_id", n=n).collect()
    }

    def ngrams(text):
        t = text.lower().split(" ")
        return {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}

    eval_ngrams = set().union(*(ngrams(t) for _, t in eval_rows))
    for did, text in train_rows:
        hits = ngrams(text) & eval_ngrams
        assert got[did] == (len(hits), bool(hits)), (did, text)
    assert set(got) == {d for d, _ in train_rows}


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=2,
        max_size=24,
        unique=True,
    ),
    st.integers(1, 6),
)
def test_hamming_neardup_pairs_is_complete(spark, hashes, budget):
    """Pigeonhole guarantee: the banded join must find EVERY pair
    within the hamming budget (and nothing beyond it) — compared
    against the brute-force O(n^2) reference on random 64-bit hashes."""
    from lsd2_spark.operators.dedup import hamming_neardup_pairs

    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hashes)], "doc_id long, h long"
    )
    got = {
        (r["id1"], r["id2"]): r["hamming"]
        for r in hamming_neardup_pairs(
            df, "doc_id", "h", bits=64, max_hamming=budget
        ).collect()
    }

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    want = {
        (i, j): ham(hashes[i], hashes[j])
        for i in range(len(hashes))
        for j in range(i + 1, len(hashes))
        if ham(hashes[i], hashes[j]) <= budget
    }
    assert got == want


def test_hamming_neardup_pairs_remainder_band_width(spark):
    """bits=60 with max_hamming=6 makes 7 bands of 8 bits plus a 12-bit
    REMAINDER band (60 = 7*8 + 4 extra absorbed by the last band) — the
    mask branch every gated use dodges because their widths divide
    evenly.  Pigeonhole completeness vs the O(n^2) oracle, with planted
    pairs that differ ONLY inside the remainder band (the regression
    that a wrong last-band mask would miss) and decoys at budget+1."""
    import random

    from lsd2_spark.operators.dedup import hamming_neardup_pairs

    rng = random.Random(60)
    bits, budget = 60, 6
    base = [rng.getrandbits(bits) for _ in range(40)]
    hashes = list(base)
    # planted: flip 1..6 bits strictly inside the top (remainder) band
    # [48, 60), one per victim
    top_band_positions = list(range(48, 60))
    for k in range(1, budget + 1):
        h = base[k]
        for pos in rng.sample(top_band_positions, k):
            h ^= 1 << pos
        hashes.append(h)
    # decoy: budget+1 flips spread over remainder band + low bands
    d = base[10]
    for pos in [50, 55, 59, 3, 17, 33, 41]:
        d ^= 1 << pos
    hashes.append(d)

    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hashes)], "doc_id long, h long"
    )
    got = {
        (r["id1"], r["id2"]): r["hamming"]
        for r in hamming_neardup_pairs(
            df, "doc_id", "h", bits=bits, max_hamming=budget
        ).collect()
    }

    def ham(a, b):
        return bin(a ^ b).count("1")

    want = {
        (i, j): ham(hashes[i], hashes[j])
        for i in range(len(hashes))
        for j in range(i + 1, len(hashes))
        if ham(hashes[i], hashes[j]) <= budget
    }
    assert got == want
    # the planted remainder-band pairs are specifically present
    n = len(base)
    for k in range(1, budget + 1):
        assert got.get((k, n + k - 1)) == k
    # and the budget+1 decoy is specifically absent
    assert not any(10 in p and len(hashes) - 1 in p for p in got)
