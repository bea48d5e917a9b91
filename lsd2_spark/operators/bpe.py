"""BPE tokenizer training and encoding on-cluster.

Classic byte-pair-encoding (Sennrich et al. 2016) has the two-phase
shape every production trainer (sentencepiece, GPT-2) uses, and it
maps onto Spark cleanly:

1. **Word histogram** — the only pass over the corpus: one
   partial-aggregable ``groupBy(word).count()``.  At 100 TB this is
   the entire distributed cost; everything after operates on the
   (bounded, top-``max_vocab_words``) histogram.
2. **Merge loop** — the standard driver-side iteration over the word
   histogram: count adjacent symbol pairs weighted by word frequency,
   merge the most frequent pair, repeat.  State is O(vocab), never
   O(corpus) — this is NOT a driver-side loop over rows.
3. **Encode** — distributed again: an Arrow-batched kernel applies the
   learned merge ranks greedily per word, memoizing per distinct word
   within each batch (Zipf makes the hit rate high).

The merge list is a plain Python list of string pairs — persist it as
JSON and ship it anywhere.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lsd2_spark.functions.portable_hash import WS

__all__ = ["word_histogram", "train_bpe", "bpe_encode"]

_EOW = "</w>"


def word_histogram(df: DataFrame, text_col: str) -> DataFrame:
    """(word, count) over lower-cased whitespace tokens — one
    partial-aggregable groupBy; the corpus's only full pass."""
    return (
        df.select(
            F.explode(F.split(F.lower(F.col(text_col)), WS)).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def train_bpe(
    df: DataFrame,
    text_col: str,
    n_merges: int = 200,
    max_vocab_words: int = 50_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus.  The driver
    holds only the top-``max_vocab_words`` histogram rows (plan-sized
    by construction); ties in pair frequency break lexicographically
    so training is deterministic."""
    rows = (
        word_histogram(df, text_col)
        .orderBy(F.desc("count"), F.asc("word"))
        .limit(max_vocab_words)
        .collect()
    )
    # word -> (symbol tuple, freq); end-of-word marker per BPE convention
    vocab: dict[tuple[str, ...], int] = {}
    for r in rows:
        sym = tuple(r["word"]) + (_EOW,)
        vocab[sym] = vocab.get(sym, 0) + int(r["count"])

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, freq in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + freq
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break  # nothing left worth merging
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, freq in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == best[0] and sym[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + freq
        vocab = new_vocab
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    sym = list(word) + [_EOW]
    while len(sym) > 1:
        best_rank, best_i = None, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Encode each document with the learned merges: (id, tokens
    array, n_bpe_tokens).  Arrow-batched kernel, shuffle-free; per-word
    encodings are memoized within each batch (Zipf → high hit rate)."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            toks_col, counts = [], []
            for text in pdf[text_col]:
                toks: list[str] = []
                for w in (text or "").lower().split():
                    enc = cache.get(w)
                    if enc is None:
                        enc = _encode_word(w, ranks)
                        cache[w] = enc
                    toks.extend(enc)
                toks_col.append(toks)
                counts.append(len(toks))
            yield pd.DataFrame(
                {
                    "_id": pdf[id_col],
                    "tokens": pd.Series(toks_col, dtype="object"),
                    "n_bpe_tokens": counts,
                }
            )

    id_type = df.schema[id_col].dataType.simpleString()
    out = df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        kernel, f"_id {id_type}, tokens array<string>, n_bpe_tokens int"
    )
    return out.withColumnRenamed("_id", id_col)
