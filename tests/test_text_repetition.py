"""Gopher-style repetition signals: handcrafted expectations plus a
full DuckDB-oracle replay on the documents table (same rigor as the
gate, run in pytest because the driver gate surface is pinned at 50)."""

from __future__ import annotations

import pandas as pd

from lsd2_spark.operators import text_analysis

from tests.oracle_harness import compare, duck_connection

SF_DIR = "/root/testdata/sf0.001"

REPETITION_ORACLE_SQL = """
WITH l AS (
  SELECT doc_id, text,
         string_split(text, chr(10)) AS lines,
         length(text) AS n_chars
  FROM documents
), occ AS (
  SELECT doc_id, line, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM documents)
  GROUP BY doc_id, line
), linemass AS (
  SELECT doc_id,
         SUM((c - 1) * length(line)) AS dup_chars,
         SUM(c * length(line)) AS line_chars
  FROM occ GROUP BY doc_id
), tok AS (
  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t FROM documents
), bg AS (
  SELECT doc_id, concat_ws(' ', t[i], t[i + 1]) AS bigram
  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM tok)
), cnt AS (
  SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY doc_id, bigram
), top AS (
  SELECT doc_id, bigram, c FROM (
    SELECT doc_id, bigram, c,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, bigram DESC) AS rn
    FROM cnt
  ) WHERE rn = 1
)
SELECT l.doc_id,
       CAST(len(l.lines) AS INTEGER) AS n_lines,
       ROUND(CAST(len(l.lines) - len(list_distinct(l.lines)) AS DOUBLE)
             / len(l.lines), 6) AS dup_line_frac,
       ROUND(CASE WHEN lm.line_chars > 0
                  THEN CAST(lm.dup_chars AS DOUBLE) / lm.line_chars
                  ELSE 0.0 END, 6) AS dup_line_char_frac,
       top.bigram AS top_bigram,
       COALESCE(top.c, 0) AS top_bigram_n,
       ROUND(COALESCE(CAST(top.c * length(top.bigram) AS DOUBLE)
                      / NULLIF(l.n_chars, 0), 0.0), 6) AS top_bigram_char_frac
FROM l
JOIN linemass lm USING (doc_id)
LEFT JOIN top USING (doc_id)
"""


def test_repetition_stats_handcrafted(spark):
    rows = [
        # 4 lines, "dup" appears 3x -> dup_line_frac 2/4; dup char mass
        # = 2 extra occurrences * 3 chars over 3+3+3+5 line chars
        (1, "dup\ndup\ndup\nother"),
        # no repetition at all
        (2, "one two three"),
        # dominant bigram: "ha ha" from "ha ha ha ha" (3 occurrences)
        (3, "ha ha ha ha"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = (
        text_analysis.repetition_stats(df, "text", "doc_id")
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert got.loc[1, "n_lines"] == 4
    assert got.loc[1, "dup_line_frac"] == 0.5
    assert got.loc[1, "dup_line_char_frac"] == round(6 / 14, 6)
    assert got.loc[2, "dup_line_frac"] == 0.0
    assert got.loc[2, "dup_line_char_frac"] == 0.0
    assert got.loc[3, "top_bigram"] == "ha ha"
    assert got.loc[3, "top_bigram_n"] == 3
    # 3 occurrences * 5 chars / 11 text chars
    assert got.loc[3, "top_bigram_char_frac"] == round(15 / 11, 6)


def test_repetition_stats_single_token_and_line(spark):
    """Docs with no bigram (single token) and a single line must
    survive with zeroed fractions, not drop out or divide by zero."""
    df = spark.createDataFrame(
        [(1, "solo"), (2, "")], "doc_id long, text string"
    )
    got = (
        text_analysis.repetition_stats(df, "text", "doc_id")
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert len(got) == 2
    assert got.loc[1, "top_bigram_n"] == 0
    assert pd.isna(got.loc[1, "top_bigram"])
    assert got.loc[1, "top_bigram_char_frac"] == 0.0
    assert got.loc[2, "n_lines"] == 1
    assert got.loc[2, "dup_line_char_frac"] == 0.0


def test_repetition_stats_matches_oracle(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = text_analysis.repetition_stats(docs, "text", "doc_id")
    con = duck_connection(SF_DIR)
    compare(got, con, REPETITION_ORACLE_SQL, "repetition_stats")


def test_blocklist_filter_counts_and_gates(spark):
    from lsd2_spark.operators.text_analysis import blocklist_filter

    df = spark.createDataFrame(
        [
            (1, "a clean document about cats"),
            (2, "this BADWORD document has badword twice"),
            (3, "borderline with one badword only"),
        ],
        "doc_id long, text string",
    )
    kept = {r["doc_id"]: r["n_blocked_hits"] for r in blocklist_filter(
        df, "text", "doc_id", ["badword", "slur"]
    ).collect()}
    assert kept == {1: 0}  # case-insensitive, both occurrences counted

    lenient = {r["doc_id"]: r["n_blocked_hits"] for r in blocklist_filter(
        df, "text", "doc_id", ["badword"], max_hits=1
    ).collect()}
    assert lenient == {1: 0, 3: 1}

    import pytest as _pytest
    with _pytest.raises(ValueError):
        blocklist_filter(df, "text", "doc_id", [])


def test_blocklist_filter_keeps_null_text(spark):
    """Totality convention: lm_score/bpe_encode/decontaminate all keep
    NULL-text rows; blocklist_filter must too (a NULL doc has zero
    blocked hits), not silently drop them via NULL <= max_hits."""
    from lsd2_spark.operators.text_analysis import blocklist_filter

    df = spark.createDataFrame(
        [(1, "clean text"), (2, None), (3, "the badword")],
        "doc_id long, text string",
    )
    kept = {r["doc_id"]: r["n_blocked_hits"] for r in blocklist_filter(
        df, "text", "doc_id", ["badword"]
    ).collect()}
    assert kept == {1: 0, 2: 0}
