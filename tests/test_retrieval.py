"""BM25 retrieval: hand-checked scores, DuckDB-oracle replay over the
real corpus, and plan-shape asserts (TakeOrdered top-k, broadcast idf)."""

from __future__ import annotations

import math

import pytest

from lsd2_spark.operators.retrieval import bm25_score, bm25_topk


def test_bm25_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (1, "cat sat on the mat"),
            (2, "cat cat cat"),
            (3, "dog runs"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bm25_score(docs, "cat", "text", "doc_id").collect()}
    assert set(out) == {1, 2}  # doc 3 has no query term

    n_docs, df = 3.0, 2.0
    avgdl = (5 + 3 + 2) / 3.0
    idf = math.log(1 + (n_docs - df + 0.5) / (df + 0.5))
    k1, b = 1.2, 0.75

    def s(tf, dl):
        return round(idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)), 6)

    assert out[1]["score"] == pytest.approx(s(1, 5))
    assert out[2]["score"] == pytest.approx(s(3, 3))
    assert out[2]["score"] > out[1]["score"]  # higher tf, shorter doc
    assert out[1]["n_query_terms_matched"] == 1


def test_bm25_multi_term_and_case(spark):
    docs = spark.createDataFrame(
        [(1, "The CAT and the dog"), (2, "the cat"), (3, "nothing here")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in bm25_score(docs, "Cat DOG cat", "text", "doc_id").collect()
    }
    # query terms dedup to {cat, dog}; matching is case-insensitive
    assert out[1]["n_query_terms_matched"] == 2
    assert out[2]["n_query_terms_matched"] == 1
    assert 3 not in out


def test_bm25_empty_query_raises(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_score(docs, "   ", "text", "doc_id")


def test_bm25_matches_duckdb_oracle_on_corpus(spark, sf_dir):
    """Full engine-portability check on the real documents table — the
    same standard as the gate queries, run in pytest because the gate
    surface is pinned at 50."""
    import duckdb

    query = "the data of system"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = (
        bm25_score(docs, query, "text", "doc_id")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    terms = "'the', 'data', 'of', 'system'"
    con = duckdb.connect()
    oracle = con.execute(f"""
        WITH base AS (
          SELECT doc_id,
                 regexp_split_to_array(lower(text), '\\s+') AS t,
                 CAST(len(regexp_split_to_array(lower(text), '\\s+')) AS DOUBLE) AS dl
          FROM read_parquet('{sf_dir}/documents.parquet')
        ), stats AS (
          SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM base
        ), m AS (
          SELECT doc_id, dl, unnest(list_filter(t, x -> x IN ({terms}))) AS term
          FROM base
        ), tf AS (
          SELECT doc_id, dl, term, CAST(COUNT(*) AS DOUBLE) AS tf
          FROM m GROUP BY doc_id, dl, term
        ), dfq AS (
          SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term
        )
        SELECT doc_id,
               ROUND(SUM(ln(1 + (n_docs - df + 0.5) / (df + 0.5)) * tf * 2.2
                         / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 6) AS score,
               COUNT(*) AS n_query_terms_matched
        FROM tf JOIN dfq USING (term) CROSS JOIN stats
        GROUP BY doc_id ORDER BY doc_id
    """).df()
    assert len(got) == len(oracle) > 0
    assert got["doc_id"].tolist() == oracle["doc_id"].tolist()
    assert got["n_query_terms_matched"].tolist() == oracle["n_query_terms_matched"].tolist()
    assert got["score"].tolist() == pytest.approx(oracle["score"].tolist(), abs=2e-6)


def test_bm25_topk_plans_as_take_ordered(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    top = bm25_topk(docs, "the data", "text", "doc_id", k=5)
    rows = top.collect()
    assert len(rows) == 5
    assert [r["score"] for r in rows] == sorted(
        [r["score"] for r in rows], reverse=True
    )
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan  # idf + corpus stats sides
