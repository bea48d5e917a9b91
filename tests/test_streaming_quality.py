"""The text-quality/scoring projections compose with Structured
Streaming unchanged: gopher_quality_flags, quality_score, token_stats,
and dsir_score are pure projections (or broadcast-join + projection),
so the SAME operator call works on a readStream DataFrame — streamed
results must equal the batch run row for row."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lsd2_spark.operators.dsir import dsir_score, train_dsir
from lsd2_spark.operators.quality_rules import gopher_quality_flags
from lsd2_spark.operators.text_analysis import quality_score, token_stats
from lsd2_spark.streaming.events import run_to_memory_sink

from tests.conftest import SF_DIR

_DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _stream_vs_batch(spark, name, streamed_df, batch_df, key="doc_id"):
    run_to_memory_sink(streamed_df, name, mode="append")
    got = (
        spark.sql(f"SELECT * FROM {name}")
        .toPandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    want = batch_df.toPandas().sort_values(key).reset_index(drop=True)
    assert len(got) == len(want) > 0
    assert got.equals(want[got.columns]), name


@pytest.fixture(scope="module")
def stream_dir(spark, docs, tmp_path_factory):
    # a parquet dir holding ONLY documents rows (readStream over the
    # whole SF_DIR would mix tables)
    d = tmp_path_factory.mktemp("docstream")
    docs.write.mode("overwrite").parquet(str(d / "docs"))
    return str(d / "docs")


def _read_stream(spark, stream_dir):
    return spark.readStream.schema(_DOCS_SCHEMA).parquet(stream_dir)


def test_gopher_flags_streamable(spark, docs, stream_dir):
    s = gopher_quality_flags(_read_stream(spark, stream_dir), "text", "doc_id")
    b = gopher_quality_flags(docs, "text", "doc_id")
    _stream_vs_batch(spark, "gopher_stream", s, b)


def test_quality_and_token_stats_streamable(spark, docs, stream_dir):
    s = quality_score(_read_stream(spark, stream_dir), "text", "doc_id")
    b = quality_score(docs, "text", "doc_id")
    _stream_vs_batch(spark, "quality_stream", s, b)
    s2 = token_stats(_read_stream(spark, stream_dir), "text", "doc_id")
    b2 = token_stats(docs, "text", "doc_id")
    _stream_vs_batch(spark, "tokstats_stream", s2, b2)


def test_dsir_score_streamable(spark, docs, stream_dir):
    """A trained DSIR model scores a STREAM: the ratio table is a
    materialized local relation (train-time collect), so the scoring
    plan is stream-side explode + broadcast join + per-doc agg — but
    open aggregation needs a mode; scoring works under foreachBatch,
    the production shape for stream scoring."""
    target = docs.filter(F.col("doc_id") % 7 == 0).select("doc_id", "text")
    model = train_dsir(target, docs, "text", n_buckets=2048)
    batch_scores = (
        dsir_score(docs, "text", "doc_id", model)
        .select("doc_id", "dsir_logweight")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = []

    def score_batch(bdf, _bid):
        got.append(
            dsir_score(bdf, "text", "doc_id", model)
            .select("doc_id", "dsir_logweight")
            .toPandas()
        )

    q = (
        _read_stream(spark, stream_dir)
        .writeStream.foreachBatch(score_batch)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    import pandas as pd

    streamed = (
        pd.concat(got).sort_values("doc_id").reset_index(drop=True)
    )
    assert len(streamed) == len(batch_scores) > 0
    assert (streamed["doc_id"] == batch_scores["doc_id"]).all()
    assert (
        (streamed["dsir_logweight"] - batch_scores["dsir_logweight"]).abs() < 1e-9
    ).all()
