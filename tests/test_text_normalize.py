"""Unicode normalization + mojibake repair: DuckDB oracle parity on
the NFC path, ftfy-criterion conservatism on the repair path, and
shuffle-free plan shapes (the whole module is pre-dedup hot path)."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lsd2_spark.operators.text_normalize import (
    clean_text,
    fix_mojibake,
    strip_control_chars,
    strip_control_chars_sql,
    unicode_normalize,
)

NFD_CAFE = "cafe\u0301"  # e + combining acute
NFC_CAFE = "caf\u00e9"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, NFD_CAFE),
            (2, NFC_CAFE),
            (3, None),
            (4, ""),
            (5, "plain ascii"),
            (6, "\uff14\uff12 \ufb01sh"),  # fullwidth 42, fi ligature
            (7, "A\u030a"),  # A + combining ring
        ],
        "doc_id long, text string",
    )


def test_nfc_matches_duckdb_oracle(spark, docs):
    got = {
        r["doc_id"]: r["text"]
        for r in unicode_normalize(docs, "text", "NFC").collect()
    }
    con = duckdb.connect()
    con.register("d", docs.toPandas())
    want = {
        i: t
        for i, t in con.execute(
            "SELECT doc_id, nfc_normalize(text) FROM d"
        ).fetchall()
    }
    assert got == want
    assert got[1] == got[2] == NFC_CAFE  # NFD and NFC converge
    assert got[3] is None and got[4] == ""


def test_nfkc_folds_compatibility_chars(spark, docs):
    got = {
        r["doc_id"]: r["text"]
        for r in unicode_normalize(docs, "text", "NFKC").collect()
    }
    assert got[6] == "42 fish"
    assert got[7] == "\u00c5"


def test_normalize_rejects_bad_form(spark, docs):
    with pytest.raises(ValueError):
        unicode_normalize(docs, "text", "NFX")


def test_mojibake_repairs_planted_damage(spark):
    single = NFC_CAFE.encode("utf-8").decode("cp1252")  # 'cafÃ©'
    double = single.encode("utf-8").decode("cp1252")  # two layers
    # left quote + em dash only: '”' is utf-8 ...0x9D, undefined
    # in cp1252, so that damage arrives via latin-1 instead (below)
    curly = "“hi — ok".encode("utf-8").decode("cp1252")
    # '”' = utf-8 ...0x9D reaches the reader only via latin-1
    quoted = "hi”".encode("utf-8").decode("latin-1")
    df = spark.createDataFrame(
        [(1, single), (2, double), (3, curly), (4, quoted)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in fix_mojibake(df, "text").collect()}
    assert out[1]["text"] == NFC_CAFE and out[1]["mojibake_fixed"]
    assert out[2]["text"] == NFC_CAFE and out[2]["mojibake_fixed"]
    assert out[3]["text"] == "“hi — ok" and out[3]["mojibake_fixed"]
    assert out[4]["text"] == "hi”" and out[4]["mojibake_fixed"]


def test_mojibake_keeps_legitimate_text(spark):
    rows = [
        (1, "Ära não"),  # legit accents incl. marker-range chars
        (2, "日本語の文"),  # CJK
        (3, None),
        (4, ""),
        (5, "plain ascii"),
        (6, NFD_CAFE),  # combining mark, marker-free
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in fix_mojibake(df, "text").collect()}
    for i, t in rows:
        assert out[i]["text"] == t, (i, out[i]["text"])
        assert out[i]["mojibake_fixed"] is (None if t is None else False)


def test_mojibake_out_col_and_rounds_validation(spark):
    single = NFC_CAFE.encode("utf-8").decode("cp1252")
    df = spark.createDataFrame([(1, single)], "doc_id long, text string")
    out = fix_mojibake(df, "text", out_col="repaired").collect()[0]
    assert out["text"] == single and out["repaired"] == NFC_CAFE
    with pytest.raises(ValueError):
        fix_mojibake(df, "text", max_rounds=0)


def test_strip_control_chars_matches_sql_twin(spark):
    texts = [
        "a\x00b\x0bc\x1fd\x7fe\x85f",  # C0, VT, DEL, C1 (NEL)
        "keep\tthese\nwhite\rspace\x0cchars",
        "",
        None,
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    got = {
        r["i"]: r["s"]
        for r in df.select(
            "i", strip_control_chars(F.col("text")).alias("s")
        ).collect()
    }
    con = duckdb.connect()
    con.register("d", pd.DataFrame({"i": range(len(texts)), "text": texts}))
    want = {
        i: s
        for i, s in con.execute(
            f"SELECT i, {strip_control_chars_sql('text')} FROM d"
        ).fetchall()
    }
    assert got == want
    assert got[0] == "abcdef"
    assert got[1] == "keep\tthese\nwhite\rspace\x0cchars"


def test_clean_text_end_to_end_feeds_dedup(spark):
    """The composition contract: encoding-damaged NFD text and its
    clean NFC spelling hash together after clean_text."""
    from lsd2_spark.operators.dedup import normalized_dedup

    # latin-1: the combining acute's continuation byte 0x81 is
    # undefined in cp1252, so this damage can only arrive that way
    damaged = NFD_CAFE.encode("utf-8").decode("latin-1") + " bar\x07"
    df = spark.createDataFrame(
        [(1, damaged), (2, NFC_CAFE + " bar")], "doc_id long, text string"
    )
    cleaned = clean_text(df, "text")
    texts = {r["doc_id"]: r["text"] for r in cleaned.collect()}
    assert texts[1] == texts[2] == NFC_CAFE + " bar"
    dd = normalized_dedup(cleaned, "text", "doc_id").collect()
    assert {r["canonical_id"] for r in dd} == {1}


def test_plans_are_shuffle_free(spark, docs):
    for out in (
        unicode_normalize(docs, "text"),
        fix_mojibake(docs, "text"),
        clean_text(docs, "text"),
    ):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Join" not in plan
    # the pure-Column path must stay JVM-side entirely
    col_only = docs.select(strip_control_chars(F.col("text")).alias("s"))
    plan = col_only._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan  # no BatchEvalPython / ArrowEvalPython


def test_zero_row_batches(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    assert clean_text(df, "text").count() == 0
    assert unicode_normalize(df, "text", "NFKD").count() == 0


def test_clean_text_single_arrow_pass(spark):
    """Review finding: repair + normalization previously ran as two
    pandas UDFs, serializing every document across the Arrow boundary
    twice.  clean_text's plan must now carry exactly ONE Python eval
    node, and the fused result must equal the two-stage composition."""
    moji = "caf\u00c3\u00a9"  # "cafe-acute" shipped through cp1252
    nfd = "cafe\u0301"  # e + combining acute, no mojibake
    rows = [("m", moji), ("d", nfd), ("c", "plain ascii"), ("n", None)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = clean_text(df, "text")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1, plan
    got = {r["doc_id"]: (r["text"], r["mojibake_fixed"]) for r in out.collect()}
    assert got["m"] == ("caf\u00e9", True)
    # NFD composed inside the SAME fused UDF, on the not-suspect path
    assert got["d"] == ("caf\u00e9", False)
    assert got["c"] == ("plain ascii", False)
    assert got["n"] == (None, None)
    # parity with the unfused composition
    ref = unicode_normalize(fix_mojibake(df, "text"), "text")
    ref = ref.withColumn("text", strip_control_chars(F.col("text")))
    want = {r["doc_id"]: (r["text"], r["mojibake_fixed"]) for r in ref.collect()}
    assert got == want
