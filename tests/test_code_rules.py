"""Stack/StarCoder code-file rule battery (operators/code_rules.py).

Planted fixtures exercise each rule in isolation (a clean file fails
nothing; each dirty file fails exactly its own rule), plus the
null/empty totality contract and the zero-shuffle plan shape.
"""

import pytest
from pyspark.sql import functions as F

from lsd2_spark.operators.code_rules import starcoder_code_flags

CLEAN = (
    "import os\n\n"
    "def main(path):\n"
    "    for name in os.listdir(path):\n"
    "        print(name)\n\n"
    "if __name__ == '__main__':\n"
    "    main('.')\n"
)

MINIFIED = "var a=1;" * 300  # one 2400-char line

HEXDUMP = "\n".join("00 1f 8b 08 00 00 09 6e 88 00 ff" for _ in range(40))

AUTOGEN = "// Code automatically generated. DO NOT EDIT.\n" + CLEAN

LATE_MARKER = CLEAN + "\n" * 10 + "# note: auto-generated section below\n"

B64_BLOB = CLEAN + "DATA = '" + "QUJDREVGRwo4" * 500 + "'\n"  # 6000-char run

XML = "<?xml version=\"1.0\"?>\n<root><a>1</a></root>\n"

HTML = "<html><body><p>hello world text</p></body></html>"


def _flags(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = starcoder_code_flags(df, "text", "doc_id", **kw)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_each_rule_fires_alone(spark):
    got = _flags(
        spark,
        [
            ("clean", CLEAN),
            ("minified", MINIFIED),
            ("hexdump", HEXDUMP),
            ("autogen", AUTOGEN),
            ("late_marker", LATE_MARKER),
            ("b64", B64_BLOB),
            ("xml", XML),
        ],
    )
    c = got["clean"]
    assert c["code_pass"] and all(
        c[k] for k in ("line_len_ok", "alpha_ok", "not_autogen", "blob_ok", "not_xml")
    )

    assert not got["minified"]["line_len_ok"]
    assert not got["minified"]["code_pass"]
    assert got["minified"]["max_line_len"] == 2400

    assert not got["hexdump"]["alpha_ok"]
    assert got["hexdump"]["alpha_frac"] < 0.25

    assert not got["autogen"]["not_autogen"]
    assert not got["autogen"]["code_pass"]
    # marker OUTSIDE the 5-line header window does not fire
    assert got["late_marker"]["not_autogen"]
    assert got["late_marker"]["code_pass"]

    assert not got["b64"]["blob_ok"]
    assert got["b64"]["longest_blob_run"] == 6000
    assert got["b64"]["blob_frac"] > 0.5

    assert not got["xml"]["not_xml"]
    assert not got["xml"]["code_pass"]


def test_moderate_blob_passes(spark):
    """A short encoded constant (an 80-char key, say) is normal code."""
    doc = CLEAN + "KEY = '" + "A1b2" * 20 + "'\n"
    got = _flags(spark, [("k", doc)])
    assert got["k"]["longest_blob_run"] == 80
    assert got["k"]["blob_ok"] and got["k"]["code_pass"]


def test_visible_text_metric(spark):
    got = _flags(spark, [("h", HTML), ("t", "plain words only")])
    assert got["t"]["visible_text_frac"] == 1.0
    assert 0 < got["h"]["visible_text_frac"] < 0.5
    # visible-text is a metric, not part of code_pass
    assert got["h"]["not_xml"]


def test_null_and_empty_total(spark):
    got = _flags(spark, [("n", None), ("e", "")])
    for d in ("n", "e"):
        r = got[d]
        assert not r["code_pass"]
        assert r["mean_line_len"] is None
        assert r["alpha_frac"] is None
        assert not r["line_len_ok"] and not r["alpha_ok"]


def test_thresholds_overridable(spark):
    got = _flags(spark, [("m", MINIFIED)], max_mean_line_len=1e9, max_line_len=10_000)
    assert got["m"]["line_len_ok"]


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame([("a", CLEAN)], "doc_id string, text string")
    plan = (
        starcoder_code_flags(df, "text", "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan, plan


def test_xml_behind_bom_or_newline_still_flagged(spark):
    """Review finding: default btrim strips spaces only, so a BOM or
    leading newline hid the <?xml prolog."""
    got = _flags(
        spark,
        [
            ("bom", "﻿<?xml version=\"1.0\"?><root/>"),
            ("nl", "\n<?xml version=\"1.0\"?><root/>"),
        ],
    )
    assert not got["bom"]["not_xml"]
    assert not got["nl"]["not_xml"]


def test_hex_digest_runs_counted(spark):
    """A 40-char sha1 hex constant is a blob run (hex threshold 32 —
    at 64 the hex branch was dead, subsumed by the base64 class)."""
    doc = CLEAN + "SHA = 'da39a3ee5e6b4b0d3255bfef95601890afd80709'\n"
    got = _flags(spark, [("h", doc)])
    assert got["h"]["longest_blob_run"] == 40
    # a single digest in a normal file is fine overall
    assert got["h"]["blob_ok"] and got["h"]["code_pass"]
