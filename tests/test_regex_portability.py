"""Cross-engine regex portability: every gated tokenizer must split a
document IDENTICALLY under Java regex (Spark) and RE2 (DuckDB).

``\\s`` is the trap: Java's ASCII ``\\s`` is ``[ \\t\\n\\x0B\\f\\r]``
while RE2's is ``[ \\t\\n\\f\\r]`` — they disagree on \\x0B (vertical
tab), and Unicode-aware builds disagree on NBSP and friends.  The gate
surface therefore pins an explicit shared class
(``portable_hash.WS = "[ \\t\\n\\r\\f]+"``); this module plants every
divergent character in a synthetic corpus and replays the text-gate
oracles end-to-end on it, so a regression back to ``\\s`` (or any other
engine-defined class) fails here before it can red a driver row.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from lsd2_spark.functions.portable_hash import WS
from lsd2_spark.queries import TABLES, all_oracles, all_queries
from tests.oracle_harness import compare

SF_DIR = "/root/testdata/sf0.001"

# Every character on which Java \s, RE2 \s, or their Unicode variants
# disagree — plus the agreed ASCII set to keep the docs realistic.
NASTY = [
    "plain words only",
    "vertical\x0btab bites",       # Java \s splits here, RE2 \s does not
    "nbsp\u00a0joined\u00a0tokens",  # Unicode \s in ICU/Python, not ASCII
    "narrow\u202fnbsp here",
    "ideographic\u3000space",
    "line\u2028sep and\u2029para",
    "nextline\x85control",
    "ogham\u1680space mark",
    "mix \t tab\nnewline\rcr\fff end",
    "  leading and trailing  ",
    "",
]

# Gate rows whose oracle tokenizes/normalizes document text.
TEXT_GATE = [
    "q30_dedup_variants",
    "q31_signatures",  # merged former q31/q34
    "q32_neardup_pairs",  # merged former q32/q33
    "q36_doc_profile",  # merged former q35/q36/q37
    "q38_fingerprints",
    "q46_dedup_clusters",
    "q61_text_hygiene",  # merged former q61/q62
    "q63_decontaminate",
    "q64_pack_sequences",
    "q65_passages",
    "q66_simhash_neardup",
    "q67_line_dedup",
    "q68_dsir_score",
    "q69_fuzzy_decontam",
    "q70_clean_text",
    "q71_html_text",
]


@pytest.fixture(scope="module")
def nasty_sf_dir(spark, tmp_path_factory):
    """An sf-dir clone where ``documents`` carries the planted
    divergence characters; every other table links to sf0.001."""
    d = tmp_path_factory.mktemp("nasty_sf")
    for t in TABLES:
        src = f"{SF_DIR}/{t}.parquet"
        if t != "documents" and os.path.exists(src):
            os.symlink(src, d / f"{t}.parquet")
    base = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    docs = base.head(len(NASTY) * 3).copy().reset_index(drop=True)
    for i, txt in enumerate(NASTY * 3):
        docs.loc[i, "text"] = txt
    docs.to_parquet(d / "documents.parquet", index=False)
    return str(d)


@pytest.fixture(scope="module")
def nasty_duck(nasty_sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{nasty_sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    yield con
    con.close()


def test_ws_class_has_no_engine_defined_escape():
    assert "\\s" not in WS and "\\w" not in WS and "\\b" not in WS


def test_no_backslash_s_on_gate_surface():
    """Source scan: no ``\\s`` regex may appear anywhere in the package —
    every tokenizer goes through the shared portable class."""
    root = os.path.join(os.path.dirname(__file__), "..", "lsd2_spark")
    hits = []
    for dirpath, _, files in os.walk(root):
        for f in files:
            if not f.endswith(".py"):
                continue
            path = os.path.join(dirpath, f)
            with open(path) as fh:
                for i, line in enumerate(fh, 1):
                    if "\\s" in line and not line.lstrip().startswith("#"):
                        # allow prose mentions in docstrings that quote the
                        # trap itself; ban it inside any quoted regex
                        if "``" in line:
                            continue
                        hits.append(f"{path}:{i}: {line.strip()}")
    assert not hits, "engine-defined \\s on gate surface:\n" + "\n".join(hits)


def test_spark_duckdb_split_parity_on_planted_chars(spark, nasty_duck):
    """The primitive itself: F.split(text, WS) must equal DuckDB
    regexp_split_to_array(text, WS) for every planted document."""
    from pyspark.sql import functions as F

    sdf = spark.createDataFrame([(i, t) for i, t in enumerate(NASTY)], "i int, text string")
    got = {
        r["i"]: r["toks"]
        for r in sdf.select("i", F.split("text", WS).alias("toks")).collect()
    }
    con = nasty_duck
    for i, t in enumerate(NASTY):
        want = con.execute(
            "SELECT regexp_split_to_array(?, ?)", [t, WS]
        ).fetchone()[0]
        assert got[i] == want, f"doc {i!r}: {got[i]} != {want}"


@pytest.mark.parametrize("name", TEXT_GATE)
def test_text_gate_oracles_on_planted_divergence(spark, nasty_sf_dir, nasty_duck, name):
    fn = all_queries()[name]
    sql = all_oracles()[name]
    compare(fn(spark, nasty_sf_dir), nasty_duck, sql, name)
