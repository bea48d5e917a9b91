"""Registry self-check — guards the driver correctness gate surface.

Round 5 post-mortem: the driver's CORRECTNESS artifact truncates at 50
entries, and with 52 registered queries the last two in registration
order (q44/q45) silently fell off the gate.  The surface is now pinned
at EXACTLY 50 queries, every one oracle-backed, with similarity (the
block that dropped) registered first.  Any rename/add/remove that would
silently change the gate surface fails here instead.
"""

from lsd2_spark.queries import all_oracles, all_queries

# The 50 gate queries, in registration order (== driver run order).
EXPECTED = [
    # similarity first — insurance against artifact truncation
    "q40_embedding_knn",
    "q41_ivf_topk",
    "q44_lsh_ann",
    "q45_embedding_neardup",
    # spatial
    "q20_cone_search",
    "q21_crossmatch_knn",
    # relational
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_supplier_volume",
    "q06_revenue_forecast",
    "q07_window_topk",
    "q08_rollup",
    "q09_semi_anti",  # merged former q09/q10 (round 10)
    "q11_events_hourly",
    "q12_sessionize",
    "q15_asof_join",
    "q16_cube",
    "q17_order_setops",  # merged former q17/q18
    "q19_median",
    "q14_conditional_agg",
    "q04_order_priority",
    "q22_idle_customers",
    "q47_asof_directions",  # merged former q47/q48
    "q51_event_windows",  # merged former q51/q52
    # text / LLM-pipeline
    "q30_dedup_variants",  # merged former q30/q59
    "q31_signatures",  # merged former q31/q34
    "q32_neardup_pairs",  # merged former q32/q33
    "q36_doc_profile",  # merged former q35/q36/q37
    "q38_fingerprints",  # merged former q38/q39
    "q42_media_profile",  # merged former q42/q43
    "q53_ppm_pixel_features",  # merged former q53/q55
    "q56_frame_sample",
    "q54_wav_audio_features",
    "q46_dedup_clusters",
    "q49_sample_and_split",  # merged former q49/q50 + temperature mixture
    "q57_kmv_distinct",  # merged former q57/q13 + KMV set algebra
    "q58_weighted_sample",  # merged former q58/q60 (round 11)
    "q61_text_hygiene",  # merged former q61/q62
    "q63_decontaminate",
    "q64_pack_sequences",
    "q65_passages",
    "q66_simhash_neardup",
    # round-9 additions: the round-8 LLM operators, driver-gated
    "q67_line_dedup",
    "q68_dsir_score",
    "q69_fuzzy_decontam",
    "q70_clean_text",
    # round-10 additions: HTML->text extraction (slot freed by the
    # q53/q55 merge), BM25 retrieval (slot freed by the q13->q57 merge),
    # and char-trigram LM scoring (slot freed by the q09/q10 merge)
    "q71_html_text",
    "q72_bm25_topk",
    "q73_lm_score",
    # round-11 addition: the batch curation funnel, end-to-end (slot
    # freed by the q58/q60 merge)
    "q74_curation_funnel",
]


def test_registry_is_exactly_the_50_gate_queries():
    assert list(all_queries()) == EXPECTED
    assert len(EXPECTED) == 50


def test_every_query_has_an_oracle():
    # full-fidelity gate: every registered query must have a DuckDB twin
    assert set(all_oracles()) == set(all_queries())


def test_registration_puts_similarity_first():
    # the round-5 truncation dropped the LAST registered block; keep the
    # historically-vulnerable similarity queries at the head
    assert list(all_queries())[:4] == [
        "q40_embedding_knn",
        "q41_ivf_topk",
        "q44_lsh_ann",
        "q45_embedding_neardup",
    ]


# Gate rows whose result is a single scalar-aggregate row BY DESIGN —
# the only queries allowed below the 2-row floor.  Everything else must
# match real data at sf0.01: round 12's post-mortem found q04 green at
# 0 rows because its date window fell outside the generator's
# 1995-2001 span, i.e. the gate had never run that operator on data.
SCALAR_SINGLETONS = {
    "q06_revenue_forecast": 1,  # single SUM() scalar (over ~1.2k matched rows)
}
ROW_FLOOR = 2


def _latest_hash_artifact(suffix):
    import glob
    import os
    import re

    root = os.path.join(os.path.dirname(__file__), "..")
    paths = glob.glob(os.path.join(root, f"CORRECTNESS_r*_{suffix}_hashes.json"))
    assert paths, f"no CORRECTNESS_r*_{suffix}_hashes.json artifact committed"

    def round_no(p):
        m = re.search(r"_r(\d+)_", os.path.basename(p))
        return int(m.group(1)) if m else -1

    return max(paths, key=round_no)


def test_gate_rows_match_real_data_at_both_sfs():
    """Every gate row must have matched >= ROW_FLOOR result rows in the
    committed hash artifacts at BOTH sf0.01 and sf0.1 (scalar-aggregate
    exceptions listed above).  A green-but-empty gate row certifies an
    operator the gate never ran on data — this makes that class of
    vacuous vector structurally impossible instead of judge-found."""
    import json

    for suffix in ("sf001", "sf01"):
        path = _latest_hash_artifact(suffix)
        with open(path) as f:
            art = json.load(f)
        rows = art["queries"]
        missing = set(EXPECTED) - set(rows)
        assert not missing, f"{path}: gate queries missing from artifact: {missing}"
        thin = {
            q: r["spark_rows"]
            for q, r in rows.items()
            if r["spark_rows"] < SCALAR_SINGLETONS.get(q, ROW_FLOOR)
        }
        assert not thin, f"{path}: gate rows below the row floor: {thin}"
        red = {q: r.get("status") for q, r in rows.items() if r.get("match") is False}
        assert not red, f"{path}: gate rows with hash mismatch: {red}"


def test_every_oracle_runs_under_vanilla_duckdb():
    """A driver-side DuckDB swap must not break oracle parsing: every
    oracle must PREPARE (parse + bind + plan) on a fresh, extension-free
    in-memory DuckDB connection against empty tables with the real
    schemas.  (Full value checks run in test_queries_oracle.py; this
    guards the parse/bind surface itself, cheaply.)"""
    import duckdb

    from lsd2_spark.queries import TABLES

    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in TABLES:
        # zero-row views with the genuine parquet schemas: binding is
        # fully exercised, evaluation cost is nil
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet') WHERE 1 = 0"
        )
    for name, sql in sorted(all_oracles().items()):
        try:
            con.execute(sql).fetchall()
        except Exception as e:  # pragma: no cover
            raise AssertionError(f"{name}: oracle failed under vanilla DuckDB: {e}")
    con.close()
