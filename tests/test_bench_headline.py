"""The bench stdout contract: ONE JSON line that FITS the driver's
2,000-byte capture window.

BENCH_r10.json and BENCH_r11.json both recorded ``parsed: null``
because the full result line grew to 4.8 KB while the driver keeps
only the last 2,000 bytes of stdout — the external perf gate was blind
for two rounds.  These tests pin the compact headline's size with a
result dict deliberately FATTER than anything bench.py produces, so
adding a query or a probe cannot silently regrow the line past the
window.
"""

from __future__ import annotations

import importlib.util
import json
import os

import pytest

_BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")


@pytest.fixture(scope="module")
def bench_mod():
    spec = importlib.util.spec_from_file_location("lsd2_bench_module", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _fat_result() -> dict:
    # 36 queries (bench currently times 30) with worst-case name
    # lengths and 4-significant-digit values
    queries = {f"q{i:02d}_{'x' * 22}": 123.456 for i in range(36)}
    qmin = {k: 122.333 for k in queries}
    density = {
        f"probe_{i}_{'y' * 18}_x10": {
            "base_sec": 12.345,
            "x10_sec": 123.456,
            "exec_ratio": 10.01,
            "base_out_rows": 1_000_000,
            "x10_out_rows": 10_000_000,
            "base_cand_rows": 99_999_999,
            "x10_cand_rows": 999_999_999,
            "cand_ratio": 100.0,
            "extra_breakdown": {str(j): j * 1.5 for j in range(12)},
        }
        for i in range(12)
    }
    density["cc_skew"] = {
        "wall_ratio": 10.44,
        "rounds_flat": True,
        "uniform": {"rounds": 3, "edges": 1_029_581},
        "mega_cluster_10pct": {"rounds": 3, "edges": 925_831},
    }
    density["cc_chain"] = {
        "d6": {"diameter": 6, "rounds": 7, "converged": True},
        "d24": {"diameter": 24, "rounds": 25, "converged": True},
        "capped_d24_steps8": {
            "rounds": 8,
            "converged": False,
            "cap_warned": True,
            "n_clusters": 17,
        },
    }
    return {
        "metric": "headline_query_wall_time",
        "value": 4444.444,
        "unit": "sec",
        "queries": queries,
        "queries_min": qmin,
        "sf": 0.1,
        "repeats": 3,
        "streaming": {
            "rows": 6000,
            "wall_sec_runs": [4.1, 4.2, 4.3],
            "min_rows_per_sec": 1758.3,
            "rows_per_sec": 1700.0,
        },
        "crossmatch_x10": {"exec_sec": 44.46, "plan_sec": 1.2, "pairs": 1},
        "crossmatch_skew": {
            "refined_speedup": 33.34,
            "auto_speedup": 33.31,
            "auto_pairs_equal": True,
            "auto_plan_sec": 12.3,
            "coarse_sec": 100.0,
        },
        "calibration": {
            "cpu_sec_min": 11.234,
            "cpu_sec_runs": [11.3, 11.4, 11.5],
            "shuffle_sec_min": 11.1,
            "normalized_min": {
                f"q{i:02d}_{'z' * 18}": 123.45 for i in range(8)
            },
        },
        "density_x10": density,
        "semdedup_recall": {"per_nprobe": {str(i): {"sec": 1} for i in range(8)}},
        "extras": {
            "curation_funnel": 144.823,
            "curation_funnel_reliable": 155.778,
            **{f"op_{i}": 9.999 for i in range(30)},
        },
        "loadavg_start": [1.0, 2.0, 3.0],
        "loadavg_end": [4.0, 5.0, 6.0],
    }


def _real_shaped_result() -> dict:
    """Strictly fatter than today's actual result (30 timed queries,
    19-char max name, 8 density probes) but inside the budget — the
    shape where NOTHING may be shed."""
    fat = _fat_result()
    queries = {f"q{i:02d}_{'x' * 16}": 123.456 for i in range(32)}
    fat["queries"] = queries
    fat["queries_min"] = {k: 122.333 for k in queries}
    # real probe names are 9-26 chars (lsh_pairs ... embedding_
    # neardup_scaledbits); 18-char names x 9 probes is fatter than the
    # real mix while keeping the no-shed property the test pins
    fat["density_x10"] = {
        f"probe_{i}_{'y' * 8}_x10": fat["density_x10"]["probe_0_" + "y" * 18 + "_x10"]
        for i in range(9)
    }
    fat["density_x10"]["cc_skew"] = _fat_result()["density_x10"]["cc_skew"]
    fat["density_x10"]["cc_chain"] = _fat_result()["density_x10"]["cc_chain"]
    return fat


def test_compact_line_fits_capture_window(bench_mod):
    # even an adversarially fat result (36 queries x 26-char names,
    # 12 probes) must fit: the size budget sheds low-priority sections
    # rather than regrow the line past the driver's window
    for result in (_fat_result(), _real_shaped_result()):
        compact = bench_mod.compact_headline(result)
        line = json.dumps(compact) + "\n"
        # the driver keeps the LAST 2,000 bytes; 1,800 leaves headroom
        assert len(line.encode()) <= 1800, (
            f"compact headline is {len(line)}B: {line[:200]}"
        )


def test_compact_line_has_driver_contract_keys(bench_mod):
    compact = bench_mod.compact_headline(_real_shaped_result())
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in compact, key
    assert compact["unit"] == "sec"
    assert isinstance(compact["queries"], dict) and len(compact["queries"]) == 32
    # per-query numbers are the min-of-repeats (load-robust)
    assert all(v == 122.333 for v in compact["queries"].values())
    assert compact["value"] == pytest.approx(32 * 122.333, abs=0.01)
    # at the real shape nothing is shed: every probe keeps one scalar
    # (9 density exec_ratios + crossmatch_sec + 2 skew speedups +
    # auto_pairs_equal + cc_rounds_flat + 2 cc_chain scalars)
    assert len(compact["probe_ratios"]) == 16
    assert compact["probe_ratios"]["cc_rounds_flat"] is True
    assert compact["probe_ratios"]["cc_chain_cap_warns"] is True
    assert compact["probe_ratios"]["cc_chain_d24_rounds"] == 25
    assert compact["probe_ratios"]["xmatch_auto_pairs_equal"] is True
    assert compact["streaming_rows_per_sec"] == 1758.3
    assert compact["curation_funnel"] == 144.823
    # calibration load discriminators present (normalized per-query
    # quotients are derivable: queries[q] / cal_cpu_min)
    assert compact["cal_cpu_min"] == 11.234
    assert compact["cal_shuffle_min"] == 11.1


def test_compact_line_is_single_json_line(bench_mod):
    line = json.dumps(bench_mod.compact_headline(_fat_result()))
    assert "\n" not in line
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_query_wall_time"


def test_compact_line_budget_holds_for_arbitrary_results(bench_mod):
    """Property: whatever bench.py grows into, the stdout line stays
    inside the driver's capture window and keeps the contract keys."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    name = st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz_0123456789", min_size=1, max_size=40
    )
    secs = st.floats(
        min_value=0.0, max_value=99999.0, allow_nan=False, allow_infinity=False
    )

    @settings(max_examples=60, deadline=None)
    @given(
        queries=st.dictionaries(name, secs, max_size=80),
        probes=st.dictionaries(
            name,
            st.fixed_dictionaries({"exec_ratio": secs, "base_sec": secs}),
            max_size=40,
        ),
        sf=st.one_of(secs, st.text(max_size=60)),
    )
    def check(queries, probes, sf):
        result = {
            "metric": "headline_query_wall_time",
            "value": 1.0,
            "unit": "sec",
            "queries": queries,
            "queries_min": {k: round(v, 3) for k, v in queries.items()},
            "sf": sf,
            "repeats": 3,
            "density_x10": probes,
            "extras": {"curation_funnel": 1.0},
            "streaming": {"min_rows_per_sec": 1.0},
        }
        line = json.dumps(bench_mod.compact_headline(result))
        # STRICT: the shedding loop halves the kept-queries count and
        # finally empties the dict, so no input shape can exceed the
        # window (an sf string is bounded at 60 here; real sf is a
        # float or a short path)
        assert len(line.encode()) <= 1800
        parsed = json.loads(line)
        for key in ("metric", "value", "unit", "queries", "sf"):
            assert key in parsed

    check()
