"""Every registered query with an oracle must match DuckDB exactly at
sf0.001 (the driver gate runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from lsd2_spark.queries import all_oracles, all_queries
from tests.oracle_harness import compare, duck_connection

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


def _oracle_cases():
    oracles = all_oracles()
    return sorted(oracles.keys())


@pytest.mark.parametrize("name", _oracle_cases())
def test_query_matches_oracle(spark, duck, name):
    fn = all_queries()[name]
    sql = all_oracles()[name]
    df = fn(spark, SF_DIR)
    assert len(df.toPandas()) >= 0  # plan executes
    compare(fn(spark, SF_DIR), duck, sql, name)


def test_every_query_runs(spark):
    for name, fn in all_queries().items():
        df = fn(spark, SF_DIR)
        df.limit(1).collect()


def test_load_table_adapts_to_both_events_formats(spark, tmp_path):
    """The driver's generator has stored events.ts BOTH as
    TIMESTAMP(NANOS) (read as long under the legacy flag) and as
    timestamp[us] NTZ across rounds; load_table must normalize either
    to the same session-tz TimestampType instants."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from lsd2_spark.queries import load_table

    micros = [1_704_067_200_000_000, 1_704_070_800_123_456]
    base = {
        "event_id": pa.array([1, 2], pa.int64()),
        "user_id": pa.array([10, 20], pa.int64()),
        "event_type": pa.array(["click", "purchase"]),
        "value": pa.array([1.5, 2.5], pa.float64()),
        "props": pa.array(["{}", "{}"]),
    }

    us_dir = tmp_path / "us_form"
    us_dir.mkdir()
    pq.write_table(
        pa.table({**base, "ts": pa.array(micros, pa.timestamp("us"))}),
        us_dir / "events.parquet",
    )
    ns_dir = tmp_path / "ns_form"
    ns_dir.mkdir()
    pq.write_table(
        pa.table(
            {**base, "ts": pa.array([m * 1000 for m in micros], pa.timestamp("ns"))}
        ),
        ns_dir / "events.parquet",
        store_schema=False,  # bare TIMESTAMP(NANOS), as the old generator wrote
    )
    us_long_dir = tmp_path / "us_long_form"
    us_long_dir.mkdir()
    pq.write_table(
        pa.table({**base, "ts": pa.array(micros, pa.int64())}),
        us_long_dir / "events.parquet",  # plain int64 epoch micros
    )

    a = load_table(spark, str(us_dir), "events")
    b = load_table(spark, str(ns_dir), "events")
    c = load_table(spark, str(us_long_dir), "events")
    for d in (a, b, c):
        assert str(d.schema["ts"].dataType) == "TimestampType()"
    want = [m // 1_000_000 for m in micros]
    for d in (a, b, c):
        got = [r["e"] for r in d.select(F.col("ts").cast("long").alias("e")).orderBy("e").collect()]
        assert got == want


def test_load_table_leaves_session_conf_alone_and_memoizes_probe(
    spark, tmp_path, monkeypatch
):
    """Round-5 regression: load_table set nanosAsLong on the SHARED
    session for every events read (affecting unrelated parquet reads)
    and ran a probe Spark job per call.  Now the footer probe is
    driver-side, memoized per path, and the legacy conf is only touched
    for genuinely TIMESTAMP(NANOS) data."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    import lsd2_spark.queries as q
    from lsd2_spark.queries import load_table

    d = tmp_path / "ev"
    d.mkdir()
    micros = [1_704_067_200_000_000, 1_704_070_800_123_456]
    pq.write_table(
        pa.table({
            "event_id": pa.array([1, 2], pa.int64()),
            "user_id": pa.array([10, 20], pa.int64()),
            "event_type": pa.array(["a", "b"]),
            "value": pa.array([1.0, 2.0], pa.float64()),
            "props": pa.array(["{}", "{}"]),
            "ts": pa.array(micros, pa.timestamp("us")),
        }),
        d / "events.parquet",
    )

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    df = load_table(spark, str(d), "events")
    df.collect()
    # non-nanos data must not flip the session-global legacy conf
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "false"

    # the probe is memoized: a second build must not re-probe
    def boom(path):
        raise AssertionError("probe re-ran for a cached path")

    monkeypatch.setattr(q, "_probe_events_ts", boom)
    df2 = load_table(spark, str(d), "events")
    assert [r["e"] for r in df2.select(
        F.col("ts").cast("long").alias("e")).orderBy("e").collect()
    ] == [m // 1_000_000 for m in micros]


def test_q74_oracle_convergence_guard_fires_and_is_silent_when_converged(duck):
    """ADVICE r11: the q74 oracle unrolls its CC fixpoint to a fixed
    depth while Spark runs to convergence — a too-shallow unroll must
    surface as an explicit failure row, not a spurious hash mismatch.
    With steps=0 the guard compares round 1 against the initial labels
    (different on any corpus with >= 1 fuzzy edge), so the
    CC_UNCONVERGED row MUST appear; at the registered depth it must
    not (the sf0.001 corpus converges, as every gate run proves)."""
    from lsd2_spark.queries.text import _q74_sql

    shallow = duck.execute(_q74_sql(steps=0)).df()
    guard = shallow[shallow["kind"].str.startswith("CC_UNCONVERGED")]
    assert len(guard) == 1, "steps=0 must trip the convergence guard"
    assert int(guard["doc_id"].iloc[0]) > 0  # count of diverged labels

    full = duck.execute(_q74_sql()).df()
    assert not full["kind"].str.startswith("CC_UNCONVERGED").any()
    # and the guard row is the ONLY difference in row count
    assert len(shallow) >= len(full)


def test_q75_substr_oracle_handles_null_text_documents(spark, tmp_path):
    """Engine-fork regression (round-12 review): Spark concat_ws SKIPS
    a NULL text when building the boilerplate variant while SQL '||'
    would propagate it — the oracle uses a CASE twin.  The shipped sf
    dirs have zero NULL texts, so this pins the fork on a crafted
    corpus where two of three docs are NULL."""
    import duckdb
    import pandas as pd

    from lsd2_spark.queries.text import _VARIANT_OFF, _q75_sql, _q75_substr_part
    from tests.oracle_harness import canonical_hash

    pdf = pd.DataFrame(
        {
            "doc_id": [3, 13, 23],
            "text": [
                None,
                "alpha beta gamma delta epsilon zeta eta theta iota kappa",
                None,
            ],
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    got = _q75_substr_part(spark, str(tmp_path)).toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    want = con.execute(_q75_sql()).df()
    assert len(got) == len(want) == 6  # 3 docs + 3 boilerplate variants
    assert canonical_hash(got) == canonical_hash(want)
    # the NULL-text variants reduce to the bare boilerplate, which is
    # itself repeated across variants — spans must exist on exactly one
    null_variants = got[got.doc_id.isin([_VARIANT_OFF + 3, _VARIANT_OFF + 23])]
    assert (null_variants.n_spans > 0).sum() == 1
