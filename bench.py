"""Benchmark harness — runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Per-query time = full plan execution to a count() action (forces scans,
shuffles, kernels; result sets are small so collection cost is noise).
Catalog ingest + pruned cone search run against a temp dir to exercise
the write path and partition pruning end-to-end.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_supplier_volume",
    "q06_revenue_forecast",
    "q07_window_topk",
    "q11_events_hourly",
    "q12_sessionize",
    "q15_asof_join",
    "q20_cone_search",
    "q21_crossmatch_knn",
    "q30_dedup_exact",
    "q31_minhash_signatures",
    "q32_lsh_pairs",
    "q35_token_stats",
    "q40_embedding_knn",
    "q41_ivf_topk",
    "q45_embedding_neardup",
]


def main() -> None:
    from lsd2_spark import get_spark
    from lsd2_spark.queries import all_queries

    spark = get_spark(app_name="lsd2_bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    # JIT/codegen warm-up outside the timings
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    times: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        queries[name](spark, SF_DIR).count()
        times[name] = round(time.perf_counter() - t0, 3)

    # catalog path: density-adaptive ingest + pruned cone search
    from pyspark.sql import functions as F

    from lsd2_spark.catalog import partition_catalog
    from lsd2_spark.queries.spatial import derive_dec, derive_ra

    tmp = tempfile.mkdtemp(prefix="lsd2_bench_")
    try:
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
            F.col("l_orderkey").alias("sid"),
            derive_ra(F.col("l_orderkey")).alias("ra"),
            derive_dec(F.col("l_orderkey")).alias("dec"),
        )
        t0 = time.perf_counter()
        cat = partition_catalog(
            li, f"{tmp}/cat", "bench", ra_col="ra", dec_col="dec", id_col="sid",
            threshold=50_000, order_k=6, write_margins=False,
        )
        times["catalog_ingest"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        cat.cone_search(45.0, 10.0, 10.0).count()
        times["catalog_cone_pruned"] = round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "headline_query_wall_time",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else SF_DIR,
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
