"""Focused per-query timing for optimization A/B runs.

Same methodology as bench.py's headline loop (count() action,
min/median of N repeats, bench session factory) but only the queries
named on the command line — so a tree change can be measured on an
idle box in minutes instead of re-running the whole bench.

Usage:
    python tools/time_queries.py [-n REPEATS] q32_neardup_pairs [...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    repeats = 3
    if args and args[0] == "-n":
        repeats = int(args[1])
        args = args[2:]
    names = args

    from lsd2_spark import get_spark
    from lsd2_spark.queries import all_queries

    spark = get_spark(app_name="lsd2_time_queries")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    # same JIT/codegen warm-up as bench.py
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(repeats):
        for name in names:
            spark.sparkContext.setJobDescription(f"time: {name}")
            t0 = time.perf_counter()
            queries[name](spark, SF_DIR).count()
            samples[name].append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
    out = {
        name: {
            "min": round(min(ts), 3),
            "med": round(sorted(ts)[len(ts) // 2], 3),
            "runs": [round(t, 3) for t in ts],
        }
        for name, ts in samples.items()
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
