"""Subset replica of tools/correctness_local.py — same vanilla session,
same canonicalization, but only the queries named on the command line.
Used during optimization rounds to re-prove result identity for the
queries whose execution plans changed, without paying for the full
50-query battery on every iteration.

Usage: python tools/correctness_subset.py <sf_dir> q32_neardup_pairs [...]
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]

    sys.path.insert(0, ".")
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry
    from tests.oracle_harness import canonical_hash, compare_frames, duck_connection

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .appName("correctness-subset")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(sf_dir)
    qs, osql = entry.queries(), entry.oracle_sql()

    results = {}
    failed = False
    for name in names:
        t0 = time.perf_counter()
        try:
            got = qs[name](spark, sf_dir).toPandas()
            want = con.execute(osql[name]).df()
            compare_frames(got, want, name)
            res = {
                "rows": len(got),
                "hash": canonical_hash(got),
                "ok": True,
            }
        except Exception as e:
            res = {"ok": False, "err": f"{type(e).__name__}: {e}"[:300]}
            failed = True
        res["sec"] = round(time.perf_counter() - t0, 2)
        results[name] = res
        print(f"{name}: {'OK' if res.get('ok') else 'FAIL'} {res}", file=sys.stderr)
    print(json.dumps(results, default=str))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
