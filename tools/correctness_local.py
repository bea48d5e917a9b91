"""Local replica of the driver correctness gate, with per-query
canonical hashes for triangulating driver-environment divergences.

Runs every `__spark_entry__.queries()` entry against its
`oracle_sql()` twin on a VANILLA SparkSession (the driver builds its
own session, so session-factory configs must not matter) and records,
per query: rows/schema/value match, wall seconds, and the md5 of the
canonical (sorted, 17-significant-digit) form of BOTH the Spark and
DuckDB results.  When a future driver round reds a row that is green
here, diffing the recorded hashes against the driver's tells which
side moved (Spark result, oracle result, or the driver's hasher).

Usage:
    python tools/correctness_local.py [sf_dir] [out.json] [--reliable]
Defaults: /root/testdata/sf0.01, stdout.

--reliable sets a SparkContext checkpoint directory before any query
runs, which flips every `cut_lineage(mode="auto")` site in the engine
from local persist cuts to RELIABLE checkpoint cuts — the default mode
on a real cluster (operators/common.py:40).  Running the full 50-query
battery under it proves hash parity is mode-independent end-to-end,
not only in the funnel-equality unit test.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    argv = [a for a in sys.argv[1:] if a != "--reliable"]
    reliable = "--reliable" in sys.argv[1:]
    sf_dir = argv[0] if len(argv) > 0 else "/root/testdata/sf0.01"
    out_path = argv[1] if len(argv) > 1 else None

    sys.path.insert(0, ".")
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry
    from tests.oracle_harness import canonical_hash, compare_frames, duck_connection

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .appName("correctness-local")
        .getOrCreate()
    )
    ckpt_dir = None
    if reliable:
        import tempfile

        ckpt_dir = tempfile.mkdtemp(prefix="lsd2-reliable-gate-")
        spark.sparkContext.setCheckpointDir(ckpt_dir)
    con = duck_connection(sf_dir)

    qs, osql = entry.queries(), entry.oracle_sql()
    report: dict = {
        "sf_dir": sf_dir,
        "duckdb_version": duckdb.__version__,
        "spark_version": spark.version,
        "cut_mode": "reliable" if reliable else "local",
        "queries": {},
    }
    n_ok = 0
    for name, fn in qs.items():
        row: dict = {}
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
            row["spark_rows"] = len(got)
            row["spark_hash"] = canonical_hash(got)
            if name in osql:
                want = con.execute(osql[name]).df()
                row["oracle_rows"] = len(want)
                row["oracle_hash"] = canonical_hash(want)
                # compare the SAME executions the hashes came from —
                # re-running fn/sql would validate a different result
                # (and double the battery's wall time)
                compare_frames(got, want, name)
                row["match"] = row["spark_hash"] == row["oracle_hash"]
            else:
                row["match"] = None  # rows-only query
            row["status"] = "OK"
            n_ok += 1
        except Exception as ex:  # noqa: BLE001 — battery must finish
            row["status"] = "FAIL"
            row["err"] = str(ex)[:400]
        row["sec"] = round(time.time() - t0, 2)
        report["queries"][name] = row
        print(
            f"{row['status']:<5} {name} {row['sec']}s "
            f"hash={row.get('spark_hash', '')[:12]}",
            flush=True,
        )
    report["n_ok"] = n_ok
    report["n_total"] = len(qs)
    blob = json.dumps(report, indent=1)
    if out_path:
        with open(out_path, "w") as f:
            f.write(blob + "\n")
        print(f"wrote {out_path}: {n_ok}/{len(qs)} OK")
    else:
        print(blob)
    spark.stop()
    if ckpt_dir:
        import shutil

        shutil.rmtree(ckpt_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
