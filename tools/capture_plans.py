"""Dump .explain("formatted") for every declared query to plans/<tag>/.

Usage: python tools/capture_plans.py <tag> [query ...]

Writes plans/<tag>/<query>_<suffix>.txt where suffix is "before" or
"after" (the tag is e.g. "r13"; pass --suffix after).  Building a query
DataFrame may itself run plan-sized Spark jobs (k-means seeding,
density counts) — that is part of the declared query and is captured
as-is.  No query is executed; only the plan string is rendered.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    suffix = "after" if "--after" in sys.argv else "before"
    tag = args[0] if args else "r13"
    only = set(args[1:])

    from lsd2_spark import get_spark
    from lsd2_spark.queries import all_queries

    spark = get_spark(app_name="lsd2_capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    for name, fn in sorted(all_queries().items()):
        if only and name not in only:
            continue
        try:
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # capture the failure instead of dying
            plan = f"ERROR building {name}: {type(e).__name__}: {e}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"{name}: {len(plan)} bytes -> {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
