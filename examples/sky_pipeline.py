"""End-to-end spatial catalog pipeline — the reference's core workflow
composed: ingest → query → cross-match → visualize → append →
rebalance → delete →
audit.  Run directly: ``python examples/sky_pipeline.py [workdir]``.

Every stage is the scale-shaped path: one-shuffle adaptive ingest,
partition-pruned cone search, boundary-correct kNN cross-match via
query-time halos, dynamic-overwrite incremental append and predicate
delete, and the fsck metadata-vs-disk audit.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd


def synthetic_survey(n: int, seed: int, hotspot: bool = True) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    ra = rng.uniform(0, 360, n)
    dec = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    if hotspot:  # dense region so the adaptive map splits orders
        m = n // 3
        ra[:m] = (45.0 + rng.normal(0, 2.0, m)) % 360
        dec[:m] = np.clip(10.0 + rng.normal(0, 2.0, m), -90, 90)
    return pd.DataFrame(
        {
            "source_id": np.arange(n, dtype=np.int64),
            "ra": ra % 360.0,
            "dec": np.clip(dec, -90, 90),
            "mag": rng.uniform(10, 22, n),
        }
    )


def main(workdir: str) -> None:
    from lsd2_spark import get_spark
    from lsd2_spark.catalog import Catalog, partition_catalog

    spark = get_spark(app_name="sky_pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. ingest two overlapping surveys (one histogram pass + one
    #    shuffled partitioned write each, margins included)
    a = partition_catalog(
        spark.createDataFrame(synthetic_survey(30_000, 1)),
        f"{workdir}/survey_a", "survey_a",
        ra_col="ra", dec_col="dec", id_col="source_id",
        threshold=4_000, order_k=5,
    )
    b = partition_catalog(
        spark.createDataFrame(synthetic_survey(20_000, 2)),
        f"{workdir}/survey_b", "survey_b",
        ra_col="ra", dec_col="dec", id_col="source_id",
        threshold=4_000, order_k=5,
    )
    print(f"ingested: A={a.meta.n_sources} rows / "
          f"{sum(len(v) for v in a.meta.hips.values())} cells, "
          f"B={b.meta.n_sources} rows")

    # 2. partition-pruned cone search + SQL over the same catalog
    cone = a.cone_search(45.0, 10.0, radius=3.0)
    print("cone(45,10,r=3):", cone.count(), "sources")
    view = a.create_view()
    bright = spark.sql(f"SELECT count(*) c FROM {view} WHERE mag < 15")
    print("bright sources (SQL over catalog view):", bright.collect()[0]["c"])

    # 3. boundary-correct kNN cross-match (cogrouped kernel, one
    #    shuffle per side, halos built query-time)
    xm = a.cross_match(b, n_neighbors=1, dthresh=0.05)
    print("cross-match pairs within 0.05 deg:", xm.count())

    # 4. SVG sky renderings (sources, partitions, coverage overlap)
    svg = a.visualize_partitions()
    with open(f"{workdir}/partitions.svg", "w") as f:
        f.write(svg)
    print("wrote", f"{workdir}/partitions.svg", f"({len(svg)} bytes)")

    # 5. incremental append (only touched cells re-rank and rewrite)
    batch = synthetic_survey(2_000, 3)
    batch["source_id"] += 10_000_000
    a2 = a.append(spark.createDataFrame(batch))
    print("after append:", a2.meta.n_sources, "sources")

    # 5b. in-place rebalance: split any cells the append pushed over
    # the density threshold (adaptive re-plan, only those cells rewritten)
    a2 = a2.rebalance()
    print("after rebalance:", a2.meta.n_sources, "sources,",
          sum(len(ps) for ps in a2.meta.hips.values()), "cells")

    # 6. predicate delete (right-to-be-forgotten; cell-local rewrite)
    a3 = a2.delete("mag > 21.5")
    print("after delete(mag > 21.5):", a3.meta.n_sources, "sources")

    # 7. audit: metadata vs bytes on disk
    report = a3.fsck()
    print("fsck consistent:", report["consistent"], "| rows:",
          report["n_rows_disk"], "| dup ids:", report["duplicate_ids"])
    assert report["consistent"], report

    # 8. reload from disk — the committed state is the whole story
    again = Catalog.load(spark, f"{workdir}/survey_a", "survey_a")
    assert again.meta.n_sources == a3.meta.n_sources
    print("reload OK:", again.meta.n_sources)
    spark.stop()


if __name__ == "__main__":
    wd = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="sky_")
    os.makedirs(wd, exist_ok=True)
    main(wd)
