"""Spatial operator surface over the driver's relational testdata.

The testdata has no native sky positions, so deterministic positions
are **derived from integer keys** with pure integer arithmetic — the
exact same formula is expressible in Spark and ANSI SQL, which makes
the spatial operators oracle-checkable end-to-end:

    ra  = (key * 9973 % 360000) / 1000.0          ∈ [0, 360)
    dec = (key * 7919 % 160000) / 1000.0 - 80.0   ∈ [-80, 80)

Cone search semantics follow the reference (hipscat/catalog.py:65-141,
hipscat/dask_utils.py:330-364): great-circle distance to a fixed
center, keep rows with dist < radius, append the distance column.
Distances are rounded to 1e-6 deg in BOTH engines so JVM/libm trig
ULP differences cannot flip the value hash.

The catalog-backed cone search (with real HEALPix partition pruning)
lives in lsd2_spark.catalog; this module exercises the same distance
predicate through the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from lsd2_spark.functions.spherical import gc_dist, gc_dist_sql
from lsd2_spark.queries import load_table, register

__all__ = ["derive_ra", "derive_dec", "derive_sql", "CONE"]


def derive_ra(key: Column) -> Column:
    return (key * 9973 % 360000) / 1000.0


def derive_dec(key: Column) -> Column:
    return (key * 7919 % 160000) / 1000.0 - 80.0


def derive_sql(key: str) -> tuple[str, str]:
    return (
        f"({key} * 9973 % 360000) / 1000.0",
        f"({key} * 7919 % 160000) / 1000.0 - 80.0",
    )


# golden cone query (center/radius chosen to select a non-trivial subset)
CONE = {"ra": 45.0, "dec": 10.0, "radius": 15.0}


def q20_cone_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    df = li.select(
        "l_orderkey",
        "l_linenumber",
        derive_ra(F.col("l_orderkey")).alias("ra"),
        derive_dec(F.col("l_orderkey")).alias("dec"),
    )
    dist = gc_dist(F.col("ra"), F.col("dec"), CONE["ra"], CONE["dec"])
    return (
        df.withColumn("_dist", F.round(dist, 6))
        .filter(F.col("_dist") < CONE["radius"])
    )


_ra_sql, _dec_sql = derive_sql("l_orderkey")
register(
    "q20_cone_search",
    q20_cone_search,
    f"""
    SELECT * FROM (
      SELECT l_orderkey, l_linenumber,
             {_ra_sql} AS ra, {_dec_sql} AS dec,
             ROUND({gc_dist_sql(_ra_sql, _dec_sql, str(CONE["ra"]), str(CONE["dec"]))}, 6) AS _dist
      FROM lineitem) t
    WHERE _dist < {CONE["radius"]}
    """,
)
