"""Temporal join operators Spark lacks natively.

``asof_join_backward``: for each left row, the single latest right row
with ``right.ts <= left.ts`` per key — the classic as-of join
(market-data / attribution shape).  Implemented with the union+window
trick: tag both sides, union, and take ``last(right, ignorenulls)``
over a (key, ts, tag)-ordered running window.  ONE shuffle on
(key), no Python, no range-join blowup — the idiomatic Spark plan for
this operator (a Pandas ``merge_asof`` per group would Arrow-transfer
both sides; the window form stays in Tungsten).

Right-side (key, ts) duplicates must be resolved before the join for
deterministic output; ``dedupe_latest`` keeps the max id per (key, ts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["asof_join_backward", "asof_join_forward", "asof_join_nearest", "dedupe_latest"]


def dedupe_latest(df: DataFrame, key: str, ts: str, id_col: str) -> DataFrame:
    w = Window.partitionBy(key, ts).orderBy(F.desc(id_col))
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    left_cols: list[str],
    right_cols: list[str],
) -> DataFrame:
    """Left rows + the latest right row at-or-before their timestamp.

    Output: ``left_cols`` + ``right_cols`` (right columns prefixed
    ``asof_``, null when no prior right row exists).
    """
    # the right payload rides as ONE struct so every output field comes
    # from the same matched row even when right columns contain nulls
    rstruct = F.struct(*[F.col(c).alias(c) for c in right_cols])
    rtype = right.select(rstruct.alias("_r")).schema["_r"].dataType
    lt = left.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        *[F.col(c).alias(f"_l_{c}") for c in left_cols],
        F.lit(None).cast(rtype).alias("_r"),
    )
    rt = right.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in left_cols],
        rstruct.alias("_r"),
    )
    unioned = lt.unionByName(rt)
    # right rows (tag 0) sort before left rows at equal ts → a right row
    # AT the left timestamp is visible to it (<= semantics)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn("_rf", F.last("_r", ignorenulls=True).over(w))
    out = filled.filter(F.col("_tag") == 1)
    return out.select(
        *[F.col(f"_l_{c}").alias(c) for c in left_cols],
        *[F.col("_rf").getField(c).alias(f"asof_{c}") for c in right_cols],
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    left_cols: list[str],
    right_cols: list[str],
) -> DataFrame:
    """Left rows + the EARLIEST right row at-or-after their timestamp
    (``right.ts >= left.ts``) — the forward as-of join.  Same
    union+window shape as the backward form: one shuffle on the key,
    ``first(ignorenulls)`` over a FOLLOWING window; left rows sort
    before right rows at equal ts so an exactly-simultaneous right row
    matches (>= semantics)."""
    rstruct = F.struct(*[F.col(c).alias(c) for c in right_cols])
    rtype = right.select(rstruct.alias("_r")).schema["_r"].dataType
    lt = left.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        *[F.col(c).alias(f"_l_{c}") for c in left_cols],
        F.lit(None).cast(rtype).alias("_r"),
    )
    rt = right.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in left_cols],
        rstruct.alias("_r"),
    )
    unioned = lt.unionByName(rt)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    filled = unioned.withColumn("_rf", F.first("_r", ignorenulls=True).over(w))
    out = filled.filter(F.col("_tag") == 0)
    return out.select(
        *[F.col(f"_l_{c}").alias(c) for c in left_cols],
        *[F.col("_rf").getField(c).alias(f"asof_{c}") for c in right_cols],
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    left_cols: list[str],
    right_cols: list[str],
) -> DataFrame:
    """Left rows + the CLOSEST right row by absolute time difference;
    exact ties prefer the earlier (backward) right row.  One pass:
    both directional fills run over the same unioned frame (still one
    shuffle on the key), then a deterministic distance pick.

    ``ts`` is added to the matched payload internally to compute the
    distance; output columns mirror the other variants."""
    rcols = list(right_cols) if ts in right_cols else [ts, *right_cols]
    rstruct = F.struct(*[F.col(c).alias(c) for c in rcols])
    rtype = right.select(rstruct.alias("_r")).schema["_r"].dataType
    lt = left.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_ts"),
        F.lit(1).alias("_btag"),
        F.lit(0).alias("_ftag"),
        *[F.col(c).alias(f"_l_{c}") for c in left_cols],
        F.lit(None).cast(rtype).alias("_r"),
    )
    rt = right.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_ts"),
        F.lit(0).alias("_btag"),
        F.lit(1).alias("_ftag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in left_cols],
        rstruct.alias("_r"),
    )
    unioned = lt.unionByName(rt)
    wb = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_btag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_ftag")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    filled = unioned.withColumn(
        "_rb", F.last("_r", ignorenulls=True).over(wb)
    ).withColumn("_rff", F.first("_r", ignorenulls=True).over(wf))
    out = filled.filter(F.col("_btag") == 1)
    lts = F.col("_ts").cast("timestamp").cast("long")
    db = lts - F.col("_rb").getField(ts).cast("timestamp").cast("long")
    df_ = F.col("_rff").getField(ts).cast("timestamp").cast("long") - lts
    pick = F.when(F.col("_rb").isNull(), F.col("_rff")).when(
        F.col("_rff").isNull(), F.col("_rb")
    ).when(df_ < db, F.col("_rff")).otherwise(F.col("_rb"))  # tie → backward
    out = out.withColumn("_rp", pick)
    return out.select(
        *[F.col(f"_l_{c}").alias(c) for c in left_cols],
        *[F.col("_rp").getField(c).alias(f"asof_{c}") for c in right_cols],
    )
