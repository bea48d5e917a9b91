"""Relational operator surface — scans, filters, joins, aggregations,
windows, sorts, set ops, rollups — expressed as idiomatic DataFrame
plans with ANSI-SQL oracles.

The reference exposes this surface by passing through to the Dask
DataFrame API (reference README.md:159-233: ``assign``/``query``/
``compute``/``to_parquet``); here it is first-class Catalyst.  Each
query doubles as a declared operator from SURVEY.md §2 (P4/P5 filters
and computed columns, J* joins, A* aggregations, W1 windows, O* sorts,
U* set ops).

**Float determinism**: SUM over doubles is accumulation-order-dependent
and would never hash-match an external oracle.  Every floating
aggregate therefore casts the (deterministic, per-row) double expression
to DECIMAL(28,6), sums exactly, and casts the final value back to
double — both engines then produce bit-identical results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lsd2_spark.functions.numeric import round6
from lsd2_spark.queries import load_table, register

DEC = "decimal(28,6)"


def dsum(c: Column) -> Column:
    """Exact decimal sum of a double expression, returned as double."""
    return F.sum(c.cast(DEC)).cast("double")


def _dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(28,6))) AS DOUBLE)"


# ---------------------------------------------------------------------------
# Q01 — pricing summary: selective scan → wide grouped aggregation
# (TPC-H Q1 shape; exercises P4 predicate, P5 computed cols, A1/A5 aggs)
# ---------------------------------------------------------------------------


def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            (dsum(F.col("l_quantity")) / F.count(F.lit(1))).alias("avg_qty"),
            (dsum(F.col("l_extendedprice")) / F.count(F.lit(1))).alias("avg_price"),
            (dsum(F.col("l_discount")) / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


register(
    "q01_pricing_summary",
    q01_pricing_summary,
    f"""
    SELECT l_returnflag, l_linestatus,
           {_dsum('l_quantity')} AS sum_qty,
           {_dsum('l_extendedprice')} AS sum_base_price,
           {_dsum('l_extendedprice*(1-l_discount)')} AS sum_disc_price,
           {_dsum('l_extendedprice*(1-l_discount)*(1+l_tax)')} AS sum_charge,
           {_dsum('l_quantity')}/COUNT(*) AS avg_qty,
           {_dsum('l_extendedprice')}/COUNT(*) AS avg_price,
           {_dsum('l_discount')}/COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)


# ---------------------------------------------------------------------------
# Q03 — shipping priority: 3-way join → agg → deterministic top-10
# ---------------------------------------------------------------------------


def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("timestamp").cast("long").alias("o_orderdate_epoch"),
            F.col("o_orderpriority"),
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


register(
    "q03_shipping_priority",
    q03_shipping_priority,
    f"""
    SELECT l_orderkey, CAST(epoch(o_orderdate) AS BIGINT) AS o_orderdate_epoch,
           o_orderpriority,
           {_dsum('l_extendedprice*(1-l_discount)')} AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15'
      AND l_shipdate  > TIMESTAMP '1995-03-15'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)


# ---------------------------------------------------------------------------
# Q05 — local supplier volume: 6-way join (broadcast dims) → agg
# ---------------------------------------------------------------------------


def q05_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(nation),
            (cust.c_nationkey == nation.n_nationkey)
            & (supp.s_nationkey == nation.n_nationkey),
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


register(
    "q05_supplier_volume",
    q05_supplier_volume,
    f"""
    SELECT n_name, r_name, {_dsum('l_extendedprice*(1-l_discount)')} AS revenue
    FROM lineitem JOIN orders   ON l_orderkey = o_orderkey
                  JOIN customer ON o_custkey = c_custkey
                  JOIN supplier ON l_suppkey = s_suppkey
                  JOIN nation   ON c_nationkey = n_nationkey AND s_nationkey = n_nationkey
                  JOIN region   ON n_regionkey = r_regionkey
    GROUP BY n_name, r_name
    """,
)


# ---------------------------------------------------------------------------
# Q06 — revenue forecast: tight range predicates → single scalar agg
# ---------------------------------------------------------------------------


def q06_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


register(
    "q06_revenue_forecast",
    q06_revenue_forecast,
    f"""
    SELECT {_dsum('l_extendedprice*l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
    """,
)


# ---------------------------------------------------------------------------
# Q07 — top-3 orders per priority: ranking window (W1 analogue)
# ---------------------------------------------------------------------------


def q07_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rnk")
    )


register(
    "q07_window_topk",
    q07_window_topk,
    """
    SELECT o_orderpriority, o_orderkey, o_totalprice, rnk FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                     ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rnk
      FROM orders) t
    WHERE rnk <= 3
    """,
)


# ---------------------------------------------------------------------------
# Q08 — rollup: hierarchical aggregate (A3's relational cousin)
# ---------------------------------------------------------------------------


def q08_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum(F.col("o_totalprice")).alias("total"))
    )


register(
    "q08_rollup",
    q08_rollup,
    f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders, {_dsum('o_totalprice')} AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)


# ---------------------------------------------------------------------------
# Q09 — anti + semi join (merged former q09/q10, round 10: same
# customer grain).  Both REAL join strategies still execute — the anti
# half (customers with no open 'O' orders) and the semi half (customers
# with a >60-day-late shipment) each run as their native left_anti /
# left_semi join, then attach to the full customer table as flags.
# Splitting back out is mechanical: q09 = filter no_open_orders,
# project c_name; q10 = filter late_ship, project c_mktsegment.
# ---------------------------------------------------------------------------


def q09_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    open_orders = orders.filter(F.col("o_orderstatus") == "O")
    no_open = (
        cust.join(open_orders, cust.c_custkey == open_orders.o_custkey, "left_anti")
        .select("c_custkey")
        .withColumn("_no_open", F.lit(True))
    )

    late = orders.join(li, orders.o_orderkey == li.l_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    late_cust = (
        cust.join(late, cust.c_custkey == late.o_custkey, "left_semi")
        .select("c_custkey")
        .withColumn("_late", F.lit(True))
    )

    return (
        cust.select("c_custkey", "c_name", "c_mktsegment")
        .join(no_open, "c_custkey", "left")
        .join(late_cust, "c_custkey", "left")
        .select(
            "c_custkey",
            "c_name",
            "c_mktsegment",
            F.coalesce(F.col("_no_open"), F.lit(False)).alias("no_open_orders"),
            F.coalesce(F.col("_late"), F.lit(False)).alias("late_ship"),
        )
    )


register(
    "q09_semi_anti",
    q09_semi_anti,
    """
    SELECT c_custkey, c_name, c_mktsegment,
           NOT EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
             AS no_open_orders,
           EXISTS (SELECT 1 FROM orders JOIN lineitem ON o_orderkey = l_orderkey
                   WHERE o_custkey = c_custkey
                     AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
             AS late_ship
    FROM customer
    """,
)


# ---------------------------------------------------------------------------
# Q11 — event-time tumbling window aggregate (batch form; streaming twin
# lives in lsd2_spark.streaming)
# ---------------------------------------------------------------------------


def q11_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).cast("long").alias("hour_epoch"),
            F.col("event_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value")).alias("total_value"))
    )


register(
    "q11_events_hourly",
    q11_events_hourly,
    f"""
    SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch, event_type,
           COUNT(*) AS n, {_dsum('value')} AS total_value
    FROM events GROUP BY 1, 2
    """,
)


# ---------------------------------------------------------------------------
# Q12 — sessionization: gap-based sessions via lag + running sum window
# ---------------------------------------------------------------------------

SESSION_GAP_MIN = 30


def q12_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    new_sess = F.when(gap.isNull() | (gap > SESSION_GAP_MIN * 60), 1).otherwise(0)
    sess_id = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.withColumn("sess", sess_id)
        .groupBy("user_id")
        .agg(
            F.max("sess").cast("long").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


register(
    "q12_sessionize",
    q12_sessionize,
    f"""
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR floor(epoch(ts)) - floor(epoch(LAG(ts) OVER w)) > {SESSION_GAP_MIN * 60}
                  THEN 1 ELSE 0 END AS new_sess
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sess
      FROM g
    )
    SELECT user_id, CAST(MAX(sess) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
    FROM s GROUP BY user_id
    """,
)


# ---------------------------------------------------------------------------
# Q15 — as-of join: each 'click' event matched to the user's latest
# 'purchase' at-or-before it (an operator Spark lacks natively; DuckDB's
# ASOF JOIN is the oracle).  Union+window implementation: one shuffle.
# ---------------------------------------------------------------------------


def q15_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lsd2_spark.operators.temporal import asof_join_backward, dedupe_latest

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = dedupe_latest(
        ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts", "value"),
        "user_id", "ts", "event_id",
    )
    out = asof_join_backward(
        clicks, purchases, key="user_id", ts="ts",
        left_cols=["event_id", "user_id", "ts"],
        right_cols=["event_id", "value"],
    )
    return out.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").cast("timestamp").cast("long").alias("click_epoch"),
        F.col("asof_event_id").alias("purchase_id"),
        F.col("asof_value").alias("purchase_value"),
    )


register(
    "q15_asof_join",
    q15_asof_join,
    """
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ), purchases AS (
      SELECT event_id, user_id, ts, value FROM (
        SELECT event_id, user_id, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'purchase') t
      WHERE rn = 1
    )
    SELECT c.event_id AS click_id, c.user_id,
           CAST(floor(epoch(c.ts)) AS BIGINT) AS click_epoch,
           p.event_id AS purchase_id, p.value AS purchase_value
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND p.ts <= c.ts
    """,
)


# ---------------------------------------------------------------------------
# Q16 — cube: full grouping-set lattice; Q17/Q18 — intersect / except
# ---------------------------------------------------------------------------


def q16_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"), dsum(F.col("o_totalprice")).alias("total")
    )


register(
    "q16_cube",
    q16_cube,
    f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders, {_dsum('o_totalprice')} AS total
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)


def q17_order_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT and EXCEPT gated in one row (merged former q17/q18 —
    same grain, same inputs): customers holding both an open and a
    finished order, tagged ``both``, and customers with open orders but
    no finished ones, tagged ``open_only``."""
    orders = load_table(spark, sf_dir, "orders")
    open_c = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("c_custkey")
    )
    done_c = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return open_c.intersect(done_c).withColumn("setop", F.lit("both")).unionByName(
        open_c.subtract(done_c).withColumn("setop", F.lit("open_only"))
    )


register(
    "q17_order_setops",
    q17_order_setops,
    """
    SELECT c_custkey, 'both' AS setop FROM (
      SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    UNION ALL
    SELECT c_custkey, 'open_only' AS setop FROM (
      SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    """,
)


# ---------------------------------------------------------------------------
# Q19 — exact interpolated median per group (both engines use the
# linear-interpolation definition on identical sorted doubles)
# ---------------------------------------------------------------------------


def q19_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        round6(F.expr("percentile(l_extendedprice, 0.5)")).alias("median_price"),
        round6(F.expr("percentile(l_extendedprice, 0.9)")).alias("p90_price"),
    )


register(
    "q19_median",
    q19_median,
    """
    SELECT l_returnflag,
           FLOOR(quantile_cont(l_extendedprice, 0.5) * 1000000.0 + 0.5) / 1000000.0 AS median_price,
           FLOOR(quantile_cont(l_extendedprice, 0.9) * 1000000.0 + 0.5) / 1000000.0 AS p90_price
    FROM lineitem GROUP BY l_returnflag
    """,
)


# ---------------------------------------------------------------------------
# Q13 — exact distinct + min/max profile per event type
# ---------------------------------------------------------------------------


def q13_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Former gate row q13 — merged into q57_kmv_distinct in round 10
    (same event_type grain; the exact COUNT(DISTINCT) now sits next to
    the KMV estimate it validates).  Kept callable for the unmerge plan
    in COVERAGE.md."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# Q14 — conditional aggregation (pivot expressed portably)
# ---------------------------------------------------------------------------


def q14_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_linestatus").agg(
        dsum(F.when(F.col("l_returnflag") == "R", rev).otherwise(0.0)).alias("rev_returned"),
        dsum(F.when(F.col("l_returnflag") == "A", rev).otherwise(0.0)).alias("rev_ack"),
        dsum(F.when(F.col("l_returnflag") == "N", rev).otherwise(0.0)).alias("rev_none"),
    )


register(
    "q14_conditional_agg",
    q14_conditional_agg,
    f"""
    SELECT l_linestatus,
      {_dsum("CASE WHEN l_returnflag='R' THEN l_extendedprice*(1-l_discount) ELSE 0.0 END")} AS rev_returned,
      {_dsum("CASE WHEN l_returnflag='A' THEN l_extendedprice*(1-l_discount) ELSE 0.0 END")} AS rev_ack,
      {_dsum("CASE WHEN l_returnflag='N' THEN l_extendedprice*(1-l_discount) ELSE 0.0 END")} AS rev_none
    FROM lineitem GROUP BY l_linestatus
    """,
)


# ---------------------------------------------------------------------------
# Q04 — order-priority checking (TPC-H Q4 shape adapted to this schema:
# EXISTS → left-semi, date-window scan).  The semi-join keeps the probe
# side unduplicated — no post-join distinct at 100 TB.
# ---------------------------------------------------------------------------


def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


register(
    "q04_order_priority",
    q04_order_priority,
    """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)


# ---------------------------------------------------------------------------
# Q22 — idle high-balance customers (TPC-H Q22 shape adapted: scalar
# subquery for the positive-balance average + NOT EXISTS anti-join,
# grouped by market segment).  "Idle" = no orders on/after 1999-01-01:
# the generator gives every customer at least one order overall, so the
# no-orders-ever form would be vacuously empty at every scale factor.
# The scalar average broadcasts; the anti join is one shuffle.
# ---------------------------------------------------------------------------


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    # engine-portable average (exact decimal sum / count in double) as a
    # broadcast 1-row scalar — no driver collect
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg((dsum(F.col("c_acctbal")) / F.count(F.lit(1))).alias("_avg_bal"))
    )
    rich = cust.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("_avg_bal")
    )
    recent = orders.filter(F.col("o_orderdate") >= F.lit("1999-01-01"))
    idle = rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
    return idle.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("numcust"),
        dsum(F.col("c_acctbal")).alias("totacctbal"),
    )


register(
    "q22_idle_customers",
    q22_idle_customers,
    f"""
    WITH avg_bal AS (
      SELECT {_dsum("c_acctbal")} / COUNT(*) AS a FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS numcust,
           {_dsum("c_acctbal")} AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > a
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= DATE '1999-01-01')
    GROUP BY c_mktsegment
    """,
)


# ---------------------------------------------------------------------------
# Q47/Q48 — forward and nearest as-of joins (extensions of q15's
# operator; DuckDB's native ASOF JOIN is the oracle, with the nearest
# form composed from both directions)
# ---------------------------------------------------------------------------


def q47_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lsd2_spark.operators.temporal import asof_join_forward, dedupe_latest

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = dedupe_latest(
        ev.filter(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts", "value"
        ),
        "user_id", "ts", "event_id",
    )
    out = asof_join_forward(
        clicks, purchases, key="user_id", ts="ts",
        left_cols=["event_id", "user_id", "ts"],
        right_cols=["event_id", "value"],
    )
    return out.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").cast("timestamp").cast("long").alias("click_epoch"),
        F.col("asof_event_id").alias("purchase_id"),
        F.col("asof_value").alias("purchase_value"),
    )


_Q47_FORWARD_SQL = """
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ), purchases AS (
      SELECT event_id, user_id, ts, value FROM (
        SELECT event_id, user_id, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'purchase') t
      WHERE rn = 1
    )
    SELECT c.event_id AS click_id, c.user_id,
           CAST(floor(epoch(c.ts)) AS BIGINT) AS click_epoch,
           p.event_id AS purchase_id, p.value AS purchase_value
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND p.ts >= c.ts
    """


def q48_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lsd2_spark.operators.temporal import asof_join_nearest, dedupe_latest

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = dedupe_latest(
        ev.filter(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts", "value"
        ),
        "user_id", "ts", "event_id",
    )
    out = asof_join_nearest(
        clicks, purchases, key="user_id", ts="ts",
        left_cols=["event_id", "user_id", "ts"],
        right_cols=["event_id", "value"],
    )
    return out.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").cast("timestamp").cast("long").alias("click_epoch"),
        F.col("asof_event_id").alias("purchase_id"),
        F.col("asof_value").alias("purchase_value"),
    )


_Q48_NEAREST_SQL = """
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ), purchases AS (
      SELECT event_id, user_id, ts, value FROM (
        SELECT event_id, user_id, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'purchase') t
      WHERE rn = 1
    ), bwd AS (
      SELECT c.event_id AS click_id, c.user_id, c.ts AS cts,
             p.event_id AS b_id, p.value AS b_value, p.ts AS b_ts
      FROM clicks c ASOF LEFT JOIN purchases p
        ON c.user_id = p.user_id AND p.ts <= c.ts
    ), fwd AS (
      SELECT c.event_id AS click_id, c.user_id,
             p.event_id AS f_id, p.value AS f_value, p.ts AS f_ts
      FROM clicks c ASOF LEFT JOIN purchases p
        ON c.user_id = p.user_id AND p.ts >= c.ts
    )
    SELECT b.click_id, b.user_id,
           CAST(floor(epoch(b.cts)) AS BIGINT) AS click_epoch,
           CASE WHEN b.b_id IS NULL THEN f.f_id
                WHEN f.f_id IS NULL THEN b.b_id
                WHEN floor(epoch(f.f_ts)) - floor(epoch(b.cts))
                     < floor(epoch(b.cts)) - floor(epoch(b.b_ts)) THEN f.f_id
                ELSE b.b_id END AS purchase_id,
           CASE WHEN b.b_id IS NULL THEN f.f_value
                WHEN f.f_id IS NULL THEN b.b_value
                WHEN floor(epoch(f.f_ts)) - floor(epoch(b.cts))
                     < floor(epoch(b.cts)) - floor(epoch(b.b_ts)) THEN f.f_value
                ELSE b.b_value END AS purchase_value
    FROM bwd b JOIN fwd f ON f.click_id = b.click_id
    """


def q47_asof_directions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward and nearest as-of joins gated in one row (merged former
    q47/q48 — identical schema, same inputs), tagged by ``direction``.
    The backward variant keeps its own gate row (q15_asof_join)."""
    fwd = q47_asof_forward(spark, sf_dir).withColumn("direction", F.lit("forward"))
    nst = q48_asof_nearest(spark, sf_dir).withColumn("direction", F.lit("nearest"))
    return fwd.unionByName(nst)


register(
    "q47_asof_directions",
    q47_asof_directions,
    f"""
    SELECT *, 'forward' AS direction FROM ({_Q47_FORWARD_SQL})
    UNION ALL
    SELECT *, 'nearest' AS direction FROM ({_Q48_NEAREST_SQL})
    """,
)


# ---------------------------------------------------------------------------
# Q51 — windowed analytics over event time: rolling aggregate + lead/lag
# deltas in ONE window spec (§2.5 breadth beyond the rank/top-k forms;
# merged former q51/q52 — same grain, same partition/order, one shuffle)
# ---------------------------------------------------------------------------


def q51_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wr = wo.rowsBetween(-4, Window.currentRow)
    ts_l = F.col("ts").cast("timestamp").cast("long")
    return ev.select(
        "event_id",
        "user_id",
        ts_l.alias("ts_epoch"),
        # no ROUND: the DECIMAL(28,6) sum cast to double is already the
        # nearest double of an exact 6-dp decimal — rounding is a no-op,
        # and engine-defined ROUND is banned from the gate surface.
        F.sum(F.col("value").cast(DEC)).over(wr).cast("double")
        .alias("rolling_value_5"),
        (ts_l - F.lag(ts_l).over(wo)).alias("secs_since_prev"),
        (F.lead(ts_l).over(wo) - ts_l).alias("secs_to_next"),
        F.lag("event_type").over(wo).alias("prev_type"),
    )


register(
    "q51_event_windows",
    q51_event_windows,
    """
    SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch,
           CAST(SUM(CAST(value AS DECIMAL(28,6)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS rolling_value_5,
           CAST(floor(epoch(ts)) AS BIGINT)
             - LAG(CAST(floor(epoch(ts)) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS secs_since_prev,
           LEAD(CAST(floor(epoch(ts)) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id)
             - CAST(floor(epoch(ts)) AS BIGINT) AS secs_to_next,
           LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
    FROM events
    """,
)
