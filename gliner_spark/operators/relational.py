"""Classic relational queries over the TPC-H-ish testdata tables.

Round out SURVEY.md §2.2's category coverage with operators the KG
pipeline doesn't naturally exercise: multi-aggregate scan (Q1 shape),
rollup/grouping sets, dimension joins Catalyst auto-broadcasts,
semi/anti joins, and sort/limit — all plain Catalyst plans with exact
DuckDB oracles. These double as plan-quality probes: the audit in
tools/explain_plans.py checks the scans prune columns/push predicates
and the dim joins go broadcast without hints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide aggregate over the filtered lineitem scan."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (grouping sets) over returnflag/linestatus with grouping
    ids — the hierarchy-subtotal operator class."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "revenue",
            "n",
        )
    )


def top_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join through two broadcastable dims + agg + sort/limit."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
        .limit(10)
    )


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (NOT EXISTS): customers with no orders after the
    cutoff — the filter rides into the anti-join's build side."""
    cust = _t(spark, sf_dir, "customer")
    recent = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") > F.lit("1997-06-01")
    )
    return (
        cust.join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_nationkey")
    )


def urgent_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape — SEMI join (EXISTS): count orders per priority
    that have at least one late-shipped discounted lineitem (predicate
    adapted to the synthetic schema, which lacks commit/receipt dates).
    The semi join ships only the
    distinct probe keys, never multiplies rows."""
    orders = _t(spark, sf_dir, "orders")
    late = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") > F.lit("1998-01-01"))
        & (F.col("l_discount") >= 0.05)
    )
    return (
        orders.join(
            late, orders.o_orderkey == late.l_orderkey, "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


RELATIONAL_SQL = {
    "tpch_urgent": """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    AND l_discount >= 0.05
)
GROUP BY o_orderpriority""",
    "tpch_pricing": """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus""",
    "tpch_rollup": """
SELECT COALESCE(l_returnflag, 'ALL') AS rf,
       COALESCE(l_linestatus, 'ALL') AS ls,
       ROUND(SUM(l_extendedprice), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "tpch_top_nations": """
SELECT n_name, ROUND(SUM(o_totalprice), 2) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY revenue DESC, n_name
LIMIT 10""",
    "tpch_no_orders": """
SELECT c_custkey, c_name, c_nationkey
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey
    AND o_orderdate > TIMESTAMP '1997-06-01 00:00:00'
)""",
}


def window_combo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/running-sum/rank/ntile in one pass over the events stream —
    the window-function class beyond sessionization."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.round(
            F.col("value") - F.coalesce(F.lag("value").over(w), F.lit(0.0)), 4
        ).alias("delta"),
        F.round(
            F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 4
        ).alias("running"),
        F.row_number().over(w).cast("long").alias("rn"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


def events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, day-of-week): all 4 grouping sets."""
    e = _t(spark, sf_dir, "events").select(
        "event_type", F.dayofweek("ts").cast("long").alias("dow"), "value"
    )
    return (
        e.cube("event_type", "dow")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total"),
        )
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce(F.col("dow").cast("string"), F.lit("ALL")).alias("dow"),
            "n",
            "total",
        )
    )


def nation_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT: nations having customers but no suppliers,
    and vice versa, tagged."""
    cust_n = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    ).distinct()
    supp_n = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    ).distinct()
    both = cust_n.intersect(supp_n).withColumn("tag", F.lit("both"))
    cust_only = cust_n.exceptAll(supp_n).withColumn("tag", F.lit("cust_only"))
    supp_only = supp_n.exceptAll(cust_n).withColumn("tag", F.lit("supp_only"))
    return both.unionByName(cust_only).unionByName(supp_only)


RELATIONAL_SQL.update(
    {
        "events_windows": """
SELECT user_id, event_id,
       ROUND(value - COALESCE(lag(value) OVER w, 0.0), 4) AS delta,
       ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
         AS running,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
       CAST(NTILE(4) OVER w AS BIGINT) AS quartile
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
        "events_cube": """
SELECT COALESCE(event_type, 'ALL') AS event_type,
       COALESCE(CAST(dow AS VARCHAR), 'ALL') AS dow,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 4) AS total
FROM (SELECT event_type, CAST(dayofweek(ts) + 1 AS BIGINT) AS dow, value
      FROM events)
GROUP BY CUBE (event_type, dow)""",
        "nation_setops": """
WITH cn AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
sn AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
SELECT nationkey, 'both' AS tag FROM cn INTERSECT SELECT nationkey, 'both' FROM sn
UNION ALL
(SELECT nationkey, 'cust_only' FROM cn EXCEPT SELECT nationkey, 'cust_only' FROM sn)
UNION ALL
(SELECT nationkey, 'supp_only' FROM sn EXCEPT SELECT nationkey, 'supp_only' FROM cn)""",
    }
)
