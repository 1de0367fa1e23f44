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


RELATIONAL_SQL = {
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
