"""Relational coverage operators over the TPC-H-ish driver tables —
demonstrating the engine's join/agg/window surface is stock Catalyst
(SURVEY.md §2.2: the reference has NO relational layer; ours is Spark's,
used declaratively so pushdown/pruning/broadcast come free)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style aggregate over lineitem."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    # money sums as exact integer cents (order-independent, oracle-exact)
    return (li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
                 F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
                  .alias("base_price_cents"),
                 F.sum(F.round(F.col("l_extendedprice")
                               * (1 - F.col("l_discount")) * 100).cast("long"))
                  .alias("disc_price_cents"),
                 F.count("*").alias("count_order")))


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join with a broadcast dimension chain: customer ⋈ orders ⋈
    lineitem rolled up to the customer nation."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
            .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
            .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
            .groupBy("n_name")
            .agg(F.sum(F.round(F.col("l_extendedprice")
                               * (1 - F.col("l_discount")) * 100).cast("long"))
                  .alias("revenue_cents"),
                 F.count("*").alias("n_items")))
