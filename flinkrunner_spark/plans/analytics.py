"""Analytics query plans — the Table/SQL-API parity surface (reference
flink/TableStreamJob.scala + util/SqlBuilder.scala prove out SQL pipelines;
these are the equivalent declarative DataFrame plans on the test schema).

All money arithmetic goes through exact DECIMAL (see operators/aggregates.py)
so results are bit-identical across engines and cluster sizes. Dimension
tables are explicitly broadcast — at 100 TB the fact tables shuffle only on
their join keys and every dim join is shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flinkrunner_spark.operators.aggregates import DEC, dmean, dsum
from flinkrunner_spark.operators.joins import topk_per_group
from flinkrunner_spark.tables import load_tables


def q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary (flagship). Scan → filter (pushed to
    parquet) → single hash aggregation with partial (map-side) combine."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.lit(1).cast("decimal(8,6)") - F.col("l_discount").cast("decimal(8,6)")
    tax = F.lit(1).cast("decimal(8,6)") + F.col("l_tax").cast("decimal(8,6)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum(price, "sum_base_price"),
            F.sum(price * disc).cast("decimal(24,6)").cast("double").alias("sum_disc_price"),
            F.sum(price * disc * tax).cast("decimal(24,6)").cast("double").alias("sum_charge"),
            dmean("l_quantity", "avg_qty"),
            dmean("l_extendedprice", "avg_price"),
            dmean("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3-style shipping priority: top-10 open orders by pending revenue
    for one market segment. customer is broadcast; lineitem⋈orders
    shuffles on the order key only."""
    t = load_tables(spark, sf_dir)
    cutoff = F.lit("1998-06-01").cast("timestamp")
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.lit(1).cast("decimal(8,6)") - F.col("l_discount").cast("decimal(8,6)")
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    return (
        t["lineitem"]
        .filter(F.col("l_shipdate") > cutoff)
        .join(
            t["orders"].filter(F.col("o_orderdate") < cutoff),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(price * disc).cast("decimal(24,6)").cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def q5_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5-style local-supplier revenue by nation: 6-way join where every
    dimension (region→nation→supplier/customer) is broadcast; the only
    shuffles are lineitem⋈orders on the order key and the final agg."""
    t = load_tables(spark, sf_dir)
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.lit(1).cast("decimal(8,6)") - F.col("l_discount").cast("decimal(8,6)")
    nations = (
        t["nation"]
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    supp = t["supplier"].join(
        F.broadcast(nations), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey")
        )
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(F.sum(price * disc).cast("decimal(24,6)").cast("double").alias("revenue"))
    )


def q6_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6-style forecast revenue change: pure filter + scalar aggregate —
    every predicate pushes to the parquet scan (zero joins, zero wide
    shuffles; the canonical predicate-pushdown probe)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast("decimal(8,6)")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(price * disc).cast("decimal(24,6)").cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q10_returned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10-style returned-item revenue: top-20 customers by revenue lost to
    returns in one quarter. lineitem⋈orders shuffles on the order key;
    customer and nation are broadcast; the quarter predicate and the
    returnflag filter both push to the parquet scan."""
    t = load_tables(spark, sf_dir)
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.lit(1).cast("decimal(8,6)") - F.col("l_discount").cast("decimal(8,6)")
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1995-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    return (
        t["lineitem"]
        .filter(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(price * disc).cast("decimal(24,6)").cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def q18_bigorders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18-style large-volume customers: orders whose total quantity
    exceeds 250. The per-order aggregate IS the output quantity (the
    final group is per order), so lineitem is scanned and shuffled exactly
    once — no join-back, which at 100 TB halves the fact shuffle."""
    t = load_tables(spark, sf_dir)
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(dsum("l_quantity", "sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        big.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


def q14_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14-style promotion revenue share for one quarter: lineitem⋈part
    with part broadcast, conditional aggregation to one row. The date
    filter pushes to the parquet scan; the join adds no shuffle."""
    t = load_tables(spark, sf_dir)
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.lit(1).cast("decimal(8,6)") - F.col("l_discount").cast("decimal(8,6)")
    rev = (price * disc).cast("decimal(24,6)")
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    return (
        li.join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(24,6)")))
                .cast("double")
                * 100.0
                / F.sum(rev).cast("double")
            ).alias("promo_revenue_pct")
        )
        .select(F.round("promo_revenue_pct", 6).alias("promo_revenue_pct"))
    )


def q19_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19-style disjunctive brand/quantity revenue: OR-of-ANDs predicate
    across the join — Catalyst pushes the common join key and evaluates
    the disjunction post-join; part is broadcast."""
    t = load_tables(spark, sf_dir)
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.lit(1).cast("decimal(8,6)") - F.col("l_discount").cast("decimal(8,6)")
    j = t["lineitem"].join(
        F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey")
    )
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("l_quantity").between(1, 11)) & (F.col("p_size").between(1, 5)))
        | ((F.col("p_brand") == "Brand#13") & (F.col("l_quantity").between(10, 20)) & (F.col("p_size").between(1, 10)))
        | ((F.col("p_brand") == "Brand#23") & (F.col("l_quantity").between(20, 30)) & (F.col("p_size").between(1, 15)))
    )
    return j.filter(cond).agg(
        F.sum(price * disc).cast("decimal(24,6)").cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def salted_supplier_rev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier revenue via the skew-mitigating salted join
    (operators/joins.salted_join) — result-identical to the plain
    equi-join the oracle runs, but each supplier key's rows spread over
    16 salt slices in the shuffle."""
    from flinkrunner_spark.operators.joins import salted_join

    t = load_tables(spark, sf_dir)
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.lit(1).cast("decimal(8,6)") - F.col("l_discount").cast("decimal(8,6)")
    li = t["lineitem"].select("l_suppkey", "l_extendedprice", "l_discount")
    supp = t["supplier"].select("s_suppkey", "s_name")
    return (
        salted_join(li, supp, "l_suppkey", "s_suppkey", salt=16)
        .groupBy("s_name")
        .agg(F.sum(price * disc).cast("decimal(24,6)").cast("double").alias("revenue"))
    )


def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by total price per order priority (window top-k)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return topk_per_group(
        orders.select("o_orderpriority", "o_orderkey", "o_totalprice"),
        ["o_orderpriority"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        3,
    )


def pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-count matrix per user (pivot on event type)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
    )


def rollup_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup over (returnflag, linestatus) — Table-API GROUP BY ROLLUP."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"), dsum("l_quantity", "sum_qty")
    )


def cube_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cube over (returnflag, linestatus) — all grouping-set combinations."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"), dsum("l_quantity", "sum_qty")
    )
