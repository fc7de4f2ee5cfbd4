"""Co-located bucketed join: correctness (equals plain join) AND plan
shape (no Exchange on either join side) — the written-down proof of the
100 TB shuffle-free fact-fact join design."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flinkrunner_spark.operators.bucketing import bucketed_join, write_bucketed
from flinkrunner_spark.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    write_bucketed(li, "b_lineitem", "l_orderkey", buckets=8)
    write_bucketed(orders, "b_orders", "o_orderkey", buckets=8)
    yield "b_lineitem", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    lt, rt = bucketed_tables
    got = bucketed_join(
        spark, lt, rt, spark.table(lt)["l_orderkey"] == spark.table(rt)["o_orderkey"]
    )
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    want = li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # disable broadcast so the join planner must pick SMJ; bucketing should
    # then eliminate both shuffle exchanges
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(
            spark,
            lt,
            rt,
            spark.table(lt)["l_orderkey"] == spark.table(rt)["o_orderkey"],
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_agg_has_no_exchange(spark, bucketed_tables):
    lt, _ = bucketed_tables
    agg = spark.table(lt).groupBy("l_orderkey").agg(F.sum("l_quantity"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
