"""Bucketed tables: shuffle-free co-located joins (SURVEY.md §4).

The MR analogue is pre-partitioned HDFS inputs consumed by a map-side merge
join. Bucketing both fact tables on the join key lets Spark's SortMergeJoin
run with ZERO exchanges — the decisive join strategy for repeated 100 TB
fact-fact joins.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cbde_mapreduce_spark.sources import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_smoke):
    li = load_table(spark, sf_smoke, "lineitem")
    orders = load_table(spark, sf_smoke, "orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("b_lineitem")
    )
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("b_orders")
    )
    yield spark.table("b_lineitem"), spark.table("b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_is_shuffle_free(spark, bucketed_tables):
    li, orders = bucketed_tables
    # disable broadcast so the join strategy decision is about bucketing
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
            "o_orderstatus"
        ).agg(F.count(F.lit(1)).alias("n"))
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    join_section = plan.split("HashAggregate")[-1]
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in join_section, (
        "bucketed join should not shuffle either side"
    )


def test_bucketed_join_results_match_unbucketed(spark, sf_smoke, bucketed_tables):
    li_b, orders_b = bucketed_tables
    li = load_table(spark, sf_smoke, "lineitem")
    orders = load_table(spark, sf_smoke, "orders")
    a = (
        li_b.join(orders_b, li_b.l_orderkey == orders_b.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .toPandas()
        .sort_values("o_orderstatus")
        .reset_index(drop=True)
    )
    b = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .toPandas()
        .sort_values("o_orderstatus")
        .reset_index(drop=True)
    )
    assert a.equals(b)
