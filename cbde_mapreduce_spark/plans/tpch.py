"""TPC-H-shaped relational queries (SURVEY.md §2.4 aggregations, §2.3 joins).

MapReduce parity: Q1 is the canonical map→combine→reduce aggregation job;
Q3/Q5 are chained repartition-join jobs (each join = one full MR round). In
Spark each is a single declarative plan: Catalyst produces partial+final
hash aggregates (the combiner, for free) and picks broadcast-hash joins for
the small dimensions, so the multi-job chain collapses into one DAG with a
minimal number of shuffles.

Scale notes (100 TB): Q1 shuffles only the 4-6 grouping aggregate cells per
partition (map-side partial agg); Q3/Q5 broadcast region/nation/supplier
(tiny dims) and let AQE convert the customer join to broadcast when the
filtered side is small — lineitem, the 100 TB fact, is never shuffled except
on its join key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cbde_mapreduce_spark.plans.money import (
    avg_money,
    charge_units,
    disc_units,
    sum_money,
    sum_units,
)
from cbde_mapreduce_spark.plans.registry import query
from cbde_mapreduce_spark.sources import load_table

#: SQL twins of the plans/money.py unit expressions (kept as fragments so
#: every oracle spells the discipline identically).
EP_CENTS_SQL = "round(l_extendedprice * 100)::bigint"
DISC_UNITS_SQL = (
    "(round(l_extendedprice * 100)::bigint"
    " * (100 - round(l_discount * 100)::bigint))::decimal(38,0)"
)
CHARGE_UNITS_SQL = (
    "(round(l_extendedprice * 100)::bigint"
    " * (100 - round(l_discount * 100)::bigint)"
    " * (100 + round(l_tax * 100)::bigint))::decimal(38,0)"
)


@query(
    "q1_pricing_summary",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2)                          AS sum_qty,
               round(sum({EP_CENTS_SQL}) / 100.0, 2)              AS sum_base_price,
               round(sum({DISC_UNITS_SQL})::double / 10000.0, 2)  AS sum_disc_price,
               round(sum({CHARGE_UNITS_SQL})::double / 1000000.0, 2) AS sum_charge,
               round(avg(l_quantity), 6)                          AS avg_qty,
               round(sum({EP_CENTS_SQL}) / 100.0
                     / count(l_extendedprice), 6)                 AS avg_price,
               round(sum(round(l_discount * 100)::bigint) / 100.0
                     / count(l_discount), 6)                      AS avg_disc,
               count(*)                                           AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    category="aggregation",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: scan + filter + 8 simultaneous aggregates per group.

    Money aggregates ride exact integer units (plans/money.py): quantity
    sums stay double (integer-valued doubles are exact in float64 and
    order-independent below 2^53), everything priced is an exact
    bigint/decimal sum with ONE deterministic final division.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            sum_money("l_extendedprice").alias("sum_base_price"),
            sum_units(disc_units(), 4).alias("sum_disc_price"),
            sum_units(charge_units(), 6).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            avg_money("l_extendedprice", 6).alias("avg_price"),
            avg_money("l_discount", 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle=f"""
        SELECT l.l_orderkey,
               round(sum({DISC_UNITS_SQL})::double / 10000.0, 2) AS revenue,
               o.o_orderdate
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    category="join",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: 3-way join + aggregate + deterministic top-10."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp_ntz"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(sum_units(disc_units(), 4).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier",
    oracle=f"""
        SELECT n.n_name,
               round(sum({DISC_UNITS_SQL})::double / 10000.0, 2) AS revenue
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
        GROUP BY n.n_name
    """,
    category="join",
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-way star join + aggregate; tiny dims broadcast."""
    t = {n: load_table(spark, sf_dir, n) for n in ("customer", "orders", "lineitem", "supplier", "nation", "region")}
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(t["supplier"]),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(sum_units(disc_units(), 4).alias("revenue"))
    )
