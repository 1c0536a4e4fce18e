"""Set operations (SURVEY.md §2.7).

MapReduce parity: union = MultipleInputs job; union-distinct adds a dedupe
reduce; intersect/except are tagged co-group jobs emitting by tag-set
membership. Spark plans these as shuffle-free unions and hash-based
left-semi/anti joins respectively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cbde_mapreduce_spark.plans.registry import query
from cbde_mapreduce_spark.sources import load_table


@query(
    "union_all_parties",
    oracle="""
        SELECT c_name AS name, 'customer' AS kind FROM customer
        UNION ALL
        SELECT s_name AS name, 'supplier' AS kind FROM supplier
    """,
    category="setop",
)
def union_all_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL — the MR MultipleInputs job."""
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    a = cust.select(F.col("c_name").alias("name"), F.lit("customer").alias("kind"))
    b = supp.select(F.col("s_name").alias("name"), F.lit("supplier").alias("kind"))
    return a.unionByName(b)


@query(
    "union_distinct_nations",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    category="setop",
)
def union_distinct_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — union job + dedupe reduce."""
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    a = cust.select(F.col("c_nationkey").alias("nationkey"))
    b = supp.select(F.col("s_nationkey").alias("nationkey"))
    return a.unionByName(b).distinct()


@query(
    "intersect_nation_keys",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    category="setop",
)
def intersect_nation_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT — nations that have both customers and suppliers."""
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        cust.select(F.col("c_nationkey").alias("nationkey"))
        .intersect(supp.select(F.col("s_nationkey").alias("nationkey")))
    )


@query(
    "except_nation_keys",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT s_nationkey AS nationkey FROM supplier
        WHERE s_acctbal > 9000
    """,
    category="setop",
)
def except_nation_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT — customer nations minus nations holding a rich supplier.

    The supplier side is filtered (s_acctbal > 9000) so its key set is a
    strict subset of the customer nations and the difference is non-empty:
    the round-1 unfiltered version returned 0 rows at every SF (both key
    sets = all nations), a vacuous pass that verified nothing about EXCEPT.
    """
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    rich = supp.filter(F.col("s_acctbal") > 9000)
    return cust.select(F.col("c_nationkey").alias("nationkey")).subtract(
        rich.select(F.col("s_nationkey").alias("nationkey"))
    )


@query(
    "except_all_priorities",
    oracle="""
        SELECT o_orderpriority AS priority FROM orders WHERE o_orderstatus = 'O'
        EXCEPT ALL
        SELECT o_orderpriority AS priority FROM orders WHERE o_orderstatus = 'F'
    """,
    category="setop",
)
def except_all_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset difference (multiplicity preserved)."""
    orders = load_table(spark, sf_dir, "orders")
    open_p = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_orderpriority").alias("priority")
    )
    done_p = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderpriority").alias("priority")
    )
    return open_p.exceptAll(done_p)


@query(
    "intersect_all_priorities",
    oracle="""
        SELECT o_orderpriority AS priority FROM orders WHERE o_orderstatus = 'O'
        INTERSECT ALL
        SELECT o_orderpriority AS priority FROM orders WHERE o_orderstatus = 'F'
    """,
    category="setop",
)
def intersect_all_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — multiset intersection (min multiplicity per value),
    completing the §2.7 multiset pair with except_all_priorities."""
    orders = load_table(spark, sf_dir, "orders")
    open_p = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_orderpriority").alias("priority")
    )
    done_p = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderpriority").alias("priority")
    )
    return open_p.intersectAll(done_p)
