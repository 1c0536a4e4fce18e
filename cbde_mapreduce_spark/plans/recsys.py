"""Recommender primitives over implicit feedback (SURVEY.md §2 widened):
item-item collaborative filtering on the customer→part purchase incidence.

The MR lineage is the classic "people who bought X also bought Y"
co-occurrence job: shuffle the (user, item) incidence on the user key,
emit item pairs per basket, reduce to co-occurrence counts, normalize to
cosine. Spark-first, that is one distinct + one self-join on the basket key
+ one combinable groupBy — no matrix library, no driver-side data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cbde_mapreduce_spark.plans.registry import query
from cbde_mapreduce_spark.sources import load_table

_CF_MIN_CO = 5  # pair support floor (sf0.01-tuned: keeps ~1k candidate pairs)
_CF_TOP = 20

_CF_ORACLE = f"""
    WITH b AS (SELECT DISTINCT o_custkey AS c, l_partkey AS p
               FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    pop AS (SELECT p, count(*)::double AS n FROM b GROUP BY p),
    co AS (SELECT x.p AS p1, y.p AS p2, count(*)::double AS co
           FROM b x JOIN b y ON x.c = y.c AND x.p < y.p
           GROUP BY x.p, y.p
           HAVING count(*) >= {_CF_MIN_CO}),
    sc AS (SELECT p1, p2, co,
                  round(co / sqrt(n1.n * n2.n), 6) AS cosine
           FROM co JOIN pop n1 ON co.p1 = n1.p
                   JOIN pop n2 ON co.p2 = n2.p)
    SELECT p1, p2, co::bigint AS co, cosine
    FROM sc
    ORDER BY cosine DESC, p1, p2
    LIMIT {_CF_TOP}
"""


@query("item_item_cf_topk", oracle=_CF_ORACLE, category="recsys")
def item_item_cf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering: top-20 part pairs by cosine
    similarity over binary customer-purchase vectors, with a pair-support
    floor (co-occurrence >= 5).

    cosine(i,j) = |U_i ∩ U_j| / sqrt(|U_i|·|U_j|) — computed from the
    basket self-join on the customer key, so the shuffle carries incidence
    pairs, never an items×items matrix. The support floor is applied
    DURING the co-occurrence reduce (HAVING on the combinable count), so
    sub-threshold pairs die in the aggregation, not in a later filter.

    At 100 TB two standard guards bound the self-join fan-out: cap basket
    size (a user with B items emits B² pairs — truncate or sample whale
    baskets, exactly the triangle-count orientation concern), and prune
    items below minimum support BEFORE pairing (an item appearing once
    cannot reach any co-occurrence floor). Item popularity is a broadcast
    dimension joined after the reduce.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    b = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    pop = b.groupBy("p").agg(F.count(F.lit(1)).cast("double").alias("n"))
    x = b.select(F.col("c"), F.col("p").alias("p1"))
    y = b.select(F.col("c"), F.col("p").alias("p2"))
    co = (
        x.join(y, "c")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).cast("double").alias("co"))
        .filter(F.col("co") >= _CF_MIN_CO)
    )
    n1 = pop.select(F.col("p").alias("p1"), F.col("n").alias("n1"))
    n2 = pop.select(F.col("p").alias("p2"), F.col("n").alias("n2"))
    sc = (
        co.join(F.broadcast(n1), "p1")
        .join(F.broadcast(n2), "p2")
        .select(
            "p1",
            "p2",
            F.col("co").cast("bigint").alias("co"),
            F.round(
                F.col("co") / F.sqrt(F.col("n1") * F.col("n2")), 6
            ).alias("cosine"),
        )
    )
    return sc.orderBy(F.desc("cosine"), F.asc("p1"), F.asc("p2")).limit(_CF_TOP)
