"""UDF / UDAF / grouped-map surface (SURVEY.md §2.9).

MapReduce parity: the Mapper/Reducer classes ARE the reference's UDF
surface — arbitrary user code per record (map) and per key-group (reduce).
Spark order of preference (enforced across this repo): built-in functions
first; Arrow-vectorized pandas_udf when Python is genuinely needed;
applyInPandas for arbitrary per-group logic; row-at-a-time F.udf never on a
hot path. These queries exist to prove the custom-code path produces
oracle-exact results through the Arrow boundary.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from cbde_mapreduce_spark.plans.registry import query
from cbde_mapreduce_spark.sources import load_table


@query(
    "pandas_udf_net_revenue",
    oracle="""
        SELECT l_returnflag,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS net_revenue,
               count(*) AS n
        FROM lineitem
        GROUP BY l_returnflag
    """,
    category="udf",
)
def pandas_udf_net_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf (vectorized 'Mapper') feeding a JVM aggregate."""
    li = load_table(spark, sf_dir, "lineitem")

    @pandas_udf("double")
    def net_revenue(price: pd.Series, discount: pd.Series, tax: pd.Series) -> pd.Series:
        # vectorized per-record transform (the Mapper body), Arrow-batched
        return price * (1.0 - discount) * (1.0 + tax)

    return (
        li.withColumn(
            "net", net_revenue(F.col("l_extendedprice"), F.col("l_discount"), F.col("l_tax"))
        )
        .groupBy("l_returnflag")
        .agg(
            F.round(F.sum("net"), 2).alias("net_revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "grouped_map_zscore",
    oracle="""
        SELECT event_id, user_id,
               round((value - avg(value) OVER u) / stddev_samp(value) OVER u, 4) AS zscore
        FROM events
        WINDOW u AS (PARTITION BY user_id)
    """,
    category="udf",
)
def grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas (the arbitrary 'Reducer' body): per-user z-scores.

    The pandas ddof=1 std matches SQL stddev_samp; single-event users give
    NULL on both sides. Differential value: a genuinely different numeric
    path (pandas) must agree with the window-function oracle.
    """
    events = load_table(spark, sf_dir, "events")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        sd = v.std(ddof=1)
        z = (v - v.mean()) / sd if sd and sd == sd else v * float("nan")
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "user_id": pdf["user_id"], "zscore": z.round(4)}
        )

    return (
        events.select("event_id", "user_id", "value")
        .groupBy("user_id")
        .applyInPandas(zscore, "event_id bigint, user_id bigint, zscore double")
    )


@query(
    "grouped_agg_pandas_median",
    oracle="""
        SELECT event_type,
               round(median(value), 4) AS med_value,
               count(*)                AS n
        FROM events
        GROUP BY event_type
    """,
    category="udf",
)
def grouped_agg_pandas_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas_udf (custom UDAF): exact median per group.

    Median is not partial-aggregatable — the canonical case where MR needs
    a full reducer and Spark needs a custom aggregate. (At 100 TB prefer
    approx_percentile; exactness is the point of this operator.)
    """
    events = load_table(spark, sf_dir, "events")

    @pandas_udf("double")
    def exact_median(v: pd.Series) -> float:
        return float(v.median())

    # A grouped-agg pandas UDF cannot share an .agg() with JVM aggregates —
    # compute it alone and join the plain count back in.
    med = events.groupBy("event_type").agg(
        F.round(exact_median(F.col("value")), 4).alias("med_value")
    )
    counts = events.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    return med.join(counts, "event_type")
