"""Privacy auditing / anonymization queries (SURVEY.md §2 widened): the
checks a data-release pipeline runs before shipping a table — re-identification
risk (k-anonymity, l-diversity) and the Laplace mechanism for DP counts.

Scale shape: both audits reduce to ONE combinable groupBy over the
quasi-identifier key; every risk statistic is then arithmetic over the
group-size table (|QI combinations| rows, not |rows|). The DP mechanism is a
per-group scalar transform of already-aggregated counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cbde_mapreduce_spark.plans.registry import query
from cbde_mapreduce_spark.sources import load_table

_K_ANON = 5
_L_DIV = 3

_KANON_ORACLE = f"""
    WITH g AS (
        SELECT c_nationkey, c_mktsegment,
               count(*)::bigint AS k,
               count(DISTINCT CASE WHEN c_acctbal < 0 THEN 'neg'
                                   WHEN c_acctbal < 5000 THEN 'low'
                                   ELSE 'high' END)::bigint AS l
        FROM customer GROUP BY c_nationkey, c_mktsegment)
    SELECT count(*)::bigint AS n_groups,
           min(k)::bigint AS k_min,
           sum(CASE WHEN k < {_K_ANON} THEN 1 ELSE 0 END)::bigint
             AS groups_below_k,
           sum(CASE WHEN k < {_K_ANON} THEN k ELSE 0 END)::bigint
             AS customers_at_risk,
           min(l)::bigint AS l_min,
           sum(CASE WHEN l < {_L_DIV} THEN 1 ELSE 0 END)::bigint
             AS groups_below_l
    FROM g
"""


@query("k_anonymity_audit", oracle=_KANON_ORACLE, category="privacy")
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-identification risk audit before release: k-anonymity (smallest
    quasi-identifier group) and l-diversity (fewest distinct sensitive
    values within a group) over QI = (nation, market segment), sensitive
    attribute = the banded account balance. A group of size < k can be
    singled out by its QI alone; a group with < l sensitive values leaks
    the attribute even when k holds — both must pass.

    One groupBy over the QI key computes group size and within-group
    sensitive diversity together (count + count-distinct share the
    shuffle); the release decision statistics are a second aggregate over
    the |QI| group table. At 100 TB the QI table is the only state —
    bounded by the QI domain, not the data.
    """
    cust = load_table(spark, sf_dir, "customer")
    sensitive = (
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
    )
    g = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.count_distinct(sensitive).cast("bigint").alias("l"),
    )
    return g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.min("k").cast("bigint").alias("k_min"),
        F.sum(F.when(F.col("k") < _K_ANON, 1).otherwise(0))
        .cast("bigint")
        .alias("groups_below_k"),
        F.sum(F.when(F.col("k") < _K_ANON, F.col("k")).otherwise(0))
        .cast("bigint")
        .alias("customers_at_risk"),
        F.min("l").cast("bigint").alias("l_min"),
        F.sum(F.when(F.col("l") < _L_DIV, 1).otherwise(0))
        .cast("bigint")
        .alias("groups_below_l"),
    )


_DP_EPS = 0.5  # epsilon; count sensitivity is 1

_DP_ORACLE = f"""
    WITH g AS (SELECT c_mktsegment AS segment, count(*)::bigint AS true_n
               FROM customer GROUP BY c_mktsegment),
    u AS (SELECT segment, true_n,
                 ((ascii(substr(md5(segment), 1, 1)) * 256
                   + ascii(substr(md5(segment), 2, 1)) + 0.5) / 65536.0) - 0.5
                   AS uni
          FROM g)
    SELECT segment, true_n,
           round(true_n - (1.0 / {_DP_EPS})
                 * sign(uni) * ln(1 - 2 * abs(uni)), 4) AS noisy_n,
           round(abs((1.0 / {_DP_EPS}) * sign(uni) * ln(1 - 2 * abs(uni))), 4)
             AS abs_noise
    FROM u
"""


@query("dp_laplace_counts", oracle=_DP_ORACLE, category="privacy")
def dp_laplace_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Laplace mechanism for differentially-private counts: per-segment
    customer counts plus Laplace(Δ/ε) noise, Δ=1 (one customer moves one
    count), ε=0.5 — noisy_n is what a DP release publishes instead of
    true_n.

    The noise draw inverts the Laplace CDF at a uniform derived from the
    md5 of the group key — DETERMINISTIC BY DESIGN here so the oracle can
    certify the mechanism's arithmetic exactly; a production release
    replaces that one uniform with a cryptographic RNG (the privacy
    guarantee lives in the randomness, which no differential test can
    check). The mechanism itself is a scalar transform AFTER the
    combinable count aggregation — zero extra passes at any scale.
    """
    cust = load_table(spark, sf_dir, "customer")
    g = cust.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).cast("bigint").alias("true_n")
    )
    h = F.md5(F.encode("segment", "UTF-8"))
    uni = (
        (F.ascii(F.substring(h, 1, 1)) * 256 + F.ascii(F.substring(h, 2, 1)) + 0.5)
        / 65536.0
    ) - 0.5
    noise = (1.0 / _DP_EPS) * F.signum(uni) * F.log(1 - 2 * F.abs(uni))
    return g.select(
        "segment",
        "true_n",
        F.round(F.col("true_n") - noise, 4).alias("noisy_n"),
        F.round(F.abs(noise), 4).alias("abs_noise"),
    )
