"""Scale-technique queries that stay oracle-checkable: salted aggregation,
pivot (multi-emit demux), exact percentiles, broadcast map-literal lookup."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cbde_mapreduce_spark.operators.skew import salted_aggregate
from cbde_mapreduce_spark.plans.money import cents
from cbde_mapreduce_spark.plans.registry import query
from cbde_mapreduce_spark.sources import load_table

REGION_OF_NATION_GROUP = {0: "AFRICA", 1: "AMERICA", 2: "ASIA", 3: "EUROPE", 4: "MIDDLE EAST"}


@query(
    "salted_agg_event_types",
    oracle="""
        SELECT event_type,
               count(*)                 AS n,
               round(sum(round(value * 100)::bigint) / 100.0, 2) AS sum_value,
               round(max(value), 2)     AS max_value
        FROM events
        GROUP BY event_type
    """,
    category="aggregation",
)
def salted_agg_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant two-phase salted aggregation (operators/skew.py).

    Values are identical to the plain group-by (the salt only changes
    partitioning) — which is exactly why it can share the plain oracle.
    """
    events = load_table(spark, sf_dir, "events").withColumn(
        "vc", cents("value")
    )
    out = salted_aggregate(
        events,
        ["event_type"],
        {
            "n": ("count", F.count(F.lit(1))),
            "sum_vc": ("sum", F.sum("vc")),
            "max_value_raw": ("max", F.max("value")),
        },
        n_salts=16,
    )
    return out.select(
        "event_type",
        "n",
        F.round(F.col("sum_vc") / F.lit(100.0), 2).alias("sum_value"),
        F.round("max_value_raw", 2).alias("max_value"),
    )


@query(
    "pivot_user_event_matrix",
    oracle="""
        SELECT user_id,
               sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END)::bigint AS click,
               sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END)::bigint AS error,
               sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::bigint AS purchase,
               sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END)::bigint AS signup,
               sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END)::bigint AS view
        FROM events
        GROUP BY user_id
    """,
    category="aggregation",
)
def pivot_user_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (the MR multi-emit + reducer-demux pattern) with pinned columns.

    Pivot values are declared explicitly — at scale, letting Spark discover
    pivot values costs an extra job over the full input.
    """
    events = load_table(spark, sf_dir, "events")
    piv = (
        events.groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "user_id",
        *[F.coalesce(c, F.lit(0)).cast("bigint").alias(c) for c in ["click", "error", "purchase", "signup", "view"]],
    )


@query(
    "percentiles_order_value",
    oracle="""
        SELECT o_orderstatus,
               round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
               round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
               round(quantile_cont(o_totalprice, 0.99), 4) AS p99
        FROM orders
        GROUP BY o_orderstatus
    """,
    category="aggregation",
)
def percentiles_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (both engines: linear / type-7).

    At 100 TB this becomes approx_percentile (t-digest); exactness here is
    the semantic contract being verified.
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
    )


@query(
    "map_literal_region_lookup",
    oracle="""
        SELECT CASE n_nationkey % 5
                 WHEN 0 THEN 'AFRICA' WHEN 1 THEN 'AMERICA' WHEN 2 THEN 'ASIA'
                 WHEN 3 THEN 'EUROPE' ELSE 'MIDDLE EAST' END AS mapped_region,
               count(*) AS n_nations
        FROM nation
        GROUP BY 1
    """,
    category="scalar",
)
def map_literal_region_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-literal lookup — the MR distributed-cache hashmap in setup(),
    as a Catalyst map expression (no join, no shuffle for the lookup)."""
    nation = load_table(spark, sf_dir, "nation")
    mapping = F.create_map(
        *[F.lit(x) for kv in REGION_OF_NATION_GROUP.items() for x in kv]
    )
    return (
        nation.select(
            mapping[F.col("n_nationkey") % 5].alias("mapped_region")
        )
        .groupBy("mapped_region")
        .agg(F.count(F.lit(1)).alias("n_nations"))
    )


@query(
    "profile_lineitem_columns",
    oracle="""
        SELECT 'l_quantity' AS col, count(*) AS n_rows,
               count(l_quantity)::bigint AS n_nonnull,
               round(min(l_quantity), 4) AS min_v, round(max(l_quantity), 4) AS max_v,
               round(avg(l_quantity), 6) AS mean_v
        FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice', count(*), count(l_extendedprice)::bigint,
               round(min(l_extendedprice), 4), round(max(l_extendedprice), 4),
               round(sum(round(l_extendedprice * 100)::bigint) / 100.0
                     / count(l_extendedprice), 6)
        FROM lineitem
        UNION ALL
        SELECT 'l_discount', count(*), count(l_discount)::bigint,
               round(min(l_discount), 4), round(max(l_discount), 4),
               round(sum(round(l_discount * 100)::bigint) / 100.0
                     / count(l_discount), 6)
        FROM lineitem
    """,
    category="aggregation",
)
def profile_lineitem_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (data-quality pass): one scan, all stats per column.

    Built as a single multi-aggregate + unpivot-style union so the table is
    read once regardless of how many columns are profiled — the shape that
    matters when the scan is 100 TB.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        # quantity is integer-valued (double sums exact, order-free);
        # price/discount means ride exact cent/percent units (money.py)
        mean = (
            F.round(F.avg(c), 6)
            if c == "l_quantity"
            else F.round(F.sum(cents(c)) / F.lit(100.0) / F.count(c), 6)
        )
        aggs += [
            F.count(c).alias(f"{c}__nonnull"),
            F.round(F.min(c), 4).alias(f"{c}__min"),
            F.round(F.max(c), 4).alias(f"{c}__max"),
            mean.alias(f"{c}__mean"),
        ]
    wide = li.agg(*aggs)
    parts = [
        wide.select(
            F.lit(c).alias("col"),
            F.col("n_rows"),
            F.col(f"{c}__nonnull").alias("n_nonnull"),
            F.col(f"{c}__min").alias("min_v"),
            F.col(f"{c}__max").alias("max_v"),
            F.col(f"{c}__mean").alias("mean_v"),
        )
        for c in cols
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@query(
    "salted_join_order_priority",
    oracle="""
        SELECT o_orderpriority,
               count(*)                          AS n_items,
               round(sum(round(l_extendedprice * 100)::bigint) / 100.0, 2)
                                                 AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
    """,
    category="scale",
)
def salted_join_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof salted equi-join (operators/skew.py::salted_broadcast_join):
    lineitem⋈orders with the join key widened to (key, salt) so a hot
    orderkey would fan out over 16 partitions instead of one reducer.

    The salt changes partitioning, never values — the oracle is the PLAIN
    join, and equality is the whole point of the check.
    """
    from cbde_mapreduce_spark.operators.skew import salted_broadcast_join

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"), "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), "o_orderpriority"
    )
    joined = salted_broadcast_join(li, orders, "k", n_salts=16)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum(cents("l_extendedprice")) / F.lit(100.0), 2).alias(
            "revenue"
        ),
    )


@query(
    "data_quality_checks",
    oracle="""
        SELECT 'orders_fk_customer' AS rule,
               (SELECT count(*) FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM customer c
                                  WHERE c.c_custkey = o.o_custkey))::bigint
                   AS n_violations
        UNION ALL
        SELECT 'orders_pk_unique',
               ((SELECT count(*) FROM orders)
                - (SELECT count(DISTINCT o_orderkey) FROM orders))::bigint
        UNION ALL
        SELECT 'lineitem_qty_in_1_30',
               (SELECT count(*) FROM lineitem
                WHERE l_quantity < 1 OR l_quantity > 30)::bigint
        UNION ALL
        SELECT 'customer_acctbal_nonneg',
               (SELECT count(*) FROM customer WHERE c_acctbal < 0)::bigint
        UNION ALL
        SELECT 'orders_date_before_2000',
               (SELECT count(*) FROM orders
                WHERE o_orderdate > DATE '2000-01-01')::bigint
    """,
    category="quality",
)
def data_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality constraint suite (the Deequ/dbt-test
    pattern): referential integrity, key uniqueness, range, sign, and
    freshness rules evaluated in one job, one row of violation counts per
    rule.

    Every rule is a scan + combinable aggregate (the FK rule a broadcast
    anti-join against the dimension); rules over the same table share its
    scan via Catalyst CTE-dedup. The result set is |rules|-sized — at
    100 TB this is the cheap always-on gate before data ships. Mixed
    zero / non-zero expectations (FK and PK hold; 25k range, 122 sign,
    3.6k freshness violations at sf0.01) keep the differential
    discriminating — an engine bug in any rule direction shows.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")

    def rule(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("rule"),
            F.count(F.lit(1)).cast("bigint").alias("n_violations"),
        )

    fk = orders.join(
        F.broadcast(customer.select("c_custkey")),
        orders.o_custkey == F.col("c_custkey"),
        "left_anti",
    )
    dup = orders.agg(
        F.lit("orders_pk_unique").alias("rule"),
        (F.count(F.lit(1)) - F.count_distinct("o_orderkey"))
        .cast("bigint")
        .alias("n_violations"),
    )
    qty = lineitem.filter((F.col("l_quantity") < 1) | (F.col("l_quantity") > 30))
    neg = customer.filter(F.col("c_acctbal") < 0)
    fresh = orders.filter(F.col("o_orderdate") > F.lit("2000-01-01").cast("date"))
    return (
        rule("orders_fk_customer", fk)
        .unionAll(dup)
        .unionAll(rule("lineitem_qty_in_1_30", qty))
        .unionAll(rule("customer_acctbal_nonneg", neg))
        .unionAll(rule("orders_date_before_2000", fresh))
    )


@query(
    "mad_outlier_orders",
    oracle="""
        WITH o AS (SELECT o_orderpriority,
                          round(o_totalprice * 100)::bigint AS yc
                   FROM orders),
        med AS (SELECT o_orderpriority,
                       quantile_cont(yc, 0.5) AS med
                FROM o GROUP BY 1),
        dev AS (SELECT o.o_orderpriority, o.yc, med.med,
                       abs(o.yc - med.med) AS adev
                FROM o JOIN med USING (o_orderpriority)),
        mad AS (SELECT o_orderpriority, any_value(med) AS med,
                       quantile_cont(adev, 0.5) AS mad
                FROM dev GROUP BY 1)
        SELECT d.o_orderpriority,
               count(*)::bigint AS n_orders,
               round(any_value(m.med) / 100.0, 4) AS med_price,
               round(any_value(m.mad) / 100.0, 4) AS mad_price,
               count(*) FILTER (WHERE d.adev > 3 * m.mad)::bigint AS n_outliers
        FROM dev d JOIN mad m USING (o_orderpriority)
        GROUP BY 1
    """,
    category="quality",
)
def mad_outlier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per group: median absolute deviation
    (median-of-|x − median|), flagging rows beyond 3·MAD — the
    heavy-tail-safe alternative to z-scores for corpus/price anomaly
    screens.

    Two grouped exact-percentile passes chained by a broadcast join of the
    (|groups|-sized) median table back onto the facts; all aggregation is
    combinable, no global sort. The medians run over INTEGER CENTS
    (round-10 hardening, same class as the conformal/RFM rolled-corpus
    catches): with integer inputs below 2⁵³, every value the 0.5-quantile
    interpolation can produce — halves, then quarters for the MAD pass —
    is exactly representable, so med/mad are bit-equal across engines
    REGARDLESS of each engine's interpolation formula, and the unrounded
    3·MAD band test (which replicated cent-quantized data loads with exact
    ties) cannot flip a row on an ulp.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("yc"),
    )
    med = o.groupBy("o_orderpriority").agg(
        F.percentile("yc", F.lit(0.5)).alias("med")
    )
    dev = o.join(F.broadcast(med), "o_orderpriority").withColumn(
        "adev", F.abs(F.col("yc") - F.col("med"))
    )
    mad = dev.groupBy("o_orderpriority").agg(
        F.any_value("med").alias("med2"),
        F.percentile("adev", F.lit(0.5)).alias("mad"),
    )
    return (
        dev.join(F.broadcast(mad), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.round(F.any_value("med2") / F.lit(100.0), 4).alias("med_price"),
            F.round(F.any_value("mad") / F.lit(100.0), 4).alias("mad_price"),
            F.sum(F.when(F.col("adev") > 3 * F.col("mad"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


@query(
    "benford_digit_audit",
    oracle="""
        WITH d AS (SELECT substr(floor(o_totalprice)::bigint::varchar, 1, 1)::int
                       AS digit
                   FROM orders WHERE o_totalprice >= 1),
        c AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
        t AS (SELECT sum(n) AS total FROM c)
        SELECT digit, n,
               round(n / (SELECT total FROM t), 6)            AS observed_p,
               round(log10(1.0 + 1.0 / digit), 6)             AS benford_p,
               round(abs(n / (SELECT total FROM t)
                         - log10(1.0 + 1.0 / digit)), 6)      AS abs_dev
        FROM c
    """,
    category="warehouse",
)
def benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the forensic
    data-quality screen (fabricated or truncated monetary data departs
    from the log10(1 + 1/d) digit curve). Per digit: observed share vs
    the Benford expectation and the absolute deviation.

    One narrow scan + a 9-row aggregate; the digit extraction goes
    floor → integer → string (explicit floor because a bare double→bigint
    cast ROUNDS in DuckDB but TRUNCATES in Spark — one fixture order sits
    exactly on that boundary; and never float formatting, which also
    differs between engines). This fixture's totals are uniform-ish, NOT
    Benford-distributed — large deviations on high digits are the
    expected, discriminating output here (the audit detects that too).
    """
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    digit = F.substring(
        F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
    ).cast("int")
    c = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    total = Window.partitionBy()
    obs = F.col("n") / F.sum("n").over(total)
    benford = F.log10(1.0 + 1.0 / F.col("digit"))
    return c.select(
        "digit",
        "n",
        F.round(obs, 6).alias("observed_p"),
        F.round(benford, 6).alias("benford_p"),
        F.round(F.abs(obs - benford), 6).alias("abs_dev"),
    )


@query(
    "key_skew_profile",
    oracle="""
        WITH c AS (SELECT l_suppkey AS k, count(*)::bigint AS cnt
                   FROM lineitem GROUP BY l_suppkey),
        t AS (SELECT sum(cnt) AS total FROM c),
        p AS (SELECT cnt, total, cnt / total::double AS pr FROM c, t)
        SELECT count(*)::bigint                         AS n_keys,
               max(total)::bigint                       AS n_rows,
               max(cnt)::bigint                         AS max_cnt,
               round(max(cnt) / max(total)::double, 6)  AS top1_share,
               round(quantile_cont(cnt, 0.99), 4)       AS p99_cnt,
               round(CASE WHEN count(*) < 2 THEN NULL
                          ELSE sqrt(greatest(count(*)::double
                                     * sum(cnt::decimal(19,0) * cnt)::double
                                   - sum(cnt)::double * sum(cnt)::double, 0)
                          / (count(*)::double * (count(*)::double - 1)))
                     / (sum(cnt)::double / count(*)) END, 6) AS cv,
               round(-sum(round(pr * ln(pr) * 1e12)::bigint)::double
                     / 1e12, 6)                         AS entropy
        FROM p
    """,
    category="scale",
)
def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profile of lineitem.l_suppkey — the measurement that
    DECIDES skew treatment (salting / AQE skew-join / broadcast) before a
    big join, instead of guessing: key count, heaviest-key share, p99
    per-key count, coefficient of variation, and key-distribution entropy.

    One map-side-combinable groupBy reduces the fact table to |keys| rows;
    every statistic is then a single aggregate over that key-count vector
    (the 1-row total rides in as a broadcast). This is the profiler behind
    operators/skew.py::salted_aggregate — high top1_share / low entropy is
    the signal that turns salting on.
    """
    li = load_table(spark, sf_dir, "lineitem")
    c = li.groupBy(F.col("l_suppkey").alias("k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    t = c.agg(F.sum("cnt").alias("total"))
    p = F.col("cnt") / F.col("total").cast("double")
    # cv from exact integer count moments; entropy terms (per-key
    # p*ln(p), deterministic doubles) quantize at 1e-12 before the sum
    # (money.py round-11 — the double co-moment/entropy sums merged in
    # scheduler order)
    nk = F.count(F.lit(1)).cast("double")
    sc = F.sum("cnt").cast("double")
    # decimal BEFORE the square: a single hot key at fleet scale can
    # push cnt^2 past int64
    sc2 = F.sum(F.col("cnt").cast("decimal(19,0)") * F.col("cnt")).cast(
        "double"
    )
    return c.crossJoin(F.broadcast(t)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.max("total").cast("bigint").alias("n_rows"),
        F.max("cnt").cast("bigint").alias("max_cnt"),
        F.round(F.max("cnt") / F.max("total").cast("double"), 6).alias("top1_share"),
        F.round(F.expr("percentile(cnt, 0.99)"), 4).alias("p99_cnt"),
        # n < 2 guard: ANSI Spark raises DIVIDE_BY_ZERO even on double /
        # (one-row sweep); DuckDB's 0/0 would yield NULL — CASE both sides
        F.round(
            F.when(nk < 2, F.lit(None)).otherwise(
                F.sqrt(
                    F.greatest(nk * sc2 - sc * sc, F.lit(0.0))
                    / (nk * (nk - 1))
                )
                / (sc / nk)
            ),
            6,
        ).alias("cv"),
        F.round(
            -F.sum(F.round(p * F.log(p) * 1e12).cast("bigint")).cast("double")
            / F.lit(1e12),
            6,
        ).alias("entropy"),
    )


SAMPLE_K = 3


@query(
    "sample_k_per_group",
    oracle=f"""
        SELECT user_id, event_id, rn
        FROM (SELECT user_id, event_id,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY md5(event_id::varchar),
                                                 event_id) AS rn
              FROM events)
        WHERE rn <= {SAMPLE_K}
    """,
    category="scale",
)
def sample_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-key deterministic sampling: 3 events per user, chosen
    by md5-hash order — the per-key downsampler that caps hot keys before
    an expensive downstream op (rand() would be irreproducible; LIMIT
    inside a group is order-dependent; hash order is both uniform-ish and
    replayable).

    One window on the group key: shuffle by user_id, sort each partition by
    (md5(id), id), keep rn ≤ 3. The same hash trick at 100 TB caps any
    key's contribution regardless of its raw frequency — the sampling face
    of the skew toolkit (key_skew_profile → salting / capping).
    """
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(
        F.md5(F.col("event_id").cast("string")), F.col("event_id")
    )
    return (
        ev.select("user_id", "event_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= SAMPLE_K)
    )


_SEL_ORACLE = """
    WITH n AS (SELECT count(*)::bigint AS n FROM orders),
    k AS (SELECT n, (n + 1) // 2 AS k FROM n)
    SELECT k.n, k.k,
           (SELECT o_totalprice FROM orders
            ORDER BY o_totalprice
            LIMIT 1 OFFSET (SELECT k - 1 FROM k)) AS median
    FROM k
"""


@query("exact_median_selection", oracle=_SEL_ORACLE, category="scale")
def exact_median_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (lower) median of o_totalprice WITHOUT a global sort and
    without a single-JVM percentile aggregate: iterative histogram
    narrowing (operators/selection.py::kth_smallest) — the multi-round
    selection algorithm every MPP engine reaches for when the column no
    longer fits one reducer.

    Per round, one combinable 32-bucket histogram aggregation runs over
    the surviving rows and only the 32 counts reach the driver; the
    survivor set shrinks ~32× per round (log₃₂ n rounds total), and the
    finish is a bounded TakeOrdered over ≤4096 candidates. Contrast with
    percentiles_order_value (single-aggregate exact percentile — correct
    but collects the full column into one JVM aggregation buffer) and
    decile_histogram_orders (interpolated edges): this is the exact-answer
    scale path. The oracle is the direct ORDER BY / OFFSET definition.
    """
    from cbde_mapreduce_spark.operators.selection import kth_smallest

    orders = load_table(spark, sf_dir, "orders")
    n = orders.count()
    k = (n + 1) // 2
    # empty input: k = 0 has no defined order statistic; NULL median like
    # the oracle's out-of-range scalar subquery
    med = kth_smallest(orders, "o_totalprice", k) if k >= 1 else None
    return spark.createDataFrame(
        [(n, k, med)], "n bigint, k bigint, median double"
    )
