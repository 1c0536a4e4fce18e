"""Aggregate/scalar surface extensions (SURVEY.md §2.4/§2.8 depth):
boolean/bitwise aggregates, linear-regression aggregates, conditional
counting (``count_if``), safe-cast ingestion parsing (``try_cast``), and a
dominance (skyline/Pareto-front) query built on the distributed prefix-min
operator.

All follow the registry's hash-matching discipline: identical aliases on
both engine sides, floats rounded on both sides, deterministic orderings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cbde_mapreduce_spark.operators.prefix import exclusive_prefix_min
from cbde_mapreduce_spark.plans.money import cents
from cbde_mapreduce_spark.plans.registry import query
from cbde_mapreduce_spark.sources import load_table


@query(
    "bool_bit_aggs_lineitem",
    oracle="""
        SELECT l_returnflag,
               bool_and(l_quantity < 49.0)            AS all_small,
               bool_or(l_discount > 0.09)             AS any_deep_disc,
               bit_and(CAST(l_linenumber AS BIGINT))  AS line_mask_and,
               bit_or(CAST(l_linenumber AS BIGINT))   AS line_mask_or,
               bit_xor(CAST(l_suppkey AS BIGINT))     AS supp_xor
        FROM lineitem
        GROUP BY l_returnflag
    """,
    category="aggregate",
)
def bool_bit_aggs_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bool_and/bool_or + bit_and/bit_or/bit_xor aggregates.

    All five are map-side-combinable monoids, so the partial-aggregate
    before the shuffle moves one row per (partition, flag) — the same 100×
    shape as SUM. bit_xor over a key column doubles as an order-independent
    group fingerprint (cf. ``fingerprint_table``).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bool_and(F.col("l_quantity") < 49.0).alias("all_small"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_deep_disc"),
        F.bit_and(F.col("l_linenumber").cast("bigint")).alias("line_mask_and"),
        F.bit_or(F.col("l_linenumber").cast("bigint")).alias("line_mask_or"),
        F.bit_xor(F.col("l_suppkey").cast("bigint")).alias("supp_xor"),
    )


@query(
    "regr_aggs_lineitem",
    oracle="""
        WITH r AS (SELECT l_returnflag,
                          round(l_quantity)::bigint AS x,
                          round(l_extendedprice * 100)::bigint AS yc
                   FROM lineitem
                   WHERE l_quantity IS NOT NULL
                     AND l_extendedprice IS NOT NULL),
        m AS (SELECT l_returnflag,
                     count(*)::bigint AS n,
                     sum(x)::bigint AS sx, sum(yc)::bigint AS sy,
                     sum(x * x)::bigint AS sxx,
                     sum((x * yc)::decimal(38,0)) AS sxy,
                     sum((yc * yc)::decimal(38,0)) AS syy
              FROM r GROUP BY l_returnflag),
        f AS (SELECT l_returnflag, n,
                     n::double * sxx::double - sx::double * sx::double AS det,
                     n::double * syy::double - sy::double * sy::double AS dety,
                     n::double * sxy::double - sx::double * sy::double AS cov,
                     sx::double AS dsx, sy::double AS dsy, n::double AS dn
              FROM m)
        SELECT l_returnflag,
               round(CASE WHEN det = 0 THEN NULL
                          ELSE cov / det END / 100.0, 4)   AS price_qty_slope,
               round((dsy - CASE WHEN det = 0 THEN NULL
                                 ELSE cov / det END * dsx) / dn
                     / 100.0, 2)                           AS price_qty_icept,
               round(CASE WHEN det = 0 OR dety = 0 THEN NULL
                          ELSE cov * cov / (det * dety) END, 6) AS price_qty_r2,
               n AS n_pairs
        FROM f
    """,
    category="aggregate",
)
def regr_aggs_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group least-squares fit from the six combinable moments.

    One pass, one shuffle: the regr_* family decomposes into (n, Σx, Σy,
    Σxx, Σyy, Σxy) partial-agg moments — and since round 11 those moments
    are EXACT integers (bigint quantities x bigint cents, decimal(38,0)
    for the squared terms; money.py discipline): builtin regr_* aggs
    accumulate double co-moments whose partial-merge order is scheduler-
    dependent, the exact class that flipped conformal_interval_orders'
    coverage in round 10. Slope/intercept/r² are ONE deterministic double
    expression over identical exact operands on both engines; degenerate
    fits (zero x- or y-variance) yield NULL via the same CASE both sides.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity").isNotNull() & F.col("l_extendedprice").isNotNull()
    )
    x = F.round(F.col("l_quantity")).cast("bigint")
    yc = cents("l_extendedprice")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(yc).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum((x * yc).cast("decimal(38,0)")).alias("sxy"),
        F.sum((yc * yc).cast("decimal(38,0)")).alias("syy"),
    )
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731 — mirror ::double
    f = m.select(
        "l_returnflag",
        F.col("n"),
        (dbl("n") * dbl("sxx") - dbl("sx") * dbl("sx")).alias("det"),
        (dbl("n") * dbl("syy") - dbl("sy") * dbl("sy")).alias("dety"),
        (dbl("n") * dbl("sxy") - dbl("sx") * dbl("sy")).alias("cov"),
        dbl("sx").alias("dsx"),
        dbl("sy").alias("dsy"),
        dbl("n").alias("dn"),
    )
    m_c = F.when(F.col("det") == 0, F.lit(None)).otherwise(
        F.col("cov") / F.col("det")
    )
    return f.select(
        "l_returnflag",
        F.round(m_c / F.lit(100.0), 4).alias("price_qty_slope"),
        F.round(
            (F.col("dsy") - m_c * F.col("dsx")) / F.col("dn") / F.lit(100.0), 2
        ).alias("price_qty_icept"),
        F.round(
            F.when((F.col("det") == 0) | (F.col("dety") == 0), F.lit(None))
            .otherwise(F.col("cov") * F.col("cov") / (F.col("det") * F.col("dety"))),
            6,
        ).alias("price_qty_r2"),
        F.col("n").alias("n_pairs"),
    )


@query(
    "count_if_priority_orders",
    oracle="""
        SELECT o_orderpriority,
               count(*)                                 AS n_orders,
               CAST(count_if(o_totalprice > 250000.0) AS BIGINT) AS n_big,
               CAST(count_if(o_orderstatus = 'F') AS BIGINT)     AS n_finished,
               round(sum(CASE WHEN o_orderstatus = 'F'
                              THEN round(o_totalprice * 100)::bigint
                              ELSE 0 END) / 100.0, 2)   AS finished_price
        FROM orders
        GROUP BY o_orderpriority
    """,
    category="aggregate",
)
def count_if_priority_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional counting — count_if and filtered-CASE sums in one agg."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.count_if(F.col("o_totalprice") > 250000.0).alias("n_big"),
        F.count_if(F.col("o_orderstatus") == "F").alias("n_finished"),
        F.round(
            F.sum(
                F.when(
                    F.col("o_orderstatus") == "F", cents("o_totalprice")
                ).otherwise(F.lit(0))
            )
            / F.lit(100.0),
            2,
        ).alias("finished_price"),
    )


@query(
    "safe_cast_mixed_events",
    oracle="""
        WITH mixed AS (
            SELECT event_id, event_type,
                   CASE WHEN event_id % 3 = 0 THEN CAST(value AS VARCHAR)
                        ELSE event_type END AS raw
            FROM events
        )
        SELECT event_type,
               count(*)                                              AS n_events,
               count(try_cast(raw AS DOUBLE))                        AS n_parsed,
               round(sum(round(coalesce(try_cast(raw AS DOUBLE), 0.0)
                               * 100)::bigint) / 100.0, 2)  AS parsed_sum
        FROM mixed
        GROUP BY event_type
    """,
    category="scalar",
)
def safe_cast_mixed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_cast over a deliberately mixed string column — safe ingestion.

    A third of the rows carry a castable numeric string, the rest a word;
    try_cast yields NULL (never an error) for the junk, so count(parsed)
    measures parse yield. The double→string→double round trip is exact on
    both engines (shortest-round-trip float formatting), so parsed_sum is
    engine-comparable after rounding.
    """
    ev = load_table(spark, sf_dir, "events")
    mixed = ev.withColumn(
        "raw",
        F.when(F.col("event_id") % 3 == 0, F.col("value").cast("string")).otherwise(
            F.col("event_type")
        ),
    )
    parsed = F.col("raw").try_cast("double")
    return mixed.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.count(parsed).alias("n_parsed"),
        F.round(
            F.sum(cents(F.coalesce(parsed, F.lit(0.0)))) / F.lit(100.0), 2
        ).alias("parsed_sum"),
    )


@query(
    "skyline_orders",
    oracle="""
        WITH f AS (
            SELECT o_orderkey, o_totalprice, o_orderdate
            FROM orders WHERE o_totalprice > 450000.0
        )
        SELECT a.o_orderkey, a.o_totalprice, a.o_orderdate
        FROM f a
        WHERE NOT EXISTS (
            SELECT 1 FROM f b
            WHERE b.o_totalprice > a.o_totalprice
              AND b.o_orderdate  < a.o_orderdate
        )
    """,
    category="window",
)
def skyline_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto front): maximize price, minimize date — orders not
    strictly dominated by any other.

    The oracle is the O(n²) NOT-EXISTS dominance definition; the Spark plan
    is the sort-based O(n log n) realization: group rows by price (one
    shuffle), take each price's min date, then an EXCLUSIVE running min of
    date over strictly-higher prices — computed with the distributed
    prefix-min operator (operators/prefix.py), NOT a single-partition global
    window, so the scan stays P-way parallel at any distinct-price count. A
    row is on the front iff its date ≤ every strictly-higher-priced row's
    min date (vacuously true for the top price group, where the exclusive
    prefix is NULL).
    """
    f = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 450000.0)
        .select("o_orderkey", "o_totalprice", "o_orderdate")
    )
    grp = (
        f.groupBy("o_totalprice")
        .agg(F.min("o_orderdate").alias("grp_min_date"))
        .withColumn("__ord", -F.col("o_totalprice"))
    )
    pm = exclusive_prefix_min(
        grp, "__ord", "grp_min_date", out_col="prev_min_date", num_partitions=16
    )
    return (
        f.join(pm.select("o_totalprice", "prev_min_date"), "o_totalprice")
        .filter(
            F.col("prev_min_date").isNull()
            | (F.col("o_orderdate") <= F.col("prev_min_date"))
        )
        .select("o_orderkey", "o_totalprice", "o_orderdate")
    )


@query(
    "listagg_priority_profile",
    oracle="""
        WITH pc AS (SELECT o_orderstatus, o_orderpriority AS p, count(*) AS c
                    FROM orders GROUP BY 1, 2)
        SELECT o_orderstatus,
               string_agg(p || ':' || c, ',' ORDER BY p) AS priorities
        FROM pc GROUP BY o_orderstatus
    """,
    category="aggregation",
)
def listagg_priority_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (SQL:2023 LISTAGG ... WITHIN GROUP):
    per-status 'priority:count' profile as one deterministic string.

    The two-level shape keeps the aggregated strings bounded: counts
    collapse first (map-side combinable), LISTAGG runs over the tiny
    (status × priority) relation — never concatenate the fact table.
    DuckDB's ordered string_agg is the oracle twin.
    """
    o = load_table(spark, sf_dir, "orders")
    pc = o.groupBy("o_orderstatus", F.col("o_orderpriority").alias("p")).agg(
        F.count(F.lit(1)).alias("c")
    )
    return pc.groupBy("o_orderstatus").agg(
        F.expr(
            "listagg(p || ':' || c, ',') WITHIN GROUP (ORDER BY p)"
        ).alias("priorities")
    )


@query(
    "incremental_agg_merge",
    oracle="""
        SELECT o_orderstatus, count(*) AS n,
               round(sum(round(o_totalprice * 100)::bigint) / 100.0, 2) AS total
        FROM orders GROUP BY o_orderstatus
    """,
    category="aggregation",
)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-rollup maintenance: the base partition's aggregate and
    the delta partition's aggregate are MERGED (re-aggregated), never
    recomputed from raw — and the merge must equal the from-scratch
    aggregate, which is exactly what the oracle checks.

    This is the incremental pattern behind every continuously-maintained
    100 TB rollup: sums/counts are associative, so yesterday's aggregate +
    today's delta aggregate costs O(|delta| + |groups|), not O(|base|).
    The date split simulates the base/delta landing boundary.
    """
    o = load_table(spark, sf_dir, "orders")
    cut = F.lit("1999-01-01 00:00:00").cast("timestamp_ntz")

    def partial(df: DataFrame) -> DataFrame:
        # partial totals in exact integer cents (money.py): the merge then
        # re-sums bigints, so base+delta is bit-equal to from-scratch at
        # ANY partition boundary — the associativity the pattern claims
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents("o_totalprice")).alias("total_c"),
        )

    base = partial(o.filter(F.col("o_orderdate") < cut))
    delta = partial(o.filter(F.col("o_orderdate") >= cut))
    return (
        base.unionByName(delta)
        .groupBy("o_orderstatus")
        .agg(
            F.sum("n").alias("n"),
            F.round(F.sum("total_c") / F.lit(100.0), 2).alias("total"),
        )
    )


@query(
    "incremental_join_maintenance",
    oracle="""
        SELECT c_mktsegment,
               count(*)::bigint AS n_orders,
               round(sum(round(o_totalprice * 100)::bigint) / 100.0, 2)
                 AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    category="aggregation",
)
def incremental_join_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental JOIN-view maintenance: with orders split into base O0 and
    delta dO (by order date) and customer into base C0 and delta dC (by key
    mod), the joined view is maintained as the delta identity

        (O0 + dO) JOIN (C0 + dC) = O0 JOIN C0  +  dO JOIN C0
                                 + O0 JOIN dC  +  dO JOIN dC

    — three delta joins touch only delta-sized inputs; the full-recompute
    O0 JOIN C0 term would already be materialized in a real pipeline. The
    oracle computes the DIRECT join, so the value hash proves the
    decomposition is exhaustive and disjoint (a wrong split double-counts
    or drops rows). Completes the incremental-maintenance triangle beside
    incremental_agg_merge (rollups) and table_diff_cdc (snapshot diffs).
    Every term shuffles on the same join key, and the final per-segment
    aggregate is map-side combinable over the union.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", "o_orderdate"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cut = F.lit("1998-01-01").cast("timestamp_ntz")
    o0 = orders.filter(F.col("o_orderdate") < cut)
    do = orders.filter(F.col("o_orderdate") >= cut)
    c0 = cust.filter(F.col("c_custkey") % 10 != 0)
    dc = cust.filter(F.col("c_custkey") % 10 == 0)
    on = [F.col("o_custkey") == F.col("c_custkey")]
    parts = [
        o0.join(c0, on),
        do.join(c0, on),
        o0.join(dc, on),
        do.join(dc, on),
    ]
    j = parts[0]
    for p in parts[1:]:
        j = j.unionByName(p)
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.round(F.sum(cents("o_totalprice")) / F.lit(100.0), 2).alias("revenue"),
    )


@query(
    "weighted_median_price",
    oracle="""
        WITH s AS (
            SELECT l_returnflag, l_extendedprice, l_quantity,
                   sum(l_quantity) OVER (PARTITION BY l_returnflag
                                         ORDER BY l_extendedprice,
                                                  l_orderkey, l_linenumber
                                         ROWS UNBOUNDED PRECEDING) AS cw,
                   sum(l_quantity) OVER (PARTITION BY l_returnflag) AS w
            FROM lineitem)
        SELECT l_returnflag,
               count(*)::bigint AS n,
               round(max(w), 2) AS w_total,
               round(min(CASE WHEN cw >= w / 2 THEN l_extendedprice END), 4)
                 AS weighted_median
        FROM s
        GROUP BY l_returnflag
    """,
    category="aggregation",
)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median (quantity-weighted extended price per return flag):
    the smallest price whose cumulative weight reaches half the group's
    total — the robust center that plain median misses when weights vary.

    Cumulative weights run over an explicit ROWS frame with a
    (price, orderkey, linenumber) total order, so both engines accumulate
    the SAME float sequence and cross the W/2 threshold on the same row —
    exact equality without rounding tricks on the path. The whole-partition
    total rides the same shuffle as a frameless window. Exact semantics is
    the contract here; the 100 TB form is a two-pass bucketed quantile
    (histogram pass → in-bucket pass) or t-digest.
    """
    li = load_table(spark, sf_dir, "lineitem")
    from pyspark.sql import Window

    wo = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("l_returnflag")
    s = li.select(
        "l_returnflag",
        "l_extendedprice",
        "l_quantity",
        F.sum("l_quantity").over(wo).alias("cw"),
        F.sum("l_quantity").over(wall).alias("w"),
    )
    return s.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.max("w"), 2).alias("w_total"),
        F.round(
            F.min(
                F.when(F.col("cw") >= F.col("w") / 2, F.col("l_extendedprice"))
            ),
            4,
        ).alias("weighted_median"),
    )


@query(
    "decimal_exact_revenue",
    oracle="""
        SELECT o_orderstatus,
               count(*)::bigint AS n,
               sum(o_totalprice::decimal(18,2))::varchar AS revenue_exact
        FROM orders
        GROUP BY o_orderstatus
    """,
    category="aggregation",
)
def decimal_exact_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Money arithmetic in DECIMAL, not double: per-status revenue summed as
    decimal(18,2) and emitted as a STRING, so the check is exact to the
    cent with no float rounding discipline at all — the representation a
    finance-grade pipeline must use, and at 100 TB decimal sums stay exact
    where double sums drift with partition count and add order.

    Same combinable one-groupBy shape as the double version
    (global_agg_lineitem); only the type lane differs (Spark widens the
    accumulator to decimal(28,2), DuckDB to decimal(38,2) — same digits,
    same string).
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("string")
        .alias("revenue_exact"),
    )


KMV_K = 256

#: portable hex-digit value: '0'-'9' -> 0-9, 'a'-'f' -> 10-15
_HEXC = "(ascii(substr({h}, {i}, 1)) - CASE WHEN substr({h}, {i}, 1) <= '9' THEN 48 ELSE 87 END)"


def _hex4_sql(h: str) -> str:
    """First 16 bits of a hex string as an integer (DuckDB + Spark SQL)."""
    return " + ".join(
        f"{_HEXC.format(h=h, i=i)} * {16 ** (4 - i)}" for i in range(1, 5)
    )


@query(
    "kmv_distinct_customers",
    oracle=f"""
        WITH d AS (SELECT DISTINCT o_orderpriority, o_custkey FROM orders),
        h AS (SELECT o_orderpriority,
                     md5(o_custkey::varchar) AS hx
              FROM d),
        r AS (SELECT o_orderpriority, hx,
                     row_number() OVER (PARTITION BY o_orderpriority
                                        ORDER BY hx) AS rn,
                     count(*) OVER (PARTITION BY o_orderpriority) AS n_exact
              FROM h),
        kth AS (SELECT o_orderpriority, n_exact,
                       ({_hex4_sql('hx')}) / 65536.0 AS u_k
                FROM r WHERE rn = {KMV_K})
        SELECT o_orderpriority,
               n_exact::bigint AS n_exact,
               round(({KMV_K} - 1) / u_k, 2) AS kmv_estimate,
               round(abs(({KMV_K} - 1) / u_k - n_exact) / n_exact, 4)
                 AS rel_err
        FROM kth
    """,
    category="aggregation",
)
def kmv_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch per order priority,
    k=256 — the second mergeable cardinality sketch beside HLL, and unlike
    HLL it is exactly reproducible from first principles in BOTH engines
    (the k-th smallest md5 is deterministic), so this approximate sketch
    gets a full value-hash oracle, not a rows-only pass.

    Estimate = (k−1)/u(k) where u(k) is the k-th order statistic of the
    hash-uniform [0,1) values (quantized to 16 bits portably via hex-char
    arithmetic — ~4e-4 relative quantization, far under the sketch's own
    1/√k ≈ 6% error, and identical in both engines). Mergeability at
    100 TB: union of per-partition k-min sets, keep the k smallest — an
    associative combiner, same update shape as HLL's register max. The
    emitted rel_err column IS the accuracy check (≈2-7% here).
    """
    orders = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window

    d = orders.select("o_orderpriority", "o_custkey").distinct()
    h = d.select(
        "o_orderpriority",
        F.md5(F.col("o_custkey").cast("string")).alias("hx"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy("hx")
    wall = Window.partitionBy("o_orderpriority")
    r = h.select(
        "o_orderpriority",
        "hx",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n_exact"),
    )
    kth = r.filter(F.col("rn") == KMV_K).select(
        "o_orderpriority",
        "n_exact",
        (F.expr(_hex4_sql("hx")) / 65536.0).alias("u_k"),
    )
    est = (KMV_K - 1) / F.col("u_k")
    return kth.select(
        "o_orderpriority",
        F.col("n_exact").cast("bigint").alias("n_exact"),
        F.round(est, 2).alias("kmv_estimate"),
        F.round(F.abs(est - F.col("n_exact")) / F.col("n_exact"), 4).alias(
            "rel_err"
        ),
    )


_BR_Y1, _BR_Y2 = 1997, 1998

_BRIDGE_ORACLE = f"""
    WITH base AS (
        SELECT p.p_type AS ptype, year(o.o_orderdate) AS y,
               sum(l.l_quantity)::double AS vol,
               sum((round(l.l_extendedprice * 100)::bigint
                    * (100 - round(l.l_discount * 100)::bigint)
                   )::decimal(38,0)) AS rev
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE year(o.o_orderdate) IN ({_BR_Y1}, {_BR_Y2})
        GROUP BY 1, 2),
    w AS (SELECT ptype,
                 max(CASE WHEN y = {_BR_Y1} THEN vol END) AS v1,
                 max(CASE WHEN y = {_BR_Y2} THEN vol END) AS v2,
                 max(CASE WHEN y = {_BR_Y1} THEN rev END)::double
                   / 10000.0 AS r1,
                 max(CASE WHEN y = {_BR_Y2} THEN rev END)::double
                   / 10000.0 AS r2
          FROM base GROUP BY ptype),
    d AS (SELECT ptype, v1, v2, r1, r2,
                 r1 / v1 AS p1, r2 / v2 AS p2
          FROM w WHERE v1 IS NOT NULL AND v2 IS NOT NULL)
    SELECT ptype,
           round(r2 - r1, 2) AS delta_rev,
           round((v2 - v1) * p1, 2) AS volume_effect,
           round((p2 - p1) * v1, 2) AS price_effect,
           round((v2 - v1) * (p2 - p1), 2) AS mix_effect
    FROM d
"""


@query("revenue_bridge_decomposition", oracle=_BRIDGE_ORACLE, category="aggregation")
def revenue_bridge_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue bridge per part type between 1997 and 1998: the exact
    price/volume/mix decomposition ΔR = Δv·p₁ + Δp·v₁ + Δv·Δp (the three
    terms sum to delta_rev by algebraic identity — a built-in self-check
    the driver's value hash exercises on every run).

    One pass reduces the three-table star to the (type, year) grid
    (dimensions broadcast), the year pivot is conditional max over the
    6-row-per-type table, and the decomposition is scalar algebra —
    the whole financial bridge costs one fact-table scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    base = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(F.year("o_orderdate").isin(_BR_Y1, _BR_Y2))
        .groupBy(F.col("p_type").alias("ptype"), F.year("o_orderdate").alias("y"))
        .agg(
            F.sum("l_quantity").cast("double").alias("vol"),
            # exact 1e-4-dollar units (money.py); converted to dollars
            # once per (type, year) cell after the pivot
            F.sum(
                (
                    F.round(F.col("l_extendedprice") * 100).cast("bigint")
                    * (
                        F.lit(100)
                        - F.round(F.col("l_discount") * 100).cast("bigint")
                    )
                ).cast("decimal(38,0)")
            ).alias("rev"),
        )
    )
    cell = lambda y, c: F.max(F.when(F.col("y") == y, F.col(c)))
    w = base.groupBy("ptype").agg(
        cell(_BR_Y1, "vol").alias("v1"),
        cell(_BR_Y2, "vol").alias("v2"),
        (cell(_BR_Y1, "rev").cast("double") / F.lit(10000.0)).alias("r1"),
        (cell(_BR_Y2, "rev").cast("double") / F.lit(10000.0)).alias("r2"),
    )
    d = w.filter(F.col("v1").isNotNull() & F.col("v2").isNotNull()).select(
        "ptype",
        "v1",
        "v2",
        "r1",
        "r2",
        # try_divide: zero year volume (all quantities 0) makes the unit
        # price 0/0 — DuckDB yields NULL, ANSI Spark raises.
        F.try_divide(F.col("r1"), F.col("v1")).alias("p1"),
        F.try_divide(F.col("r2"), F.col("v2")).alias("p2"),
    )
    return d.select(
        "ptype",
        F.round(F.col("r2") - F.col("r1"), 2).alias("delta_rev"),
        F.round((F.col("v2") - F.col("v1")) * F.col("p1"), 2).alias("volume_effect"),
        F.round((F.col("p2") - F.col("p1")) * F.col("v1"), 2).alias("price_effect"),
        F.round(
            (F.col("v2") - F.col("v1")) * (F.col("p2") - F.col("p1")), 2
        ).alias("mix_effect"),
    )
