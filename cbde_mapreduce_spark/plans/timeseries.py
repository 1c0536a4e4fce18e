"""Time-series / monitoring queries over events and orders (SURVEY.md §2.5
window family + §2.10 event-time family, widened to the four shapes every
metrics warehouse runs: resampling, distribution drift, peak concurrency,
rolling correlation).

Scale notes (the 100 TB shapes):

- ``ohlc_bars_events`` and ``rolling_corr_value`` partition their windows by
  a real key (event_type×hour, user) — never a global single-partition sort.
- ``psi_order_value_drift`` is two single-pass conditional aggregations over
  a 10-row bin spine; the fact table is scanned once, bins are map-side
  combinable, and only 10 rows ever reach the final compute.
- ``concurrent_sessions_peak`` is the classic sweep-line: intervals become
  ±1 marks, a per-day running sum finds the peak. The sweep is partitioned
  by day (marks never cross days by construction), so the sort is
  |marks-per-day|, not |table| — the re-expression that keeps the canonical
  interval-overlap algorithm distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cbde_mapreduce_spark.plans.money import cents
from cbde_mapreduce_spark.plans.registry import query
from cbde_mapreduce_spark.sources import load_table


@query(
    "ohlc_bars_events",
    oracle="""
        WITH b AS (SELECT event_type, date_trunc('hour', ts) AS hr, ts,
                          event_id, value
                   FROM events),
        r AS (SELECT *,
                     row_number() OVER (PARTITION BY event_type, hr
                                        ORDER BY ts, event_id) AS ra,
                     count(*)     OVER (PARTITION BY event_type, hr) AS ntot
              FROM b)
        SELECT event_type, hr,
               round(max(CASE WHEN ra = 1    THEN value END), 4) AS open,
               round(max(value), 4)                              AS high,
               round(min(value), 4)                              AS low,
               round(max(CASE WHEN ra = ntot THEN value END), 4) AS close,
               count(*)::bigint                                  AS n_events,
               round(sum(round(value * 100)::bigint) / 100.0, 4)                              AS volume
        FROM r
        GROUP BY event_type, hr
    """,
    category="time-series",
)
def ohlc_bars_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC resampling: hourly open/high/low/close/volume bars per event_type.

    Open/close need the first/last value under event-time order with a
    deterministic tiebreak (ts, event_id). Both are derived from ONE sorted
    window pass: ``ra`` = ascending row_number, and the frameless
    ``count(*) over (partition)`` gives the bar size, so close is simply
    ``ra == ntot`` — no second descending sort. One shuffle on
    (event_type, hour), then a map-side-combinable groupBy on the same key.
    """
    ev = load_table(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        F.date_trunc("hour", "ts").alias("hr"),
        "ts",
        "event_id",
        "value",
    )
    w = Window.partitionBy("event_type", "hr").orderBy("ts", "event_id")
    wall = Window.partitionBy("event_type", "hr")
    r = b.withColumn("ra", F.row_number().over(w)).withColumn(
        "ntot", F.count(F.lit(1)).over(wall)
    )
    return r.groupBy("event_type", "hr").agg(
        F.round(F.max(F.when(F.col("ra") == 1, F.col("value"))), 4).alias("open"),
        F.round(F.max("value"), 4).alias("high"),
        F.round(F.min("value"), 4).alias("low"),
        F.round(
            F.max(F.when(F.col("ra") == F.col("ntot"), F.col("value"))), 4
        ).alias("close"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.round(F.sum(cents("value")) / F.lit(100.0), 4).alias("volume"),
    )


#: PSI bin layout: 10 equal-width bins over [0, 500k) — fixed edges, so the
#: bucketing is reproducible across engines and across runs (quantile-edge
#: PSI would tie the bin definition to one period's sample).
_PSI_BINS = 10
_PSI_WIDTH = 50_000.0
_PSI_SPLIT = "1998-01-01"


@query(
    "psi_order_value_drift",
    oracle=f"""
        WITH binned AS (
            SELECT least(greatest(floor(o_totalprice / {_PSI_WIDTH}), 0),
                         {_PSI_BINS - 1})::int AS bin,
                   (o_orderdate < TIMESTAMP '{_PSI_SPLIT}')::int AS in_a
            FROM orders),
        c AS (SELECT bin,
                     sum(in_a)::bigint     AS a_cnt,
                     sum(1 - in_a)::bigint AS b_cnt
              FROM binned GROUP BY bin),
        spine AS (SELECT unnest(range({_PSI_BINS}))::int AS bin),
        f AS (SELECT spine.bin,
                     coalesce(a_cnt, 0) AS a_cnt,
                     coalesce(b_cnt, 0) AS b_cnt
              FROM spine LEFT JOIN c ON spine.bin = c.bin),
        t AS (SELECT sum(a_cnt) AS na, sum(b_cnt) AS nb FROM f)
        SELECT bin, a_cnt, b_cnt,
               round((a_cnt + 1.0) / (na + {_PSI_BINS}), 6) AS p_a,
               round((b_cnt + 1.0) / (nb + {_PSI_BINS}), 6) AS p_b,
               round(((b_cnt + 1.0) / (nb + {_PSI_BINS})
                      - (a_cnt + 1.0) / (na + {_PSI_BINS}))
                     * ln(((b_cnt + 1.0) / (nb + {_PSI_BINS}))
                          / ((a_cnt + 1.0) / (na + {_PSI_BINS}))), 6)
                 AS psi_term
        FROM f, t
    """,
    category="time-series",
)
def psi_order_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift screen: o_totalprice distribution
    before vs after 1998-01-01 over 10 fixed-width bins, Laplace-smoothed
    (+1 per bin) so empty bins cannot produce log(0).

    One conditional-aggregation scan of orders (both periods counted in the
    same groupBy — no second pass, no join of two filtered scans), a 10-row
    bin spine to pin the output domain, and a broadcast of the 1-row totals.
    The per-bin ``psi_term`` sums to the headline PSI; emitting terms keeps
    the check cell-exact instead of one lump.
    """
    orders = load_table(spark, sf_dir, "orders")
    binned = orders.select(
        F.least(
            F.greatest(F.floor(F.col("o_totalprice") / _PSI_WIDTH), F.lit(0)),
            F.lit(_PSI_BINS - 1),
        )
        .cast("int")
        .alias("bin"),
        (F.col("o_orderdate") < F.lit(_PSI_SPLIT).cast("timestamp_ntz"))
        .cast("int")
        .alias("in_a"),
    )
    c = binned.groupBy("bin").agg(
        F.sum("in_a").cast("bigint").alias("a_cnt"),
        F.sum(1 - F.col("in_a")).cast("bigint").alias("b_cnt"),
    )
    spine = spark.range(_PSI_BINS).select(F.col("id").cast("int").alias("bin"))
    f = (
        spine.join(c, "bin", "left")
        .select(
            "bin",
            F.coalesce("a_cnt", F.lit(0)).alias("a_cnt"),
            F.coalesce("b_cnt", F.lit(0)).alias("b_cnt"),
        )
    )
    totals = f.agg(
        F.sum("a_cnt").alias("na"), F.sum("b_cnt").alias("nb")
    )
    pa = (F.col("a_cnt") + 1.0) / (F.col("na") + _PSI_BINS)
    pb = (F.col("b_cnt") + 1.0) / (F.col("nb") + _PSI_BINS)
    return f.crossJoin(F.broadcast(totals)).select(
        "bin",
        "a_cnt",
        "b_cnt",
        F.round(pa, 6).alias("p_a"),
        F.round(pb, 6).alias("p_b"),
        F.round((pb - pa) * F.log(pb / pa), 6).alias("psi_term"),
    )


@query(
    "concurrent_sessions_peak",
    oracle="""
        WITH iv AS (SELECT user_id, ts::date AS day,
                           min(ts) AS s, max(ts) AS e
                    FROM events GROUP BY user_id, ts::date),
        marks AS (SELECT day, s AS t, 1 AS d FROM iv
                  UNION ALL
                  SELECT day, e AS t, -1 AS d FROM iv),
        sweep AS (SELECT day,
                         sum(d) OVER (PARTITION BY day
                                      ORDER BY t, d DESC) AS live
                  FROM marks)
        SELECT day,
               (SELECT count(*) FROM iv i WHERE i.day = sweep.day)::bigint
                 AS n_sessions,
               max(live)::bigint AS peak_concurrency
        FROM sweep
        GROUP BY day
    """,
    category="time-series",
)
def concurrent_sessions_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent user-visits per day by sweep line over intervals.

    A visit is a user's [min(ts), max(ts)] span within one day (inclusive
    ends). Naive overlap counting is an O(n²) interval self-join; the sweep
    line re-expression is two rows per interval (+1 at start, -1 past end),
    a running sum, and a max — O(n log n), and the sort is PARTITIONED by
    day (intervals cannot cross days), so no global single-partition window.

    Tie discipline: marks order by (t, d DESC) — starts before ends at the
    same instant (inclusive-interval semantics), and the default RANGE
    window frame gives all tied marks the same cumulative value in both
    engines, so the per-day max is deterministic.

    Single-scan shape: both ±1 marks come from ONE interval aggregate by
    exploding a 2-struct array (no self-union, which would scan events once
    per branch), and n_sessions rides the same final groupBy as the peak
    (count the +1 marks) instead of a separate aggregate + join. Executed
    plan: one events scan, one (user,day) exchange, one (day) exchange —
    the groupBy reuses the window's partitioning.
    """
    ev = load_table(spark, sf_dir, "events")
    iv = (
        ev.select("user_id", F.col("ts").cast("date").alias("day"), "ts")
        .groupBy("user_id", "day")
        .agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
    )
    marks = iv.select(
        "day",
        F.explode(
            F.array(
                F.struct(F.col("s").alias("t"), F.lit(1).alias("d")),
                F.struct(F.col("e").alias("t"), F.lit(-1).alias("d")),
            )
        ).alias("m"),
    ).select("day", F.col("m.t").alias("t"), F.col("m.d").alias("d"))
    w = Window.partitionBy("day").orderBy(F.asc("t"), F.desc("d"))
    sweep = marks.withColumn("live", F.sum("d").over(w))
    return sweep.groupBy("day").agg(
        F.sum(F.when(F.col("d") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_sessions"),
        F.max("live").cast("bigint").alias("peak_concurrency"),
    ).select(
        F.col("day").cast("timestamp_ntz").alias("day"),
        "n_sessions",
        "peak_concurrency",
    )


_CORR_FRAME = 10  # trailing rows per correlation window


@query(
    "rolling_corr_value",
    oracle=f"""
        WITH s AS (SELECT user_id, ts, event_id, value,
                          lag(value) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS vp,
                          row_number() OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) AS rn
                   FROM events)
        SELECT user_id, rn,
               round(corr(value, vp) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN {_CORR_FRAME - 1} PRECEDING AND CURRENT ROW
               ), 4) AS corr10
        FROM s
        QUALIFY rn >= {_CORR_FRAME}
    """,
    category="time-series",
)
def rolling_corr_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling autocorrelation: per user, corr(value, lag(value)) over a
    trailing 10-row event-time frame — the lag-1 serial-correlation monitor
    run over metric streams to catch stuck sensors / repeated payloads.

    All three window functions (lag, row_number, framed corr) share ONE
    partitioning and sort (user_id; ts, event_id) — one shuffle, one sort
    per partition. Rows before the frame fills (rn < 10) are dropped;
    inside the frame both engines skip NULL pairs identically, so the first
    emitted frame correlates 9 pairs. Rounded to 4 digits: corr divides by
    two sample stddevs, amplifying ~1e-15 summation noise beyond the 6-digit
    discipline used for plain sums.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(-(_CORR_FRAME - 1), Window.currentRow)
    s = ev.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.lag("value").over(w).alias("vp"),
        F.row_number().over(w).alias("rn"),
    )
    # Composed corr = try_divide(covar_samp, stddev·stddev) over the same
    # frame instead of F.corr: ANSI Spark's corr RAISES on a zero-variance
    # frame (a constant or stuck-sensor run — precisely what this monitor
    # exists to catch) where DuckDB's corr yields NULL (numeric-extremes
    # sweep). The stddevs are conditioned on the PAIR being complete, so
    # NULL handling matches corr's pairwise-deletion semantics exactly.
    both = F.col("value").isNotNull() & F.col("vp").isNotNull()
    composed = F.try_divide(
        F.covar_samp("value", "vp").over(wf),
        F.stddev_samp(F.when(both, F.col("value"))).over(wf)
        * F.stddev_samp(F.when(both, F.col("vp"))).over(wf),
    )
    return (
        s.withColumn("corr10", F.round(composed, 4))
        .filter(F.col("rn") >= _CORR_FRAME)
        .select("user_id", "rn", "corr10")
    )


@query(
    "monthly_revenue_growth",
    oracle="""
        WITH m AS (SELECT date_trunc('month', o_orderdate) AS month,
                          count(*)::bigint AS n_orders,
                          round(sum(round(o_totalprice * 100)::bigint) / 100.0, 2) AS revenue
                   FROM orders GROUP BY 1)
        SELECT month, n_orders, revenue,
               round((revenue - lag(revenue) OVER (ORDER BY month))
                     / lag(revenue) OVER (ORDER BY month), 6) AS mom_growth
        FROM m
    """,
    category="time-series",
)
def monthly_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth — the reporting staple: monthly
    revenue plus its relative change vs the prior month (first month NULL).

    The fact table collapses to ~80 month rows in one combinable groupBy;
    the unpartitioned lag window then runs over the month spine only —
    the same dimension-sized-global-window argument as
    gini_customer_revenue (a window over months is never the scale
    problem; a window over orders would be). Growth divides the
    already-rounded revenues so both engines divide identical inputs.
    """
    orders = load_table(spark, sf_dir, "orders")
    m = (
        orders.groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.round(F.sum(cents("o_totalprice")) / F.lit(100.0), 2).alias("revenue"),
        )
    )
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return m.select(
        "month",
        "n_orders",
        "revenue",
        # try_divide: a zero-revenue prior month is x/0 — DuckDB yields
        # NULL, ANSI Spark raises (numeric-extremes sweep).
        F.round(F.try_divide(F.col("revenue") - prev, prev), 6).alias("mom_growth"),
    )


@query(
    "ks_binned_order_drift",
    oracle=f"""
        WITH binned AS (
            SELECT least(greatest(floor(o_totalprice / {_PSI_WIDTH}), 0),
                         {_PSI_BINS - 1})::int AS bin,
                   (o_orderdate < TIMESTAMP '{_PSI_SPLIT}')::int AS in_a
            FROM orders),
        c AS (SELECT bin,
                     sum(in_a)::bigint     AS a_cnt,
                     sum(1 - in_a)::bigint AS b_cnt
              FROM binned GROUP BY bin),
        spine AS (SELECT unnest(range({_PSI_BINS}))::int AS bin),
        f AS (SELECT spine.bin,
                     coalesce(a_cnt, 0) AS a_cnt,
                     coalesce(b_cnt, 0) AS b_cnt
              FROM spine LEFT JOIN c ON spine.bin = c.bin),
        e AS (SELECT bin,
                     sum(a_cnt) OVER (ORDER BY bin) AS ca,
                     sum(b_cnt) OVER (ORDER BY bin) AS cb,
                     sum(a_cnt) OVER () AS na,
                     sum(b_cnt) OVER () AS nb
              FROM f)
        SELECT max(abs(ca / na::double - cb / nb::double)) AS ks_d,
               max(na)::bigint AS n_a,
               max(nb)::bigint AS n_b
        FROM e
    """,
    category="time-series",
)
def ks_binned_order_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned Kolmogorov-Smirnov drift statistic on the same fixed bins as
    psi_order_value_drift: D = max over bin edges of |ECDF_A − ECDF_B| —
    the location-sensitive companion to PSI (PSI weights all bins; KS
    catches a shift concentrated at one edge).

    Exact KS needs a global sort of the value column; the binned variant
    is exact FOR THE GRID and scale-sane — the fact table collapses to 10
    bin counts, the ECDFs are window cumsums over those 10 rows, and the
    statistic is their max gap. Counts are exact integers, so the ECDFs
    divide identically in both engines.
    """
    orders = load_table(spark, sf_dir, "orders")
    binned = orders.select(
        F.least(
            F.greatest(F.floor(F.col("o_totalprice") / _PSI_WIDTH), F.lit(0)),
            F.lit(_PSI_BINS - 1),
        )
        .cast("int")
        .alias("bin"),
        (F.col("o_orderdate") < F.lit(_PSI_SPLIT).cast("timestamp_ntz"))
        .cast("int")
        .alias("in_a"),
    )
    c = binned.groupBy("bin").agg(
        F.sum("in_a").cast("bigint").alias("a_cnt"),
        F.sum(1 - F.col("in_a")).cast("bigint").alias("b_cnt"),
    )
    spine = spark.range(_PSI_BINS).select(F.col("id").cast("int").alias("bin"))
    f = spine.join(c, "bin", "left").select(
        "bin",
        F.coalesce("a_cnt", F.lit(0)).alias("a_cnt"),
        F.coalesce("b_cnt", F.lit(0)).alias("b_cnt"),
    )
    wc = Window.orderBy("bin")
    wall = Window.partitionBy()
    e = f.select(
        "bin",
        F.sum("a_cnt").over(wc).alias("ca"),
        F.sum("b_cnt").over(wc).alias("cb"),
        F.sum("a_cnt").over(wall).alias("na"),
        F.sum("b_cnt").over(wall).alias("nb"),
    )
    return e.agg(
        # try_divide: an empty split (na or nb = 0) yields NULL ECDFs and a
        # NULL statistic, matching DuckDB's NULL-on-zero division
        F.max(
            F.abs(
                F.try_divide(F.col("ca"), F.col("na").cast("double"))
                - F.try_divide(F.col("cb"), F.col("nb").cast("double"))
            )
        ).alias("ks_d"),
        F.max("na").cast("bigint").alias("n_a"),
        F.max("nb").cast("bigint").alias("n_b"),
    )


_SEAS_ORACLE = """
    WITH daily AS (
        SELECT date_trunc('day', ts) AS day,
               sum(round(value * 100)::bigint) / 100.0 AS revenue
        FROM events GROUP BY 1),
    tr AS (
        SELECT day, revenue,
               avg(revenue) OVER (ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS trend,
               count(*) OVER (ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS wn
        FROM daily),
    dt AS (SELECT day, revenue, trend, revenue - trend AS detr,
                  isodow(day) - 1 AS wd
           FROM tr WHERE wn = 7),
    seas AS (SELECT wd, avg(detr) AS seasonal FROM dt GROUP BY wd)
    SELECT dt.day::timestamp AS day,
           round(dt.revenue, 2) AS revenue,
           round(dt.trend, 4) AS trend,
           round(seas.seasonal, 4) AS seasonal,
           round(dt.detr - seas.seasonal, 4) AS residual
    FROM dt JOIN seas USING (wd)
"""


@query("seasonal_decompose_daily", oracle=_SEAS_ORACLE, category="time-series")
def seasonal_decompose_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of daily event revenue:
    centered 7-day moving-average trend (full windows only), weekday
    seasonal component as the mean detrended value per weekday, residual
    as the remainder — the moving-average step of STL, model-free.

    Scale shape: one combinable groupBy reduces events to the day-domain
    series; the trend window, weekday seasonal aggregate, and the final
    join all run over calendar-bounded relations (≤ days × 1 rows), so
    the decomposition costs one fact-table scan regardless of event
    volume. Weekday numbering is the cross-engine trap: Spark weekday()
    is Monday=0, DuckDB dayofweek is Sunday=0 — the oracle uses
    isodow-1 to agree.
    """
    events = load_table(spark, sf_dir, "events")
    # day-domain series from EXACT integer cents (money.py); downstream
    # trend/seasonal arithmetic is deterministic given exact inputs
    daily = events.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        (F.sum(cents("value")) / F.lit(100.0)).alias("revenue")
    )
    wtr = Window.orderBy("day").rowsBetween(-3, 3)  # day-domain series
    tr = daily.select(
        "day",
        "revenue",
        F.avg("revenue").over(wtr).alias("trend"),
        F.count(F.lit(1)).over(wtr).alias("wn"),
    )
    dt = tr.filter(F.col("wn") == 7).select(
        "day",
        "revenue",
        "trend",
        (F.col("revenue") - F.col("trend")).alias("detr"),
        F.weekday("day").alias("wd"),
    )
    seas = dt.groupBy("wd").agg(F.avg("detr").alias("seasonal"))
    return (
        dt.join(F.broadcast(seas), "wd")
        .select(
            F.col("day").cast("timestamp_ntz").alias("day"),
            F.round("revenue", 2).alias("revenue"),
            F.round("trend", 4).alias("trend"),
            F.round("seasonal", 4).alias("seasonal"),
            F.round(F.col("detr") - F.col("seasonal"), 4).alias("residual"),
        )
    )


_TS_ORACLE = """
    WITH daily AS (
        SELECT date_trunc('day', ts) AS day,
               sum(round(value * 100)::bigint) / 100.0 AS y
        FROM events GROUP BY 1),
    xy AS (SELECT date_diff('day', (SELECT min(day) FROM daily), day) AS x, y
           FROM daily),
    slopes AS (SELECT (b.y - a.y) / (b.x - a.x) AS s
               FROM xy a JOIN xy b ON a.x < b.x),
    m AS (SELECT quantile_cont(s, 0.5) AS slope FROM slopes),
    icepts AS (SELECT xy.y - m.slope * xy.x AS b0 FROM xy, m)
    SELECT round(m.slope, 4) AS slope,
           round(quantile_cont(b0, 0.5), 4) AS intercept,
           (SELECT count(*) FROM slopes)::bigint AS n_pairs
    FROM icepts, m
    GROUP BY m.slope
"""


@query("theil_sen_trend_daily", oracle=_TS_ORACLE, category="time-series")
def theil_sen_trend_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of daily event revenue: the median slope over
    all day-pairs, intercept as the median of per-point offsets — the
    outlier-immune companion to the OLS fit (a single corrupted day moves
    OLS; it cannot move a pairwise median until half the days break).

    Scale shape: the fact table reduces to the day-domain series in one
    combinable pass; the O(days²) pair join, both medians, and the final
    cross joins run over calendar-bounded relations (here 30 rows → 435
    pairs). For multi-year spans the pair blow-up stays trivial (10 years
    → ~6.6M pairs, one task); only an UNAGGREGATED Theil-Sen over raw
    points would need the repeated-median or sampling variants.
    """
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        (F.sum(cents("value")) / F.lit(100.0)).alias("y")
    )
    mind = daily.agg(F.min("day").alias("d0"))
    xy = daily.crossJoin(F.broadcast(mind)).select(
        F.datediff("day", "d0").alias("x"), "y"
    )
    a = xy.select(F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = xy.select(F.col("x").alias("xb"), F.col("y").alias("yb"))
    slopes = a.join(b, F.col("xa") < F.col("xb")).select(
        ((F.col("yb") - F.col("ya")) / (F.col("xb") - F.col("xa"))).alias("s")
    )
    m = slopes.agg(
        F.expr("percentile(s, 0.5)").alias("slope"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
    )
    icepts = xy.crossJoin(F.broadcast(m)).select(
        "slope", "n_pairs", (F.col("y") - F.col("slope") * F.col("x")).alias("b0")
    )
    return icepts.groupBy("slope", "n_pairs").agg(
        F.expr("percentile(b0, 0.5)").alias("b0m")
    ).select(
        F.round("slope", 4).alias("slope"),
        F.round("b0m", 4).alias("intercept"),
        "n_pairs",
    )


_ENV_ORACLE = """
    SELECT date_trunc('day', ts)::timestamp AS day,
           count(*)::bigint AS n,
           round(quantile_cont(value, 0.1), 4) AS p10,
           round(quantile_cont(value, 0.5), 4) AS p50,
           round(quantile_cont(value, 0.9), 4) AS p90
    FROM events GROUP BY 1
"""


@query("daily_value_envelope", oracle=_ENV_ORACLE, category="time-series")
def daily_value_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily P10/P50/P90 envelope of event values — the percentile band
    every monitoring dashboard draws around its median line.

    All three percentiles ride ONE combinable groupBy on the day key
    (Spark's exact percentile aggregate buffers per group — fine while
    groups are day-sized; the documented 100 TB swap is
    approx_percentile's t-digest, same single-shuffle shape). Both
    engines interpolate type-7 quantiles, rounded to 4 dp.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.expr("percentile(value, 0.1)"), 4).alias("p10"),
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
        )
        .select(F.col("day").cast("timestamp_ntz").alias("day"), "n", "p10", "p50", "p90")
    )


_MSI_ORACLE = """
    WITH m AS (SELECT year(o_orderdate) AS y, month(o_orderdate) AS mo,
                      sum(round(o_totalprice * 100)::bigint) AS rev_c
               FROM orders GROUP BY 1, 2),
    mm AS (SELECT mo, sum(rev_c) AS sum_c, count(*)::bigint AS n_years
           FROM m GROUP BY mo),
    g AS (SELECT sum(rev_c) AS g_sum_c, count(*)::bigint AS g_n FROM m)
    SELECT mm.mo AS month, mm.n_years,
           ((2 * mm.sum_c + mm.n_years) // (2 * mm.n_years)) / 100.0
               AS avg_monthly_rev,
           round((mm.sum_c * g.g_n)::double
                 / nullif(mm.n_years * g.g_sum_c, 0), 6) AS seasonal_index
    FROM mm, g
"""


@query("monthly_seasonality_index", oracle=_MSI_ORACLE, category="time-series")
def monthly_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical month-of-year seasonality index over the 6-year order
    history: each calendar month's average revenue (across years) divided
    by the overall monthly average — index > 1 marks the high season,
    and the vector of 12 indices is the multiplicative seasonal profile
    a demand forecast divides out.

    Two combinable aggregations (year-month revenue, then month-of-year
    means) and a broadcast global mean — the calendar-bounded pattern
    throughout: after the first groupBy no relation exceeds 12×|years|
    rows.
    """
    # Exact integer-cents arithmetic end to end: round(avg(double), 2) put
    # a month average exactly on a .xx5 shortest-repr boundary at one SF,
    # where Spark (HALF_UP on the shortest decimal repr) and DuckDB (round
    # of the binary value) disagree by a cent. Money sums in cents are
    # exact bigints; the average applies explicit half-up integer division
    # ((2a + n) div (2n), non-negative revenue) on BOTH engines, and the
    # seasonal ratio is ONE double division of two exact integer products,
    # so both engines see bit-identical operands.
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("mo")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("rev_c")
    )
    mm = m.groupBy("mo").agg(
        F.sum("rev_c").alias("sum_c"),
        F.count(F.lit(1)).cast("bigint").alias("n_years"),
    )
    g = m.agg(
        F.sum("rev_c").alias("g_sum_c"), F.count(F.lit(1)).cast("bigint").alias("g_n")
    )
    return mm.crossJoin(F.broadcast(g)).select(
        F.col("mo").alias("month"),
        "n_years",
        (
            F.expr("(2 * sum_c + n_years) div (2 * n_years)") / F.lit(100.0)
        ).alias("avg_monthly_rev"),
        # try_divide: an all-zero-revenue spine makes the denominator 0 —
        # DuckDB yields NULL, ANSI Spark raises (numeric-extremes sweep).
        F.round(
            F.try_divide(
                (F.col("sum_c") * F.col("g_n")).cast("double"),
                F.col("n_years") * F.col("g_sum_c"),
            ),
            6,
        ).alias("seasonal_index"),
    )
