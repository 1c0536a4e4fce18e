"""Product/event analytics over the events table (SURVEY.md §2.10 batch
event-time family, widened): funnels, cohort retention, sliding distinct
counts — the three queries every clickstream warehouse runs daily.

All three are chained groupBy/join plans shuffled on user_id or day —
map-side combinable, no windows over a global sort, no Python. The
events side is always aggregated FIRST (per user-day / per user-week
distinct) so the join inputs are bounded by |users|·|days|, not |events|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cbde_mapreduce_spark.plans.money import cents
from cbde_mapreduce_spark.plans.registry import query
from cbde_mapreduce_spark.sources import load_table


@query(
    "funnel_user_day",
    oracle="""
        WITH d AS (SELECT user_id, ts::date AS day, event_type, ts FROM events),
        t1 AS (SELECT user_id, day, min(ts) AS t1
               FROM d WHERE event_type = 'view' GROUP BY 1, 2),
        t2 AS (SELECT d.user_id, d.day, min(d.ts) AS t2
               FROM d JOIN t1 USING (user_id, day)
               WHERE d.event_type = 'click' AND d.ts > t1.t1 GROUP BY 1, 2),
        t3 AS (SELECT d.user_id, d.day, min(d.ts) AS t3
               FROM d JOIN t2 USING (user_id, day)
               WHERE d.event_type = 'purchase' AND d.ts > t2.t2 GROUP BY 1, 2)
        SELECT 1 AS stage, (SELECT count(*) FROM t1)::bigint AS n_units
        UNION ALL
        SELECT 2, (SELECT count(*) FROM t2)::bigint
        UNION ALL
        SELECT 3, (SELECT count(*) FROM t3)::bigint
    """,
    category="event-analytics",
)
def funnel_user_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered three-step funnel (view → click → purchase) per user-day:
    a unit advances to stage k+1 only via an event strictly AFTER its
    stage-k timestamp on the same day.

    Stage k+1 depends on stage k's min-timestamp, so the plan is a chain of
    (filter → groupBy → join) hops, every one shuffled on the same
    (user_id, day) key — AQE/Catalyst reuses the partitioning instead of
    re-shuffling, and each stage's input shrinks (1617 → 345 → 56 units at
    sf0.01). The alternative single-pass sessionized scan needs a per-key
    sort; this join chain is the shuffle-light MR expression.
    """
    ev = load_table(spark, sf_dir, "events")
    d = ev.select(
        "user_id", F.col("ts").cast("date").alias("day"), "event_type", "ts"
    )
    keys = ["user_id", "day"]
    t1 = (
        d.filter(F.col("event_type") == "view")
        .groupBy(*keys)
        .agg(F.min("ts").alias("t1"))
    )
    t2 = (
        d.filter(F.col("event_type") == "click")
        .join(t1, keys)
        .filter(F.col("ts") > F.col("t1"))
        .groupBy(*keys)
        .agg(F.min("ts").alias("t2"))
    )
    t3 = (
        d.filter(F.col("event_type") == "purchase")
        .join(t2, keys)
        .filter(F.col("ts") > F.col("t2"))
        .groupBy(*keys)
        .agg(F.min("ts").alias("t3"))
    )

    def stage(df: DataFrame, k: int) -> DataFrame:
        return df.agg(
            F.lit(k).alias("stage"),
            F.count(F.lit(1)).cast("bigint").alias("n_units"),
        )

    return stage(t1, 1).unionAll(stage(t2, 2)).unionAll(stage(t3, 3))


@query(
    "cohort_retention_purchases",
    oracle="""
        WITH p AS (SELECT DISTINCT user_id, date_trunc('week', ts)::date AS w
                   FROM events WHERE event_type = 'purchase'),
        fp AS (SELECT user_id, min(w) AS cw FROM p GROUP BY 1)
        SELECT fp.cw AS cohort_week,
               (datediff('day', fp.cw, p.w) // 7)::int AS week_offset,
               count(*)::bigint AS n_active
        FROM p JOIN fp USING (user_id)
        GROUP BY 1, 2
    """,
    category="event-analytics",
)
def cohort_retention_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-purchase week, counted
    in every later week they purchased again.

    (user, week) is distinct-ed BEFORE the cohort join, so join input is
    |users|·|weeks|, never |events|; both sides shuffle on user_id once.
    Week offsets are day-arithmetic (both engines' weeks start Monday via
    date_trunc), floor-divided — no weekofyear, which is locale/ISO-trapped.
    """
    ev = load_table(spark, sf_dir, "events")
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id", F.date_trunc("week", "ts").cast("date").alias("w")
        )
        .distinct()
    )
    fp = p.groupBy("user_id").agg(F.min("w").alias("cw"))
    return (
        p.join(fp, "user_id")
        .groupBy(
            F.col("cw").cast("timestamp_ntz").alias("cohort_week"),
            F.floor(F.datediff("w", "cw") / 7).cast("int").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
    )


@query(
    "sliding_distinct_users",
    oracle="""
        WITH ud AS (SELECT DISTINCT user_id, ts::date AS day FROM events),
        days AS (SELECT DISTINCT day FROM ud)
        SELECT d.day AS win_end, count(DISTINCT u.user_id)::bigint AS n_users_7d
        FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
        GROUP BY 1
    """,
    category="event-analytics",
)
def sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day (the DAU/WAU family) —
    EXACT distinct over a sliding window, which no window function gives.

    Day-expansion rewrite: each distinct (user, day) pair is exploded to the
    <= 7 window-end days it can serve, then a plain two-phase countDistinct
    per window-end. Shuffle volume is 7·|user-days| tiny pairs — independent
    of raw event count — where the naive range join is |days|·|user-days|
    comparisons. The DuckDB oracle runs that naive range join (its IEJoin),
    so the differential crosses two genuinely different algorithms.
    """
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    bounds = ud.agg(F.max("day").alias("max_day"))
    exp = ud.select(
        "user_id",
        F.explode(
            F.sequence("day", F.date_add("day", 6), F.expr("INTERVAL 1 DAY"))
        ).alias("win_end"),
    )
    return (
        exp.join(F.broadcast(bounds), exp.win_end <= F.col("max_day"))
        .groupBy(F.col("win_end").cast("timestamp_ntz").alias("win_end"))
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_users_7d"))
    )


@query(
    "event_transition_matrix",
    oracle="""
        WITH s AS (SELECT user_id, event_type,
                          lag(event_type) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id) AS prev
                   FROM events),
        c AS (SELECT prev, event_type AS next, count(*)::bigint AS n
              FROM s WHERE prev IS NOT NULL GROUP BY 1, 2)
        SELECT prev, next, n,
               round(n * 1.0 / sum(n) OVER (PARTITION BY prev), 6) AS p
        FROM c
    """,
    category="event-analytics",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event stream:
    counts and row-normalized probabilities of (previous type → next type).

    The lag() pass is the MR secondary-sort job (one shuffle on user_id);
    the 5×5 count matrix then row-normalizes with a window over a
    25-row aggregate — trivially small at any corpus scale, since the
    matrix is |event types|², independent of event count.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev"),
    )
    c = (
        s.filter(F.col("prev").isNotNull())
        .groupBy("prev", F.col("event_type").alias("next"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    wp = Window.partitionBy("prev")
    return c.select(
        "prev",
        "next",
        "n",
        F.round(F.col("n") / F.sum("n").over(wp), 6).alias("p"),
    )


@query(
    "assoc_rules_event_pairs",
    oracle="""
        WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        n AS (SELECT count(DISTINCT user_id) AS n_users FROM events),
        item AS (SELECT event_type, count(*) AS c FROM ut GROUP BY 1),
        pair AS (SELECT a.event_type AS ante, b.event_type AS cons,
                        count(*) AS cp
                 FROM ut a JOIN ut b ON a.user_id = b.user_id
                                    AND a.event_type <> b.event_type
                 GROUP BY 1, 2)
        SELECT ante, cons,
               round(cp::double / (SELECT n_users FROM n), 6) AS support,
               round(cp::double / ia.c, 6) AS confidence,
               round(cp::double * (SELECT n_users FROM n)
                     / (ia.c::double * ic.c), 6) AS lift
        FROM pair
        JOIN item ia ON pair.ante = ia.event_type
        JOIN item ic ON pair.cons = ic.event_type
    """,
    category="event-analytics",
)
def assoc_rules_event_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over per-user event baskets: support, confidence,
    and lift for every ordered (antecedent → consequent) event-type pair —
    the frequent-itemset/market-basket core, the original chained-MapReduce
    workload.

    Scale shape: the basket relation collapses to DISTINCT (user, item)
    FIRST (combinable, one shuffle), so the pair self-join fans out per
    user by basket size — bounded by the item vocabulary, never by event
    volume. Item counts and the user total are dimension-sized broadcasts
    into the final enrichment. Ratios are rounded AFTER all arithmetic.
    """
    events = load_table(spark, sf_dir, "events")
    ut = events.select("user_id", "event_type").distinct()
    n_users = events.select(
        F.countDistinct("user_id").alias("n_users")
    )
    item = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("c"))
    a = ut.select("user_id", F.col("event_type").alias("ante"))
    b = ut.select("user_id", F.col("event_type").alias("cons"))
    pair = (
        a.join(b, "user_id")
        .filter(F.col("ante") != F.col("cons"))
        .groupBy("ante", "cons")
        .agg(F.count(F.lit(1)).alias("cp"))
    )
    ia = item.select(F.col("event_type").alias("ante"), F.col("c").alias("ca"))
    ic = item.select(F.col("event_type").alias("cons"), F.col("c").alias("cc"))
    return (
        pair.join(F.broadcast(ia), "ante")
        .join(F.broadcast(ic), "cons")
        .crossJoin(F.broadcast(n_users))
        .select(
            "ante",
            "cons",
            F.round(F.col("cp") / F.col("n_users"), 6).alias("support"),
            F.round(F.col("cp") / F.col("ca"), 6).alias("confidence"),
            F.round(
                F.col("cp") * F.col("n_users")
                / (F.col("ca").cast("double") * F.col("cc")),
                6,
            ).alias("lift"),
        )
    )


@query(
    "cumulative_distinct_users",
    oracle="""
        SELECT a.day::timestamp AS day, count(DISTINCT e.user_id)::bigint AS cum_users
        FROM (SELECT DISTINCT ts::date AS day FROM events) a
        JOIN events e ON e.ts::date <= a.day
        GROUP BY 1
    """,
    category="event-analytics",
)
def cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per day (the growth-curve metric) via the
    FIRST-SEEN transform: distinct is not combinable across days, but
    'new on day d' is — min(first day) per user, count new users per day,
    running-sum over the day-sized relation. Work is O(|users| + |days|)
    after one shuffle, versus the oracle's genuinely different naive
    algorithm (day × preceding-events range join, O(days·events)) — a real
    algorithmic differential, not the same plan twice.

    The running sum's window runs over ~30 day rows — day-sized, so the
    single-partition window is correct here (same judgment call as
    top50_parts_ranked, opposite of global_rank_prefix_orders).
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    first_seen = (
        # NULL user_id is not a user: count(DISTINCT user_id) excludes
        # NULLs per SQL, but groupBy would mint a NULL group and count it
        # (NULL-FK value-parity sweep)
        ev.where(F.col("user_id").isNotNull())
        .select("user_id", F.col("ts").cast("date").alias("day"))
        .groupBy("user_id")
        .agg(F.min("day").alias("first_day"))
    )
    new_per_day = first_seen.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    days = ev.select(F.col("ts").cast("date").alias("day")).distinct()
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        days.join(new_per_day, "day", "left")
        .select("day", F.coalesce("new_users", F.lit(0)).alias("nu"))
        .select(
            F.col("day").cast("timestamp_ntz").alias("day"),
            F.sum("nu").over(w).cast("bigint").alias("cum_users"),
        )
    )


@query(
    "cusum_drift_users",
    oracle="""
        WITH s AS (
            SELECT user_id, ts, event_id,
                   round(value * 100)::bigint AS c,
                   sum(round(value * 100)::bigint)
                     OVER (PARTITION BY user_id) AS sc,
                   sum((round(value * 100)::bigint
                        * round(value * 100)::bigint)::decimal(38,0))
                     OVER (PARTITION BY user_id) AS sc2,
                   count(*) OVER (PARTITION BY user_id) AS n
            FROM events),
        c AS (
            SELECT user_id, n,
                   sqrt(greatest(sc2::double - sc::double * sc::double / n,
                                 0) / (n - 1)) / 100.0 AS sd,
                   (sum(c) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING)::double
                    - row_number() OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)
                      * (sc::double / n)) / 100.0 AS cusum
            FROM s WHERE n > 1)
        SELECT user_id,
               round(max(abs(cusum)), 4) AS max_abs_cusum,
               (max(abs(cusum)) > any_value(sd) * sqrt(any_value(n)))
                   AS drifted
        FROM c
        GROUP BY user_id
    """,
    category="event-analytics",
)
def cusum_drift_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM drift screen per user: running sum of deviations from the
    user's own mean, flagged when its peak exceeds σ√n — the classic
    sequential change detector (a drifting metric accumulates signed
    deviation; a stable one mean-reverts). The per-entity QC pass of a
    telemetry pipeline.

    Three windows, ONE partitioning (user_id): the global per-user stats
    ride the same exchange as the ordered cumsum — Spark reuses the
    partitioning across frames, so the whole screen is a single shuffle.
    Rounded after the max; the boolean compares unrounded on both engines
    (identical arithmetic, exact inputs; the nearest user sits ~1e-3 from
    the threshold, nine orders above float noise). Threshold σ√n is
    calibrated to DISCRIMINATE on this driftless synthetic corpus
    (29/150 users flagged — the natural max-|CUSUM| spread), so a wrong
    comparison visibly shifts the flag set; production drift screens use
    3-5σ√n.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    wp = Window.partitionBy("user_id")
    wo = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wr = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # exact integer cents (money.py): the running cusum unrolls to
    # csum_k - k*mean, both exact-integer-derived; sd comes from exact
    # moments (the running float sum and the stddev co-moments were both
    # in the scheduler-order flake class). greatest(...,0): zero-variance
    # cancellation may land an ulp below 0 in double.
    cc = F.round(F.col("value") * 100).cast("bigint")
    s = ev.select(
        "user_id",
        "ts",
        "event_id",
        cc.alias("c"),
        F.sum(cc).over(wp).alias("sc"),
        F.sum((cc * cc).cast("decimal(38,0)")).over(wp).alias("sc2"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    dsc = F.col("sc").cast("double")
    c = s.filter(F.col("n") > 1).select(
        "user_id",
        "n",
        (
            F.sqrt(
                F.greatest(
                    F.col("sc2").cast("double") - dsc * dsc / F.col("n"),
                    F.lit(0.0),
                )
                / (F.col("n") - 1)
            )
            / F.lit(100.0)
        ).alias("sd"),
        (
            (
                F.sum("c").over(wo).cast("double")
                - F.row_number().over(wr) * (dsc / F.col("n"))
            )
            / F.lit(100.0)
        ).alias("cusum"),
    )
    return (
        c.groupBy("user_id")
        .agg(
            F.round(F.max(F.abs("cusum")), 4).alias("max_abs_cusum"),
            (
                F.max(F.abs("cusum"))
                > F.any_value("sd") * F.sqrt(F.any_value("n"))
            ).alias("drifted"),
        )
    )


TRIGRAM_TOP = 20


@query(
    "event_trigram_paths",
    oracle=f"""
        WITH s AS (
            SELECT user_id, event_type AS e1,
                   lead(event_type, 1) OVER w AS e2,
                   lead(event_type, 2) OVER w AS e3
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT e1 || '>' || e2 || '>' || e3 AS path,
               count(*)::bigint AS n
        FROM s WHERE e3 IS NOT NULL
        GROUP BY 1
        ORDER BY n DESC, path
        LIMIT {TRIGRAM_TOP}
    """,
    category="event-analytics",
)
def event_trigram_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 three-step behavior paths (order-2 sequence mining): the
    successor pair of every event under per-user event-time order, counted
    globally. The order-1 version is event_transition_matrix; order-2 is
    where funnels that the first-order chain can't distinguish (a→b→a vs
    a→b→c) become visible.

    One shuffle on user_id for both leads (shared window sort), then a
    map-side-combinable count on the path key and a TakeOrdered top-20 with
    a (count, path) total order — never a global sort of all paths.
    """
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    return (
        s.select(
            F.concat_ws(">", "e1", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(TRIGRAM_TOP)
    )


@query(
    "funnel_ttc_percentiles",
    oracle="""
        WITH d AS (SELECT user_id, ts::date AS day, event_type,
                          epoch_ns(ts) AS tns
                   FROM events),
        t1 AS (SELECT user_id, day, min(tns) AS t1
               FROM d WHERE event_type = 'view' GROUP BY 1, 2),
        t3 AS (SELECT d.user_id, d.day, min(d.tns) AS t3
               FROM d JOIN t1 USING (user_id, day)
               WHERE d.event_type = 'purchase' AND d.tns > t1.t1
               GROUP BY 1, 2),
        c AS (SELECT t3.day,
                     (t3.t3 - t1.t1) / 1e9 AS ttc_sec
              FROM t3 JOIN t1 USING (user_id, day))
        SELECT day,
               count(*)::bigint AS n_conversions,
               round(quantile_cont(ttc_sec, 0.5), 2) AS median_ttc_sec,
               round(quantile_cont(ttc_sec, 0.9), 2) AS p90_ttc_sec
        FROM c
        GROUP BY day
    """,
    category="event-analytics",
)
def funnel_ttc_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: per day, median and p90 seconds from a
    user's first view to their first subsequent purchase — the latency
    companion to funnel_user_day's stage counts (funnels say how many
    convert; this says how long conversion takes).

    Same (user_id, day)-keyed join chain as the funnel, with timestamps
    carried as integer event-time nanoseconds (ts_ns — no timezone or
    float-epoch drift; both engines divide the same exact integers).
    Percentiles are exact interpolated over the per-day conversion sets.
    """
    ev = load_table(spark, sf_dir, "events")
    d = ev.select(
        "user_id",
        F.col("ts").cast("date").alias("day"),
        "event_type",
        F.col("ts_ns").alias("tns"),
    )
    keys = ["user_id", "day"]
    t1 = (
        d.filter(F.col("event_type") == "view")
        .groupBy(*keys)
        .agg(F.min("tns").alias("t1"))
    )
    t3 = (
        d.filter(F.col("event_type") == "purchase")
        .join(t1, keys)
        .filter(F.col("tns") > F.col("t1"))
        .groupBy(*keys)
        .agg(F.min("tns").alias("t3"))
    )
    c = t3.join(t1, keys).select(
        "day", ((F.col("t3") - F.col("t1")) / 1e9).alias("ttc_sec")
    )
    return (
        c.groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_conversions"),
            F.round(F.expr("percentile(ttc_sec, 0.5)"), 2).alias("median_ttc_sec"),
            F.round(F.expr("percentile(ttc_sec, 0.9)"), 2).alias("p90_ttc_sec"),
        )
        .select(
            F.col("day").cast("timestamp_ntz").alias("day"),
            "n_conversions",
            "median_ttc_sec",
            "p90_ttc_sec",
        )
    )


CEP_PATTERN = "v[^e]*c[^e]*p"  # view→click→purchase with no error between


@query(
    "cep_pattern_matches",
    oracle=f"""
        WITH seq AS (
            SELECT user_id, ts::date AS day,
                   string_agg(left(event_type, 1), '' ORDER BY ts, event_id)
                     AS s
            FROM events GROUP BY user_id, ts::date
        )
        SELECT day,
               count(*)::bigint AS n_units,
               sum(CASE WHEN regexp_matches(s, '{CEP_PATTERN}')
                        THEN 1 ELSE 0 END)::bigint AS n_matching,
               sum(len(regexp_extract_all(s, '{CEP_PATTERN}')))::bigint
                 AS total_matches
        FROM seq GROUP BY day
    """,
    category="event-analytics",
)
def cep_pattern_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-event-processing pattern counts: per user-day, the ordered
    event-initial string (view→v, click→c, …) is matched against
    ``v[^e]*c[^e]*p`` — a conversion with NO error event in between — the
    MATCH_RECOGNIZE / Flink-CEP representative re-expressed as ordered
    string aggregation + regex, which distributes as one groupBy.

    The per-unit sequence string is bounded by a user-day's events (≤
    dozens), so the collected string is session-sized, never corpus-sized;
    both engines run the same greedy non-overlapping scan so match counts
    agree exactly. Output per day: units, units matching at least once,
    total non-overlapping matches.
    """
    ev = load_table(spark, sf_dir, "events")
    seq = (
        ev.select(
            "user_id",
            F.col("ts").cast("date").alias("day"),
            F.expr("left(event_type, 1)").alias("i"),
            "ts",
            "event_id",
        )
        .groupBy("user_id", "day")
        .agg(
            F.expr(
                "listagg(i, '') WITHIN GROUP (ORDER BY ts, event_id)"
            ).alias("s")
        )
    )
    matches = F.size(F.expr(f"regexp_extract_all(s, '{CEP_PATTERN}', 0)"))
    return (
        seq.groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_units"),
            F.sum(
                F.when(F.col("s").rlike(CEP_PATTERN), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_matching"),
            F.sum(matches).cast("bigint").alias("total_matches"),
        )
        .select(
            F.col("day").cast("timestamp_ntz").alias("day"),
            "n_units",
            "n_matching",
            "total_matches",
        )
    )


_ATTR_LOOKBACK_DAYS = 3

_ATTR_ORACLE = f"""
    WITH ev AS (
        SELECT user_id, ts, event_id, event_type, value,
               CASE WHEN event_type = 'click'
                    THEN json_extract(props, '$.k')::bigint END AS click_k
        FROM events),
    carry AS (
        SELECT user_id, ts, event_type, value,
               max(CASE WHEN event_type = 'click'
                        THEN {{'cts': ts, 'ceid': event_id, 'ck': click_k}} END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS lc
        FROM ev),
    attr AS (
        SELECT CASE WHEN lc IS NOT NULL
                     AND lc.cts >= ts - INTERVAL {_ATTR_LOOKBACK_DAYS} DAY
                    THEN 'ch' || (lc.ck % 4)::varchar
                    ELSE 'organic' END AS channel,
               value
        FROM carry WHERE event_type = 'purchase')
    SELECT channel,
           count(*)::bigint AS n_purchases,
           round(sum(round(value * 100)::bigint) / 100.0, 2) AS revenue
    FROM attr GROUP BY channel
"""


@query("attribution_last_touch", oracle=_ATTR_ORACLE, category="event-analytics")
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: every purchase is credited to the
    user's most recent click within a 3-day lookback (channel = click's
    props.k mod 4), else to 'organic'; revenue and counts roll up per
    channel.

    The as-of matching is the carry-forward union shape, not a pair join:
    one shuffle partitions all events by user_id, and a running max over
    struct(ts, k) — ordered by the window's sort key first — carries the
    latest click down to each purchase row in a single pass. That is the
    same one-shuffle plan as sessionization, immune to the per-user event
    blow-up a purchases×clicks join would produce on heavy users. The
    lookback test then runs rowwise, and the final rollup is a combinable
    aggregation over ≤5 channel keys.
    """
    events = load_table(spark, sf_dir, "events")
    click_k = F.when(
        F.col("event_type") == "click",
        F.get_json_object("props", "$.k").cast("bigint"),
    )
    w = (
        # (ts, event_id) tiebreak: peers at identical timestamps would
        # otherwise be framed nondeterministically under a ROWS frame, and
        # the streaming twin (run_stateful_attribution) sorts by
        # (ts_us, event_id) — the two kernels must agree on ties. The
        # carried struct also embeds event_id (cts, ceid, ck) so that two
        # clicks at an identical ts resolve by event order, not channel key.
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carry = events.select(
        "user_id",
        "ts",
        "event_type",
        "value",
        F.max(
            F.when(
                F.col("event_type") == "click",
                F.struct(
                    F.col("ts").alias("cts"),
                    F.col("event_id").alias("ceid"),
                    click_k.alias("ck"),
                ),
            )
        )
        .over(w)
        .alias("lc"),
    )
    attributed = carry.filter(F.col("event_type") == "purchase").select(
        F.when(
            F.col("lc").isNotNull()
            & (
                F.col("lc.cts")
                >= F.col("ts") - F.expr(f"INTERVAL {_ATTR_LOOKBACK_DAYS} DAYS")
            ),
            F.concat(F.lit("ch"), (F.col("lc.ck") % 4).cast("string")),
        )
        .otherwise("organic")
        .alias("channel"),
        "value",
    )
    return attributed.groupBy("channel").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
        F.round(F.sum(cents("value")) / F.lit(100.0), 2).alias("revenue"),
    )


_BURST_MIN_GAPS = 20

_BURST_ORACLE = f"""
    WITH g AS (
        SELECT user_id,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                                      ORDER BY ts, event_id)
                 AS gap
        FROM events),
    s AS (SELECT user_id,
                 count(gap)::bigint AS n_gaps,
                 sum(gap)::double / count(gap) / 1e6 AS mu,
                 sqrt(greatest(count(gap)::double
                                 * sum(gap::decimal(19,0) * gap)::double
                               - sum(gap)::double * sum(gap)::double, 0)
                      / (count(gap)::double * (count(gap)::double - 1)))
                   / 1e6 AS sd
          FROM g WHERE gap IS NOT NULL GROUP BY user_id
          HAVING count(gap) >= {_BURST_MIN_GAPS})
    SELECT user_id, n_gaps,
           round(mu, 4) AS mean_gap_s,
           round(sd, 4) AS sd_gap_s,
           round((sd - mu) / (sd + mu), 6) AS burstiness
    FROM s
"""


@query("interevent_burstiness", oracle=_BURST_ORACLE, category="event-analytics")
def interevent_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event burstiness per user (Goh-Barabási B = (σ−μ)/(σ+μ) of
    the inter-event gaps): B→−1 is a metronome, B≈0 is Poisson, B→1 is
    bursty — the behavioral-regularity screen behind bot detection and
    session-gap tuning (it answers "is a 30-minute sessionization gap
    meaningful for THIS user").

    One shuffle on user_id feeds the lag() window and the per-user
    moments (combinable avg/stddev on the same partitioning — no second
    exchange); gaps are integer microseconds (epoch_us both engines)
    divided once, so the moments see identical inputs. Users under 20
    gaps are dropped where B's estimate is noise.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.expr("ts_ns div 1000")  # loader's integer-ns column (tables.py)
    g = events.select(
        "user_id", (us - F.lag(us).over(w)).alias("gap")
    ).filter(F.col("gap").isNotNull())
    # exact integer-microsecond moments (money.py discipline): avg and
    # stddev_samp merged double partials in scheduler order; mean and sd
    # now derive from bigint/decimal sums in one deterministic expression
    nn = F.count("gap").cast("double")
    sg = F.sum("gap").cast("double")
    # decimal BEFORE the square: an hours-scale gap in microseconds
    # squared exceeds int64
    sg2 = F.sum(F.col("gap").cast("decimal(19,0)") * F.col("gap")).cast(
        "double"
    )
    s = (
        g.groupBy("user_id")
        .agg(
            F.count("gap").cast("bigint").alias("n_gaps"),
            (F.sum("gap").cast("double") / F.count("gap") / F.lit(1e6)).alias(
                "mu"
            ),
            (
                F.sqrt(
                    F.greatest(nn * sg2 - sg * sg, F.lit(0.0))
                    / (nn * (nn - 1))
                )
                / F.lit(1e6)
            ).alias("sd"),
        )
        .filter(F.col("n_gaps") >= _BURST_MIN_GAPS)
    )
    return s.select(
        "user_id",
        "n_gaps",
        F.round("mu", 4).alias("mean_gap_s"),
        F.round("sd", 4).alias("sd_gap_s"),
        # try_divide: a user whose >=20 gaps are ALL zero (every event at
        # one instant) has sd+mu = 0; DuckDB's 0/0 yields NULL, ANSI Spark
        # raises — try_divide reproduces the NULL (uniform-ts skew sweep).
        F.round(
            F.try_divide(F.col("sd") - F.col("mu"), F.col("sd") + F.col("mu")), 6
        ).alias("burstiness"),
    )


_BITMASK_ORACLE = """
    WITH d AS (
        SELECT user_id,
               date_diff('day', (SELECT min(ts)::date FROM events), ts::date)
                 AS day_idx
        FROM events),
    m AS (SELECT user_id,
                 bit_or(1::bigint << day_idx) AS mask
          FROM d GROUP BY user_id)
    SELECT user_id, mask,
           bit_count(mask)::int AS n_active_days,
           ((mask >> 0) & 1 = 1 AND (mask >> 29) & 1 = 1) AS first_and_last
    FROM m
"""


@query("activity_bitmask_users", oracle=_BITMASK_ORACLE, category="event-analytics")
def activity_bitmask_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity bitmask: bit d of a single bigint is set iff the
    user was active on day d of the observation window — the bitmap-index
    representation behind fast retention/segment math (N-day actives,
    day-k cohort membership, arbitrary AND/OR audience combinations) at
    one 8-byte word per user per month.

    bit_or(1 << day_idx) is a combinable aggregate, so the whole index
    builds in ONE shuffle of (user, day-bit) words; every downstream
    retention question is then bit arithmetic on the mask (bit_count,
    shifts) with no second pass over events. The 30-day fixture window
    fits one bigint; longer windows shard into (user, month) words —
    same aggregate, composite key.
    """
    events = load_table(spark, sf_dir, "events")
    d0 = events.agg(F.min(F.to_date("ts")).alias("d0"))
    d = events.crossJoin(F.broadcast(d0)).select(
        "user_id", F.datediff(F.to_date("ts"), F.col("d0")).alias("day_idx")
    )
    m = d.groupBy("user_id").agg(
        F.bit_or(F.expr("shiftleft(cast(1 as bigint), day_idx)")).alias("mask")
    )
    return m.select(
        "user_id",
        "mask",
        F.bit_count("mask").cast("int").alias("n_active_days"),
        F.expr("(mask & 1) = 1 AND (shiftright(mask, 29) & 1) = 1").alias(
            "first_and_last"
        ),
    )


_RLE_ORACLE = """
    WITH s AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
        FROM events),
    f AS (SELECT user_id, event_type,
                 CASE WHEN prev IS NULL OR prev <> event_type
                      THEN 1 ELSE 0 END AS brk,
                 ts, event_id
          FROM s),
    r AS (SELECT user_id, event_type,
                 sum(brk) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS run_id
          FROM f),
    runs AS (SELECT user_id, run_id, event_type, count(*)::bigint AS len
             FROM r GROUP BY user_id, run_id, event_type)
    SELECT user_id,
           count(*)::bigint AS n_runs,
           sum(len)::bigint AS n_events,
           max(len)::bigint AS longest_run,
           round(sum(len) / count(*)::double, 6) AS compression
    FROM runs GROUP BY user_id
"""


@query("rle_event_runs", oracle=_RLE_ORACLE, category="event-analytics")
def rle_event_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length structure of each user's event-type sequence: number of
    maximal same-type runs, longest run, and the RLE compression ratio
    (events per run) — the repetitiveness screen for clickstreams
    (rage-clicks, retry loops, bot bursts all surface as long runs), and
    the storage model behind run-length-encoded sequence columns.

    Pure gaps-and-islands: one shuffle on user_id feeds the break-flag
    lag, the running-sum run ids, and the two roll-ups — all four steps
    share the same partitioning, so Catalyst plans a single exchange.
    """
    events = load_table(spark, sf_dir, "events")
    wl = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = events.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.lag("event_type").over(wl).alias("prev"),
    )
    f = s.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.when(
            F.col("prev").isNull() | (F.col("prev") != F.col("event_type")), 1
        )
        .otherwise(0)
        .alias("brk"),
    )
    r = f.select(
        "user_id", "event_type", F.sum("brk").over(wl).alias("run_id")
    )
    runs = r.groupBy("user_id", "run_id", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("len")
    )
    return runs.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_runs"),
        F.sum("len").cast("bigint").alias("n_events"),
        F.max("len").cast("bigint").alias("longest_run"),
        F.round(F.sum("len") / F.count(F.lit(1)).cast("double"), 6).alias(
            "compression"
        ),
    )


_OVL_ORACLE = """
    WITH au AS (SELECT DISTINCT event_type, user_id FROM events),
    sz AS (SELECT event_type, count(*)::bigint AS n FROM au GROUP BY event_type),
    ix AS (SELECT a.event_type AS t1, b.event_type AS t2,
                  count(*)::bigint AS both
           FROM au a JOIN au b ON a.user_id = b.user_id
                                AND a.event_type < b.event_type
           GROUP BY 1, 2)
    SELECT ix.t1, ix.t2, ix.both,
           s1.n AS n1, s2.n AS n2,
           round(ix.both / (s1.n + s2.n - ix.both)::double, 6) AS jaccard
    FROM ix JOIN sz s1 ON ix.t1 = s1.event_type
            JOIN sz s2 ON ix.t2 = s2.event_type
"""


@query("audience_overlap_matrix", oracle=_OVL_ORACLE, category="event-analytics")
def audience_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap between event types: for every type pair, the
    exact co-audience size and Jaccard similarity of their user sets —
    the segment-overlap matrix behind "do purchasers also report errors"
    questions, and the exact twin the KMV/HLL-intersection sketches
    approximate at sketch cost.

    The (type, user) incidence is distinct-ed FIRST, so the pair join is
    the inverted-index self-join on user_id — audiences sharing no user
    never pair up, and the shuffle carries incidence rows, never user
    sets. Set sizes are a broadcast dimension joined after the reduce.
    """
    events = load_table(spark, sf_dir, "events")
    au = events.select("event_type", "user_id").distinct()
    sz = au.groupBy("event_type").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    a = au.select(F.col("event_type").alias("t1"), "user_id")
    b = au.select(F.col("event_type").alias("t2"), "user_id")
    ix = (
        a.join(b, "user_id")
        .filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("both"))
    )
    s1 = sz.select(F.col("event_type").alias("t1"), F.col("n").alias("n1"))
    s2 = sz.select(F.col("event_type").alias("t2"), F.col("n").alias("n2"))
    return (
        ix.join(F.broadcast(s1), "t1")
        .join(F.broadcast(s2), "t2")
        .select(
            "t1",
            "t2",
            "both",
            "n1",
            "n2",
            F.round(
                F.col("both")
                / (F.col("n1") + F.col("n2") - F.col("both")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


_MPX_ORACLE = """
    WITH s AS (SELECT user_id, event_type AS next,
                      lag(event_type) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id) AS prev
               FROM events),
    tr AS (SELECT prev, next, count(*)::double AS n
           FROM s WHERE prev IS NOT NULL GROUP BY prev, next),
    tm AS (SELECT prev, next, n / sum(n) OVER (PARTITION BY prev) AS p
           FROM tr),
    scored AS (SELECT s.user_id, round(ln(tm.p) * 1e9)::bigint AS q
               FROM s JOIN tm ON s.prev = tm.prev AND s.next = tm.next
               WHERE s.prev IS NOT NULL)
    SELECT user_id,
           count(*)::bigint AS n_transitions,
           round(exp(-(sum(q)::double / 1e9 / count(*))), 6) AS perplexity
    FROM scored GROUP BY user_id
"""


@query("markov_perplexity_users", oracle=_MPX_ORACLE, category="event-analytics")
def markov_perplexity_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user perplexity under the corpus-wide first-order Markov model
    of event transitions: exp(−mean ln p(next|prev)) — the sequence-
    anomaly score (scripted/bot traffic follows transitions the global
    model finds improbable, organic traffic hugs the model).

    The transition model is event_transition_matrix's 5×5 table
    (row-normalized over a 25-row aggregate), broadcast back onto the
    lagged transition stream — so scoring costs the same single user_id
    shuffle the lag already needs, plus a map-side model lookup. Every
    observed transition has nonzero model probability by construction
    (the model was estimated from the same stream), so ln() is total.
    """
    events = load_table(spark, sf_dir, "events")
    wl = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = events.select(
        "user_id",
        F.col("event_type").alias("next"),
        F.lag("event_type").over(wl).alias("prev"),
    ).filter(F.col("prev").isNotNull())
    tr = s.groupBy("prev", "next").agg(F.count(F.lit(1)).cast("double").alias("n"))
    tm = tr.select(
        "prev",
        "next",
        (F.col("n") / F.sum("n").over(Window.partitionBy("prev"))).alias("p"),
    )
    # per-row ln P (deterministic double from exact count ratios)
    # quantized at 1e-9; the mean is exact-integer-sum / count (money.py)
    scored = s.join(F.broadcast(tm), ["prev", "next"]).select(
        "user_id", F.round(F.log("p") * 1e9).cast("bigint").alias("q")
    )
    return scored.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_transitions"),
        F.round(
            F.exp(
                -(
                    F.sum("q").cast("double")
                    / F.lit(1e9)
                    / F.count(F.lit(1))
                )
            ),
            6,
        ).alias("perplexity"),
    )


_NVR_ORACLE = """
    WITH o AS (SELECT o_custkey, date_trunc('month', o_orderdate) AS m,
                      o_totalprice AS rev
               FROM orders),
    first AS (SELECT o_custkey, min(m) AS m0 FROM o GROUP BY o_custkey)
    SELECT o.m::timestamp AS month,
           round(sum(CASE WHEN o.m = first.m0
                          THEN round(o.rev * 100)::bigint
                          ELSE 0 END) / 100.0, 2)
             AS new_revenue,
           round(sum(CASE WHEN o.m > first.m0
                          THEN round(o.rev * 100)::bigint
                          ELSE 0 END) / 100.0, 2)
             AS returning_revenue,
           count(DISTINCT CASE WHEN o.m = first.m0 THEN o.o_custkey END)::bigint
             AS new_customers,
           count(DISTINCT CASE WHEN o.m > first.m0 THEN o.o_custkey END)::bigint
             AS returning_customers
    FROM o JOIN first USING (o_custkey)
    GROUP BY o.m
"""


@query("new_vs_returning_revenue", oracle=_NVR_ORACLE, category="event-analytics")
def new_vs_returning_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: monthly revenue and customer counts split into
    NEW (first-ever order month) vs RETURNING — the decomposition that
    tells acquisition apart from retention in a single chart, and the
    revenue-side sibling of cohort_retention_purchases.

    The first-order month is one combinable groupBy on the customer key;
    classification is a join back on the same key (both sides already
    partitioned by it — no extra exchange), and the monthly rollup
    aggregates conditionals. The two count-distincts share the month
    shuffle via Spark's expand strategy.
    """
    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        "o_custkey",
        F.date_trunc("month", "o_orderdate").alias("m"),
        F.col("o_totalprice").alias("rev"),
    )
    first = o.groupBy("o_custkey").agg(F.min("m").alias("m0"))
    j = o.join(first, "o_custkey")
    is_new = F.col("m") == F.col("m0")
    is_ret = F.col("m") > F.col("m0")
    return (
        j.groupBy(F.col("m").cast("timestamp_ntz").alias("month"))
        .agg(
            F.round(
                F.sum(F.when(is_new, cents("rev")).otherwise(F.lit(0)))
                / F.lit(100.0),
                2,
            ).alias("new_revenue"),
            F.round(
                F.sum(F.when(is_ret, cents("rev")).otherwise(F.lit(0)))
                / F.lit(100.0),
                2,
            ).alias("returning_revenue"),
            F.count_distinct(F.when(is_new, F.col("o_custkey")))
            .cast("bigint")
            .alias("new_customers"),
            F.count_distinct(F.when(is_ret, F.col("o_custkey")))
            .cast("bigint")
            .alias("returning_customers"),
        )
    )
