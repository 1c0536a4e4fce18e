"""Event-time batch operators (SURVEY.md §2.10 batch-first) + JSON extraction.

MapReduce parity: tumbling buckets are map-side key derivation
(bucket = ts - ts % width) + the standard aggregate reduce; JSON props
parsing is an in-map() record transform. The streaming twins of these live
in cbde_mapreduce_spark/streaming/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cbde_mapreduce_spark.plans.money import cents
from cbde_mapreduce_spark.plans.registry import query
from cbde_mapreduce_spark.sources import load_table


@query(
    "tumbling_hourly_events",
    oracle="""
        SELECT date_trunc('hour', ts)   AS hour_start,
               count(*)                 AS n,
               round(sum(round(value * 100)::bigint) / 100.0, 2)     AS sum_value
        FROM events
        GROUP BY 1
    """,
    category="event-time",
)
def tumbling_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows via F.window (event-time bucketing)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(cents("value")) / F.lit(100.0), 2).alias("sum_value"),
        )
        .select(F.col("w.start").cast("timestamp_ntz").alias("hour_start"), "n", "sum_value")
    )


@query(
    "sliding_window_events",
    oracle="""
        SELECT make_timestamp(epoch_us(ts)
                 - ((epoch_us(ts) % 900000000 + 900000000) % 900000000))
                 - INTERVAL 15 MINUTE * k.i AS win_start,
               count(*)             AS n,
               round(sum(round(value * 100)::bigint) / 100.0, 2) AS sum_value
        FROM events, (SELECT unnest(range(0, 4)) AS i) k
        GROUP BY 1
    """,
    category="event-time",
)
def sliding_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h width, 15 min slide) via F.window.

    Each event lands in 4 overlapping windows; the DuckDB oracle replicates
    the same multi-emit expansion explicitly (the MR realization).
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(cents("value")) / F.lit(100.0), 2).alias("sum_value"),
        )
        .select(F.col("w.start").cast("timestamp_ntz").alias("win_start"), "n", "sum_value")
    )


@query(
    "json_props_extract",
    oracle="""
        SELECT event_type,
               sum(regexp_extract(props, '"k": ([0-9]+)', 1)::bigint)::bigint AS sum_k,
               count(*) AS n
        FROM events
        GROUP BY event_type
    """,
    category="scalar",
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON column parsing: from_json on the props payload, aggregated.

    The Spark side uses a real JSON parser (from_json → struct); the oracle
    extracts the same field by regex — a genuine cross-implementation check.
    """
    events = load_table(spark, sf_dir, "events")
    parsed = events.withColumn("p", F.from_json("props", "k BIGINT"))
    return parsed.groupBy("event_type").agg(
        F.sum(F.col("p.k")).alias("sum_k"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "session_window_events",
    oracle="""
        WITH g AS (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                          OR lag(ts) OVER w IS NULL
                        THEN 1 ELSE 0 END AS brk
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        s AS (
            SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS sess
            FROM g
        )
        SELECT user_id,
               min(ts)                          AS win_start,
               max(ts) + INTERVAL 30 MINUTE     AS win_end,
               count(*)                         AS n_events,
               round(sum(round(value * 100)::bigint) / 100.0, 2)             AS sum_value
        FROM s GROUP BY user_id, sess
    """,
    category="event-time",
)
def session_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows via Spark's native session_window (30-min gap).

    Genuine differential: Spark merges via its SessionWindow operator; the
    oracle reconstructs sessions with the lag/cumsum algorithm. Spark's
    window end = last event + gap, mirrored in the oracle.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(cents("value")) / F.lit(100.0), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").cast("timestamp_ntz").alias("win_start"),
            F.col("w.end").cast("timestamp_ntz").alias("win_end"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "time_weighted_avg_user",
    oracle="""
        WITH s AS (SELECT user_id, value, epoch_us(ts) AS us,
                          lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                                   ORDER BY ts, event_id) AS nxt
                   FROM events)
        SELECT user_id,
               round(sum(round(value * 100)::bigint::decimal(19,0)
                          * (nxt - us))::double
                     / sum(nxt - us)::double / 100.0, 6) AS tw_avg,
               count(*)::bigint AS n_intervals
        FROM s WHERE nxt IS NOT NULL
        GROUP BY user_id
    """,
    category="event-time",
)
def time_weighted_avg_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per user (the hypertable/irregular-sampling
    aggregate): each reading is weighted by how long it was current —
    Σ vᵢ·Δtᵢ / Σ Δtᵢ over [tᵢ, tᵢ₊₁) holds, last reading open-ended and
    excluded.

    One window shuffle on user_id (lead for the next timestamp), then a
    combinable weighted-sum aggregate. Weights are exact integer
    microseconds (ts_ns div 1000 == DuckDB epoch_us — the fixture's ns
    discipline), so both engines weight identically; only the final ratio
    is floating and it is rounded on both sides.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.expr("ts_ns div 1000")
    s = ev.select(
        "user_id",
        "value",
        us.alias("us"),
        F.lead(us).over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    dt = F.col("nxt") - F.col("us")
    # exact integer weights AND values: cents x integer-us durations in
    # decimal(38,0) (money.py), one deterministic division chain at the end.
    # try_divide: if every reading of a user shares one instant, sum(dt)=0;
    # DuckDB's 0/0 yields NULL, ANSI Spark raises (uniform-ts skew sweep).
    # decimal BEFORE the product: cents x a years-scale microsecond
    # duration can exceed int64
    cd = cents("value").cast("decimal(19,0)") * dt
    return s.groupBy("user_id").agg(
        F.round(
            F.try_divide(
                F.sum(cd).cast("double"), F.sum(dt).cast("double")
            )
            / F.lit(100.0),
            6,
        ).alias("tw_avg"),
        F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
    )


@query(
    "window_dedup_events",
    oracle="""
        WITH r AS (
            SELECT event_type, value,
                   row_number() OVER (
                       PARTITION BY user_id, event_type, date_trunc('hour', ts)
                       ORDER BY ts, event_id) AS rn
            FROM events)
        SELECT event_type, count(*) AS n_kept,
               round(sum(round(value * 100)::bigint) / 100.0, 2) AS sum_value
        FROM r WHERE rn = 1
        GROUP BY event_type
    """,
    category="event-time",
)
def window_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-horizon dedup: keep the FIRST event per (user, type) within each
    1-hour event-time bucket — the batch twin of streaming
    ``dropDuplicatesWithinWatermark`` (state bounded by the horizon, not the
    stream). One shuffle on the dedup key; the tiebreak (ts, event_id) makes
    the kept row deterministic across engines and partitionings.
    """
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy(
        "user_id", "event_type", F.date_trunc("hour", "ts")
    ).orderBy("ts", "event_id")
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.round(F.sum(cents("value")) / F.lit(100.0), 2).alias("sum_value"),
        )
    )


@query(
    "hierarchical_time_rollup",
    oracle="""
        SELECT date_trunc('day', ts)  AS day_start,
               date_trunc('hour', ts) AS hour_start,
               count(*)               AS n,
               round(sum(round(value * 100)::bigint) / 100.0, 2)   AS sum_value,
               count(DISTINCT user_id)::bigint AS n_users
        FROM events
        GROUP BY GROUPING SETS ((date_trunc('day', ts), date_trunc('hour', ts)),
                                (date_trunc('day', ts)))
    """,
    category="event-time",
)
def hierarchical_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-granularity rollup: hourly AND daily aggregates
    of the same measures in ONE pass (rollup over the day→hour hierarchy,
    grand-total slice excluded to keep exactly the two granularities).

    At 100 TB this is the continuous-aggregate pattern: the fact is scanned
    once, partial aggregates combine map-side per grouping set, and the
    coarser granularity rides the same shuffle rather than re-scanning.
    """
    events = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").cast("timestamp_ntz")
    hour = F.date_trunc("hour", "ts").cast("timestamp_ntz")
    return (
        events.rollup(day.alias("day_start"), hour.alias("hour_start"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(cents("value")) / F.lit(100.0), 2).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .filter(F.col("day_start").isNotNull())
    )


@query(
    "variant_props_extract",
    oracle="""
        SELECT event_type,
               sum(json_extract(props, '$.k')::bigint)::bigint AS sum_k,
               round(avg(json_extract(props, '$.k')::bigint), 6) AS avg_k,
               count(*) AS n
        FROM events
        GROUP BY event_type
    """,
    category="event-time",
)
def variant_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction through Spark 4's VARIANT type:
    parse_json once into the binary variant encoding, then typed
    variant_get path access — the schema-on-read fast path that replaces
    per-query JSON string re-parsing (and, at 100 TB, re-parsing the same
    props column N times across N queries).

    Twin of json_props_extract (from_json with an explicit schema): variant
    needs NO up-front schema, keeps nested paths queryable, and shreds
    columnar in parquet. The DuckDB oracle uses its native JSON path
    extraction over the same file.
    """
    events = load_table(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'bigint')")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "decay_weighted_user_value",
    oracle="""
        WITH m AS (SELECT max(ts) AS t_max FROM events)
        SELECT user_id,
               count(*) AS n_events,
               round(sum((round(value * exp(-(epoch_us(t_max) - epoch_us(ts))
                                            / 86400000000.0)
                                * 1000000)::bigint)::decimal(38,0))::double
                     / 1000000.0, 4) AS decayed_value
        FROM events, m
        GROUP BY user_id
    """,
    category="event-time",
)
def decay_weighted_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-decayed per-user value: sum of value·e^(−age/τ) with τ = 1
    day against the corpus max event time — the exponential-decay feature
    every recommender/fraud pipeline derives (recent activity dominates,
    old activity never fully vanishes).

    Age is exact integer microseconds (ts_ns div 1000 == DuckDB epoch_us)
    scaled INSIDE exp, so both engines evaluate exp on identical doubles;
    one map-side-combinable aggregate, with the scalar t_max broadcast.
    Rounded at 4dp after the sum (exp ulp noise ≪ cutoff).
    """
    events = load_table(spark, sf_dir, "events")
    t_max = events.agg((F.max(F.expr("ts_ns div 1000"))).alias("tmax_us"))
    us = F.expr("ts_ns div 1000")
    return (
        events.crossJoin(F.broadcast(t_max))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # per-row decayed value quantized to a 1e-6 grid, summed as
            # exact integers (money.py: exp is per-row deterministic; only
            # the double SUM order was the flake vector)
            F.round(
                F.sum(
                    F.round(
                        F.col("value")
                        * F.exp(
                            -(F.col("tmax_us") - us) / F.lit(86400000000.0)
                        )
                        * 1000000
                    )
                    .cast("bigint")
                    .cast("decimal(38,0)")
                ).cast("double")
                / F.lit(1000000.0),
                4,
            ).alias("decayed_value"),
        )
    )
