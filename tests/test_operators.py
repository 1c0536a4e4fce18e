"""Unit tests on tiny inline DataFrames with hand-computed expectations
(SURVEY.md §5.3): as-of join edges, shingles, session gap boundary,
counters/sinks parity features."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from cbde_mapreduce_spark.functions.texttools import shingles, tokens
from cbde_mapreduce_spark.operators.asof import asof_join


def _ts(s: str):
    return dt.datetime.fromisoformat(s)


def test_asof_join_hand_computed(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T10:00:00")),  # after right@9:00 -> 1.0
            (2, 10, _ts("2024-01-01T12:00:00")),  # after right@11:30 -> 2.0
            (3, 10, _ts("2024-01-01T08:00:00")),  # before any right -> NULL
            (4, 20, _ts("2024-01-01T10:00:00")),  # equal ts -> inclusive -> 5.0
        ],
        "event_id long, user_id long, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01T09:00:00"), 1.0),
            (10, _ts("2024-01-01T11:30:00"), 2.0),
            (20, _ts("2024-01-01T10:00:00"), 5.0),
        ],
        "user_id long, ts timestamp_ntz, v double",
    )
    out = {
        r.event_id: r.v
        for r in asof_join(left, right, by="user_id", ts="ts", value_cols=["v"]).collect()
    }
    assert out == {1: 1.0, 2: 2.0, 3: None, 4: 5.0}


def test_asof_join_preserves_null_value_of_matched_row(spark):
    """A matched right row whose value is NULL must yield NULL, not an older
    non-NULL value (DuckDB ASOF semantics; round-2 advice fix)."""
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T12:00:00")),  # nearest right@11:00 has v=NULL
            (2, 10, _ts("2024-01-01T10:00:00")),  # nearest right@09:00 -> 1.0
        ],
        "event_id long, user_id long, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01T09:00:00"), 1.0),
            (10, _ts("2024-01-01T11:00:00"), None),
        ],
        "user_id long, ts timestamp_ntz, v double",
    )
    out = {
        r.event_id: r.v
        for r in asof_join(left, right, by="user_id", ts="ts", value_cols=["v"]).collect()
    }
    assert out == {1: None, 2: 1.0}


def test_shingles_short_doc_is_empty(spark):
    df = spark.createDataFrame([("a b",), ("a b c",), ("a b c d",)], "text string")
    rows = df.select(shingles(tokens("text"), 3).alias("s")).collect()
    assert rows[0].s == []
    assert rows[1].s == ["a b c"]
    assert rows[2].s == ["a b c", "b c d"]


def test_session_gap_boundary(spark):
    """A gap of exactly 30 min must NOT break the session (strictly greater)."""
    from cbde_mapreduce_spark.plans import REGISTRY
    import tempfile, os
    base = _ts("2024-01-01T00:00:00")
    rows = [
        (1, base, 7, "click", 1.0, "{}"),
        (2, base + dt.timedelta(minutes=30), 7, "click", 1.0, "{}"),        # exactly 30 -> same
        (3, base + dt.timedelta(minutes=60, seconds=1), 7, "click", 1.0, "{}"),  # 30:01 -> break
    ]
    df = spark.createDataFrame(
        [(i, int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1e9), u, e, v, p)
         for (i, t, u, e, v, p) in rows],
        "event_id long, ts_ns long, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.timestamp_micros(F.expr("ts_ns div 1000")).cast("timestamp_ntz"))
    with tempfile.TemporaryDirectory() as d:
        # route through the registered query by writing an events.parquet fixture
        df.select("event_id", F.col("ts_ns").alias("ts"), "user_id", "event_type", "value", "props") \
          .toPandas().to_parquet(os.path.join(d, "events.parquet"))
        out = REGISTRY["sessionize_events"].fn(spark, d).toPandas()
    assert len(out) == 2
    assert sorted(out.n_events.tolist()) == [1, 2]


def test_counters_observe_and_accumulator(spark, sf_smoke):
    """MR counters parity (SURVEY §2.1): df.observe + SparkContext accumulators."""
    from pyspark.sql import Observation
    from cbde_mapreduce_spark.sources import load_table
    li = load_table(spark, sf_smoke, "lineitem")
    obs = Observation("metrics")
    observed = li.observe(obs, F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
    total = observed.count()
    assert obs.get["n"] == total
    acc = spark.sparkContext.accumulator(0)
    li.select("l_orderkey").rdd.foreach(lambda _: acc.add(1))
    assert acc.value == total


def test_parquet_sink_partitioned_roundtrip(spark, sf_smoke, tmp_path):
    """Sink parity (SURVEY §2.1): partitioned parquet write + readback."""
    from cbde_mapreduce_spark.sources import load_table
    orders = load_table(spark, sf_smoke, "orders")
    out = str(tmp_path / "orders_by_status")
    orders.write.partitionBy("o_orderstatus").mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == orders.count()
    assert set(back.select("o_orderstatus").distinct().toPandas().o_orderstatus) == {"O", "F", "P"}
    # partition pruning: a status filter must read only that partition
    plan = back.filter(F.col("o_orderstatus") == "O")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "o_orderstatus" in plan


def test_unicode_text_handling(spark):
    """Unicode safety: char-length vs byte-length, tokenization, md5 of
    utf-8 — verified against DuckDB on inline multilingual rows."""
    import duckdb

    rows = [(1, "héllo wörld"), (2, "数据 库 系统"), (3, "emoji 🚀 test"), (4, "ascii only")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = (
        df.select(
            "doc_id",
            F.length("text").alias("n_chars"),
            F.octet_length("text").cast("bigint").alias("n_bytes"),
            F.size(F.split("text", " ")).cast("bigint").alias("n_tok"),
            F.md5(F.encode("text", "UTF-8")).alias("h"),
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = con.sql(
        """SELECT doc_id, length(text)::int AS n_chars, strlen(text)::bigint AS n_bytes,
                  len(string_split(text,' '))::bigint AS n_tok, md5(text) AS h
           FROM t ORDER BY doc_id"""
    ).df()
    assert got.equals(want), f"\n{got}\nvs\n{want}"


def test_gapfill_scaffold_nonvacuous(spark, sf_oracle):
    """The recursive date scaffold must actually align with fact weeks
    (a misaligned anchor zeroes every week on BOTH engines and the
    differential passes vacuously — this guards the semantics)."""
    from cbde_mapreduce_spark.plans import REGISTRY

    rows = REGISTRY["gapfill_weekly_orders"].fn(spark, sf_oracle).collect()
    total = sum(r["n_orders"] for r in rows)
    zeros = sum(1 for r in rows if r["n_orders"] == 0)
    assert len(rows) == 106
    assert total > 4000, f"scaffold misaligned: only {total} orders matched"
    assert zeros >= 1, "no empty week survived — left-join semantics unexercised"


def test_capped_running_balance_matches_reference(spark, sf_oracle):
    """The clamped accumulator (non-linear recursion — no SQL closed form)
    must match an independent pandas groupby reference, and the clamps must
    actually fire (otherwise it degenerates to a plain signed sum)."""
    from cbde_mapreduce_spark.plans import REGISTRY
    from cbde_mapreduce_spark.sources import load_table

    got = {
        r["user_id"]: (r["final_balance"], r["n_cap_hits"], r["n_floor_hits"])
        for r in REGISTRY["capped_running_balance"].fn(spark, sf_oracle).collect()
    }
    pdf = (
        load_table(spark, sf_oracle, "events")
        .select("user_id", "ts", "event_id", "event_type", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    total_clips = 0
    for uid, g in pdf.groupby("user_id"):
        bal, hi, lo = 0.0, 0, 0
        for etype, v in zip(g["event_type"], g["value"]):
            if etype == "purchase":
                bal += float(v)
            elif etype == "error":
                bal -= float(v)
            if bal > 500.0:
                bal, hi = 500.0, hi + 1
            elif bal < 0.0:
                bal, lo = 0.0, lo + 1
        assert got[uid] == (round(bal, 2), hi, lo), f"user {uid} diverged"
        total_clips += hi + lo
    assert total_clips > 0, "clamps never fired — vacuous"
