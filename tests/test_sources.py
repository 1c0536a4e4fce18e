"""Source/sink format coverage (SURVEY.md §2.1): csv, json, text scans."""

from __future__ import annotations

from pyspark.sql import functions as F

from cbde_mapreduce_spark.sources import load_table


def test_csv_roundtrip_with_schema(spark, sf_smoke, tmp_path):
    orders = load_table(spark, sf_smoke, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    path = str(tmp_path / "orders_csv")
    orders.write.option("header", True).mode("overwrite").csv(path)
    back = spark.read.csv(
        path,
        header=True,
        schema="o_orderkey long, o_custkey long, o_totalprice double, o_orderstatus string",
    )
    assert back.count() == orders.count()
    a = orders.agg(F.round(F.sum("o_totalprice"), 2).alias("s")).collect()[0].s
    b = back.agg(F.round(F.sum("o_totalprice"), 2).alias("s")).collect()[0].s
    assert a == b


def test_json_roundtrip(spark, sf_smoke, tmp_path):
    events = load_table(spark, sf_smoke, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    path = str(tmp_path / "events_json")
    events.write.mode("overwrite").json(path)
    back = spark.read.json(path)
    assert back.count() == events.count()
    assert set(back.columns) == set(events.columns)


def test_text_scan_wordcount_pattern(spark, sf_smoke, tmp_path):
    """The original MapReduce input format: lines of text → wordcount."""
    docs = load_table(spark, sf_smoke, "documents")
    path = str(tmp_path / "docs_text")
    docs.select("text").write.mode("overwrite").text(path)
    lines = spark.read.text(path)
    n_words_text = (
        lines.select(F.explode(F.split("value", " ")).alias("w"))
        .filter(F.col("w") != "")
        .count()
    )
    n_words_parquet = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .count()
    )
    assert n_words_text == n_words_parquet


def test_repartition_custom_partitioner_parity(spark, sf_smoke):
    """MR custom Partitioner parity: hash repartition co-locates keys;
    repartitionByRange orders ranges; sortWithinPartitions is the shuffle
    sort phase."""
    orders = load_table(spark, sf_smoke, "orders")
    by_cust = orders.repartition(8, "o_custkey")
    assert by_cust.rdd.getNumPartitions() == 8
    # all rows of one key land in one partition
    loc = (
        by_cust.select("o_custkey", F.spark_partition_id().alias("pid"))
        .groupBy("o_custkey")
        .agg(F.countDistinct("pid").alias("nparts"))
        .agg(F.max("nparts").alias("m"))
        .collect()[0]
        .m
    )
    assert loc == 1
    ranged = orders.repartitionByRange(4, "o_orderdate").sortWithinPartitions("o_orderdate")
    assert ranged.count() == orders.count()


def test_compression_codecs_roundtrip(spark, sf_smoke, tmp_path):
    """Parquet codec coverage: snappy (default) and zstd (the 100 TB choice
    for cold data) both roundtrip byte-exact aggregates."""
    li = load_table(spark, sf_smoke, "lineitem").select("l_orderkey", "l_quantity")
    want = li.agg(F.round(F.sum("l_quantity"), 2).alias("s")).collect()[0].s
    for codec in ("snappy", "zstd"):
        path = str(tmp_path / f"li_{codec}")
        li.write.option("compression", codec).mode("overwrite").parquet(path)
        got = (
            spark.read.parquet(path)
            .agg(F.round(F.sum("l_quantity"), 2).alias("s"))
            .collect()[0]
            .s
        )
        assert got == want, codec


def test_merge_schema_evolution(spark, tmp_path):
    """Schema evolution: files written before a column was added remain
    readable; mergeSchema unions the schemas with nulls for missing cols."""
    path = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, v1 string").write.mode("append").parquet(path)
    spark.createDataFrame([(2, "b", 9.5)], "id long, v1 string, v2 double").write.mode(
        "append"
    ).parquet(path)
    merged = spark.read.option("mergeSchema", True).parquet(path)
    assert set(merged.columns) == {"id", "v1", "v2"}
    rows = {r.id: r.v2 for r in merged.collect()}
    assert rows[1] is None and rows[2] == 9.5


def test_orc_roundtrip(spark, sf_smoke, tmp_path):
    """ORC sink/scan (built into Spark): values and schema must survive a
    round trip, and predicate pushdown must reach the ORC scan."""
    from cbde_mapreduce_spark.sources import load_table

    orders = load_table(spark, sf_smoke, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    path = str(tmp_path / "orders_orc")
    orders.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert back.schema == orders.schema
    assert back.count() == orders.count()
    want = orders.filter(F.col("o_totalprice") > 200000).count()
    got_df = back.filter(F.col("o_totalprice") > 200000)
    assert got_df.count() == want
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_totalprice" in plan


def test_avro_guarded(spark, sf_smoke, tmp_path):
    """Avro needs the external spark-avro package; without it the write must
    fail with Spark's actionable AVRO_MISSING_PACKAGE-style error (we assert
    the failure mode is loud, not silent)."""
    from cbde_mapreduce_spark.sources import load_table

    orders = load_table(spark, sf_smoke, "orders").limit(10)
    path = str(tmp_path / "orders_avro")
    try:
        orders.write.mode("overwrite").format("avro").save(path)
    except Exception as ex:
        assert "avro" in str(ex).lower()
        return
    back = spark.read.format("avro").load(path)  # package present
    assert back.count() == 10


def test_multifile_scan_parallelism_same_results(spark, sf_oracle, tmp_path):
    """A table split over many files scans in parallel partitions and
    produces identical query results (ROADMAP #6: scan parallelism)."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_oracle, "documents")
    out = str(tmp_path / "docs_multi")
    docs.repartition(16).write.parquet(out)
    multi = spark.read.parquet(out)
    assert multi.rdd.getNumPartitions() > 1
    a = (
        docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
        .toPandas().set_index("source").n.to_dict()
    )
    b = (
        multi.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
        .toPandas().set_index("source").n.to_dict()
    )
    assert a == b


def test_schema_evolution_merge_schema(spark, tmp_path):
    """Schema evolution on a landing directory: files written before a column
    was added coexist with evolved files; mergeSchema unions the schemas and
    back-fills the missing column with NULLs — the additive-evolution
    contract a long-lived 100 TB table relies on."""
    from pyspark.sql import functions as F

    base = str(tmp_path / "evolving")
    spark.range(0, 10).select(
        F.col("id"), (F.col("id") * 2).alias("a")
    ).write.parquet(base + "/batch=1")
    spark.range(10, 20).select(
        F.col("id"), (F.col("id") * 2).alias("a"), F.lit("v2").alias("b")
    ).write.parquet(base + "/batch=2")

    df = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(df.columns) == {"id", "a", "b", "batch"}
    assert df.count() == 20
    assert df.filter(F.col("b").isNull()).count() == 10  # pre-evolution rows
    assert df.filter(F.col("batch") == 1).agg(F.max("id")).first()[0] == 9


def test_python_datasource_custom_inputformat(spark):
    """Custom Python DataSource (the MR custom-InputFormat extension point):
    declared splits scan in parallel, per-split readers are deterministic,
    and an event_type equality is absorbed source-side via pushFilters."""
    from pyspark.sql import functions as F

    from cbde_mapreduce_spark.sources.pydatasource import register

    register(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("partitions", 6)
        .option("rowsPerPartition", 500)
        .load()
    )
    assert df.count() == 6 * 500
    # splits became real scan partitions
    assert (
        df.select(F.spark_partition_id().alias("p")).distinct().count() == 6
    )
    # deterministic regeneration: same seed -> identical dataset
    again = (
        spark.read.format("synthetic_events")
        .option("partitions", 6)
        .option("rowsPerPartition", 500)
        .load()
    )
    assert (
        df.exceptAll(again).count() == 0 and again.exceptAll(df).count() == 0
    )
    # pushed filter result == post-scan filter result (same semantics,
    # evaluated at the source)
    pushed = df.filter(F.col("event_type") == "click")
    n_clicks = pushed.count()
    assert 0 < n_clicks < 6 * 500
    total_by_type = {r["event_type"]: r["n"] for r in df.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert n_clicks == total_by_type["click"]
