"""Streaming pipelines over the events table.

Batch/stream duality: ``events_stream`` yields the same schema as
``sources.load_table(..., 'events')`` so every batch transformation can be
re-bound to a stream unchanged. Fixture files are read with
``Trigger.AvailableNow`` (bounded backfill) — the same pipeline pointed at a
Kafka/file source runs unbounded.

100 TB posture: tumbling aggregation state is per (window, keys) — bounded
by watermark eviction; ``complete`` output mode is used only for the
bounded-fixture parity check (unbounded deployments use append/update +
watermark, demonstrated in tests/test_streaming.py).
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from cbde_mapreduce_spark.session import apply_runtime_conf

#: Raw parquet schema of events (ts is epoch-nanos long, see sources/tables.py).
_RAW_EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet with the canonical column set."""
    apply_runtime_conf(spark)
    # The file stream source requires a directory; scope the listing to the
    # events file with a glob filter.
    raw = (
        spark.readStream.schema(_RAW_EVENTS_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return (
        raw.withColumnRenamed("ts", "ts_ns")
        .withColumn(
            "ts", F.timestamp_micros(F.expr("ts_ns div 1000")).cast("timestamp_ntz")
        )
        .select("event_id", "ts", "ts_ns", "user_id", "event_type", "value", "props")
    )


def run_streaming_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour counts as a real streaming query, run to completion.

    AvailableNow trigger + complete mode + memory sink; returns the sink as
    a DataFrame. Must produce byte-identical results to the batch twin
    (plans/events_q.py::tumbling_hourly_events) — that equivalence IS the
    streaming correctness check.
    """
    stream = events_stream(spark, sf_dir)
    agg = (
        stream.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("hour_start"),
            "n",
            "sum_value",
        )
    )
    sink = f"tumbling_{uuid.uuid4().hex[:12]}"
    query = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_tumbling_"))
        .start()
    )
    query.awaitTermination()
    return spark.table(sink)
