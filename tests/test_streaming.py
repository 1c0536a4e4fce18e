"""Structured Streaming growth path (SURVEY.md §2.10, P6)."""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import functions as F

from cbde_mapreduce_spark.plans import REGISTRY
from cbde_mapreduce_spark.streaming import events_stream, run_streaming_tumbling


def test_stream_matches_batch_tumbling(spark, sf_smoke):
    """The streaming tumbling agg must equal its batch twin exactly."""
    got = (
        run_streaming_tumbling(spark, sf_smoke)
        .toPandas()
        .sort_values("hour_start")
        .reset_index(drop=True)
    )
    want = (
        REGISTRY["tumbling_hourly_events"].fn(spark, sf_smoke)
        .toPandas()
        .sort_values("hour_start")
        .reset_index(drop=True)
    )
    assert got.equals(want)


def test_watermark_append_mode_emits_closed_windows(spark, sf_smoke):
    """Append mode + watermark: only watermark-closed windows are emitted in
    a bounded run; the emitted subset must agree with the batch result."""
    stream = events_stream(spark, sf_smoke)
    # watermarks require TZ-aware timestamps; session tz is UTC so the cast
    # is instant-preserving
    agg = (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").cast("timestamp_ntz").alias("hour_start"), "n")
    )
    sink = f"wm_{uuid.uuid4().hex[:12]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_wm_"))
        .start()
    )
    q.awaitTermination()
    emitted = spark.table(sink).toPandas()
    batch = (
        REGISTRY["tumbling_hourly_events"].fn(spark, sf_smoke)
        .select("hour_start", "n")
        .toPandas()
    )
    assert 0 < len(emitted) <= len(batch)
    merged = emitted.merge(batch, on="hour_start", suffixes=("_s", "_b"))
    assert len(merged) == len(emitted)
    assert (merged.n_s == merged.n_b).all()
