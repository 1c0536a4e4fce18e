"""Custom stateful streaming operators (SURVEY.md §2.10 growth path).

``applyInPandasWithState`` is Spark's arbitrary-keyed-state primitive — the
streaming analogue of the MR Reducer with carried state. Here: a per-user
running profile (event count, value sum, last event time) maintained across
micro-batches.

At 100 TB: state lives in the state store partitioned by key (RocksDB
provider in production); per-batch work is Arrow-batched per key group.
Unbounded key cardinality needs TTL (timeout) eviction — demonstrated with
``GroupStateTimeout.NoTimeout`` here because the fixture backfill is bounded.
"""

from __future__ import annotations

import tempfile
import uuid
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from cbde_mapreduce_spark.streaming.streams import events_stream

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, sum_value double"
STATE_SCHEMA = "n bigint, s double"


def _update_user_profile(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_value": [round(s, 2)]})


def run_stateful_user_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user stateful profile over the event stream (update mode).

    Bounded AvailableNow backfill → the final update per user equals the
    batch aggregate, which is the correctness check in tests.
    """
    stream = events_stream(spark, sf_dir)
    profiles = (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_profile,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    sink = f"profiles_{uuid.uuid4().hex[:12]}"
    query = (
        profiles.writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_state_"))
        .start()
    )
    query.awaitTermination()
    return spark.table(sink)
