"""Fixture-table loaders (SURVEY.md §1.2, FIXTURES.md).

Ten parquet tables per scale-factor directory. The one non-trivial read is
``events``: the fixture generations have stored ``ts`` as either parquet
TIMESTAMP(NANOS) (round 1-2 — Spark's vectorized reader rejects it, so it is
read as epoch-nanos long via ``spark.sql.legacy.parquet.nanosAsLong``) or
TIMESTAMP(MICROS) (round 3+ — reads natively as timestamp_ntz). The loader
detects which generation it got and exposes BOTH canonical columns either way:

- ``ts``     timestamp_ntz at microsecond precision — matches DuckDB's read
             of the same file, so oracle value-hashes line up;
- ``ts_ns``  epoch-nanos bigint — exact integer event-time arithmetic with no
             timezone dependence (sessionization, gap detection).

At 100 TB these are plain parquet scans: filters/projections push down, and a
directory of many files parallelizes across executors for free.
"""

from __future__ import annotations

import os
from weakref import WeakKeyDictionary

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cbde_mapreduce_spark.session import apply_runtime_conf

#: Per-session memo of loaded DataFrames. DataFrames are immutable plan
#: handles, so reuse is safe; it saves the py4j reader round-trip + footer
#: schema read on every query build (~50 ms each — the driver runs ~75
#: queries, several loading 2-6 tables). Keyed weakly so a stopped session
#: releases its entries.
_TABLE_MEMO: "WeakKeyDictionary[SparkSession, dict[tuple[str, str], DataFrame]]" = (
    WeakKeyDictionary()
)

#: All fixture tables (one parquet file per table per scale factor).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame with canonical columns."""
    memo = _TABLE_MEMO.setdefault(spark, {})
    key = (os.path.abspath(sf_dir), name)
    if key in memo:
        return memo[key]
    apply_runtime_conf(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = _canonical_events(df)
    memo[key] = df
    return df


def _canonical_events(df: DataFrame) -> DataFrame:
    """Normalize either events generation to (ts timestamp_ntz, ts_ns bigint).

    Session timezone is pinned to UTC (session.REQUIRED_CONF), so the
    ntz->timestamp cast under ``unix_micros`` is epoch-exact.
    """
    ts_type = dict(df.dtypes)["ts"]
    if ts_type == "bigint":  # TIMESTAMP(NANOS) file read via nanosAsLong
        return (
            df.withColumnRenamed("ts", "ts_ns")
            .withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts_ns div 1000")).cast("timestamp_ntz"),
            )
            .select("event_id", "ts", "ts_ns", "user_id", "event_type", "value", "props")
        )
    return (  # TIMESTAMP(MICROS) file: native timestamp_ntz read
        df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        .withColumn("ts_ns", F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000))
        .select("event_id", "ts", "ts_ns", "user_id", "event_type", "value", "props")
    )


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table: name -> DataFrame."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}
