"""Fixture-table loaders (SURVEY.md §1.2, FIXTURES.md).

Ten parquet tables per scale-factor directory. The one non-trivial read is
``events``: its ``ts`` column is parquet TIMESTAMP(NANOS), which Spark's
vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]); we read it as epoch-nanos
long (``spark.sql.legacy.parquet.nanosAsLong``) and expose BOTH:

- ``ts``     timestamp_ntz, truncated to microseconds — matches what DuckDB
             yields when casting its TIMESTAMP_NS read to TIMESTAMP, so
             oracle value-hashes line up;
- ``ts_ns``  the raw epoch-nanos bigint — exact integer event-time arithmetic
             with no timezone dependence (sessionization, gap detection).

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
        df = (
            df.withColumnRenamed("ts", "ts_ns")
            .withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts_ns div 1000")).cast("timestamp_ntz"),
            )
            .select("event_id", "ts", "ts_ns", "user_id", "event_type", "value", "props")
        )
    memo[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table: name -> DataFrame."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}
