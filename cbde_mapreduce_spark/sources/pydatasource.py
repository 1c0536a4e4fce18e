"""Custom Python DataSource (SURVEY.md §2.1 — custom InputFormat parity).

The MapReduce model's extension point for "my data lives in a format no
bundled reader speaks" is a custom InputFormat: declare the splits, give
each mapper a record reader over its split. Spark 4's Python DataSource API
is the same contract — ``partitions()`` declares the splits, ``read(part)``
is the per-split record iterator running ON EXECUTORS — so a custom feed
(an internal wire format, a service API, a generator) plugs into the
DataFrame layer and everything downstream (pushdown, pruning, joins) just
works.

The implementation here is a deterministic synthetic event feed: seeded
per-partition generation, so the source is testable end-to-end (same rows
every read, no external dependency) and usable as a load generator.
``pushFilters`` demonstrates SOURCE-SIDE pushdown: an ``event_type = 'x'``
equality is absorbed into generation (rows of other types are never
materialized) instead of being evaluated post-scan by Spark.
"""

from __future__ import annotations

import random
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    InputPartition,
)
from pyspark.sql.types import StructType

EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
_SCHEMA = "event_id bigint, user_id bigint, event_type string, value double"


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events")`` after registration.

    Options: ``partitions`` (split count), ``rowsPerPartition``, ``seed``.
    """

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema: StructType) -> "SyntheticEventsReader":
        return SyntheticEventsReader(self.options)


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_partitions = int(options.get("partitions", 4))
        self.rows_per_partition = int(options.get("rowsperpartition", 1000))
        self.seed = int(options.get("seed", 42))
        self.only_type: str | None = None

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Absorb event_type equality into generation; return the rest for
        Spark to evaluate post-scan (the pushdown contract)."""
        for f in filters:
            if (
                isinstance(f, EqualTo)
                and f.attribute == ("event_type",)
                and f.value in EVENT_TYPES
            ):
                self.only_type = f.value
            else:
                yield f

    def partitions(self) -> Sequence[InputPartition]:
        return [InputPartition(i) for i in range(self.n_partitions)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        """Per-split record reader — runs on an executor, seeded so every
        (seed, partition) pair regenerates identical rows."""
        pid = partition.value
        rng = random.Random(self.seed * 1_000_003 + pid)
        base = pid * self.rows_per_partition
        for i in range(self.rows_per_partition):
            etype = EVENT_TYPES[rng.randrange(len(EVENT_TYPES))]
            value = round(rng.random() * 100, 6)
            if self.only_type is not None and etype != self.only_type:
                continue  # pushed filter: rows never leave the source
            yield (base + i, rng.randrange(1000), etype, value)


def register(spark) -> None:
    """Idempotent registration of the synthetic_events format (+ the conf
    gate Python-source filter pushdown sits behind; runtime-settable)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticEventsDataSource)
