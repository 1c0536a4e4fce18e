"""Query registry: the bridge between SURVEY.md §2 and the driver contract.

Every implemented operator registers here as a named pair:

- a DataFrame builder ``fn(spark, sf_dir) -> DataFrame`` (the Spark-first
  implementation), and
- optionally a DuckDB-compatible ANSI-SQL ``oracle`` string computing the
  same result over the same parquet tables (the correctness gate).

Hash-matching discipline (SURVEY.md §7 hard-part 1): every computed column is
aliased identically on both sides; float aggregates are rounded on both sides
so cross-engine summation-order noise (~1e-12 relative) can't flip the
driver's value hash; every LIMIT carries a deterministic total order
(tiebreaker on a unique key).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL twin; None -> driver does rows-only check
    category: str
    doc: str = ""


#: name -> spec, populated by the @query decorator at import time.
REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, category: str = "misc"):
    """Register a query builder under ``name`` with its oracle SQL twin."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, category=category, doc=fn.__doc__ or ""
        )
        return fn

    return deco
