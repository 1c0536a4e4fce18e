"""Sources: scans over the fixture tables and generic readers.

MapReduce parity (SURVEY.md §2.1): `TextInputFormat`/structured scans become
`spark.read.{parquet,csv,json,text}` with embedded or declared schemas;
predicate pushdown and column pruning reach the parquet scan via Catalyst.
"""

from cbde_mapreduce_spark.sources.tables import (  # noqa: F401
    TABLES,
    load_table,
    load_tables,
)
