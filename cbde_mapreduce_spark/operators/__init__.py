"""Composite operators Spark lacks as single primitives (SURVEY.md §2.3, §2.11).

Each is built as a composition of DataFrame ops (preferred) or an
Arrow-batched pandas path — never row-at-a-time Python UDFs.
"""

from cbde_mapreduce_spark.operators.asof import asof_join  # noqa: F401
