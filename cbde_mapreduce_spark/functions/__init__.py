"""Reusable column-expression builders (all JVM-side, no Python UDFs).

MapReduce parity: these are the in-``map()`` record transforms of the
reference, expressed as Catalyst expressions so they stay inside
whole-stage codegen.
"""

from cbde_mapreduce_spark.functions.texttools import shingles, tokens  # noqa: F401
from cbde_mapreduce_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_norm,
)
