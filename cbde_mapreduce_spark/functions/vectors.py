"""Vector expression builders over array<float|double> columns (SURVEY.md §2.11).

Higher-order functions (zip_with / aggregate / transform) — the pure-SQL
path for cosine similarity. The throughput path for pairwise similarity is
the Arrow/numpy blocked kernel in operators/similarity.py; these expressions
are the reference semantics both implementations must match.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (left fold, JVM-side)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    """√(Σ aᵢ²)."""
    return F.sqrt(
        F.aggregate(
            F.transform(_as_double(a), lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot(a,b) / (|a|·|b|)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
