"""Vector expression builders over array<float|double> columns (SURVEY.md §2.11).

Higher-order functions (zip_with / aggregate / transform) — the pure-SQL
path for cosine similarity. The throughput path for pairwise similarity is
the Arrow/numpy blocked kernel in operators/similarity.py; these expressions
are the reference semantics both implementations must match.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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


def pair_cosine_pandas():
    """Arrow-batched numpy cosine for CANDIDATE-PAIR re-ranking: a pandas
    UDF over two embedding columns (each batch: stack → row-wise einsum →
    one vectorized divide).

    The HOF ``cosine_similarity`` expression is the reference semantics but
    evaluates interpreted per element (no codegen for higher-order
    lambdas) — on millions of LSH candidate pairs that fold dominates the
    whole job. This kernel does the same arithmetic ~30× faster; summation
    order differs only at ~1e-15, absorbed by the callers' round(…, 6).
    Built lazily (pandas_udf registration needs a live session).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _pair_cosine(ea: pd.Series, eb: pd.Series) -> pd.Series:
        a = np.stack(ea.to_numpy())
        b = np.stack(eb.to_numpy())
        num = np.einsum("ij,ij->i", a, b)
        den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
        return pd.Series(num / den)

    return _pair_cosine


def pair_l2_pandas():
    """Arrow-batched numpy squared-L2 distance for candidate-pair re-ranking
    (same rationale and shape as ``pair_cosine_pandas``)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _pair_l2(ea: pd.Series, eb: pd.Series) -> pd.Series:
        a = np.stack(ea.to_numpy())
        b = np.stack(eb.to_numpy())
        d = a - b
        return pd.Series(np.einsum("ij,ij->i", d, d))

    return _pair_l2
