"""Text expression builders: tokenization and shingling (SURVEY.md §2.11).

Pure Catalyst expressions (split/transform/sequence) — stays in whole-stage
codegen, no Python boundary crossing on the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (fixture text is single-space separated)."""
    return F.split(text if isinstance(text, Column) else F.col(text), " ")


def shingles(toks: Column, k: int = 3) -> Column:
    """Word k-gram shingles from a token array (space-joined).

    ``transform(sequence(1, n-k+1), i -> concat_ws(' ', toks[i..i+k-1]))``,
    1-based via element_at. Empty array when the doc has < k tokens (guard:
    sequence() would otherwise descend).
    """
    n = F.size(toks)
    make = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(k)]),
    )
    return F.when(n >= k, make).otherwise(F.array().cast("array<string>"))
