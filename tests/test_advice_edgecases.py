"""Regression tests for short-document edge cases (round-3 advisor findings).

The fixtures happen to contain no document with <3 tokens and no pair of
identical sub-50-char documents, so the sf0.01 parity sweep could not catch:

1. ``heaps_law_fit``: ``sequence(1, 0)`` yields ``[1, 0]`` on Spark (default
   step -1 when start > stop), and ``ws[i-1]`` with ``i=0`` throws
   ``SparkArrayIndexOutOfBoundsException`` under Spark 4's ANSI mode — one
   empty or 1-2-token document crashed the whole query before the guard.
2. ``substring_dup_spans``: the same ``[1, 0]`` pattern emitted two phantom
   shingle rows per sub-k-char document, so two IDENTICAL short docs made
   Spark report duplicate spans the DuckDB oracle (bounded by
   ``WHERE i <= length(text)-k+1``) does not.

Both tests run the full Spark-vs-DuckDB parity check on a synthetic
documents table that contains exactly those pathological rows.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from cbde_mapreduce_spark.plans import REGISTRY
from tests.parity import canonicalize

_LONG_A = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "shared-run-0123456789-abcdefghijklmnopqrstuvwxyz-end tail one"
)
_LONG_B = (
    "completely different head words here preceding the common block "
    "shared-run-0123456789-abcdefghijklmnopqrstuvwxyz-end tail two"
)

_EDGE_DOCS = pd.DataFrame(
    {
        "doc_id": [0, 1, 2, 3, 4, 5, 6, 7],
        "text": [
            "",  # empty -> split gives [''], size 1
            "one",  # 1 token
            "two words",  # 2 tokens: the largest still-degenerate case
            "identical short doc",  # < 50 chars ...
            "identical short doc",  # ... duplicated exactly
            _LONG_A,  # >= 50 chars, shares a 50-char run with _LONG_B
            _LONG_B,
            "plain long document with enough tokens to form trigrams "
            "and more than fifty characters of unique content overall",
        ],
        "lang": ["en"] * 8,
        "source": ["edge"] * 8,
        "n_chars": [0, 3, 9, 19, 19, len(_LONG_A), len(_LONG_B), 113],
    }
)


@pytest.fixture(scope="module")
def edge_docs_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("edge_docs")
    _EDGE_DOCS.to_parquet(d / "documents.parquet", index=False)
    return str(d)


def _docs_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        con.sql(
            f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        return con.sql(sql).df()
    finally:
        con.close()


def _assert_edge_parity(spark, name: str, sf_dir: str) -> None:
    spec = REGISTRY[name]
    got = canonicalize(spec.fn(spark, sf_dir).toPandas())
    want = canonicalize(_docs_oracle(spec.oracle, sf_dir))
    assert list(got.columns) == list(want.columns), name
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_heaps_law_survives_short_docs(spark, edge_docs_dir):
    """<3-token docs contribute zero trigrams instead of crashing ANSI."""
    _assert_edge_parity(spark, "heaps_law_fit", edge_docs_dir)


def test_bigram_queries_survive_single_token_docs(spark, edge_docs_dir):
    """Single-token docs (incl. the empty doc, which splits to [''])
    contribute zero bigrams — without the size>=2 guard, sequence(1, 0)
    -> [1, 0] makes element_at(toks, 0) throw INVALID_INDEX_OF_ZERO and
    one such doc kills the whole query."""
    _assert_edge_parity(spark, "pmi_bigrams_top", edge_docs_dir)
    _assert_edge_parity(spark, "bigram_lm_score_docs", edge_docs_dir)


def test_substring_dup_short_docs_no_phantom_spans(spark, edge_docs_dir):
    """Identical sub-k-char docs produce NO spans; the shared 50-char run
    between the two long docs is still detected identically by both
    engines."""
    _assert_edge_parity(spark, "substring_dup_spans", edge_docs_dir)
    # and the positive signal is present: both long docs carry >= 1 span
    rows = {
        r["doc_id"]: r
        for r in REGISTRY["substring_dup_spans"]
        .fn(spark, edge_docs_dir)
        .collect()
    }
    assert set(rows) == {5, 6}, "only the two long docs share a 50-char run"
    assert all(r["n_spans"] >= 1 for r in rows.values())
