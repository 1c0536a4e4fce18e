"""Oracle-differential tests for every registered query (SURVEY.md §5.1).

Runs each queries() entry against its DuckDB oracle at sf0.01 — the same
scale factor and engine the verification driver uses, with a stricter
(cell-exact) comparison.
"""

from __future__ import annotations


import pytest

from cbde_mapreduce_spark.plans import REGISTRY
from tests.parity import assert_parity

pytestmark = pytest.mark.slow  # value-parity/property/scale tier: excluded from the driver-visible default run (pytest.ini)

ORACLED = sorted(n for n, s in REGISTRY.items() if s.oracle)
ROWS_ONLY = sorted(n for n, s in REGISTRY.items() if not s.oracle)


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_parity_sf001(name, spark, sf_oracle):
    spec = REGISTRY[name]
    assert_parity(spec.fn(spark, sf_oracle), spec.oracle, sf_oracle, name=name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(name, spark, sf_oracle):
    """Non-SQL-expressible ops at least run and return a stable schema."""
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_oracle)
    assert df.columns, f"{name}: no columns"
    assert df.count() >= 0
