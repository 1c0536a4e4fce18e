"""ADVICE r11 (money.py): per-row quantized-integer cross-engine equality
for one transcendental site per family (ln, c·ln c, exp, pow).

Aggregate parity can mask a lone libm-divergent row (flips can cancel in
a sum); these tests compare the quantized integers ROW BY ROW through
the same assert_parity harness, so a last-ulp ln/exp/pow disagreement at
a half-grid boundary is caught at the exact row it happens on. The same
probes run against every rolled dup corpus in tools_dup_value_sweep.py.
"""

from __future__ import annotations


import pytest

from cbde_mapreduce_spark.plans.rowlevel import (
    ROWLEVEL_BOUNDED,
    ROWLEVEL_PROBES,
    assert_bounded_rowlevel,
)
from tests.parity import assert_parity

pytestmark = pytest.mark.slow  # value-parity/property/scale tier: excluded from the driver-visible default run (pytest.ini)


@pytest.mark.parametrize(
    "name,fn,sql", ROWLEVEL_PROBES, ids=[p[0] for p in ROWLEVEL_PROBES]
)
def test_rowlevel_transcendental_grid(name, fn, sql, spark, sf_oracle):
    assert_parity(fn(spark, sf_oracle), sql, sf_oracle, name=name)


@pytest.mark.parametrize(
    "name,fn,sql,keys,max_abs,max_cells",
    ROWLEVEL_BOUNDED,
    ids=[p[0] for p in ROWLEVEL_BOUNDED],
)
def test_rowlevel_bounded_divergence(
    name, fn, sql, keys, max_abs, max_cells, spark, sf_oracle
):
    """The KL@1e15 family measurably hits the half-grid boundary (one
    q_ba cell at sf0.01, one unit off — caught by this probe's first
    run); the production aggregate's 6dp rounding absorbs that class.
    This pins the divergence INSIDE the absorbable class."""
    assert_bounded_rowlevel(
        fn(spark, sf_oracle), sql, sf_oracle, keys, max_abs, max_cells, name
    )
