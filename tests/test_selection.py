"""Distributed selection operator: exact agreement with sorted order across
ranks, including forced multi-round narrowing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cbde_mapreduce_spark.operators.selection import kth_smallest
from cbde_mapreduce_spark.sources import load_table


@pytest.fixture(scope="module")
def values(spark, sf_oracle):
    df = load_table(spark, sf_oracle, "orders").select("o_totalprice")
    vals = sorted(r[0] for r in df.collect())
    return df, vals


@pytest.mark.parametrize("frac", [0.0, 0.25, 0.5, 0.75, 1.0])
def test_matches_sorted_rank(spark, values, frac):
    df, vals = values
    k = max(1, int(round(frac * (len(vals) - 1))) + 1)
    assert kth_smallest(df, "o_totalprice", k) == vals[k - 1]


def test_multi_round_narrowing_is_exact(spark, values):
    # final_limit=16 forces several histogram rounds before the finish
    df, vals = values
    k = len(vals) // 2
    got = kth_smallest(df, "o_totalprice", k, buckets=8, final_limit=16)
    assert got == vals[k - 1]


def test_k_out_of_range_raises(spark, values):
    df, vals = values
    with pytest.raises(ValueError):
        kth_smallest(df, "o_totalprice", 0)
    with pytest.raises(ValueError):
        kth_smallest(df, "o_totalprice", len(vals) + 1)


def test_ignores_nulls(spark):
    df = spark.createDataFrame(
        [(1.0,), (None,), (3.0,), (None,), (2.0,)], "x double"
    )
    assert kth_smallest(df, "x", 2) == 2.0
