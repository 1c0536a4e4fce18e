"""Misra-Gries mergeable heavy-hitter summary: the counter-based guarantees,
asserted against exact counts (the same discipline as the count-min tests)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cbde_mapreduce_spark.operators.sketches import mg_heavy_hitters
from cbde_mapreduce_spark.sources import load_table

K = 8


@pytest.fixture(scope="module")
def stream(spark, sf_oracle):
    docs = load_table(spark, sf_oracle, "documents")
    tok = docs.select(
        F.explode(F.split(F.lower("text"), " ")).alias("word")
    ).filter(F.col("word") != "")
    exact = {
        r["word"]: r["c"]
        for r in tok.groupBy("word").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    return tok, exact, sum(exact.values())


def _assert_guarantees(est, exact, n, k):
    band = n / (k + 1)
    for item, e in est.items():
        true = exact.get(item, 0)
        assert e <= true, f"{item}: MG must never overcount ({e} > {true})"
        assert e >= true - band, f"{item}: below the n/(k+1) band"
    for item, true in exact.items():
        if true > band:
            assert item in est, f"heavy hitter {item} (true={true}) missed"


def test_mg_guarantees_hold(spark, stream):
    tok, exact, n = stream
    est = {r["item"]: r["est"] for r in mg_heavy_hitters(tok, "word", K).collect()}
    assert est, "summary is empty"
    _assert_guarantees(est, exact, n, K)


@pytest.mark.parametrize("parts", [1, 3, 13])
def test_mg_guarantees_partitioning_invariant(spark, stream, parts):
    tok, exact, n = stream
    est = {
        r["item"]: r["est"]
        for r in mg_heavy_hitters(tok.repartition(parts), "word", K).collect()
    }
    _assert_guarantees(est, exact, n, K)


def test_mg_exact_when_k_covers_vocabulary(spark, stream):
    tok, exact, n = stream
    big_k = len(exact) + 5  # never decrements -> exact counts
    est = {
        r["item"]: r["est"] for r in mg_heavy_hitters(tok, "word", big_k).collect()
    }
    assert est == exact
