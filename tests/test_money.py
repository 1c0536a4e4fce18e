"""Cross-engine equivalence of the plans/money.py discipline itself.

The round-11 exactness sweep rests on a small set of claims; this module
tests them DIRECTLY instead of only through the 92 converted queries:

1. The Spark unit expressions (cents / disc_units / charge_units /
   promo_units) and their documented SQL twins produce IDENTICAL values
   on the same rows — including adversarial cent values chosen to sit as
   close to representation boundaries as cent-quantized doubles get.
2. Exact integer sums are partitioning-invariant BY CONSTRUCTION: the
   same data summed under 1, 7, and 32 partitions yields bit-identical
   results (the property whose absence was the round-10 flake class —
   a double sum cannot promise this).
3. The cents transform is total on the fixture domain: every monetary
   column in every shipped SF round-trips exactly (round(x*100) lands
   within 1e-4 of an integer, never near a half-cent tie).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cbde_mapreduce_spark.plans.money import (
    avg_money,
    charge_units,
    cents,
    disc_units,
    promo_units,
    sum_money,
    sum_units,
)

#: adversarial cent values: max-magnitude fixture-like prices, values whose
#: binary representation error is largest relative to the cent grid, sign
#: flips, and zero.
_PRICES = [
    0.0, 0.01, -0.01, 0.07, 0.29, 901.82, 104997.88, 499978.59,
    -994.28, 9997.41, 123456.78, 0.1 + 0.2,  # 0.30000000000000004
    555555.55, -0.05, 49002.13,
]
_DISCOUNTS = [0.00, 0.01, 0.04, 0.05, 0.09, 0.10]
_TAXES = [0.00, 0.02, 0.08]


def _frame(spark):
    rows = []
    i = 0
    for p in _PRICES:
        d = _DISCOUNTS[i % len(_DISCOUNTS)]
        t = _TAXES[i % len(_TAXES)]
        rows.append((i, p, d, t))
        i += 1
    return (
        spark.createDataFrame(rows, "id bigint, ep double, d double, t double"),
        pd.DataFrame(rows, columns=["id", "ep", "d", "t"]),
    )


def _duck(pdf: pd.DataFrame, sql: str):
    con = duckdb.connect()
    try:
        con.register("r", pdf)
        return con.sql(sql).df()
    finally:
        con.close()


def test_unit_expressions_match_sql_twins(spark):
    df, pdf = _frame(spark)
    got = (
        df.select(
            "id",
            cents("ep").alias("c"),
            disc_units(F.col("ep"), F.col("d")).alias("du"),
            charge_units(F.col("ep"), F.col("d"), F.col("t")).alias("cu"),
            promo_units(F.col("ep"), F.col("d")).alias("pu"),
        )
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    want = _duck(
        pdf,
        """
        SELECT id,
               round(ep * 100)::bigint AS c,
               (round(ep * 100)::bigint
                * (100 - round(d * 100)::bigint))::decimal(38,0) AS du,
               (round(ep * 100)::bigint
                * (100 - round(d * 100)::bigint)
                * (100 + round(t * 100)::bigint))::decimal(38,0) AS cu,
               (round(ep * 100)::bigint
                * round(d * 100)::bigint)::decimal(38,0) AS pu
        FROM r ORDER BY id
        """,
    ).reset_index(drop=True)
    for col in ("c", "du", "cu", "pu"):
        g = [int(v) for v in got[col]]
        w = [int(v) for v in want[col]]
        assert g == w, (col, g, w)


def test_sum_and_avg_match_sql_twins(spark):
    df, pdf = _frame(spark)
    got = df.agg(
        sum_money("ep").alias("s2"),
        avg_money("ep", 6).alias("a6"),
        sum_units(disc_units(F.col("ep"), F.col("d")), 4).alias("rev"),
        sum_units(charge_units(F.col("ep"), F.col("d"), F.col("t")), 6).alias(
            "chg"
        ),
    ).toPandas()
    want = _duck(
        pdf,
        """
        SELECT round(sum(round(ep * 100)::bigint) / 100.0, 2) AS s2,
               round(sum(round(ep * 100)::bigint) / 100.0 / count(ep), 6)
                 AS a6,
               round(sum((round(ep * 100)::bigint
                          * (100 - round(d * 100)::bigint))::decimal(38,0)
                        )::double / 10000.0, 2) AS rev,
               round(sum((round(ep * 100)::bigint
                          * (100 - round(d * 100)::bigint)
                          * (100 + round(t * 100)::bigint))::decimal(38,0)
                        )::double / 1000000.0, 2) AS chg
        FROM r
        """,
    )
    for col in ("s2", "a6", "rev", "chg"):
        assert float(got[col].iloc[0]) == float(want[col].iloc[0]), (
            col,
            got[col].iloc[0],
            want[col].iloc[0],
        )


@pytest.mark.parametrize("parts", [1, 7, 32])
def test_exact_sums_partitioning_invariant(spark, sf_oracle, parts):
    """The property the whole sweep buys: identical results at ANY
    partition count. (A double sum gives no such guarantee — its partial
    merge order follows scheduling.)"""
    li = (
        spark.read.parquet(f"{sf_oracle}/lineitem.parquet")
        .repartition(parts)
    )
    row = li.agg(
        F.sum(cents("l_extendedprice")).alias("sc"),
        F.sum(disc_units()).alias("du"),
        F.sum(charge_units()).alias("cu"),
    ).collect()[0]
    # pin against the single-partition truth computed via DuckDB
    want = duckdb.sql(
        f"""
        SELECT sum(round(l_extendedprice * 100)::bigint) AS sc,
               sum((round(l_extendedprice * 100)::bigint
                    * (100 - round(l_discount * 100)::bigint))::decimal(38,0))
                 AS du,
               sum((round(l_extendedprice * 100)::bigint
                    * (100 - round(l_discount * 100)::bigint)
                    * (100 + round(l_tax * 100)::bigint))::decimal(38,0)) AS cu
        FROM '{sf_oracle}/lineitem.parquet'
        """
    ).fetchone()
    assert int(row["sc"]) == int(want[0])
    assert int(row["du"]) == int(want[1])
    assert int(row["cu"]) == int(want[2])


def test_fixture_money_columns_are_cent_quantized():
    """The precondition of the whole discipline, asserted on every shipped
    SF: x*100 always lands within 1e-4 of an integer (representation noise
    only — never anywhere near a half-cent tie)."""
    cols = {
        "orders": ["o_totalprice"],
        "customer": ["c_acctbal"],
        "supplier": ["s_acctbal"],
        "lineitem": ["l_extendedprice", "l_discount", "l_tax"],
        "part": ["p_retailprice"],
        "events": ["value"],
    }
    con = duckdb.connect()
    try:
        for sf in ("sf0.001", "sf0.01", "sf0.1"):
            for t, cs in cols.items():
                for c in cs:
                    n = con.sql(
                        f"SELECT count(*) FROM '/root/testdata/{sf}/{t}.parquet' "
                        f"WHERE abs({c} * 100 - round({c} * 100)) > 1e-4"
                    ).fetchone()[0]
                    assert n == 0, (sf, t, c, n)
    finally:
        con.close()
