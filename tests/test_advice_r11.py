"""Round-11 ADVICE regressions (ADVICE.md, r10 judge pass).

1. HIGH — item_item_cf_topk popularity universe: the oracle's incidence
   CTE used to keep (NULL, p) rows (the equi-join only hides NULLs from
   the PAIR side), so pop's denominators counted a phantom NULL customer
   while the Spark plan filtered it — cosine 1.0 vs 0.909 on the corpus
   below. The existing NULL-FK sweep passed only VACUOUSLY because no
   pair survives co >= 5 on the 50%-nulled sf0.001 fixture. This corpus
   plants pairs that DO survive the support floor right next to
   NULL-custkey orders buying the same parts, so the aligned NULL filter
   in the oracle's b CTE is load-bearing, not decorative.

2. MEDIUM — conformal_interval_orders' degenerate-fit guard computed
   n*sxx - sx*sx in bigint; with far-future order dates (x ~ 2.9e6 days)
   and ~1k calibration rows the product exceeds int64 and ANSI raises at
   a scale tier where the double slope expression is perfectly happy.
   The guard now tests the same DOUBLE expression the slope divides by.
   The corpus below is sized so the bigint product provably overflows
   (asserted from exact Python integers, so the test cannot go vacuous
   if fixture sizes change).
"""

from __future__ import annotations

import datetime
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cbde_mapreduce_spark.plans import REGISTRY
from cbde_mapreduce_spark.sources import TABLES
from tests.parity import assert_parity

_SRC_SF = "/root/testdata/sf0.001"


def _write_orders(path: str, rows: list[tuple]) -> None:
    """rows = (o_orderkey, o_custkey|None, status, totalprice, date, prio)."""
    tbl = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
            "o_orderstatus": pa.array([r[2] for r in rows], pa.string()),
            "o_totalprice": pa.array([r[3] for r in rows], pa.float64()),
            "o_orderdate": pa.array([r[4] for r in rows], pa.timestamp("us")),
            "o_orderpriority": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, path)


def _write_lineitem(path: str, rows: list[tuple]) -> None:
    """rows = (l_orderkey, l_partkey, l_linenumber)."""
    n = len(rows)
    tbl = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
            "l_suppkey": pa.array([1] * n, pa.int64()),
            "l_linenumber": pa.array([r[2] for r in rows], pa.int32()),
            "l_quantity": pa.array([1.0] * n, pa.float64()),
            "l_extendedprice": pa.array([100.0] * n, pa.float64()),
            "l_discount": pa.array([0.0] * n, pa.float64()),
            "l_tax": pa.array([0.0] * n, pa.float64()),
            "l_returnflag": pa.array(["N"] * n, pa.string()),
            "l_linestatus": pa.array(["O"] * n, pa.string()),
            "l_shipdate": pa.array(
                [datetime.datetime(1996, 1, 1)] * n, pa.timestamp("us")
            ),
        }
    )
    pq.write_table(tbl, path)


def _clone_fixture(dst) -> str:
    for t in TABLES:
        shutil.copy(f"{_SRC_SF}/{t}.parquet", str(dst / f"{t}.parquet"))
    return str(dst)


@pytest.fixture(scope="module")
def cf_null_sf_dir(tmp_path_factory) -> str:
    """Pairs above the co>=5 floor NEXT TO NULL-custkey orders that buy
    the same parts: customers 1-10 each buy parts {1,2,3} (three pairs at
    co=10), customers 11-16 buy {4,5} (one pair at co=6), and six
    NULL-custkey orders buy {1,2,3,6}. A popularity universe that keeps
    the (NULL, p) incidence row reads pop(1..3)=11 and every top cosine
    as 10/11; the basket universe both engines now share reads 10/10."""
    d = tmp_path_factory.mktemp("cfnull_sf")
    _clone_fixture(d)
    day = datetime.datetime(1996, 6, 1)
    orders, lines = [], []
    for c in range(1, 11):
        orders.append((c, c, "O", 1000.0, day, "1-URGENT"))
        for i, p in enumerate((1, 2, 3), 1):
            lines.append((c, p, i))
    for c in range(11, 17):
        orders.append((c, c, "O", 1000.0, day, "1-URGENT"))
        for i, p in enumerate((4, 5), 1):
            lines.append((c, p, i))
    for k in range(100, 106):
        orders.append((k, None, "O", 1000.0, day, "1-URGENT"))
        for i, p in enumerate((1, 2, 3, 6), 1):
            lines.append((k, p, i))
    _write_orders(str(d / "orders.parquet"), orders)
    _write_lineitem(str(d / "lineitem.parquet"), lines)
    return str(d)


def test_item_item_cf_null_pop_non_vacuous(spark, cf_null_sf_dir):
    spec = REGISTRY["item_item_cf_topk"]
    df = spec.fn(spark, cf_null_sf_dir)
    rows = df.toPandas()
    # non-vacuous: pairs DO survive the support floor here, and the parts
    # the NULL customers bought are among them (the regime where the old
    # oracle's phantom-pop divergence reproduces: 1.0 vs 0.925820).
    assert len(rows) >= 4, rows
    assert {(1, 2), (1, 3), (2, 3), (4, 5)} <= set(
        zip(rows["p1"].astype(int), rows["p2"].astype(int))
    )
    assert (rows["cosine"] == 1.0).all(), rows
    assert_parity(df, spec.oracle, cf_null_sf_dir, name="item_item_cf_topk")


@pytest.fixture(scope="module")
def far_future_sf_dir(tmp_path_factory) -> str:
    """3000 orders dated 9890-9905: x = days since 1995-01-01 ~ 2.9e6, so
    the calibration half's n*sxx lands ~1e20 — far past int64 — while the
    double fit is well-conditioned."""
    d = tmp_path_factory.mktemp("farfuture_sf")
    _clone_fixture(d)
    orders = []
    for k in range(1, 3001):
        dt = datetime.datetime(9890, 1, 1) + datetime.timedelta(
            days=(k * 7) % 5600
        )
        price = 1000.0 + (k % 997) + (k % 100) / 100.0
        orders.append((k, 1 + k % 50, "O", price, dt, "1-URGENT"))
    _write_orders(str(d / "orders.parquet"), orders)
    return str(d)


def test_conformal_guard_survives_int64_scale(spark, far_future_sf_dir):
    import hashlib

    epoch = datetime.date(1995, 1, 1)
    n = sx = sxx = 0
    for k in range(1, 3001):
        dt = datetime.date(9890, 1, 1) + datetime.timedelta(days=(k * 7) % 5600)
        h = hashlib.md5(str(k).encode()).hexdigest()
        if (ord(h[0]) * 256 + ord(h[1])) % 100 < 50:
            x = (dt - epoch).days
            n, sx, sxx = n + 1, sx + x, sxx + x * x
    # non-vacuous: the OLD bigint guard would overflow on this corpus
    assert n * sxx > 2**63 - 1, (n, sxx)
    spec = REGISTRY["conformal_interval_orders"]
    df = spec.fn(spark, far_future_sf_dir)
    out = df.toPandas()
    assert len(out) == 1 and out["n_cal"].iloc[0] == n
    assert_parity(
        df, spec.oracle, far_future_sf_dir, name="conformal_interval_orders"
    )


def test_conformal_sf001_parity_unchanged(spark, sf_oracle):
    """The double guard changes nothing at fixture scale."""
    spec = REGISTRY["conformal_interval_orders"]
    assert_parity(
        spec.fn(spark, sf_oracle), spec.oracle, sf_oracle,
        name="conformal_interval_orders",
    )



def test_duckdb_list_reduce_struct_quirk():
    """Round-11 rows-only adjudication artifact: DuckDB 1.0.0's
    list_reduce mis-evaluates STRUCT-typed accumulators on some value
    sequences — on the 43-delta sequence below (extracted from the sf0.01
    events fixture, user 0) the struct fold reports one MORE floor hit
    than the identical list-typed fold and the Python left-fold reference.
    capped_running_balance's oracle therefore folds a [bal, caps, floors]
    LIST accumulator. If this test ever fails on the struct assertion, the
    installed DuckDB fixed the quirk and the struct form may be used again.
    """
    import duckdb

    ds = [0, 0, 0, 0, 5337, -8961, -3045, 0, 0, 512, 0, 0, -4283, -1580,
          0, 0, -13338, 0, 0, 0, 0, 0, 0, 259, 977, 0, 0, 3049, 64, 1298,
          0, -9846, -2331, 0, -659, 0, 0, 697, 7091, 0, 0, 978, -7819]
    bal = hi = lo = 0
    for d in ds:
        pre = bal + d
        if pre > 50000:
            bal, hi = 50000, hi + 1
        elif pre < 0:
            bal, lo = 0, lo + 1
        else:
            bal = pre
    con = duckdb.connect()
    try:
        lst = ",".join(f"[{d}::bigint, 0::bigint, 0::bigint]" for d in ds)
        got_list = con.sql(
            f"""SELECT list_reduce(
                  list_prepend([0::bigint, 0::bigint, 0::bigint], [{lst}]),
                  (a, x) -> [greatest(least(a[1] + x[1], 50000), 0),
                             a[2] + CASE WHEN a[1] + x[1] > 50000
                                         THEN 1 ELSE 0 END,
                             a[3] + CASE WHEN a[1] + x[1] < 0
                                         THEN 1 ELSE 0 END])"""
        ).fetchone()[0]
        # the form the oracle relies on MUST match the reference fold
        assert got_list == [bal, hi, lo], (got_list, [bal, hi, lo])

        slst = ",".join(
            f"{{'b': {d}::bigint, 'h': 0::bigint, 'l': 0::bigint}}"
            for d in ds
        )
        got_struct = con.sql(
            f"""SELECT list_reduce(
                  list_prepend(
                      {{'b': 0::bigint, 'h': 0::bigint, 'l': 0::bigint}},
                      [{slst}]),
                  (a, x) -> {{
                      'b': greatest(least(a.b + x.b, 50000), 0),
                      'h': a.h + CASE WHEN a.b + x.b > 50000
                                      THEN 1 ELSE 0 END,
                      'l': a.l + CASE WHEN a.b + x.b < 0
                                      THEN 1 ELSE 0 END}})"""
        ).fetchone()[0]
        # the pinned quirk: one extra floor hit from the struct fold
        assert got_struct["b"] == bal
        assert got_struct["l"] == lo + 1, (
            "DuckDB fixed the struct-accumulator list_reduce quirk — the "
            "struct form may be used in oracles again",
            got_struct,
        )
    finally:
        con.close()


def test_capbal_fold_null_delta_propagates():
    """ADVICE r12 (high): DuckDB's least/greatest IGNORE NULLs
    (least(NULL, 5) = 5 on the pinned 1.0.0), so the bare clamp
    greatest(least(a[1]+x[1], cap), 0) COLLAPSES a NULL-delta step to the
    cap and keeps accumulating, while the pandas kernel permanently
    poisons the balance to NULL and freezes the counters. The oracle's
    balance slot therefore propagates NULL explicitly via CASE. This test
    folds [+100, NULL, +200] (the advice's repro) plus a cap/floor-hitting
    tail through BOTH forms: the fixed form must match the Python kernel
    (NULL balance, counters frozen at their pre-NULL values); the bare
    form must still exhibit the collapse (if it stops doing so, DuckDB
    changed least/greatest NULL semantics and this pin should be
    revisited).
    """
    import duckdb

    from cbde_mapreduce_spark.plans.udfs import _BAL_CAP_C

    # +100.00, NULL, +200.00, then deltas that would hit cap and floor if
    # the fold kept accumulating
    ds = ["10000", "NULL", "20000", "90000", "-999999"]
    # Python kernel reference: NULL poisons, counters freeze
    bal, hi, lo = 0, 0, 0
    for d in ds:
        if d == "NULL":
            bal = None
        elif bal is not None:
            bal = bal + int(d)
        if bal is not None:
            if bal > _BAL_CAP_C:
                bal, hi = _BAL_CAP_C, hi + 1
            elif bal < 0:
                bal, lo = 0, lo + 1
    assert bal is None and hi == 0 and lo == 0

    lst = ",".join(f"[{d}::bigint, 0::bigint, 0::bigint]" for d in ds)
    con = duckdb.connect()
    try:
        fixed = con.sql(
            f"""SELECT list_reduce(
                  list_prepend([0::bigint, 0::bigint, 0::bigint], [{lst}]),
                  (a, x) -> [
                      CASE WHEN a[1] IS NULL OR x[1] IS NULL THEN NULL
                           ELSE greatest(least(a[1] + x[1],
                                               {_BAL_CAP_C}), 0) END,
                      a[2] + CASE WHEN a[1] + x[1] > {_BAL_CAP_C}
                                  THEN 1 ELSE 0 END,
                      a[3] + CASE WHEN a[1] + x[1] < 0
                                  THEN 1 ELSE 0 END])"""
        ).fetchone()[0]
        assert fixed == [None, 0, 0], fixed

        bare = con.sql(
            f"""SELECT list_reduce(
                  list_prepend([0::bigint, 0::bigint, 0::bigint], [{lst}]),
                  (a, x) -> [
                      greatest(least(a[1] + x[1], {_BAL_CAP_C}), 0),
                      a[2] + CASE WHEN a[1] + x[1] > {_BAL_CAP_C}
                                  THEN 1 ELSE 0 END,
                      a[3] + CASE WHEN a[1] + x[1] < 0
                                  THEN 1 ELSE 0 END])"""
        ).fetchone()[0]
        # the pinned wrong behavior of the bare form: NULL step collapses
        # to the cap (least IGNORE NULLs) and the fold keeps going
        assert bare[0] is not None and bare != [None, 0, 0], bare
    finally:
        con.close()
