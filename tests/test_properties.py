"""Property-based invariants on generated inputs (SURVEY.md §5.4)."""

from __future__ import annotations


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

import pytest

pytestmark = pytest.mark.slow  # value-parity/property/scale tier: excluded from the driver-visible default run (pytest.ini)

rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),
        st.integers(min_value=-100, max_value=100),
    ),
    min_size=0,
    max_size=30,
)

COMMON = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(a=rows, b=rows)
@settings(**COMMON)
def test_union_counts(spark, a, b):
    da = spark.createDataFrame(a or [(0, 0)], "k int, v int").limit(len(a))
    db = spark.createDataFrame(b or [(0, 0)], "k int, v int").limit(len(b))
    assert da.unionByName(db).count() == da.count() + db.count()


@given(a=rows, b=rows)
@settings(**COMMON)
def test_inner_join_row_bounds(spark, a, b):
    da = spark.createDataFrame(a or [(0, 0)], "k int, v int").limit(len(a))
    db = spark.createDataFrame(b or [(0, 0)], "k int, v int").limit(len(b))
    n = da.join(db, "k").count()
    assert 0 <= n <= da.count() * db.count()
    # semi join never exceeds the left side
    assert da.join(db, "k", "left_semi").count() <= da.count()
    # left join preserves every left row at least once
    assert da.join(db, "k", "left").count() >= da.count()


@given(a=rows)
@settings(**COMMON)
def test_rollup_marginals(spark, a):
    da = spark.createDataFrame(a or [(0, 0)], "k int, v int").limit(len(a))
    agg = da.rollup("k").agg(F.sum("v").alias("s"), F.grouping_id().alias("g")).collect()
    total = [r.s for r in agg if r.g == 1]
    partials = [r.s or 0 for r in agg if r.g == 0]
    if total:
        assert (total[0] or 0) == sum(partials)


@given(a=rows)
@settings(**COMMON)
def test_dedup_idempotent(spark, a):
    da = spark.createDataFrame(a or [(0, 0)], "k int, v int").limit(len(a))
    d1 = da.distinct()
    assert d1.count() == d1.distinct().count()
    assert d1.exceptAll(da.distinct()).count() == 0


@given(
    s=st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=200
    )
)
@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_clean_text_idempotent(spark, s):
    """clean_text is a projection: applying it twice equals once, for ANY
    input — the invariant that makes re-running a cleaning pass safe."""
    from cbde_mapreduce_spark.functions.cleaning import clean_text

    df = spark.createDataFrame([(s,)], "t string")
    row = df.select(
        clean_text("t").alias("once"),
    ).select(
        "once", clean_text(F.col("once")).alias("twice")
    ).first()
    assert row["twice"] == row["once"]


weights = st.lists(
    st.integers(min_value=1, max_value=10_000), min_size=1, max_size=12
)


@given(w=weights, budget=st.integers(min_value=1, max_value=500))
@settings(**COMMON)
def test_largest_remainder_exact_budget(spark, w, budget):
    """Hamilton allocation: quotas are non-negative ints summing EXACTLY to
    the budget, each within 1 of the real-valued share (the property that
    defines the method)."""
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(f"s{i:02d}", c) for i, c in enumerate(w)], "source string, chars long"
    )
    t = df.agg(F.sum("chars").cast("bigint").alias("total"))
    base = df.crossJoin(F.broadcast(t)).select(
        "source",
        "chars",
        F.expr(f"({budget} * chars) div total").alias("floor_q"),
        F.expr(f"({budget} * chars) % total").alias("rem"),
        "total",
    )
    s = base.agg(F.sum("floor_q").cast("bigint").alias("allotted"))
    r = base.withColumn(
        "rk", F.row_number().over(Window.orderBy(F.desc("rem"), F.asc("source")))
    )
    out = r.crossJoin(F.broadcast(s)).select(
        "source",
        "chars",
        "total",
        (
            F.col("floor_q")
            + F.when(F.col("rk") <= budget - F.col("allotted"), 1).otherwise(0)
        ).alias("quota"),
    ).collect()
    assert sum(x.quota for x in out) == budget
    total = out[0].total
    for x in out:
        share = budget * x.chars / total
        assert x.quota >= 0
        assert abs(x.quota - share) < 1.0 + 1e-9


sessions = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=8),     # user
        st.integers(min_value=0, max_value=1000),  # start offset (s)
        st.integers(min_value=0, max_value=100),   # duration
    ),
    min_size=1,
    max_size=25,
)


@given(iv=sessions)
@settings(**COMMON)
def test_sweep_line_peak_matches_brute_force(spark, iv):
    """The distributed sweep line equals the O(n²) per-interval overlap
    count maximum (inclusive ends, one interval per (user, start)), and
    never exceeds the session count."""
    from pyspark.sql import Window

    # one interval per user like the query's per-user-day collapse
    best = {}
    for u, s, d in iv:
        lo, hi = best.get(u, (s, s + d))
        best[u] = (min(lo, s), max(hi, s + d))
    intervals = [(u, s, e) for u, (s, e) in best.items()]
    brute = max(
        sum(1 for _, s2, e2 in intervals if s2 <= t <= e2)
        for _, s, e in intervals
        for t in (s, e)
    )
    df = spark.createDataFrame(intervals, "u long, s long, e long")
    marks = df.select(
        F.explode(
            F.array(
                F.struct(F.col("s").alias("t"), F.lit(1).alias("d")),
                F.struct(F.col("e").alias("t"), F.lit(-1).alias("d")),
            )
        ).alias("m")
    ).select("m.t", "m.d")
    w = Window.orderBy(F.asc("t"), F.desc("d"))
    peak = (
        marks.withColumn("live", F.sum("d").over(w))
        .agg(F.max("live").alias("p"))
        .collect()[0]
        .p
    )
    assert peak == brute
    assert peak <= len(intervals)


@given(a=rows)
@settings(**COMMON)
def test_incremental_join_decomposition(spark, a):
    """(A0+dA) join B == A0 join B + dA join B for ANY split predicate —
    the identity behind incremental_join_maintenance."""
    da = spark.createDataFrame(a or [(0, 0)], "k int, v int").limit(len(a))
    db = spark.createDataFrame([(k, k * 10) for k in range(6)], "k int, w int")
    full = da.join(db, "k").count()
    a0 = da.filter(F.col("v") % 2 == 0)
    d_a = da.filter(F.col("v") % 2 != 0)
    assert a0.join(db, "k").count() + d_a.join(db, "k").count() == full
