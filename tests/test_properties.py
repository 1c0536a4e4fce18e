"""Property-based invariants on generated inputs (SURVEY.md §5.4)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

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
