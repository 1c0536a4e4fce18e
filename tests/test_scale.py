"""Scale-consistency checks (SURVEY.md §5.5): results must grow coherently
across scale factors — a partition-sensitive bug shows up as instability."""

from __future__ import annotations


import pytest

from cbde_mapreduce_spark.plans import REGISTRY

pytestmark = pytest.mark.slow  # value-parity/property/scale tier: excluded from the driver-visible default run (pytest.ini)

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


@pytest.mark.parametrize(
    "name",
    [
        "q1_pricing_summary",
        "histogram_event_types",
        "global_agg_lineitem",
        # round-3 additions with count-bearing outputs over tables that
        # actually grow between sf0.001 and sf0.01 (documents does NOT —
        # 500 rows at both, different content)
        "window_dedup_events",
        "table_diff_cdc",
        "degree_histogram_trade_graph",
        # round-4 additions (events/orders-backed; count columns grow)
        "ohlc_bars_events",
        "concurrent_sessions_peak",
        "mutual_information_events",
        "winsorize_order_value",
        "key_skew_profile",
        "chi2_event_weekday",
        "funnel_ttc_percentiles",
    ],
)
def test_counts_grow_with_sf(name, spark):
    small = REGISTRY[name].fn(spark, SFS[0]).toPandas()
    big = REGISTRY[name].fn(spark, SFS[1]).toPandas()
    count_cols = [c for c in small.columns if c.startswith(("n", "count", "cnt"))]
    assert count_cols
    for c in count_cols:
        assert small[c].sum() < big[c].sum()


def test_results_stable_across_partitioning(spark, sf_smoke):
    """Same query, different shuffle partitioning → identical results."""
    from cbde_mapreduce_spark.sources import load_table

    df1 = REGISTRY["sessionize_events"].fn(spark, sf_smoke).toPandas()
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        df2 = REGISTRY["sessionize_events"].fn(spark, sf_smoke).toPandas()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    key = ["user_id", "sess"]
    assert df1.sort_values(key).reset_index(drop=True).equals(
        df2.sort_values(key).reset_index(drop=True)
    )
