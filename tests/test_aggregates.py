"""Approximate-aggregate accuracy vs exact twins (SURVEY §2.4 sketches)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cbde_mapreduce_spark.plans import REGISTRY
from cbde_mapreduce_spark.sources import load_table


def test_approx_count_distinct_accuracy(spark, sf_oracle):
    events = load_table(spark, sf_oracle, "events")
    approx = {
        r.event_type: r.approx_users
        for r in REGISTRY["approx_distinct_users"].fn(spark, sf_oracle).collect()
    }
    exact = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) / n < 0.1, (k, approx[k], n)


def test_approx_percentile_close_to_exact(spark, sf_oracle):
    approx = (
        REGISTRY["approx_percentile_values"].fn(spark, sf_oracle)
        .toPandas()
        .set_index("o_orderstatus")
    )
    exact = (
        REGISTRY["percentiles_order_value"].fn(spark, sf_oracle)
        .toPandas()
        .set_index("o_orderstatus")
    )
    for status in exact.index:
        assert abs(approx.loc[status, "p50_approx"] - exact.loc[status, "p50"]) / exact.loc[status, "p50"] < 0.02
        assert abs(approx.loc[status, "p90_approx"] - exact.loc[status, "p90"]) / exact.loc[status, "p90"] < 0.02


def test_freq_items_contains_true_heavy_hitters(spark, sf_oracle):
    got = set(
        r.frequent_word
        for r in REGISTRY["freq_items_words"].fn(spark, sf_oracle).collect()
    )
    top_true = [
        r.word for r in REGISTRY["wordcount_documents"].fn(spark, sf_oracle).collect()
    ]
    # freqItems guarantees superset of items above the support threshold
    for w in top_true[:5]:
        assert w in got, (w, sorted(got)[:10])


def test_cm_sketch_guarantees(spark, sf_oracle):
    """Count-min invariants: never undercounts; all true heavy hitters kept."""
    from pyspark.sql import functions as F

    from cbde_mapreduce_spark.operators.sketches import cm_build, cm_estimate
    from cbde_mapreduce_spark.sources import load_table

    docs = load_table(spark, sf_oracle, "documents")
    tok = docs.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
    exact = {r["word"]: r["n"] for r in tok.groupBy("word").agg(F.count(F.lit(1)).alias("n")).collect()}
    est = {
        r["word"]: r["est"]
        for r in cm_estimate(tok, "word", cm_build(tok, "word")).collect()
    }
    assert set(est) == set(exact)
    for w, n in exact.items():
        assert est[w] >= n, f"count-min undercounted {w}: {est[w]} < {n}"
    n_tokens = sum(exact.values())
    hh = REGISTRY["cm_sketch_heavy_hitters"].fn(spark, sf_oracle)
    kept = {r["word"] for r in hh.collect()}
    true_hh = {w for w, n in exact.items() if n >= 0.005 * n_tokens}
    assert true_hh <= kept, f"missing true heavy hitters: {true_hh - kept}"


def test_hll_rollup_lossless_merge_and_accuracy(spark, sf_oracle):
    """Union of daily sketches == direct weekly sketch (register-wise max is
    lossless at equal precision), and estimates land within 2% of exact."""
    from pyspark.sql import functions as F

    from cbde_mapreduce_spark.sources import load_table

    rolled = {
        r["week"]: r["est_distinct_users"]
        for r in REGISTRY["hll_rollup_daily_users"].fn(spark, sf_oracle).collect()
    }
    ev = load_table(spark, sf_oracle, "events").select(
        F.date_trunc("week", "ts").cast("timestamp_ntz").alias("week"), "user_id"
    )
    direct = {
        r["week"]: r["est"]
        for r in ev.groupBy("week")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).cast("bigint").alias("est"))
        .collect()
    }
    exact = {
        r["week"]: r["n"]
        for r in ev.groupBy("week").agg(F.count_distinct("user_id").alias("n")).collect()
    }
    assert rolled == direct, "daily-sketch rollup diverged from direct sketch"
    for wk, n in exact.items():
        assert abs(rolled[wk] - n) <= max(2, 0.02 * n), (wk, rolled[wk], n)


def test_hll_intersect_estimate_accuracy(spark, sf_oracle):
    """Inclusion-exclusion over HLL sketches must land within the combined
    sketch error of the exact |clickers ∩ purchasers|: three 2% sketches
    stack, so assert a conservative 10% relative bound."""
    from pyspark.sql import functions as F

    from cbde_mapreduce_spark.plans import REGISTRY
    from cbde_mapreduce_spark.sources import load_table

    est = REGISTRY["hll_intersect_estimate"].fn(spark, sf_oracle).first()
    ev = load_table(spark, sf_oracle, "events")
    clickers = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    purchasers = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    exact = clickers.join(purchasers, "user_id").count()
    assert exact > 0, "fixture has no overlap — test is vacuous"
    rel = abs(est["est_intersect"] - exact) / exact
    assert rel < 0.10, f"est={est['est_intersect']} exact={exact} rel={rel:.3f}"


def test_cm_build_one_pass_equals_union_build(spark, sf_oracle):
    """The one-pass explode build must produce cell-identical counters to
    the d-pass union build it replaced."""
    from pyspark.sql import functions as F

    from cbde_mapreduce_spark.operators.sketches import _cm_build_union, cm_build
    from cbde_mapreduce_spark.sources import load_table

    docs = load_table(spark, sf_oracle, "documents")
    tok = docs.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
    a = {(r["row"], r["bucket"]): r["cnt"] for r in cm_build(tok, "word").collect()}
    b = {(r["row"], r["bucket"]): r["cnt"] for r in _cm_build_union(tok, "word").collect()}
    assert a == b
