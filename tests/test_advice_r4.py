"""Regression tests for the round-4 advisor findings.

The shipped fixtures contain no tied-timestamp click pairs, no tf-idf
weight within an ulp of the rank-50 boundary, and no all-NULL prefix-sum
partition, so the sf0.01 parity sweep could not catch:

1. ``attribution_last_touch``: the carried struct was max(cts, ck) — two
   clicks for one user at an IDENTICAL ts resolved by the larger channel
   key, while the streaming twin (streaming/stateful.py::
   _attribute_purchases) keeps the later event_id's k. The struct now
   carries (cts, ceid, ck) so ties resolve by event order in batch,
   streaming, and the DuckDB oracle alike.
2. ``sparse_cosine_topk_docs``: the per-doc top-50 prefix filter cut on a
   raw double w = tf * ln(nd/df + 1); JVM Math.log and libm log are each
   ~1-ulp accurate, so a near-tie at the boundary could flip membership
   cross-engine. w is now rounded to 9 dp in plan AND oracle.
3. ``operators/prefix.py::exclusive_prefix_sum``: a partition whose
   value_col is entirely NULL sums to None and itertools.accumulate
   raised TypeError. Totals are now NULL-coalesced like
   exclusive_prefix_min's.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from cbde_mapreduce_spark.operators.prefix import exclusive_prefix_sum
from cbde_mapreduce_spark.plans import REGISTRY
from tests.parity import canonicalize

# --- 1. attribution tie on identical click timestamps ----------------------

_T0 = pd.Timestamp("2024-03-01 12:00:00")

_TIE_EVENTS = pd.DataFrame(
    {
        # user 1: two clicks at the SAME ts; the later event_id (11) carries
        # the SMALLER k (1) — struct-max on (cts, ck) would wrongly pick
        # k=3 from event 10. user 2: control, single click then purchase.
        "event_id": [10, 11, 12, 20, 21],
        "ts": [_T0, _T0, _T0 + pd.Timedelta(hours=1), _T0, _T0 + pd.Timedelta(hours=2)],
        "user_id": [1, 1, 1, 2, 2],
        "event_type": ["click", "click", "purchase", "click", "purchase"],
        "value": [None, None, 50.0, None, 20.0],
        "props": ['{"k": 3}', '{"k": 1}', None, '{"k": 2}', None],
    }
)


@pytest.fixture(scope="module")
def tie_events_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("tie_events")
    df = _TIE_EVENTS.copy()
    df["ts"] = df["ts"].astype("datetime64[us]")
    df.to_parquet(d / "events.parquet", index=False)
    return str(d)


def _oracle(sql: str, sf_dir: str, tables: list[str]) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in tables:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        return con.sql(sql).df()
    finally:
        con.close()


def _assert_parity(spark, name: str, sf_dir: str, tables: list[str]) -> pd.DataFrame:
    spec = REGISTRY[name]
    got = canonicalize(spec.fn(spark, sf_dir).toPandas())
    want = canonicalize(_oracle(spec.oracle, sf_dir, tables))
    assert list(got.columns) == list(want.columns), name
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    return got


def test_attribution_tied_click_ts_resolves_by_event_order(spark, tie_events_dir):
    got = _assert_parity(spark, "attribution_last_touch", tie_events_dir, ["events"])
    chans = dict(zip(got["channel"], got["n_purchases"]))
    # user 1's purchase must credit the LATER click (event 11, k=1 -> ch1),
    # not the larger channel key (k=3 -> ch3).
    assert chans == {"ch1": 1, "ch2": 1}, chans


def test_attribution_tied_click_matches_streaming_kernel(spark, tie_events_dir):
    """Batch and streaming kernels agree on the tied-ts click."""
    from cbde_mapreduce_spark.streaming.stateful import run_stateful_attribution

    rows = run_stateful_attribution(spark, tie_events_dir).collect()
    stream_chan = {r["user_id"]: r["channel"] for r in rows}
    assert stream_chan == {1: "ch1", 2: "ch2"}, stream_chan


# --- 2. sparse-cosine rank-50 boundary determinism --------------------------


def test_sparse_cosine_boundary_corpus_parity(spark, tmp_path_factory):
    """Docs with >50 distinct terms exercise the per-doc prefix cutoff;
    many equal-weight terms sit exactly at the rank-50 boundary, where the
    9-dp rounding + (w DESC, term) tiebreak must agree cross-engine."""
    terms = [f"t{i:03d}" for i in range(70)]
    # doc 0 and doc 1 share all 70 terms with tf=1 (all w equal -> the
    # boundary is pure tiebreak); doc 2 repeats a disjoint subset so df
    # varies and some weights land on non-terminating ln values.
    texts = [
        " ".join(terms),
        " ".join(terms),
        " ".join(terms[:35] * 2),
    ]
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": texts,
            "lang": ["en"] * 3,
            "source": ["edge"] * 3,
            "n_chars": [len(t) for t in texts],
        }
    )
    d = tmp_path_factory.mktemp("boundary_docs")
    docs.to_parquet(d / "documents.parquet", index=False)
    _assert_parity(spark, "sparse_cosine_topk_docs", str(d), ["documents"])


# --- 3. prefix-sum over an all-NULL partition --------------------------------


def test_exclusive_prefix_sum_all_null_partition(spark):
    """Orders 1..100 carry NULL values; with 4 range partitions at least
    one partition is entirely NULL and its total must contribute 0 (the
    pre-fix code raised TypeError in itertools.accumulate)."""
    pdf = pd.DataFrame(
        {
            "k": list(range(1, 201)),
            "v": [None] * 100 + [1] * 100,
        }
    )
    df = spark.createDataFrame(pdf.astype({"v": "Int64"}))
    out = exclusive_prefix_sum(df, "k", "v", out_col="off", num_partitions=4)
    got = {r["k"]: r["off"] for r in out.collect()}
    expect = {}
    run = 0
    for k, v in zip(pdf["k"], pdf["v"]):
        expect[k] = run
        run += 0 if pd.isna(v) else int(v)
    assert got == expect
