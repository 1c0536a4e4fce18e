"""Extreme-key-skew robustness sweep (round 5).

The shipped fixtures have well-distributed keys, so nothing ever exercises
the one-giant-group / one-hot-join-key regime that dominates real 100 TB
corpora (a handful of users produce most events; boilerplate text repeats
millions of times). This sweep rebuilds the sf0.001 fixtures with every
FOREIGN-key / grouping column collapsed to a single value (primary keys
stay unique, so referential integrity holds and join cardinalities stay
well-defined) and duplicate-heavy document text (3 distinct texts across
the corpus), then requires every registered query to (a) run without
crashing and (b) for oracled queries, agree with DuckDB on the row count
over the identical skewed data.

This is a CORRECTNESS gate, not a performance one: it hunts kernels that
assume key diversity — per-group pandas kernels handed one whole-table
group, (n-1)/variance math over a single giant group, quantile/bucket
logic that degenerates when every row shares one key, near-dup banding
where every doc collides into one bucket.
"""

from __future__ import annotations


import os

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from cbde_mapreduce_spark.plans import REGISTRY
from cbde_mapreduce_spark.sources import TABLES

pytestmark = pytest.mark.slow  # value-parity/property/scale tier: excluded from the driver-visible default run (pytest.ini)

_SRC_SF = "/root/testdata/sf0.001"

#: FK / grouping columns collapsed to one constant (PKs left unique).
_CONSTANT_COLS: dict[str, dict[str, object]] = {
    "events": {"user_id": 7},
    "orders": {"o_custkey": 7, "o_orderpriority": "1-URGENT"},
    "lineitem": {"l_suppkey": 1, "l_partkey": 1},
    "customer": {"c_nationkey": 3, "c_mktsegment": "BUILDING"},
    "supplier": {"s_nationkey": 3},
    "part": {},
    "nation": {"n_regionkey": 0},
    "region": {},
    "documents": {"lang": "en", "source": "web"},
    "embeddings": {"label": 0},
}


@pytest.fixture(scope="module")
def skew_sf_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("skew_sf")
    for t in TABLES:
        tbl = pq.read_table(f"{_SRC_SF}/{t}.parquet")
        for col, val in _CONSTANT_COLS.get(t, {}).items():
            i = tbl.schema.get_field_index(col)
            typ = tbl.schema.field(i).type
            const = pa.array([val] * len(tbl)).cast(typ)
            tbl = tbl.set_column(i, tbl.schema.field(i), const)
        if t == "documents":
            # duplicate-heavy corpus: every text is one of 3 values, so
            # exact/near-dup queries see giant duplicate groups and LSH
            # banding collapses into single buckets.
            i = tbl.schema.get_field_index("text")
            texts = tbl.column("text").to_pylist()
            reps = [x for x in texts[:3] if x is not None][:3] or ["fallback text"]
            skewed = [reps[j % len(reps)] for j in range(len(texts))]
            tbl = tbl.set_column(
                i, tbl.schema.field(i), pa.array(skewed, type=pa.string())
            )
            j = tbl.schema.get_field_index("n_chars")
            nchars = pa.array(
                [len(x) for x in skewed], type=tbl.schema.field(j).type
            )
            tbl = tbl.set_column(j, tbl.schema.field(j), nchars)
        pq.write_table(tbl, str(d / f"{t}.parquet"))
    return str(d)


def _sweep(
    spark,
    sf_dir: str,
    regime: str,
    known_divergence: frozenset[str] = frozenset(),
) -> None:
    """Run every registered query on ``sf_dir``; oracled queries must also
    row-count-match DuckDB over the identical files. Oracle-side crashes
    are defects too: the pair must agree on degenerate inputs.

    ``known_divergence`` names queries with a DOCUMENTED engine-level
    divergence under this regime (the docstring of the calling test must
    explain each) — they must still run crash-free, and a mismatch is
    tolerated rather than demanded (so a fix upstream turns green, not
    red)."""
    crashes: dict[str, str] = {}
    mismatches: dict[str, str] = {}
    con = duckdb.connect()
    try:
        for t in TABLES:
            path = f"{sf_dir}/{t}.parquet"
            src = f"{path}/*.parquet" if os.path.isdir(path) else path
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
        for name, spec in sorted(REGISTRY.items()):
            try:
                n_spark = len(spec.fn(spark, sf_dir).collect())
            except Exception as e:  # noqa: BLE001 — collecting a full report
                crashes[name] = (
                    f"{type(e).__name__}: {str(e).splitlines()[0][:120]}"
                )
                continue
            if not spec.oracle:
                continue
            try:
                n_oracle = len(con.sql(spec.oracle).fetchall())
            except Exception as e:  # noqa: BLE001
                crashes[name] = (
                    f"oracle: {type(e).__name__}: "
                    f"{str(e).splitlines()[0][:120]}"
                )
                continue
            if n_spark != n_oracle and name not in known_divergence:
                mismatches[name] = f"spark={n_spark} oracle={n_oracle}"
    finally:
        con.close()
    assert not crashes, f"queries crashing on {regime} input: {crashes}"
    assert not mismatches, f"{regime} row divergence: {mismatches}"


def test_every_query_survives_extreme_key_skew(spark, skew_sf_dir):
    _sweep(spark, skew_sf_dir, "one-hot-key")


@pytest.fixture(scope="module")
def same_ts_sf_dir(tmp_path_factory) -> str:
    """Every temporal column collapsed to ONE instant — the time-skew twin
    of the key-skew fixture: zero inter-event gaps (sessionization sees one
    giant session, lag/EWMA/burstiness see all-zero deltas), a single OHLC
    bar / calendar bucket, every order on one date. Tie-heavy windows must
    stay deterministic through their (ts, id) tiebreaks, and DuckDB must
    agree on the row counts over the identical data."""
    d = tmp_path_factory.mktemp("same_ts_sf")
    for t in TABLES:
        tbl = pq.read_table(f"{_SRC_SF}/{t}.parquet")
        for col in ("ts", "o_orderdate", "l_shipdate"):
            if col in tbl.schema.names:
                i = tbl.schema.get_field_index(col)
                typ = tbl.schema.field(i).type
                first = tbl.column(col)[0]
                const = pa.array([first.as_py()] * len(tbl), type=typ)
                tbl = tbl.set_column(i, tbl.schema.field(i), const)
        pq.write_table(tbl, str(d / f"{t}.parquet"))
    return str(d)


def test_every_query_survives_uniform_timestamps(spark, same_ts_sf_dir):
    _sweep(spark, same_ts_sf_dir, "uniform-ts")


#: Degenerate numeric regime: every item free (discount 1.0 -> zero net
#: revenue everywhere), zero quantities/taxes/totalprices, negative account
#: balances and event values. Ratios whose denominator is a revenue,
#: volume, or variance all hit 0/0 at once; log-transforms hit ln(0).
_NUMERIC_EXTREMES: dict[str, dict[str, object]] = {
    "lineitem": {"l_discount": 1.0, "l_tax": 0.0, "l_quantity": 0.0},
    "orders": {"o_totalprice": 0.0},
    "customer": {"c_acctbal": -1000.0},
    "events": {"value": -5.0},
}


@pytest.fixture(scope="module")
def numeric_extremes_sf_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("numext_sf")
    for t in TABLES:
        tbl = pq.read_table(f"{_SRC_SF}/{t}.parquet")
        for col, val in _NUMERIC_EXTREMES.get(t, {}).items():
            i = tbl.schema.get_field_index(col)
            const = pa.array([val] * len(tbl)).cast(tbl.schema.field(i).type)
            tbl = tbl.set_column(i, tbl.schema.field(i), const)
        pq.write_table(tbl, str(d / f"{t}.parquet"))
    return str(d)


def test_every_query_survives_numeric_extremes(spark, numeric_extremes_sf_dir):
    """Before this sweep existed, 11 queries crashed Spark-side (ANSI
    DIVIDE_BY_ZERO on zero-revenue/zero-variance denominators where
    DuckDB's 0/0 yields NULL) and one crashed oracle-side (DuckDB ln(0)
    raises where Spark's ln yields NULL). All now agree via try_divide /
    explicit positive-input guards on both engines."""
    _sweep(spark, numeric_extremes_sf_dir, "numeric-extremes")


@pytest.fixture(scope="module")
def zero_vectors_sf_dir(tmp_path_factory) -> str:
    """Every embedding replaced by the all-zero vector — cosine (and any
    norm-ratio score) is 0/0 against it. The registry-wide policy
    (plans/similarity_q.py::_NONZERO_SQL) EXCLUDES zero-norm vectors from
    the similarity universe in plan and oracle alike, so this corpus must
    yield zero crashes and agreeing (mostly empty) results."""
    d = tmp_path_factory.mktemp("zerovec_sf")
    for t in TABLES:
        tbl = pq.read_table(f"{_SRC_SF}/{t}.parquet")
        if t == "embeddings":
            emb = tbl.column("embedding").to_pylist()
            dim = len(emb[0]) if emb and emb[0] is not None else 8
            i = tbl.schema.get_field_index("embedding")
            zeros = pa.array(
                [[0.0] * dim for _ in emb], type=tbl.schema.field(i).type
            )
            tbl = tbl.set_column(i, tbl.schema.field(i), zeros)
        pq.write_table(tbl, str(d / f"{t}.parquet"))
    return str(d)


def test_every_query_survives_zero_vectors(spark, zero_vectors_sf_dir):
    """Before this sweep existed, 10 embedding queries crashed (ANSI
    DIVIDE_BY_ZERO on zero norms / zero pair distances) and 2 more
    row-diverged from their oracles (NULL-cosine rows ordering
    differently across engines)."""
    _sweep(spark, zero_vectors_sf_dir, "zero-vector")


@pytest.fixture(scope="module")
def pre_epoch_sf_dir(tmp_path_factory) -> str:
    """Every temporal column shifted ~60 years into the past so ALL epoch
    values are NEGATIVE (orders/lineitem land in 1935-1941, events in 1964).

    Negative epochs are where truncating and flooring integer division
    disagree (-7 // 2 is -4 floored but -3 truncated), where epoch-bucket
    arithmetic (`unix_micros(ts) div width`) can round toward zero instead
    of down, and where any "seconds since epoch are non-negative" assumption
    breaks. Spark's date_trunc/year/weekday and DuckDB's date_trunc/isodow
    must keep agreeing on the proleptic calendar either side of 1970."""
    d = tmp_path_factory.mktemp("preepoch_sf")
    shift_us = 60 * 365 * 24 * 3600 * 1_000_000
    for t in TABLES:
        tbl = pq.read_table(f"{_SRC_SF}/{t}.parquet")
        for col in ("ts", "o_orderdate", "l_shipdate"):
            if col in tbl.schema.names:
                i = tbl.schema.get_field_index(col)
                typ = tbl.schema.field(i).type
                us = pc.cast(tbl.column(col), pa.int64())
                shifted = pc.cast(pc.subtract(us, shift_us), typ)
                tbl = tbl.set_column(i, tbl.schema.field(i), shifted)
        pq.write_table(tbl, str(d / f"{t}.parquet"))
    return str(d)


def test_every_query_survives_pre_epoch_timestamps(spark, pre_epoch_sf_dir):
    """283/284 agree with DuckDB on fully pre-1970 data; zero crashes.

    The one allowlisted divergence is an ENGINE-DOMAIN limitation, not a
    plan defect: ``streaming_interval_join`` is a real watermarked
    stream-stream join, and Structured Streaming's watermark clock is
    milliseconds-since-epoch initialized to 0 — pre-epoch event times sit
    BELOW the initial watermark, so the join's state-watermark predicate
    filters them before they can match (verified: the identical join as a
    batch query returns the oracle's rows; the streaming run emits none).
    Aggregation twins survive for the mirror-image reason: the epoch-0
    watermark is AHEAD of every pre-epoch window end, so append-mode
    windows all close and emit. Pre-epoch event-time data is simply
    outside Structured Streaming's watermark domain; batch queries over
    the same data are unaffected (all oracled batch names agree)."""
    _sweep(
        spark,
        pre_epoch_sf_dir,
        "pre-epoch",
        known_divergence=frozenset({"streaming_interval_join"}),
    )


@pytest.fixture(scope="module")
def multi_file_sf_dir(tmp_path_factory) -> str:
    """Every ``{t}.parquet`` rewritten as a DIRECTORY of part files — the
    only shape that exists at 100 TB — with three twists the single-file
    fixtures never exercise: (a) part-00000 is ALWAYS zero rows
    (schema-only), so scans hand operators empty input partitions inside a
    non-empty table; (b) the split is uneven (40/35/25%); (c) row order is
    REVERSED relative to the shipped file, so file order != generation
    order and any hidden reliance on input order surfaces.

    Before this sweep existed, all 8 streaming queries returned ZERO rows
    on this layout: the file-stream source scoped its listing with
    pathGlobFilter='events.parquet', which matches LEAF file names only —
    a directory's part-*.parquet children match nothing and the source
    silently lists zero files (streaming/streams.py::events_stream now
    branches on the layout). Batch paths were unaffected (spark.read
    handles both spellings natively)."""
    d = tmp_path_factory.mktemp("multifile_sf")
    for t in TABLES:
        tbl = pq.read_table(f"{_SRC_SF}/{t}.parquet")
        n = len(tbl)
        rev = tbl.take(list(range(n - 1, -1, -1))) if n else tbl
        tdir = d / f"{t}.parquet"
        tdir.mkdir()
        cuts = [0, 0, max(1, int(n * 0.4)), max(2, int(n * 0.75)), n]
        for i in range(4):
            lo, hi = cuts[i], max(cuts[i], cuts[i + 1])
            pq.write_table(rev.slice(lo, hi - lo), str(tdir / f"part-{i:05d}.parquet"))
    return str(d)


def test_every_query_survives_multi_file_tables(spark, multi_file_sf_dir):
    _sweep(spark, multi_file_sf_dir, "multi-file")


def _value_sweep(
    spark,
    sf_dir: str,
    regime: str,
    known_divergence: frozenset[str] = frozenset(),
) -> None:
    """CELL-EXACT twin of ``_sweep`` for single-file degenerate fixtures:
    every oracled query must value-match DuckDB, not just row-count-match.
    Row counts cannot see tie-resolution divergence — under a degenerate
    regime many rows TIE on the quantities queries rank/carry/round by, and
    a query that orders by a tied value without a full deterministic
    tiebreak produces equal-cardinality, different-valued results across
    engines. (This harness found: NULL-band coverage NaN-vs-0 in
    conformal_interval_orders, channel-key-vs-event-order tie resolution in
    streaming_attribution's oracle, and a .xx5 shortest-repr rounding
    boundary in monthly_seasonality_index.)"""
    from parity import assert_parity

    fails: dict[str, str] = {}
    for name, spec in sorted(REGISTRY.items()):
        if not spec.oracle or name in known_divergence:
            continue
        try:
            assert_parity(spec.fn(spark, sf_dir), spec.oracle, sf_dir, name)
        except Exception as e:  # noqa: BLE001 — collecting a full report
            fails[name] = f"{type(e).__name__}: {str(e).splitlines()[0][:120]}"
    assert not fails, f"{regime} value divergence: {fails}"


def test_uniform_timestamp_values_cell_exact(spark, same_ts_sf_dir):
    _value_sweep(spark, same_ts_sf_dir, "uniform-ts")


@pytest.fixture(scope="module")
def same_embedding_sf_dir(tmp_path_factory) -> str:
    """Every embedding replaced by ONE identical non-zero vector — cosine,
    distance, and every similarity score tie across ALL pairs at once, so
    top-k/banding/assignment logic survives only through deterministic id
    tiebreaks that both engines share."""
    d = tmp_path_factory.mktemp("same_emb_sf")
    for t in TABLES:
        tbl = pq.read_table(f"{_SRC_SF}/{t}.parquet")
        if t == "embeddings":
            emb = tbl.column("embedding").to_pylist()
            dim = len(emb[0]) if emb and emb[0] is not None else 8
            vec = [1.0] + [0.5] * (dim - 1)
            i = tbl.schema.get_field_index("embedding")
            tbl = tbl.set_column(
                i, tbl.schema.field(i), pa.array([vec] * len(emb), type=tbl.schema.field(i).type)
            )
        pq.write_table(tbl, str(d / f"{t}.parquet"))
    return str(d)


def test_identical_embedding_values_cell_exact(spark, same_embedding_sf_dir):
    _value_sweep(spark, same_embedding_sf_dir, "identical-embeddings")


def test_pre_epoch_values_cell_exact(spark, pre_epoch_sf_dir):
    """Cell-exact twin of the pre-epoch row-count sweep. This harness found:
    the -1 "no click yet" sentinel in the stateful attribution kernel
    swallowing every legitimately-NEGATIVE click timestamp (streaming/
    stateful.py now uses a None sentinel), and DuckDB's truncating `//`
    mis-assigning sliding-window starts below epoch 0 in the
    sliding_window_events / streaming_sliding_counts oracles (now a
    branch-free floored multiple via double-%). streaming_interval_join
    carries the documented watermark-domain allowlist from the row-count
    sweep (at value level the 0-vs-2-row gap fails the same way)."""
    _value_sweep(
        spark,
        pre_epoch_sf_dir,
        "pre-epoch",
        known_divergence=frozenset({"streaming_interval_join"}),
    )


#: FK / grouping keys nulled on every other row (PKs stay unique) — the
#: dirty-data regime of real 100 TB corpora, where join/group keys are
#: routinely missing.
_NULL_FK_COLS: dict[str, list[str]] = {
    "events": ["user_id"],
    "orders": ["o_custkey"],
    "lineitem": ["l_partkey", "l_suppkey"],
    "customer": ["c_nationkey"],
    "supplier": ["s_nationkey"],
}


@pytest.fixture(scope="module")
def null_fk_sf_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("nullfk_sf")
    for t in TABLES:
        tbl = pq.read_table(f"{_SRC_SF}/{t}.parquet")
        for col in _NULL_FK_COLS.get(t, []):
            i = tbl.schema.get_field_index(col)
            vals = tbl.column(col).to_pylist()
            vals = [None if j % 2 else v for j, v in enumerate(vals)]
            tbl = tbl.set_column(
                i, tbl.schema.field(i), pa.array(vals, type=tbl.schema.field(i).type)
            )
        pq.write_table(tbl, str(d / f"{t}.parquet"))
    return str(d)


def test_null_fk_values_cell_exact(spark, null_fk_sf_dir):
    """Cell-exact sweep with 50% NULL join/group keys. SQL's NULL-key rules
    (equality never matches NULL; count(DISTINCT) excludes NULL) differ
    from the Spark constructs many plans are built on (groupBy mints a
    NULL group; dropDuplicates keeps a NULL row; a window PARTITIONs all
    NULL keys together; concat_ws skips a NULL field where '||' nulls the
    string). This harness found 8 such divergences: NULL-vertex minting in
    bfs/assortativity, NULL-user counting in cumulative_distinct/
    streaming_dedup, NULL-key carry in the asof operator, per-field NULL
    canonicalization in both fingerprints, and an int(NaN) crash in
    capped_running_balance's kernel — all fixed at the plan/operator layer
    to match SQL semantics."""
    _value_sweep(spark, null_fk_sf_dir, "null-fk")
