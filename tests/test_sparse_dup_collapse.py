"""Round-6 duplicate-collapse rewrite of ``sparse_cosine_topk_docs``.

The 100× replicated-scale study (SCALING.md round 6) timed the old plan
out: k identical copies of one text form a k-clique in the postings pair
join, Ω(k²) per duplicate group. The plan now collapses the corpus to one
representative per distinct text, joins representatives only, and expands
the top rep-level pairs back to doc pairs. The shipped fixtures carry only
a handful of duplicate texts, so these synthetic corpora pin the collapse
against the UNCHANGED quadratic-exact DuckDB oracle:

- duplicate groups larger than k+1 (the per-group expansion truncation);
- interleaved doc_ids (group minima are not contiguous);
- near-identical distinct texts (cross-group pairs must outrank or
  interleave with within-group cosine-1.0 pairs purely by value);
- empty/NULL texts (no postings -> excluded from the pair universe, even
  when duplicated).
"""

from __future__ import annotations


import duckdb
import pandas as pd
import pytest

from cbde_mapreduce_spark.plans import REGISTRY
from tests.parity import canonicalize

pytestmark = pytest.mark.slow  # value-parity/property/scale tier: excluded from the driver-visible default run (pytest.ini)


def _docs_frame(texts: list[str | None], ids: list[int]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "doc_id": ids,
            "text": texts,
            "lang": ["en"] * len(ids),
            "source": ["dup"] * len(ids),
            "n_chars": [len(t) if t else 0 for t in texts],
        }
    )


def _assert_parity(spark, sf_dir: str) -> pd.DataFrame:
    """Cell-exact vs the oracle; returns the RAW Spark result (its own
    (cosine DESC, d1, d2) order) for semantic assertions."""
    spec = REGISTRY["sparse_cosine_topk_docs"]
    raw = spec.fn(spark, sf_dir).toPandas()
    got = canonicalize(raw)
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = canonicalize(con.sql(spec.oracle).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), f"{len(got)} vs {len(want)} rows"
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    return raw


@pytest.fixture(scope="module")
def dup_corpus_dir(tmp_path_factory) -> str:
    """30-copy group (> k+1 = 21, truncation bites), a 5-copy and three
    2-copy groups, two NEAR-identical distinct texts, singletons, one
    duplicated empty text and one NULL text — 46 docs, ids interleaved so
    no group's ids are contiguous and group minima are scattered."""
    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    near = base + " kilo"  # shares 10 of 11 terms with `base` docs
    texts: list[str | None] = []
    ids: list[int] = []
    nxt = 0

    def add(text: str | None, n: int, stride: int) -> None:
        nonlocal nxt
        for j in range(n):
            texts.append(text)
            ids.append(nxt + j * stride)
        nxt += 1

    add(base, 30, 7)  # big group, ids 0,7,14,...
    add(near, 1, 1)
    add("lima mike november oscar papa", 5, 3)
    add("quebec romeo sierra", 2, 11)
    add("tango uniform victor", 2, 13)
    add("whiskey xray yankee", 2, 17)
    add("zulu solo document here", 1, 1)
    add("", 2, 19)
    add(None, 1, 1)
    # de-collide ids while keeping interleave: make them unique by rank
    seen: dict[int, int] = {}
    uniq = []
    for i in ids:
        while i in seen:
            i += 1
        seen[i] = 1
        uniq.append(i)
    d = tmp_path_factory.mktemp("dup_corpus")
    _docs_frame(texts, uniq).to_parquet(d / "documents.parquet", index=False)
    return str(d)


def test_dup_heavy_corpus_parity(spark, dup_corpus_dir):
    got = _assert_parity(spark, dup_corpus_dir)
    # the top-20 must be dominated by within-group cosine-1.0 pairs, and
    # every returned pair must be exactly 1.0 here (the 30-copy clique
    # alone has 435 such pairs) — proves the expansion truncation kept the
    # lexicographically-smallest pairs
    assert (got["cosine"] == 1.0).all()


def test_cross_group_pairs_rank_by_value(spark, tmp_path_factory):
    """With every duplicate group of size 1 except one pair, cross-group
    (cosine < 1) pairs must fill the tail of the top-k in value order."""
    texts = [
        "a b c d e f",
        "a b c d e f",  # the only duplicate group
        "a b c d e zz",  # 5/6 shared with group 0
        "a b c d yy zz",  # 4/6 shared
        "a b c xx yy zz",
        "q r s t u v",  # disjoint: shares nothing
    ]
    d = tmp_path_factory.mktemp("cross_rank")
    _docs_frame(texts, [3, 10, 1, 7, 5, 2]).to_parquet(
        d / "documents.parquet", index=False
    )
    got = _assert_parity(spark, str(d))
    # identical-copy pair first, then cross pairs strictly by cosine
    assert got.iloc[0]["d1"] == 3 and got.iloc[0]["d2"] == 10
    assert got.iloc[0]["cosine"] == 1.0
    assert (got["cosine"].values[:-1] >= got["cosine"].values[1:]).all()
    # the disjoint doc shares no capped term with anything -> never paired
    assert not ((got["d1"] == 2) | (got["d2"] == 2)).any()


def test_giant_clique_truncation_exact(spark, tmp_path_factory):
    """A 25-copy group (> k+1) plus disjoint-vocab fillers (so the shared
    terms survive the df<=0.5*nd cap: df=25, nd=55). The top-20 is the 20
    lexicographically smallest pairs of the 300-pair clique — exactly what
    the k+1-id expansion truncation must preserve."""
    n = 25
    texts = ["same text every time"] * n + [f"filler word{i}" for i in range(30)]
    ids = list(range(100, 100 + n)) + list(range(1000, 1030))
    d = tmp_path_factory.mktemp("one_text")
    _docs_frame(texts, ids).to_parquet(d / "documents.parquet", index=False)
    got = _assert_parity(spark, str(d))
    # fillers share only the df-capped 'filler' term, so the result is
    # purely the clique: its 20 smallest (d1, d2) pairs, all cosine 1.0
    assert len(got) == 20 and (got["cosine"] == 1.0).all()
    want_pairs = sorted(
        (a, b) for a in range(100, 125) for b in range(a + 1, 125)
    )[:20]
    assert list(zip(got["d1"], got["d2"])) == want_pairs
