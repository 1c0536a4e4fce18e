"""Dup-heavy regression tests for the round-8 duplicate-collapse rewrites
(ADVICE r8, low #3): sorted_neighborhood_neardup, substring_dup_spans and
phash_neardup_pairs were rewritten to run their expensive kernels once per
DISTINCT text/hash, but the shipped sf0.001 parity fixtures are mostly
distinct — the clique / closed-form / group-witness branches (same/diff
gid split, gsz>=2 rows, the NULL-text tnn guard, sub-k texts) were unpinned
in-repo. These corpora force every branch:

- replicated groups (gsz 2, 3 and 30) with interleaved doc_ids, so group
  minima are scattered and the clique/closed-form rows dominate the output;
- NULL texts (two of them, so the NULL group itself has gsz>=2 — the
  distance-0 shortcut must NOT fire for it) and duplicated EMPTY texts;
- texts shorter than the k=50 shingle width, both unique and duplicated
  (no positions exist; the whole-text closed form must not fire either);
- a unique text sharing a >=50-char prefix with a replicated group (the
  group-witness branch: a singleton's shingle hit via a multi-copy rep);
- adjacent-in-sort-order texts above the edit-distance cutoff (the banded
  DP's -1 return must drop them exactly like the true distance would).

The two oracled names are pinned cell-exact against their UNCHANGED
quadratic DuckDB oracles on the same parquet; phash (rows-only by design)
is pinned against brute-force all-pairs popcount over the operator's own
distributed hashes, which isolates the collapse logic from the DCT kernel
(itself pinned in tests/test_phash.py).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from cbde_mapreduce_spark.plans import REGISTRY
from tests.parity import canonicalize


def _docs_frame(rows: list[tuple[int, str | None, str]]) -> pd.DataFrame:
    """rows = (doc_id, text, lang)."""
    return pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": [r[2] for r in rows],
            "source": ["dup"] * len(rows),
            "n_chars": [len(r[1]) if r[1] is not None else 0 for r in rows],
        }
    )


def _rand_text(seed: int, n: int) -> str:
    rng = np.random.RandomState(seed)
    return "".join(chr(97 + c) for c in rng.randint(0, 26, n))


@pytest.fixture(scope="module")
def dup_corpus_dir(tmp_path_factory) -> str:
    """45 docs, 10 distinct texts. Groups (all ASCII, lengths <= 130 so the
    oracle's generate_series bound holds and levenshtein is engine-equal):

    en:  A   x30  (len 120)  closed-form substring rows, 30-clique
         B   x3   (len 121, = A[:80] + 41 random -> shingle hits via group
                   witnesses; edit distance to A ~40, inside the SNM cutoff
                   at the A/B sort boundary)
         C   x1   (len 130, = A[:60] + 70 random -> singleton whose only
                   shingle witnesses are a multi-copy group's reps)
         D   x1   (len 130, random -> no shared shingles; distance to its
                   sort neighbors > 80 -> the banded DP's -1 path)
         s1  x2   (len 20, duplicated sub-k text: no closed-form row)
         s2  x1   (len 10, unique sub-k text)
         ""  x2   (duplicated empty text; phash 0 clique)
         NULL x2  (the NULL-text group has gsz 2 — the distance-0
                   shortcut must not fire for it)
    fr:  E   x2   (len 120 — lang partition isolation)
         F   x1   (len 121, = E[:100] + 21 random, distance < cutoff)

    Ids are a scattered permutation (i*29 mod 45 over insertion order), so
    no group's doc_ids are contiguous and group minima land mid-sequence.
    """
    A = _rand_text(1, 120)
    B = A[:80] + _rand_text(2, 41)
    C = A[:60] + _rand_text(3, 70)
    D = _rand_text(4, 130)
    E = _rand_text(5, 120)
    F = E[:100] + _rand_text(6, 21)
    s1, s2 = _rand_text(7, 20), _rand_text(8, 10)

    entries: list[tuple[str | None, str]] = (
        [(A, "en")] * 30
        + [(B, "en")] * 3
        + [(C, "en"), (D, "en")]
        + [(s1, "en")] * 2
        + [(s2, "en")]
        + [("", "en")] * 2
        + [(None, "en")] * 2
        + [(E, "fr")] * 2
        + [(F, "fr")]
    )
    assert len(entries) == 45  # gcd(29, 45) == 1 -> the map below permutes
    rows = [
        ((i * 29) % 45 * 3 + 1, t, lg) for i, (t, lg) in enumerate(entries)
    ]
    assert len({r[0] for r in rows}) == len(rows)
    d = tmp_path_factory.mktemp("advice_r9_dup")
    _docs_frame(rows).to_parquet(d / "documents.parquet", index=False)
    return str(d)


def _oracle_df(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    return con.sql(sql).df()


def _assert_cell_exact(spark, name: str, sf_dir: str) -> pd.DataFrame:
    spec = REGISTRY[name]
    got = canonicalize(spec.fn(spark, sf_dir).toPandas())
    want = canonicalize(_oracle_df(sf_dir, spec.oracle))
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    return got


def test_sorted_neighborhood_dup_heavy_parity(spark, dup_corpus_dir):
    got = _assert_cell_exact(spark, "sorted_neighborhood_neardup", dup_corpus_dir)
    # non-vacuous: the 30-copy group alone guarantees distance-0 same-gid
    # rows, and the corpus has cross-group (dp-branch) rows too
    assert (got["dist"] == 0).sum() >= 29
    assert (got["dist"] > 0).any(), "dp branch never fired"


def test_substring_dup_spans_dup_heavy_parity(spark, dup_corpus_dir):
    got = _assert_cell_exact(spark, "substring_dup_spans", dup_corpus_dir)
    # closed-form branch: every member of the 30-copy group reports its
    # whole 120-char text as one span
    assert ((got["n_spans"] == 1) & (got["dup_chars"] == 120)).sum() >= 30
    # group-witness branch: singleton C's only shingle witnesses are the
    # multi-copy A group's reps (a 60-char prefix span), F's are E's (100)
    assert ((got["dup_chars"] >= 50) & (got["dup_chars"] < 120)).any()


def test_substring_sub_k_and_null_texts_emit_nothing(spark, dup_corpus_dir):
    """Duplicated sub-k texts, empty texts and NULL texts generate no
    positions — neither the shingle path nor the closed form may emit
    rows for them (the oracle's WHERE i <= len-k+1 excludes them)."""
    got = REGISTRY["substring_dup_spans"].fn(spark, dup_corpus_dir).toPandas()
    docs = pd.read_parquet(f"{dup_corpus_dir}/documents.parquet")
    short_ids = set(
        docs.loc[docs["text"].isna() | (docs["n_chars"] < 50), "doc_id"]
    )
    assert not (set(got["doc_id"]) & short_ids)


def test_phash_dup_heavy_matches_bruteforce(spark, dup_corpus_dir):
    """The banded + duplicate-collapsed pair set must equal brute-force
    all-pairs popcount over the distributed hashes: hamming-0 cliques from
    replicated payloads, cross-group verified pairs, and nothing for the
    NULL payloads (which carry no fingerprint)."""
    from cbde_mapreduce_spark.operators.multimodal import (
        attach_binary_payload,
        perceptual_hash,
        phash_neardup_pairs,
    )
    from cbde_mapreduce_spark.sources import load_table

    docs = load_table(spark, dup_corpus_dir, "documents")
    mm = attach_binary_payload(docs)
    hp = perceptual_hash(mm).toPandas()
    ids = hp["doc_id"].to_numpy()
    hs = hp["phash"].to_numpy(dtype=np.int64)
    want = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            ham = int(bin(int(hs[i]) ^ int(hs[j])).count("1"))
            if ham <= 14:
                a, b = sorted((int(ids[i]), int(ids[j])))
                want.add((a, b, ham))
    got_df = phash_neardup_pairs(mm, max_hamming=14).toPandas()
    got = {(int(r.a), int(r.b), int(r.hamming)) for r in got_df.itertuples()}
    assert got == want
    # non-vacuous: the 30-copy group contributes C(30,2) hamming-0 rows
    assert sum(1 for (_, _, h) in got if h == 0) >= 435
    # NULL payloads appear in no pair
    docs_pd = pd.read_parquet(f"{dup_corpus_dir}/documents.parquet")
    null_ids = set(docs_pd.loc[docs_pd["text"].isna(), "doc_id"])
    touched = {a for (a, _, _) in got} | {b for (_, b, _) in got}
    assert not (touched & null_ids)


def test_item_item_cf_pack_gate_on_source_values(spark, tmp_path_factory):
    """ADVICE r8 low #2: the 31-bit pair-pack gate must measure the values
    actually packed (lineitem.l_partkey), not the part dimension's max — a
    negative orphan FK passed the old gate and silently corrupted the
    arithmetic-shiftright unpack. This corpus has a negative l_partkey
    absent from part; the query must take the two-column exchange and
    still produce the exact co-occurrence/cosine rows."""
    d = tmp_path_factory.mktemp("advice_r9_cf")
    # 6 customers, each with one order holding items {-5, 7}: co = 6 >= 5,
    # n(-5) = n(7) = 6 -> cosine 1.0. part contains only key 7 (max 7 < 2^31
    # would have passed the OLD gate; -5 must now force the unpacked path).
    orders = pd.DataFrame(
        {"o_orderkey": range(1, 7), "o_custkey": range(101, 107)}
    )
    lineitem = pd.DataFrame(
        {
            "l_orderkey": [o for o in range(1, 7) for _ in (0, 1)],
            "l_partkey": [-5, 7] * 6,
        }
    )
    part = pd.DataFrame({"p_partkey": [7]})
    orders.to_parquet(d / "orders.parquet", index=False)
    lineitem.to_parquet(d / "lineitem.parquet", index=False)
    part.to_parquet(d / "part.parquet", index=False)
    got = (
        REGISTRY["item_item_cf_topk"].fn(spark, str(d)).toPandas()
    )
    assert [
        (int(r.p1), int(r.p2), int(r.co), float(r.cosine))
        for r in got.itertuples()
    ] == [(-5, 7, 6, 1.0)]
