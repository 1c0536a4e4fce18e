"""Approximate near-dup operators vs the exact operator (SURVEY.md §5.3)."""

from __future__ import annotations

import numpy as np

from cbde_mapreduce_spark.operators.dedup import (
    jaccard_pairs,
    minhash_lsh_neardup,
    simhash_fingerprints,
)
from cbde_mapreduce_spark.sources import load_table


def _hamming(a: int, b: int) -> int:
    return bin((a % (1 << 64)) ^ (b % (1 << 64))).count("1")


def test_minhash_lsh_recalls_planted_neardups(spark, sf_oracle):
    """Every pair with exact Jaccard ≥ 0.8 must survive 16x4 banding at 0.5."""
    docs = load_table(spark, sf_oracle, "documents")
    planted = jaccard_pairs(docs, threshold=0.8).toPandas()
    assert len(planted) > 0, "fixture should contain planted near-duplicates"
    lsh = minhash_lsh_neardup(docs, threshold=0.5).toPandas()
    planted_set = set(zip(planted.doc_a, planted.doc_b))
    lsh_set = set(zip(lsh.doc_a, lsh.doc_b))
    missed = planted_set - lsh_set
    assert not missed, f"LSH missed planted near-dups: {missed}"
    # and LSH never reports a pair below its own verify threshold
    assert (lsh.jaccard >= 0.5).all()


def test_simhash_separates_neardups_from_random(spark, sf_oracle):
    docs = load_table(spark, sf_oracle, "documents")
    planted = jaccard_pairs(docs, threshold=0.8).toPandas()
    sh = simhash_fingerprints(docs).toPandas().set_index("doc_id")["simhash"]
    planted_ham = [_hamming(sh[a], sh[b]) for a, b in zip(planted.doc_a, planted.doc_b)]
    rng = np.random.RandomState(0)
    ids = sh.index.to_numpy()
    rand_ham = [
        _hamming(sh[a], sh[b])
        for a, b in zip(rng.choice(ids, 200), rng.choice(ids, 200))
        if a != b
    ]
    assert max(planted_ham) <= 10, planted_ham
    assert np.median(rand_ham) >= 14, np.median(rand_ham)


def test_minhash_is_deterministic(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    a = minhash_lsh_neardup(docs).toPandas().sort_values(["doc_a", "doc_b"])
    b = minhash_lsh_neardup(docs).toPandas().sort_values(["doc_a", "doc_b"])
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_bloom_no_false_negatives_and_low_fp(spark, sf_oracle):
    """Bloom prefilter contract: every seen key tests positive; unseen keys
    rarely do (the false-positive sliver that reaches the exact verify)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from cbde_mapreduce_spark.operators.dedup import (
        _bloom_positions,
        bloom_build,
        incremental_dedup,
    )
    from cbde_mapreduce_spark.sources import load_table

    docs = load_table(spark, sf_oracle, "documents")
    seen = docs.select(F.md5(F.encode("text", "UTF-8")).alias("h"))
    n_bits, k = 1 << 20, 5
    bitmap = np.frombuffer(bloom_build(seen, "h", n_bits, k), dtype=np.uint8)

    def contains(pos_rows):
        idx = np.stack(pos_rows)
        return ((bitmap[idx // 8] >> (idx % 8).astype(np.uint8)) & 1).all(axis=1)

    seen_pos = seen.select(_bloom_positions(F.col("h"), n_bits, k).alias("p")).toPandas()
    assert contains(seen_pos.p.to_numpy()).all(), "false negative — impossible"

    unseen = docs.select(
        F.md5(F.encode(F.concat("text", F.lit(" zz")), "UTF-8")).alias("h")
    )
    unseen_pos = unseen.select(_bloom_positions(F.col("h"), n_bits, k).alias("p")).toPandas()
    fp_rate = contains(unseen_pos.p.to_numpy()).mean()
    assert fp_rate < 0.05, f"false-positive rate {fp_rate} too high for 2^20 bits"

    # end-to-end: planted dups all dropped, novel rows all kept
    dup = docs.limit(50).select(F.md5(F.encode("text", "UTF-8")).alias("h"))
    novel = docs.limit(50).select(
        F.md5(F.encode(F.concat("text", F.lit(" qq")), "UTF-8")).alias("h")
    )
    out = incremental_dedup(dup.unionByName(novel), seen, key_col="h").toPandas()
    assert set(out.h) == set(novel.toPandas().h)


def test_portable_hash_constants_are_frozen():
    """The MinHash oracle SQL embeds MH_AFFINE verbatim (plans/neardup.py
    VALUES list) — regenerating the constants differently (new seed, new
    PRNG semantics, reordered generation) would silently break Spark/DuckDB
    parity even though both sides still 'work'. Pin the family: size,
    modulus, and spot values at the ends."""
    from cbde_mapreduce_spark.operators.dedup import MH_AFFINE, MH_PRIME

    assert MH_PRIME == 2147483647  # Mersenne prime 2^31 - 1
    assert len(MH_AFFINE) == 64
    assert MH_AFFINE[0] == (2075059641, 994516985)
    assert MH_AFFINE[1] == (355108416, 542105135)
    assert MH_AFFINE[63] == (145810866, 355348227)
    assert all(1 <= a < MH_PRIME and 0 <= b < MH_PRIME for a, b in MH_AFFINE)


def test_portable_shingle_hash_matches_python_md5(spark):
    """The 60-bit shingle hash must equal int(md5(s)[:15], 16) — the exact
    value the DuckDB oracle computes via ('0x' || substr(md5(s),1,15)).
    One divergent engine (charset, hex case, slice off-by-one) breaks every
    downstream signature; pin against Python's md5 as the third engine."""
    import hashlib

    from pyspark.sql import functions as F

    from cbde_mapreduce_spark.operators.dedup import portable_hashed_shingle_sets

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "x y z")], "doc_id long, text string"
    )
    got = {
        r.h
        for r in portable_hashed_shingle_sets(docs, k=3).collect()
    }
    want = {
        int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
        for s in [
            "alpha beta gamma",
            "beta gamma delta",
            "x y z",
        ]
    }
    assert got == want
