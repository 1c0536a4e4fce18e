"""Near-duplicate detection operators: exact Jaccard, MinHash-LSH, SimHash.

(SURVEY.md §2.11 near-dedup; the scale path for the LLM-pipeline mandate.)

Algorithms (all public: Broder 1997 min-wise hashing; Charikar 2002 SimHash;
Leskovec/Rajaraman/Ullman MMDS ch.3 banding analysis):

- **Exact k-gram Jaccard** — shingle sets joined on shingle → intersection
  counts → |A∩B| / (|A|+|B|-|A∩B|). Shuffle cost ∝ Σ_shingle df².
  Correct but quadratic on hot shingles; it is the *oracle* for the
  approximate operators.
- **MinHash-LSH** — 64-'permutation' signature via Kirsch-Mitzenmacher
  double hashing over an md5-derived 60-bit shingle hash (engine-portable:
  a DuckDB oracle reproduces it cell-exact), banded 16×4; only
  same-(band, bandkey) docs become candidates, then exact-Jaccard
  verification. At 100 TB: signature pass is one groupBy per
  doc (map-side combinable), banding shuffle is O(docs·bands), candidate
  verification touches only colliding pairs — never all-pairs.
- **SimHash** — 64-bit fingerprint: per-token md5-derived bit votes
  weighted by term frequency, sign of the per-bit sum (engine-portable,
  same discipline). Hamming-close fingerprints ≈ similar docs; bucket by
  16-bit prefix for blocking.

Everything is pure DataFrame ops (md5 / xxhash64 / explode / groupBy /
bit ops) — no Python on the hot path. md5 is chosen over xxhash64 exactly
where cross-engine value-checkability matters (the approximate operators'
outputs); the exact-Jaccard internals keep the cheaper xxhash64 join keys,
whose collisions are count-neutral at any realistic corpus size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cbde_mapreduce_spark.functions.texttools import shingles, tokens

N_HASHES = 64
BANDS = 16
ROWS_PER_BAND = N_HASHES // BANDS


def shingle_sets(docs: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, s): the distinct word-k-gram shingle set of each document.

    Tokens are materialized into a column BEFORE shingling: the shingle
    expression references the token array ~3·n times (element_at per gram
    position), and an inlined split() would be re-evaluated at every
    reference — O(tokens·shingles) per doc instead of O(tokens).
    """
    toked = docs.select("doc_id", tokens("text").alias("__toks"))
    return toked.select(
        "doc_id",
        F.explode(F.array_distinct(shingles(F.col("__toks"), k))).alias("s"),
    )


def hashed_shingle_sets(docs: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, h): shingle sets with 64-bit hashed keys.

    Joining/shuffling on an 8-byte bigint instead of a ~20-byte string cuts
    the self-join cost; set cardinalities are preserved up to xxhash64
    collisions (~n²/2⁶⁴ — negligible at any realistic corpus size, and the
    MinHash path is approximate anyway)."""
    return shingle_sets(docs, k).select("doc_id", F.xxhash64("s").alias("h"))


def portable_hashed_shingle_sets(docs: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, h): shingle sets under the ENGINE-PORTABLE 60-bit hash
    ``('0x' || substr(md5(s), 1, 15))::bigint`` — md5 is bit-identical in
    Spark and DuckDB, so every value derived from h (MinHash signatures,
    band collisions, intersection counts) is reproducible by an oracle SQL
    statement BY CONSTRUCTION, not merely modulo hash collisions. One md5
    per distinct shingle; everything downstream is integer arithmetic.

    Deliberately NO distinct after hashing: the oracle applies the same
    hash to the same distinct-string shingle set, so a (vanishingly rare)
    60-bit collision would produce the same duplicated h row in both
    engines — parity is preserved exactly, not approximately.
    """
    h = F.conv(F.substring(F.md5("s"), 1, 15), 16, 10).cast("bigint")
    return shingle_sets(docs, k).select("doc_id", h.alias("h"))


def text_dup_groups(docs: DataFrame) -> DataFrame:
    """(doc_id, text, gid, gsz): identical-text duplicate groups.

    gid = the group's min doc_id (its representative), gsz = group size.
    One text-keyed shuffle; the cornerstone of the duplicate-collapse
    rewrites (round 6): every downstream pair computation runs once per
    DISTINCT text instead of once per copy pair, which is the difference
    between O(distinct²) and O((dup·distinct)²) on a dup-heavy corpus.
    """
    wga = Window.partitionBy("text")
    return docs.select(
        "doc_id",
        "text",
        F.min("doc_id").over(wga).alias("gid"),
        F.count(F.lit(1)).over(wga).alias("gsz"),
    )


def jaccard_rep_graph(
    docs: DataFrame, k: int = 3, threshold: float = 0.1
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The exact Jaccard near-dup graph, collapsed to identical-text
    representatives. Returns ``(mem, rep_edges, clique_gids)``:

    - mem: (doc_id, gid) — every doc's duplicate-group representative;
    - rep_edges: (ga, gb, jaccard) — qualifying pairs BETWEEN distinct
      texts (ga < gb, both gids), computed once per rep pair;
    - clique_gids: (gid,) — groups of ≥2 identical copies with ≥1 shingle:
      their members are pairwise jaccard-1.0 near-dups (identical shingle
      sets), WITHOUT materializing the Ω(gsz²) clique edges.

    Exact by construction: identical text ⇒ identical shingle set, so
    jaccard(a, b) = jaccard(rep(a), rep(b)) for every doc pair, and copies
    pair with each other iff their shingle set is nonempty. Groups whose
    text yields no shingles (under k tokens, empty, NULL) never self-pair,
    matching the shingle-join semantics.
    """
    m = text_dup_groups(docs)
    mem = m.select("doc_id", "gid")
    reps = m.filter(F.col("doc_id") == F.col("gid")).select(
        "doc_id", "text", "gsz"
    )
    sh = hashed_shingle_sets(reps, k)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("ga"), F.col("b.doc_id").alias("gb"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    x, y = sizes.alias("x"), sizes.alias("y")
    rep_edges = (
        inter.join(x, F.col("ga") == F.col("x.doc_id"))
        .join(y, F.col("gb") == F.col("y.doc_id"))
        .select(
            "ga",
            "gb",
            F.round(
                F.col("inter") / (F.col("x.n") + F.col("y.n") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    clique_gids = (
        reps.filter(F.col("gsz") >= 2)
        .join(sizes, "doc_id")  # >=1 shingle
        .select(F.col("doc_id").alias("gid"))
        .filter(F.lit(threshold <= 1.0))
    )
    return mem, rep_edges, clique_gids


def _expand_rep_pairs(
    mem: DataFrame, rep_pairs: DataFrame, clique_gids: DataFrame
) -> DataFrame:
    """Expand rep-level (ga, gb, jaccard) pairs + identical-copy cliques
    back to (doc_a, doc_b, jaccard) doc pairs via the membership map.

    Cross pairs fan out to every member combination (orientation is free:
    jaccard is symmetric, groups are disjoint); clique groups expand to all
    within-group pairs at jaccard 1.0. Output-proportional — the only
    quadratic term is the duplication-clique output itself.
    """
    ia = mem.select(F.col("gid").alias("ga"), F.col("doc_id").alias("ia"))
    ib = mem.select(F.col("gid").alias("gb"), F.col("doc_id").alias("ib"))
    ex_cross = (
        rep_pairs.join(ia, "ga")
        .join(ib, "gb")
        .select(
            F.least("ia", "ib").alias("doc_a"),
            F.greatest("ia", "ib").alias("doc_b"),
            "jaccard",
        )
    )
    cm = mem.join(clique_gids, "gid")
    ex_self = (
        cm.select("gid", F.col("doc_id").alias("doc_a"))
        .join(cm.select("gid", F.col("doc_id").alias("doc_b")), "gid")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.lit(1.0).alias("jaccard"))
    )
    return ex_cross.unionByName(ex_self)


def jaccard_pairs(docs: DataFrame, k: int = 3, threshold: float = 0.1) -> DataFrame:
    """Exact k-gram Jaccard over all pairs sharing ≥1 shingle.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b and jaccard ≥ threshold.
    The self-join runs on 8-byte hashed shingle keys (see hashed_shingle_sets)
    over identical-text REPRESENTATIVES (jaccard_rep_graph), then expands
    rep pairs back to doc pairs — the pair output on a dup-heavy corpus is
    inherently quadratic in duplication, but the shingle-join work is not.
    """
    mem, rep_edges, clique_gids = jaccard_rep_graph(docs, k, threshold)
    return _expand_rep_pairs(mem, rep_edges, clique_gids)


#: Universal-hash 'permutation' family over the Mersenne prime 2³¹−1:
#: h_j = (a_j·(h mod p) + b_j) mod p. Pairwise-independent within a
#: permutation and decorrelated ACROSS permutations (independent a_j, b_j)
#: — the property a shared-multiplier derivation like h1 + j·h2 lacks: with
#: one multiplier, every large-j 'permutation' ranks by the same component,
#: so a single differing shingle that wins that ranking flips ~all 64 mins
#: at once (observed: a 0.95-Jaccard fixture pair agreeing on 3/64 slots).
#: Constants are FIXED (seeded PRNG, frozen here) and embedded verbatim in
#: the DuckDB oracle (plans/neardup.py), keeping the pipeline cell-exact
#: across engines. a_j·h < 2³¹·2³¹ = 2⁶² — overflow-free in a bigint under
#: ANSI mode and in DuckDB alike.
MH_PRIME = (1 << 31) - 1


def _mh_affine_constants() -> list[tuple[int, int]]:
    import random

    rng = random.Random(0x5EED_CBDE)
    return [
        (rng.randrange(1, MH_PRIME), rng.randrange(0, MH_PRIME))
        for _ in range(N_HASHES)
    ]


MH_AFFINE = _mh_affine_constants()


def minhash_signatures(docs: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, h0..h63): 64 min-wise hashes over the shingle set.

    One string md5 per shingle (engine-portable, see
    portable_hashed_shingle_sets), then each 'permutation' j is the
    universal affine hash (a_j·h + b_j) mod (2³¹−1) — pure integer
    arithmetic, ~64x cheaper than hashing the shingle string per
    permutation, and reproducible in DuckDB so the driver can hash-check
    the full LSH output (round 10; previously xxhash64 → rows-only).
    """
    sh = portable_hashed_shingle_sets(docs, k)
    hm = F.col("h") % F.lit(MH_PRIME).cast("bigint")
    aggs = [
        F.min((F.lit(a).cast("bigint") * hm + F.lit(b).cast("bigint")) % F.lit(MH_PRIME).cast("bigint")).alias(f"h{j}")
        for j, (a, b) in enumerate(MH_AFFINE)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(signatures: DataFrame) -> DataFrame:
    """(doc_a, doc_b): pairs colliding in ≥1 of the 16 bands of 4 rows.

    The band key is the comma-joined signature string (injective for an
    int 4-tuple), NOT a re-hash: band equality is then EXACTLY 4-tuple
    equality in both engines — a band-hash collision can't mint a spurious
    candidate here while the oracle sees none (engine-portability by
    construction; the ~44-byte band key costs a few bytes over a bigint
    on a 16-rows-per-doc exchange, which the exactness buys cheaply).
    """
    band_cols = [
        F.concat_ws(
            ",",
            *[
                F.col(f"h{b * ROWS_PER_BAND + r}").cast("string")
                for r in range(ROWS_PER_BAND)
            ],
        ).alias(f"band{b}")
        for b in range(BANDS)
    ]
    banded = signatures.select("doc_id", F.posexplode(F.array(*band_cols)).alias("band_id", "band_hash"))
    l, r = banded.alias("l"), banded.alias("r")
    return (
        l.join(
            r,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_lsh_neardup(docs: DataFrame, k: int = 3, threshold: float = 0.5) -> DataFrame:
    """MinHash-LSH candidates verified with exact Jaccard ≥ threshold.

    Output: (doc_a, doc_b, jaccard). Verification joins shingle sets for
    candidate pairs only (the LSH point: |candidates| ≪ |all pairs|).

    Duplicate-collapse (round-6 scale fix): identical text ⇒ identical
    signature ⇒ collision in EVERY band, so a k-copy group floods every
    one of its buckets with k copies — candidate generation and the
    verify join were Ω(dup²) before any LSH pruning could help. Banding
    and verification now run over identical-text representatives;
    rep pairs expand back to doc pairs, and duplicate groups (≥2 copies,
    ≥1 shingle) expand to their jaccard-1.0 cliques directly — exactly
    the pairs the row-level algorithm emitted (identical signatures
    collide with certainty; jaccard 1 passes any threshold ≤ 1).

    Engine-portable end to end (round 10): signatures, band keys, and the
    verify join all derive from the md5-60-bit shingle hash, so a DuckDB
    oracle reproduces every value cell-exact (plans/neardup.py) — this
    operator graduated from rows-only to a full rows+schema+hash row.
    """
    m = text_dup_groups(docs)
    mem = m.select("doc_id", "gid")
    reps = m.filter(F.col("doc_id") == F.col("gid")).select(
        "doc_id", "text", "gsz"
    )
    cand = lsh_candidate_pairs(minhash_signatures(reps, k))
    sh = portable_hashed_shingle_sets(reps, k)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        cand.join(a, F.col("doc_a") == F.col("a.doc_id"))
        .join(b, (F.col("doc_b") == F.col("b.doc_id")) & (F.col("a.h") == F.col("b.h")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    x, y = sizes.alias("x"), sizes.alias("y")
    rep_pairs = (
        inter.join(x, F.col("doc_a") == F.col("x.doc_id"))
        .join(y, F.col("doc_b") == F.col("y.doc_id"))
        .select(
            F.col("doc_a").alias("ga"),
            F.col("doc_b").alias("gb"),
            F.round(
                F.col("inter") / (F.col("x.n") + F.col("y.n") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    clique_gids = (
        reps.filter(F.col("gsz") >= 2)
        .join(sizes, "doc_id")  # >=1 shingle
        .select(F.col("doc_id").alias("gid"))
        .filter(F.lit(threshold <= 1.0))
    )
    return _expand_rep_pairs(mem, rep_pairs, clique_gids)


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash, band16): 64-bit SimHash + 16-bit blocking prefix.

    Token-frequency-weighted bit votes: explode tokens (multiplicity = tf
    weight), hash, vote ±1 per bit position, sign-aggregate, reassemble via
    bit_or of shifted bits.

    The per-token 64-bit hash is ENGINE-PORTABLE (round 10, previously
    xxhash64 → rows-only): two 32-bit md5 hex slices — hi = hex[1:8],
    lo = hex[9:16] — give bit j as (lo >> j) & 1 for j < 32 and
    (hi >> (j-32)) & 1 above; every shift operates on a positive < 2³²
    value, so the identical expression runs in DuckDB and the driver
    hash-checks the full fingerprint output (plans/neardup.py oracle).
    band16 (bits 48..63, the blocking prefix) is assembled from the same
    votes rather than re-extracted from the signed bigint, avoiding any
    engine-specific unsigned-shift semantics.
    """
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("w"))
    hashed = tok.select(
        "doc_id",
        F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("bigint").alias("hi"),
        F.conv(F.substring(F.md5("w"), 9, 8), 16, 10).cast("bigint").alias("lo"),
    )

    def _bit(j: int) -> Column:
        src, off = ("lo", j) if j < 32 else ("hi", j - 32)
        return F.shiftright(F.col(src), off).bitwiseAND(F.lit(1))

    # 64 static ±1 vote aggregates — one groupBy, fully map-side combinable.
    vote_aggs = [
        F.sum(F.when(_bit(j) == 1, 1).otherwise(-1)).alias(f"b{j}")
        for j in range(64)
    ]
    sums = hashed.groupBy("doc_id").agg(*vote_aggs)
    # Reassemble: OR together literal bit values where the vote sum is positive.
    # Bit 63's value is Long.MIN_VALUE in two's complement.
    bit_vals = [(1 << j) if j < 63 else -(1 << 63) for j in range(64)]
    simhash = F.lit(0).cast("bigint")
    for j in range(64):
        simhash = simhash.bitwiseOR(
            F.when(F.col(f"b{j}") > 0, F.lit(bit_vals[j]).cast("bigint")).otherwise(0)
        )
    band16 = F.lit(0).cast("bigint")
    for i in range(16):
        band16 = band16 + F.when(
            F.col(f"b{48 + i}") > 0, F.lit(1 << i).cast("bigint")
        ).otherwise(0)
    return sums.select(
        "doc_id", simhash.alias("simhash"), band16.alias("band16")
    )


# ---------------------------------------------------------------------------
# Incremental (cross-batch) dedup with a Bloom-filter prefilter.
#
# The corpus-ingestion shape: a new batch arrives, the historical corpus is
# huge. A full anti-join would shuffle the ENTIRE new batch against the seen
# keys; the Bloom prefilter (public sketch: Bloom 1970; same role as Spark's
# own runtime InBloomFilter join pruning) classifies most genuinely-new rows
# executor-side with zero shuffle, so the exact anti-join only moves the
# bloom-positive sliver (true dups + ~fp_rate of the batch).
#
# No false negatives by construction (bitmap OR is lossless for membership),
# so prefilter + exact-verify is EXACT end-to-end — the approximation only
# costs join traffic, never correctness. Build is one distinct-positions
# pass (bounded by n_bits rows) -> per-partition partial bitmaps -> OR of P
# bitmaps on the driver: the driver holds n_bits/8 bytes (128 KiB at 2^20),
# never data rows.
# ---------------------------------------------------------------------------


def _bloom_positions(col: Column, n_bits: int, k: int) -> Column:
    """k seeded-xxhash64 bit positions for a key — pure JVM expressions."""
    return F.array(
        *[F.pmod(F.xxhash64(col, F.lit(i)), F.lit(n_bits)) for i in range(k)]
    )


def bloom_build(df: DataFrame, key_col: str, n_bits: int = 1 << 20, k: int = 5) -> bytes:
    """Serialize the seen-key set into an n_bits Bloom bitmap.

    Executor-side: explode the k positions per key, distinct (≤ n_bits
    rows survive regardless of corpus size), fold each partition into a
    partial bitmap; driver-side: OR the P partial bitmaps.
    """
    pos_df = df.select(
        F.explode(_bloom_positions(F.col(key_col), n_bits, k)).alias("p")
    ).distinct()

    def to_bitmap(batches):
        bm = np.zeros(n_bits // 8, dtype=np.uint8)
        seen_any = False
        for pdf in batches:
            if not len(pdf):
                continue
            seen_any = True
            p = pdf["p"].to_numpy(dtype=np.int64)
            np.bitwise_or.at(bm, p // 8, (1 << (p % 8)).astype(np.uint8))
        if seen_any:
            yield pd.DataFrame({"bm": [bm.tobytes()]})

    partials = pos_df.mapInPandas(to_bitmap, "bm binary").toPandas()
    out = np.zeros(n_bits // 8, dtype=np.uint8)
    for b in partials["bm"]:
        out |= np.frombuffer(bytes(b), dtype=np.uint8)
    return out.tobytes()


def incremental_dedup(
    new_df: DataFrame,
    seen_df: DataFrame,
    key_col: str = "h",
    n_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """Rows of ``new_df`` whose ``key_col`` does not occur in ``seen_df``.

    Exact result (Bloom prefilter + exact anti-join verification of the
    positives); only bloom-positive rows reach the shuffle.
    """
    spark = new_df.sparkSession
    bitmap = bloom_build(seen_df, key_col, n_bits, k)
    bc = spark.sparkContext.broadcast(bitmap)

    @F.pandas_udf("boolean")
    def might_contain(pos: pd.Series) -> pd.Series:
        bm = np.frombuffer(bc.value, dtype=np.uint8)
        idx = np.stack(pos.to_numpy())  # (rows, k) positions
        bits = (bm[idx // 8] >> (idx % 8).astype(np.uint8)) & 1
        return pd.Series(bits.all(axis=1).astype(bool))

    flagged = new_df.withColumn(
        "__maybe", might_contain(_bloom_positions(F.col(key_col), n_bits, k))
    )
    definite_new = flagged.filter(~F.col("__maybe")).drop("__maybe")
    survivors = (
        flagged.filter(F.col("__maybe"))
        .drop("__maybe")
        .join(seen_df.select(key_col).distinct(), key_col, "left_anti")
    )
    return definite_new.unionByName(survivors)
