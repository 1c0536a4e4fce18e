"""Near-duplicate queries (SURVEY.md §2.11): exact Jaccard + MinHash/SimHash.

The exact 3-gram Jaccard join is oracle-checked cell-exact against DuckDB.
MinHash-LSH and SimHash are oracle-checked too (round 10): their hashing is
md5-derived — bit-identical in Spark and DuckDB — so the full signature →
banding → verify pipeline (and the full 64-bit fingerprint) is reproduced
by the oracle SQL below cell-exact, BY CONSTRUCTION rather than modulo
engine hash seeds. Approximation QUALITY (recall of planted near-dups,
Hamming separation) is still asserted against the exact operator in
tests/test_neardup.py — the oracle proves the engines agree, the tests
prove the algorithm works.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cbde_mapreduce_spark.operators.dedup import (
    MH_AFFINE,
    MH_PRIME,
    jaccard_pairs,
    jaccard_rep_graph,
    minhash_lsh_neardup,
    simhash_fingerprints,
)
from cbde_mapreduce_spark.plans.registry import REGISTRY, query
from cbde_mapreduce_spark.sources import load_table


@query(
    "ngram_jaccard_pairs",
    oracle="""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        sh AS (SELECT DISTINCT doc_id,
                      unnest(list_transform(range(1, len(toks) - 1),
                             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
               FROM t),
        sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        p  AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
               FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
        j  AS (SELECT doc_a, doc_b,
                      round(inter / (x.n + y.n - inter), 6) AS jaccard
               FROM p JOIN sz x ON x.doc_id = doc_a
                      JOIN sz y ON y.doc_id = doc_b)
        SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.1
    """,
    category="dedup",
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard near-dup pairs (threshold 0.1).

    Scale shape: join on shingle (sparse for k=3) — cost ∝ Σ_shingle df²,
    not |docs|². The approximate twin below prunes this further.
    """
    docs = load_table(spark, sf_dir, "documents")
    return jaccard_pairs(docs, k=3, threshold=0.1)


#: DuckDB twin of the full MinHash-LSH pipeline (operators/dedup.py):
#: the SAME md5-60-bit shingle hash, the SAME universal affine
#: 'permutations' (a_j·h + b_j) mod 2³¹−1 with the SAME frozen constants
#: (MH_AFFINE, embedded as a VALUES list), the SAME 16×4 banding by
#: comma-joined signature tuple, the SAME exact-Jaccard verification at
#: 0.5 — row-level here, rep-level + expansion on the Spark side (proven
#: equivalent: identical text ⇒ identical signature ⇒ certain collision).
_MH_VALUES = ",\n                 ".join(
    f"({j}, {a}, {b})" for j, (a, b) in enumerate(MH_AFFINE)
)

_MINHASH_ORACLE = f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    sh0 AS (SELECT DISTINCT doc_id,
                  unnest(list_transform(range(1, len(toks) - 1),
                         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
           FROM t),
    sh AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::bigint AS h FROM sh0),
    hp AS (SELECT doc_id, h % {MH_PRIME} AS hm FROM sh),
    hs AS (SELECT doc_id, r.j, min((r.a * hm + r.b) % {MH_PRIME}) AS mh
           FROM hp CROSS JOIN (VALUES {_MH_VALUES}) r(j, a, b)
           GROUP BY 1, 2),
    bands AS (SELECT doc_id, j // 4 AS band_id,
                     string_agg(mh::varchar, ',' ORDER BY j) AS sig
              FROM hs GROUP BY 1, 2),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bands a JOIN bands b
               ON a.band_id = b.band_id AND a.sig = b.sig
                  AND a.doc_id < b.doc_id),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (SELECT doc_a, doc_b, count(*) AS inter
              FROM cand JOIN sh a ON a.doc_id = doc_a
                        JOIN sh b ON b.doc_id = doc_b AND a.h = b.h
              GROUP BY 1, 2),
    jj AS (SELECT doc_a, doc_b,
                  round(inter / (x.n + y.n - inter), 6) AS jaccard
           FROM inter JOIN sz x ON x.doc_id = doc_a
                      JOIN sz y ON y.doc_id = doc_b)
    SELECT doc_a, doc_b, jaccard FROM jj WHERE jaccard >= 0.5
"""


@query("minhash_lsh_neardup", oracle=_MINHASH_ORACLE, category="dedup")
def minhash_lsh_neardup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH (64 hashes, 16×4 bands) near-dup pairs, exact-verified ≥0.5.

    Fully oracled since round 10: the md5-derived portable hashing makes
    every signature, band collision, and verified jaccard reproducible in
    DuckDB (hash-matched driver rows). Recall of planted near-dups vs the
    exact operator is additionally asserted in tests/test_neardup.py.
    """
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_neardup(docs, k=3, threshold=0.5)


def _simhash_oracle_sql() -> str:
    """Generate the 64-bit-vote SimHash twin (bit j of the per-token hash
    comes from two 32-bit md5 hex slices; votes sign-aggregate; the signed
    64-bit fingerprint and the 16-bit blocking prefix are assembled as
    sums of literal bit values — no unsigned-shift semantics needed)."""
    votes = ",\n               ".join(
        "sum(CASE WHEN ({src} >> {off}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}".format(
            src="lo" if j < 32 else "hi", off=j if j < 32 else j - 32, j=j
        )
        for j in range(64)
    )
    bits = "\n             + ".join(
        f"(CASE WHEN b{j} > 0 THEN {(1 << j) if j < 63 else -(1 << 63)} ELSE 0 END)"
        for j in range(64)
    )
    band = "\n             + ".join(
        f"(CASE WHEN b{48 + i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(16)
    )
    return f"""
        WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                     FROM documents),
        h AS (SELECT doc_id,
                     ('0x' || substr(md5(w), 1, 8))::bigint AS hi,
                     ('0x' || substr(md5(w), 9, 8))::bigint AS lo
              FROM tok),
        v AS (SELECT doc_id,
               {votes}
              FROM h GROUP BY doc_id)
        SELECT doc_id,
               ({bits})::bigint AS simhash,
               ({band})::bigint AS band16
        FROM v
    """


@query("simhash_fingerprints", oracle=_simhash_oracle_sql(), category="dedup")
def simhash_fingerprints_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash fingerprints + 16-bit blocking prefix.

    Fully oracled since round 10 (md5-portable bit votes, hash-matched
    driver rows); Hamming separation of planted near-dups vs random pairs
    is additionally asserted in tests/test_neardup.py.
    """
    docs = load_table(spark, sf_dir, "documents")
    return simhash_fingerprints(docs)


def _doc_components(docs: DataFrame, cc_fn) -> DataFrame:
    """(v, component) over the exact Jaccard ≥ 0.1 doc graph, computed at
    the identical-text representative level (round-6 duplicate collapse).

    The iterative CC algorithm runs on the REP graph only: dup groups are
    internal cliques whose connectivity is implied by sharing a gid, so
    their Ω(gsz²) edges never materialize and never shuffle through the CC
    rounds. Labels expand back through the membership map; component id
    stays the min doc_id (gids are group minima, so min-over-gids =
    min-over-docs). Groups with ≥2 shingled copies but no cross edges are
    their own components; shingle-less groups have no edges at all and are
    excluded, exactly like the row-level graph.
    """
    mem, rep_edges, clique_gids = jaccard_rep_graph(docs, k=3, threshold=0.1)
    rep_cc = cc_fn(rep_edges.select("ga", "gb"), "ga", "gb")
    edge_labels = rep_cc.select(F.col("v").alias("gid"), "component")
    clique_only = clique_gids.join(
        edge_labels.select("gid"), "gid", "left_anti"
    ).select("gid", F.col("gid").alias("component"))
    labels = edge_labels.unionByName(clique_only)
    return mem.join(labels, "gid").select(
        F.col("doc_id").alias("v"), "component"
    )


@query(
    "neardup_components",
    oracle="""
        WITH RECURSIVE t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        sh AS (SELECT DISTINCT doc_id,
                      unnest(list_transform(range(1, len(toks) - 1),
                             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
               FROM t),
        sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        p  AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
               FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
        e  AS (SELECT doc_a, doc_b
               FROM p JOIN sz x ON x.doc_id = doc_a JOIN sz y ON y.doc_id = doc_b
               WHERE inter / (x.n + y.n - inter) >= 0.1),
        sym AS (SELECT doc_a AS a, doc_b AS b FROM e
                UNION SELECT doc_b, doc_a FROM e),
        verts AS (SELECT DISTINCT a AS v FROM sym),
        walk(v, l) AS (
            SELECT v, v FROM verts
            UNION
            SELECT s.a, w.l FROM walk w JOIN sym s ON w.v = s.b
        )
        SELECT v, min(l) AS component FROM walk GROUP BY v
    """,
    category="dedup",
)
def neardup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the exact near-dup graph (Jaccard ≥ 0.1).

    A genuinely iterative operator with an oracle: Spark runs min-label
    propagation to fixpoint (operators/iterative.py) over the duplicate-
    collapsed rep graph (_doc_components); DuckDB computes the same
    components with a recursive CTE over the row-level graph. Component
    id = min doc_id.
    """
    from cbde_mapreduce_spark.operators.iterative import connected_components

    docs = load_table(spark, sf_dir, "documents")
    return _doc_components(docs, connected_components)


@query(
    "dedup_canonical_docs",
    oracle="""
        WITH RECURSIVE t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        sh AS (SELECT DISTINCT doc_id,
                      unnest(list_transform(range(1, len(toks) - 1),
                             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
               FROM t),
        sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        p  AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
               FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
        e  AS (SELECT doc_a, doc_b
               FROM p JOIN sz x ON x.doc_id = doc_a JOIN sz y ON y.doc_id = doc_b
               WHERE inter / (x.n + y.n - inter) >= 0.1),
        sym AS (SELECT doc_a AS a, doc_b AS b FROM e
                UNION SELECT doc_b, doc_a FROM e),
        verts AS (SELECT DISTINCT a AS v FROM sym),
        walk(v, l) AS (
            SELECT v, v FROM verts
            UNION
            SELECT s.a, w.l FROM walk w JOIN sym s ON w.v = s.b
        ),
        comp AS (SELECT v, min(l) AS component FROM walk GROUP BY v)
        SELECT d.doc_id, d.lang
        FROM documents d
        WHERE d.doc_id NOT IN (SELECT v FROM comp WHERE v != component)
    """,
    category="dedup",
)
def dedup_canonical_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Component-canonical near-dedup: keep each near-dup component's min
    doc_id, not the per-pair greedy survivor (which over-deletes on chains).

    The keep-policy the cleaning pipeline (operators/pipeline.py) applies,
    here over the exact Jaccard graph so DuckDB's recursive CTE is a true
    value oracle for the kept-set. Components come from the duplicate-
    collapsed rep graph (_doc_components): a doc drops iff it is in the
    graph and is not its component's min id.
    """
    from cbde_mapreduce_spark.operators.iterative import connected_components

    docs = load_table(spark, sf_dir, "documents")
    drops = (
        _doc_components(docs, connected_components)
        .filter(F.col("v") != F.col("component"))
        .select(F.col("v").alias("__drop_id"))
    )
    return docs.join(
        drops, docs.doc_id == F.col("__drop_id"), "left_anti"
    ).select("doc_id", "lang")


@query(
    "neardup_components_star",
    oracle=REGISTRY["neardup_components"].oracle,
    category="dedup",
)
def neardup_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same near-dup components, computed by alternating large-star /
    small-star rounds (operators/iterative.py::connected_components_star)
    instead of min-label propagation — O(log² n) rounds on ANY topology vs
    O(diameter), the difference between ~20 and ~10⁶ shuffles on a
    path-shaped 100 TB graph.

    Identical contract (component id = min doc_id) and the SAME recursive-
    CTE oracle as neardup_components, so the 100 TB-shape algorithm gets
    its own driver-checkable value-hash row rather than riding on the
    pytest equality assertion alone. Runs over the duplicate-collapsed rep
    graph (_doc_components), like its min-label sibling.
    """
    from cbde_mapreduce_spark.operators.iterative import connected_components_star

    docs = load_table(spark, sf_dir, "documents")
    return _doc_components(docs, connected_components_star)


_SUBDUP_K = 50  # span length in characters
_SUBDUP_MAXLEN = 4096  # generate_series bound for the oracle (max doc len)

_SUBDUP_ORACLE = f"""
    WITH pos AS (
        SELECT doc_id, i, substr(text, i, {_SUBDUP_K}) AS g
        FROM documents, generate_series(1, {_SUBDUP_MAXLEN}) t(i)
        WHERE i <= length(text) - {_SUBDUP_K} + 1),
    dupg AS (SELECT g FROM pos GROUP BY g
             HAVING count(DISTINCT doc_id) > 1),
    hit AS (SELECT doc_id, i FROM pos JOIN dupg USING (g)),
    isl AS (SELECT doc_id, i,
                   CASE WHEN max(i + {_SUBDUP_K} - 1) OVER (
                            PARTITION BY doc_id ORDER BY i
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                            >= i THEN 0 ELSE 1 END AS new_island
            FROM hit),
    grp AS (SELECT doc_id, i,
                   sum(new_island) OVER (PARTITION BY doc_id ORDER BY i)
                     AS island
            FROM isl),
    spans AS (SELECT doc_id, island,
                     min(i) AS s,
                     max(i + {_SUBDUP_K} - 1) AS e
              FROM grp GROUP BY doc_id, island)
    SELECT doc_id,
           count(*)::bigint AS n_spans,
           sum(e - s + 1)::bigint AS dup_chars,
           max(e - s + 1)::bigint AS max_span
    FROM spans GROUP BY doc_id
"""


@query("substring_dup_spans", oracle=_SUBDUP_ORACLE, category="dedup")
def substring_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-substring detection (the Lee et al. 2022
    "Deduplicating Training Data" problem): for every document, find the
    character spans whose 50-char substrings also occur in some
    OTHER document, merge overlapping hits into maximal spans, and report
    span count / duplicated chars / longest span per doc.

    The suffix-array formulation is inherently sequential; the distributed
    re-expression is k-gram positional shingling: posexplode every k-char
    window (corpus chars × 1 rows), count distinct docs per shingle, keep
    cross-doc shingles, then merge overlapping [i, i+k) intervals per doc
    with the gaps-and-islands pattern (running max of span end → island id
    → min/max per island). Every stage is a shuffle on a data-parallel key
    (shingle, then doc_id); the per-doc interval-merge window partitions by
    doc. At 100 TB the shingle groupBy keys on xxhash64(g) (8-byte shuffle
    keys instead of 50-char strings) with an md5 upgrade if collision odds
    at corpus cardinality warrant 128 bits; the span algebra is unchanged.

    Duplicate-collapse (round-8 — this operator predated the r6 campaign):
    the shingle explosion is Θ(corpus chars), so a 100×-replicated corpus
    shuffled ~30 GB of 50-char shingle rows twice (the GCLocker-warning
    name in the r8 sf10 gate). Spans are text-deterministic, so the
    explosion now runs over DISTINCT texts only, with an exact group-level
    split of the cross-doc test (count(DISTINCT doc_id) > 1):
    - a doc whose text has ≥2 copies: every one of its shingles occurs
      verbatim in a twin (a distinct doc), so every position is a hit and
      the span algebra degenerates to ONE island covering the whole text —
      its row is (1, len, len) in closed form, no shingles needed;
    - a doc with a unique text: within-own-text repeats never satisfy the
      DISTINCT-doc test, so a shingle hits iff it occurs in some OTHER
      distinct text — i.e. its rep-level shingle group spans ≥2 distinct
      texts (any sizes; even another singleton is another doc). The
      island merge runs on the rep text, which IS the doc text.
    Multi-copy texts still serve as match TARGETS for the singles, so the
    shingle aggregate runs over all reps. Identity on all-distinct data
    (every group is a singleton and ng≥2 is exactly nd>1).
    """
    docs = load_table(spark, sf_dir, "documents")
    k = _SUBDUP_K
    g = docs.groupBy("text").agg(
        F.min("doc_id").alias("gid"), F.count(F.lit(1)).alias("gsz")
    )
    pos = (
        # Texts shorter than k chars generate no positions — without the
        # filter, sequence(1, 0) yields [1, 0] on Spark (default step -1
        # when start > stop) and emits two phantom shingles the oracle's
        # WHERE i <= length(text)-k+1 predicate excludes.
        g.filter(F.length("text") >= k)
        .select(
            "gid",
            "gsz",
            F.explode(
                F.sequence(F.lit(1), F.length("text") - (k - 1))
            ).alias("i"),
            "text",
        )
        .select("gid", "gsz", "i", F.expr(f"substring(text, i, {k})").alias("g"))
    )
    dupg = pos.groupBy("g").agg(
        F.count_distinct("gid").alias("ng")
    ).filter(F.col("ng") > 1).select("g")
    hit = pos.filter(F.col("gsz") == 1).join(dupg, "g").select("gid", "i")
    wprev = (
        Window.partitionBy("gid")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    isl = hit.select(
        "gid",
        "i",
        F.when(F.max(F.col("i") + (k - 1)).over(wprev) >= F.col("i"), 0)
        .otherwise(1)
        .alias("new_island"),
    )
    wcum = Window.partitionBy("gid").orderBy("i")
    grp = isl.select("gid", "i", F.sum("new_island").over(wcum).alias("island"))
    spans = grp.groupBy("gid", "island").agg(
        F.min("i").alias("s"), F.max(F.col("i") + (k - 1)).alias("e")
    )
    single_rows = spans.groupBy("gid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
        F.sum(F.col("e") - F.col("s") + 1).cast("bigint").alias("dup_chars"),
        F.max(F.col("e") - F.col("s") + 1).cast("bigint").alias("max_span"),
    )
    multi_rows = (
        g.filter((F.col("gsz") >= 2) & (F.length("text") >= k))
        .select(
            "gid",
            F.lit(1).cast("bigint").alias("n_spans"),
            F.length("text").cast("bigint").alias("dup_chars"),
            F.length("text").cast("bigint").alias("max_span"),
        )
    )
    rows = single_rows.unionByName(multi_rows)
    mem = docs.join(
        g.select(F.col("text").alias("__gt"), "gid"),
        F.col("text") == F.col("__gt"),
    ).select("doc_id", "gid")
    return mem.join(rows, "gid").select("doc_id", "n_spans", "dup_chars", "max_span")
