"""Text-analysis queries over the documents corpus (SURVEY.md §2.11).

MapReduce parity: word count IS the canonical MapReduce program; TF-IDF is
the classic two-job chain (tf per (doc,term), df per term, join);
language-ID / quality scoring / fingerprinting are in-map() record scoring
passes. All Spark-side logic is built-in functions — tokenization never
leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cbde_mapreduce_spark.functions.texttools import tokens
from cbde_mapreduce_spark.plans.registry import query
from cbde_mapreduce_spark.sources import load_table

#: tiny marker-word lexicon for language voting (vocabulary is shared across
#: the fixture's langs, so this demonstrates the operator, it cannot recover
#: the metadata label — see FIXTURES.md).
LANG_LEXICON = [
    ("the", "en", 1.0), ("a", "en", 0.8),
    ("table", "de", 1.0), ("row", "de", 0.7),
    ("data", "es", 1.0), ("query", "es", 0.6),
    ("window", "fr", 1.0), ("join", "fr", 0.7),
    ("agg", "zh", 1.0), ("merge", "zh", 0.7),
]

_LEX_VALUES = ", ".join(f"('{w}', '{lang}', {wt})" for w, lang, wt in LANG_LEXICON)


@query(
    "wordcount_documents",
    oracle="""
        SELECT w AS word, count(*) AS cnt
        FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
        WHERE w <> ''
        GROUP BY w
        ORDER BY cnt DESC, word
        LIMIT 20
    """,
    category="text",
)
def wordcount_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE MapReduce program: tokenize → explode → count → top-20."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(20)
    )


@query(
    "token_stats_per_doc",
    oracle="""
        SELECT doc_id,
               len(string_split(text, ' '))                AS n_tok,
               len(list_distinct(string_split(text, ' '))) AS n_unique,
               round((length(text) - len(string_split(text, ' ')) + 1)
                     / len(string_split(text, ' ')), 6)    AS avg_tok_len
        FROM documents
    """,
    category="text",
)
def token_stats_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting per document (count / distinct / mean length).

    avg token length uses the single-space-join identity
    (chars - (n-1)) / n — pure arithmetic, no second pass.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    n_tok = F.size(toks).cast("bigint")
    return docs.select(
        "doc_id",
        n_tok.alias("n_tok"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_unique"),
        F.round((F.length("text") - n_tok + 1) / n_tok, 6).alias("avg_tok_len"),
    )


@query(
    "quality_score_docs",
    oracle="""
        WITH s AS (
            SELECT doc_id,
                   len(string_split(text, ' '))                AS n_tok,
                   len(list_distinct(string_split(text, ' '))) AS n_unique
            FROM documents
        )
        SELECT doc_id,
               round((n_unique / n_tok) * least(n_tok / 50.0, 1.0), 6) AS quality,
               (n_unique / n_tok) * least(n_tok / 50.0, 1.0) > 0.4     AS is_quality
        FROM s
    """,
    category="text",
)
def quality_score_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score: lexical diversity × length saturation."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    n_tok = F.size(toks).cast("bigint")
    n_unique = F.size(F.array_distinct(toks)).cast("bigint")
    score = (n_unique / n_tok) * F.least(n_tok / F.lit(50.0), F.lit(1.0))
    return docs.select(
        "doc_id",
        F.round(score, 6).alias("quality"),
        (score > 0.4).alias("is_quality"),
    )


@query(
    "lang_id_lexicon",
    oracle=f"""
        WITH lex(word, cand, wt) AS (VALUES {_LEX_VALUES}),
        tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
        sc AS (SELECT doc_id, cand,
                      round(sum(round(wt * 10)::bigint) / 10.0, 4) AS score
               FROM tok JOIN lex USING (word) GROUP BY doc_id, cand),
        r AS (SELECT doc_id, cand, score,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY score DESC, cand) AS rn
              FROM sc)
        SELECT doc_id, cand AS pred_lang, score FROM r WHERE rn = 1
    """,
    category="text",
)
def lang_id_lexicon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID by marker-word voting: explode → broadcast lexicon join →
    weighted vote → argmax per doc."""
    docs = load_table(spark, sf_dir, "documents")
    lex = spark.createDataFrame(LANG_LEXICON, "word string, cand string, wt double")
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("word"))
    scored = (
        tok.join(F.broadcast(lex), "word")
        .groupBy("doc_id", "cand")
        # lexicon weights are tenth-quantized constants — exact integer
        # tenths through the sum (money.py round-11)
        .agg(
            F.round(
                F.sum(F.round(F.col("wt") * 10).cast("bigint")) / F.lit(10.0),
                4,
            ).alias("score")
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("cand"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("cand").alias("pred_lang"), "score")
    )


@query(
    "tfidf_top_terms",
    oracle="""
        WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        tf  AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
        df  AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
        n   AS (SELECT count(*)::double AS n_docs FROM documents),
        s   AS (SELECT doc_id, term,
                       round(tf * ln((SELECT n_docs FROM n) / df), 6) AS tfidf
                FROM tf JOIN df USING (term)),
        r   AS (SELECT doc_id, term, tfidf,
                       row_number() OVER (PARTITION BY doc_id
                                          ORDER BY tfidf DESC, term) AS rn
                FROM s)
        SELECT doc_id, term, tfidf, rn FROM r WHERE rn <= 3
    """,
    category="text",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: the classic MR two-job chain (tf, df) + join + top-3 per doc.

    The tf⋈df join is a plain shuffle join on term: both sides are already
    shuffled on (…, term) by their aggregations, and the df side is the
    corpus VOCABULARY — which outgrows a broadcast at corpus scale (round-1
    verdict), so no broadcast hint here.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_docs = float(docs.count())
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = tf.join(df, "term").select(
        "doc_id",
        "term",
        F.round(F.col("tf") * F.log(F.lit(n_docs) / F.col("df")), 6).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tfidf", "rn")
    )


@query(
    "doc_fingerprint",
    oracle="""
        SELECT doc_id,
               list_sum(list_transform(string_split(text, ' '),
                        (w, i) -> i * (length(w) * 7 + ascii(w))))::bigint
                 % 1000000007 AS fp
        FROM documents
    """,
    category="text",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive positional fingerprint (rolling-hash family):
    Σ position·(7·len(wᵢ) + ascii(wᵢ[0])) mod p — pure higher-order fns."""
    docs = load_table(spark, sf_dir, "documents")
    weighted = F.transform(
        tokens("text"),
        lambda w, i: (i + 1) * (F.length(w) * 7 + F.ascii(w)),
    )
    fp = (
        F.aggregate(weighted, F.lit(0).cast("bigint"), lambda acc, x: acc + x)
        % 1000000007
    )
    return docs.select("doc_id", fp.alias("fp"))


@query(
    "hash_functions_docs",
    oracle="""
        SELECT doc_id, md5(text) AS md5_hex, sha256(text) AS sha_hex
        FROM documents WHERE doc_id < 100
    """,
    category="scalar",
)
def hash_functions_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic hash functions (dedup keys / content addressing)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.col("doc_id") < 100).select(
        "doc_id",
        F.md5(F.encode("text", "UTF-8")).alias("md5_hex"),
        F.sha2(F.encode("text", "UTF-8"), 256).alias("sha_hex"),
    )


@query(
    "dedup_exact_docs",
    oracle="""
        SELECT count(*) AS n_unique
        FROM (SELECT text, min(doc_id) FROM documents GROUP BY text)
    """,
    category="dedup",
)
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup cardinality on full text."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("text")
        .agg(F.min("doc_id").alias("keep"))
        .agg(F.count(F.lit(1)).alias("n_unique"))
    )


@query(
    "dedup_exact_keep_first",
    oracle="""
        SELECT min(doc_id) AS keep_id, count(*) AS dup_count
        FROM documents GROUP BY md5(text)
    """,
    category="dedup",
)
def dedup_exact_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash, keep-lowest-id policy.

    Grouping on md5(text) instead of raw text: at 100 TB the shuffle moves
    16-byte keys, not document bodies.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5(F.encode("text", "UTF-8")).alias("h"))
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("dup_count"))
        .select("keep_id", "dup_count")
    )


@query(
    "dataset_split_assignment",
    oracle="""
        WITH b AS (
            SELECT doc_id,
                   (ascii(substr(md5(text), 1, 1)) * 256
                    + ascii(substr(md5(text), 2, 1))) % 100 AS bucket
            FROM documents
        )
        SELECT CASE WHEN bucket < 80 THEN 'train'
                    WHEN bucket < 90 THEN 'val'
                    ELSE 'test' END AS split,
               count(*) AS n_docs
        FROM b GROUP BY 1
    """,
    category="text",
)
def dataset_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split by content hash (~80/10/10).

    The standard leakage-safe split for training corpora: bucket =
    f(md5(content)) so the assignment is stable across runs, partitionings,
    and engines — never `rand()`, which is partitioning-dependent.
    """
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.encode("text", "UTF-8"))
    bucket = (
        F.ascii(F.substring(h, 1, 1)) * 256 + F.ascii(F.substring(h, 2, 1))
    ) % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return docs.groupBy(split.alias("split")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )


@query(
    "bpe_regex_token_counts",
    oracle=r"""
        SELECT doc_id,
               len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+'))::bigint
                   AS n_pieces,
               len(list_distinct(
                   regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+')))::bigint
                   AS n_unique_pieces
        FROM documents
    """,
    category="text",
)
def bpe_regex_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    r"""BPE-style regex pre-tokenization counts: alpha runs, digit runs, and
    punctuation runs as separate pieces (the GPT-2 pre-tokenizer family,
    restricted to a lookahead-free pattern so Java regex and RE2 agree).

    One narrow scan + per-row array ops, no shuffle; the piece stream is
    what a BPE merge pass would consume.
    """
    docs = load_table(spark, sf_dir, "documents")
    # F.lit pattern (not F.expr): Spark SQL string literals would eat the \s
    pieces = F.regexp_extract_all(
        F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"), F.lit(0)
    )
    return docs.select(
        "doc_id",
        F.size(pieces).cast("bigint").alias("n_pieces"),
        F.size(F.array_distinct(pieces)).cast("bigint").alias("n_unique_pieces"),
    )


@query(
    "token_entropy_docs",
    oracle="""
        WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                     FROM documents),
        c AS (SELECT doc_id, t, count(*)::double AS c
              FROM tok GROUP BY doc_id, t)
        SELECT doc_id,
               sum(c)::bigint AS n_tokens,
               round(ln(sum(c))
                     - sum(round(c * ln(c) * 1e9)::bigint)::double / 1e9
                       / sum(c), 6) AS token_entropy
        FROM c GROUP BY doc_id
    """,
    category="text",
)
def token_entropy_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc Shannon token entropy — the information-density quality
    signal (low entropy = repetitive/boilerplate text, a standard corpus
    filter alongside the Gopher repetition rules).

    Uses the algebraic identity  −Σ pᵢ·ln pᵢ = ln S − (Σ cᵢ·ln cᵢ)/S  with
    S = Σ cᵢ, so the whole thing is two chained map-side-combinable
    aggregations (token counts, then per-doc sums) — no per-doc total join,
    no window. The per-term cᵢ·ln cᵢ values (deterministic doubles from
    integer counts) quantize to a 1e-9 grid before the exact integer sum
    (money.py round-11): the double Σ merged in scheduler order, the
    run-nondeterministic flake class.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("t"))
    c = (
        tok.groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    s = F.sum("c")
    q = F.round(F.col("c") * F.log("c") * 1e9).cast("bigint")
    return c.groupBy("doc_id").agg(
        s.cast("bigint").alias("n_tokens"),
        F.round(
            F.log(s) - F.sum(q).cast("double") / F.lit(1e9) / s, 6
        ).alias("token_entropy"),
    )


@query(
    "inverted_index_terms",
    oracle="""
        WITH tok AS (SELECT DISTINCT doc_id,
                            unnest(string_split(text, ' ')) AS term
                     FROM documents)
        SELECT term,
               count(*)::bigint AS df,
               array_to_string(list_sort(list(doc_id))[1:10], ',') AS postings_head
        FROM tok GROUP BY term
    """,
    category="text",
)
def inverted_index_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build (the search-engine side of wordcount): for every
    term, its document frequency and the head of its sorted posting list.

    One explode + per-(doc, term) dedup + one groupBy on term — the posting
    list is assembled where the term's rows already live after the shuffle.
    Postings are string-serialized (array output columns break value
    hashing — the round-1 collect_set lesson) and truncated to 10: at
    corpus scale full posting lists are written as data files, not returned
    through a driver; df itself is the complete aggregate.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens("text")).alias("term")
    ).distinct()
    return tok.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.concat_ws(
            ",", F.slice(F.sort_array(F.collect_list("doc_id")), 1, 10)
        ).alias("postings_head"),
    )


@query(
    "pmi_bigrams_top",
    oracle="""
        WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
        big AS (SELECT unnest(list_transform(range(1, len(toks)),
                                             i -> [toks[i], toks[i + 1]])) AS bg
                FROM t),
        bc AS (SELECT bg[1] AS w1, bg[2] AS w2, count(*)::double AS c_xy
               FROM big GROUP BY 1, 2),
        uc AS (SELECT unnest(toks) AS w, count(*) OVER () AS _dummy FROM t),
        u AS (SELECT w, count(*)::double AS c FROM (SELECT unnest(toks) AS w FROM t) GROUP BY 1),
        n AS (SELECT (SELECT sum(c) FROM u) AS n_tok,
                     (SELECT sum(c_xy) FROM bc) AS n_big)
        SELECT w1, w2, c_xy::bigint AS c_xy,
               round(ln(c_xy * n_tok * n_tok / (n_big * u1.c * u2.c)), 6) AS pmi
        FROM bc, n
        JOIN u u1 ON bc.w1 = u1.w
        JOIN u u2 ON bc.w2 = u2.w
        WHERE c_xy >= 10
        ORDER BY pmi DESC, w1, w2
        LIMIT 20
    """,
    category="text",
)
def pmi_bigrams_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top adjacent word pairs by pointwise mutual
    information, PMI = ln(p(xy) / (p(x)·p(y))) with bigram and unigram
    probabilities from their own totals.

    Bigram and unigram counts are two aggregations over one token scan; the
    unigram table is vocabulary-sized, so the two enrichment joins shuffle
    only the distinct-bigram table (vocab², not corpus). PMI is rounded
    BEFORE the top-20 sort (cross-engine float noise cannot reorder the
    cutoff — same rule as pagerank), with a (w1, w2) tiebreak.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    t = docs.select(toks.alias("toks"))
    big = (
        # size >= 2 guard: a single-token doc would make sequence(1, 0)
        # count DOWN to [1, 0] and element_at(toks, 0) then throws
        # INVALID_INDEX_OF_ZERO — one such doc crashes the whole query.
        t.filter(F.size("toks") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - 1),
                    lambda i: F.struct(
                        F.element_at("toks", i).alias("w1"),
                        F.element_at("toks", i + 1).alias("w2"),
                    ),
                )
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
    )
    bc = big.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("double").alias("c_xy")
    )
    u = (
        t.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    totals = u.agg(F.sum("c").alias("n_tok")).crossJoin(
        bc.agg(F.sum("c_xy").alias("n_big"))
    )
    u1 = u.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = u.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    return (
        bc.filter(F.col("c_xy") >= 10)
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            F.col("c_xy").cast("bigint").alias("c_xy"),
            F.round(
                F.log(
                    F.col("c_xy")
                    * F.col("n_tok")
                    * F.col("n_tok")
                    / (F.col("n_big") * F.col("c1") * F.col("c2"))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(20)
    )


@query(
    "bigram_lm_score_docs",
    oracle="""
        WITH t AS (
            SELECT doc_id, w,
                   lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
            FROM (SELECT doc_id,
                         unnest(string_split(text, ' ')) AS w,
                         generate_subscripts(string_split(text, ' '), 1) AS pos
                  FROM documents)),
        big AS (SELECT doc_id, w AS w1, w2 FROM t WHERE w2 IS NOT NULL),
        bc AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY 1, 2),
        pc AS (SELECT w1, w2, c12, sum(c12) OVER (PARTITION BY w1) AS c1 FROM bc)
        SELECT big.doc_id, count(*) AS n_bigrams,
               round(sum(round(ln(c12::double / c1) * 1e9)::bigint)::double
                     / 1e9 / count(*), 6) AS avg_logp
        FROM big JOIN pc USING (w1, w2)
        GROUP BY big.doc_id
    """,
    category="text",
)
def bigram_lm_score_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram language-model fluency score per document —
    avg ln P(w2|w1) with MLE probabilities from the corpus itself. The
    perplexity-style quality signal of an LLM data pipeline, minus the
    external model: low scores flag repetitive or out-of-distribution docs.

    Two aggregations over one token scan (per-doc bigrams; corpus bigram
    counts), conditional counts via a window over the bigram table (vocab²
    rows, not corpus rows), then one shuffle join on (w1, w2) to score.
    Rounded AFTER the aggregate so cross-engine libm noise stays sub-cutoff.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    big = (
        # size >= 2 guard: a single-token doc would make sequence(1, 0)
        # count DOWN to [1, 0] and element_at(toks, 0) then throws
        # INVALID_INDEX_OF_ZERO — one such doc crashes the whole query
        # (the oracle's w2 IS NOT NULL predicate drops it instead).
        docs.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - 1),
                    lambda i: F.struct(
                        F.element_at("toks", i).alias("w1"),
                        F.element_at("toks", i + 1).alias("w2"),
                    ),
                )
            ).alias("bg"),
        )
        .select("doc_id", "bg.w1", "bg.w2")
    )
    bc = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    pc = bc.withColumn(
        "c1", F.sum("c12").over(Window.partitionBy("w1"))
    )
    return (
        big.join(pc, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            # per-row ln P (deterministic double from integer counts)
            # quantized at 1e-9 before the exact integer mean (money.py)
            F.round(
                F.sum(
                    F.round(
                        F.log(F.col("c12").cast("double") / F.col("c1")) * 1e9
                    ).cast("bigint")
                ).cast("double")
                / F.lit(1e9)
                / F.count(F.lit(1)),
                6,
            ).alias("avg_logp"),
        )
    )


@query(
    "feature_hash_docs",
    oracle="""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents),
        buck AS (
            SELECT doc_id,
                   (ascii(substr(md5(w), 1, 1)) * 256
                    + ascii(substr(md5(w), 2, 1))) % 256 AS f
            FROM tok WHERE w <> ''),
        fc AS (SELECT doc_id, f, count(*) AS c FROM buck GROUP BY 1, 2)
        SELECT doc_id,
               count(*)::bigint AS n_features,
               round(sqrt(sum(c * c)), 6) AS l2_norm,
               max(c)::bigint AS max_bucket
        FROM fc GROUP BY doc_id
    """,
    category="text",
)
def feature_hash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick: tokens map to a FIXED 256-dim feature space via a
    content hash (no vocabulary build, no fit step) — the unbounded-vocab
    featurizer of linear classifiers and quality models. Per-doc output:
    occupied buckets, L2 norm of the count vector, heaviest bucket.

    The hash is the engine-portable md5-byte bucket (same discipline as
    the split/mix samplers), so both engines land every token in the same
    bucket — making the whole featurization value-checkable, which a
    xxhash/murmur choice would not be (engine-specific seeds). One explode
    + two combinable aggregations; the feature space is fixed-width, so
    downstream state is O(docs · 256) regardless of vocabulary growth.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")
    h = F.md5(F.encode("w", "UTF-8"))
    f = (F.ascii(F.substring(h, 1, 1)) * 256 + F.ascii(F.substring(h, 2, 1))) % 256
    fc = tok.select("doc_id", f.alias("f")).groupBy("doc_id", "f").agg(
        F.count(F.lit(1)).alias("c")
    )
    return fc.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_features"),
        F.round(F.sqrt(F.sum(F.col("c") * F.col("c"))), 6).alias("l2_norm"),
        F.max("c").cast("bigint").alias("max_bucket"),
    )


BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY_DOC = 0  # the fixture doc whose terms form the query
BM25_TOP = 10


@query(
    "bm25_topk_docs",
    oracle=f"""
        WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
                     FROM documents),
        tf AS (SELECT doc_id, t, count(*)::double AS tf
               FROM tok GROUP BY doc_id, t),
        dl AS (SELECT doc_id, count(*)::double AS len FROM tok GROUP BY doc_id),
        stats AS (SELECT count(*)::double AS n, avg(len) AS avglen FROM dl),
        df AS (SELECT t, count(*)::double AS df FROM tf GROUP BY t),
        q AS (SELECT DISTINCT t FROM tf WHERE doc_id = {BM25_QUERY_DOC}),
        s AS (SELECT tf.doc_id,
                     sum(ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1)
                         * (tf.tf * ({BM25_K1} + 1))
                         / (tf.tf + {BM25_K1} * (1 - {BM25_B}
                            + {BM25_B} * dl.len / stats.avglen))) AS score
              FROM tf JOIN q USING (t)
                      JOIN dl USING (doc_id)
                      CROSS JOIN stats
                      JOIN df USING (t)
              WHERE tf.doc_id <> {BM25_QUERY_DOC}
              GROUP BY tf.doc_id)
        SELECT doc_id, round(score, 6) AS bm25
        FROM s
        ORDER BY round(score, 6) DESC, doc_id
        LIMIT {BM25_TOP}
    """,
    category="text",
)
def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval (Robertson/Lucene variant, k1=1.2, b=0.75): score every
    document against the query terms of doc 0, return the top 10 — the
    lexical-retrieval representative beside tfidf_top_terms (term weights)
    and the embedding family (dense retrieval).

    Scale shape: the postings table (doc, term, tf) is the only corpus-sized
    relation; the query-term set is broadcast-small by construction, so the
    scoring join prunes postings to query terms FIRST (broadcast semi-shape),
    then joins the doc-length table and the 1-row corpus stats — no
    all-terms × all-docs blowup. idf and the length normalization divide
    exact counts, rounded once at the end; top-k is TakeOrdered with a
    (score, doc_id) total order.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("t")
    )
    tf = tok.groupBy("doc_id", "t").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).cast("double").alias("len"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n"), F.avg("len").alias("avglen")
    )
    df = tf.groupBy("t").agg(F.count(F.lit(1)).cast("double").alias("df"))
    q = tf.filter(F.col("doc_id") == BM25_QUERY_DOC).select("t").distinct()
    idf = F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
    norm = F.col("tf") + BM25_K1 * (
        1 - BM25_B + BM25_B * F.col("len") / F.col("avglen")
    )
    s = (
        tf.join(F.broadcast(q), "t")
        .filter(F.col("doc_id") != BM25_QUERY_DOC)
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .join(df, "t")
        .groupBy("doc_id")
        .agg(F.sum(idf * F.col("tf") * (BM25_K1 + 1) / norm).alias("score"))
    )
    return (
        s.select("doc_id", F.round("score", 6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(BM25_TOP)
    )


_GAP_ORACLE = """
    WITH tok0 AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
                  FROM documents WHERE text <> ''),
    tok AS (SELECT doc_id, term FROM tok0 WHERE term <> ''),
    g AS (SELECT term, doc_id,
                 coalesce(doc_id - lag(doc_id) OVER (PARTITION BY term
                                                     ORDER BY doc_id),
                          doc_id + 1) AS gap
          FROM tok)
    SELECT term,
           count(*)::bigint AS df,
           max(gap)::bigint AS max_gap,
           round(avg(gap), 4) AS avg_gap,
           sum(2 * (length(printf('%b', gap)) - 1) + 1)::bigint AS gamma_bits,
           round(sum(2 * (length(printf('%b', gap)) - 1) + 1)
                 / count(*)::double, 4) AS bits_per_posting
    FROM g GROUP BY term
"""


@query("postings_delta_stats", oracle=_GAP_ORACLE, category="text")
def postings_delta_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index storage planning for the inverted index: per-term posting-list
    delta-gap statistics and the Elias-γ encoded size (2·⌊log₂ gap⌋ + 1
    bits per gap) — the number an index builder needs before choosing a
    compression codec, computed without building the index.

    Delta gaps come from one lag() window partitioned by term over the
    distinct (term, doc) postings (first posting's gap is doc_id+1, the
    delta from the -1 sentinel). The bit length is length(bin(gap)) on
    both engines — integer string length, never floor(log2(x)) float
    arithmetic, which disagrees across engines exactly at powers of two.
    One shuffle on the term key; every aggregate is combinable.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.filter(F.col("text") != "")
        .select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
        .distinct()
    )
    wt = Window.partitionBy("term").orderBy("doc_id")
    g = tok.select(
        "term",
        F.coalesce(
            F.col("doc_id") - F.lag("doc_id").over(wt), F.col("doc_id") + 1
        ).alias("gap"),
    )
    bits = 2 * (F.length(F.bin("gap")) - 1) + 1
    return g.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.max("gap").cast("bigint").alias("max_gap"),
        F.round(F.avg("gap"), 4).alias("avg_gap"),
        F.sum(bits).cast("bigint").alias("gamma_bits"),
        F.round(F.sum(bits) / F.count(F.lit(1)).cast("double"), 4).alias(
            "bits_per_posting"
        ),
    )


_KWIC_TERM = "spark"
_KWIC_CTX = 2  # words each side

_KWIC_ORACLE = f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws
                  FROM documents WHERE text <> ''),
    hits AS (SELECT doc_id, ws, k.i AS p
             FROM toks, generate_series(1, 4096) k(i)
             WHERE k.i <= len(ws) AND ws[k.i] = '{_KWIC_TERM}')
    SELECT doc_id, p::bigint AS pos,
           array_to_string(ws[greatest(1, p - {_KWIC_CTX}):
                              least(len(ws), p + {_KWIC_CTX})], ' ')
             AS context
    FROM hits
"""


@query("kwic_concordance", oracle=_KWIC_ORACLE, category="text")
def kwic_concordance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-in-context concordance — distributed grep with context, the
    original MapReduce demo upgraded: every occurrence of the term with a
    ±2-word window around it, addressed by (doc, position).

    posexplode gives the 1→N match positions; the context is a bounded
    array slice of the SAME tokenized row (no join back to the corpus, no
    second scan — tokens travel with their match). The filter on the
    exploded term prunes to matches before any context materializes, so
    the shuffle-free plan moves |matches| rows, not |tokens|.
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text") != "")
    toks = docs.select("doc_id", F.split("text", " ").alias("ws"))
    hits = toks.select(
        "doc_id",
        "ws",
        F.posexplode("ws"),
    ).filter(F.col("col") == _KWIC_TERM)
    p = F.col("pos") + 1  # 1-based token position
    start = F.greatest(F.lit(1), p - _KWIC_CTX)
    end = F.least(F.size("ws"), p + _KWIC_CTX)
    return hits.select(
        "doc_id",
        p.cast("bigint").alias("pos"),
        F.array_join(F.slice("ws", start, end - start + 1), " ").alias("context"),
    )


_HEAPS_ORACLE = """
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    dt AS (SELECT doc_id, greatest(len(ws) - 2, 0) AS ntri FROM d),
    tri AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
            FROM d, generate_series(1, 4096) s(i)
            WHERE i <= len(ws) - 2),
    fo AS (SELECT g, min(doc_id) AS fd FROM tri GROUP BY g),
    mx AS (SELECT max(doc_id) AS md FROM d),
    cp AS (SELECT ((i * (md + 1)) // 10) - 1 AS c
           FROM mx, generate_series(1, 10) s(i)),
    pts AS (SELECT cp.c,
                   (SELECT count(*) FROM fo WHERE fo.fd <= cp.c) AS v,
                   (SELECT sum(dt.ntri) FROM dt WHERE dt.doc_id <= cp.c) AS n
            FROM cp),
    q AS (SELECT round(ln(v) * 1e9)::bigint AS qy,
                 round(ln(n) * 1e9)::bigint AS qx
          FROM pts WHERE v > 0 AND n > 0),
    m AS (SELECT count(*)::double AS np,
                 sum(qx)::double AS sx, sum(qy)::double AS sy,
                 sum(qx::decimal(19,0) * qx)::double AS sxx,
                 sum(qx::decimal(19,0) * qy)::double AS sxy,
                 sum(qy::decimal(19,0) * qy)::double AS syy
          FROM q),
    c AS (SELECT np, sx, sy,
                 np * sxx - sx * sx AS dx, np * syy - sy * sy AS dy,
                 np * sxy - sx * sy AS cov
          FROM m)
    SELECT np::bigint AS n_points,
           round(CASE WHEN dx = 0 THEN NULL ELSE cov / dx END, 4) AS beta,
           round(exp((sy - CASE WHEN dx = 0 THEN NULL
                             ELSE cov / dx END * sx) / np / 1e9), 4) AS k,
           round(CASE WHEN dx <= 0 OR dy <= 0 THEN NULL
                      ELSE cov * cov / (dx * dy) END, 4) AS r2
    FROM c
"""


@query("heaps_law_fit", oracle=_HEAPS_ORACLE, category="text")
def heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit V(N) = K·N^β of trigram-vocabulary growth along the
    corpus — the companion corpus law to zipf_tail_index, and the number
    that predicts vocabulary (and BPE merge-table) size at 100× the data.

    The growth curve never materializes a running distinct count (the
    global-window trap): each trigram contributes its FIRST document
    (min(doc_id), one combinable groupBy), and V at a checkpoint is a
    count of first-occurrences at or before it — 10 checkpoint rows
    derived from the max doc id, evaluated as two small joins. The
    log-log fit is regr_slope/regr_intercept over 10 points.
    """
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("doc_id", F.split("text", " ").alias("ws"))
    dt = d.select(
        "doc_id", F.greatest(F.size("ws") - 2, F.lit(0)).alias("ntri")
    )
    tri = d.select(
        "doc_id",
        # Guarded: sequence(1, 0) on Spark yields [1, 0] (default step -1
        # when start > stop), and ws[-1] then throws under ANSI mode — docs
        # with <3 tokens must produce an empty trigram array, matching the
        # oracle's WHERE i <= len(ws)-2 bound.
        F.explode(
            F.expr(
                "CASE WHEN size(ws) >= 3 THEN"
                " transform(sequence(1, size(ws)-2),"
                " i -> concat_ws(' ', ws[i-1], ws[i], ws[i+1]))"
                " ELSE array() END"
            )
        ).alias("g"),
    )
    fo = tri.groupBy("g").agg(F.min("doc_id").alias("fd"))
    mx = d.agg(F.max("doc_id").alias("md"))
    cp = (
        # The checkpoint INDEX i rides along: when (md+1) is not a
        # multiple of 10 two checkpoints can share the same c, and the
        # oracle's regression weights that point twice (one pts row per
        # cp row) — grouping by c alone would silently dedupe it.
        mx.select(
            F.explode(F.sequence(F.lit(1), F.lit(10))).alias("i"), "md"
        )
        .select("i", F.expr("((i * (md + 1)) div 10) - 1").alias("c"))
    )
    v = (
        fo.crossJoin(F.broadcast(cp))
        .filter(F.col("fd") <= F.col("c"))
        .groupBy("i", "c")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    n = (
        dt.crossJoin(F.broadcast(cp))
        .filter(F.col("doc_id") <= F.col("c"))
        .groupBy("i", "c")
        .agg(F.sum("ntri").alias("n"))
    )
    pts = v.join(n, ["i", "c"]).filter((F.col("v") > 0) & (F.col("n") > 0))
    # log-log fit from EXACT quantized-integer moments (money.py
    # round-11; regr_* merges double co-moments in scheduler order)
    q = pts.selectExpr(
        "cast(round(ln(v) * 1e9) as bigint) AS qy",
        "cast(round(ln(n) * 1e9) as bigint) AS qx",
    )
    m = q.agg(
        F.count(F.lit(1)).cast("double").alias("np"),
        F.sum("qx").cast("double").alias("sx"),
        F.sum("qy").cast("double").alias("sy"),
        F.sum(F.col("qx").cast("decimal(19,0)") * F.col("qx"))
        .cast("double")
        .alias("sxx"),
        F.sum(F.col("qx").cast("decimal(19,0)") * F.col("qy"))
        .cast("double")
        .alias("sxy"),
        F.sum(F.col("qy").cast("decimal(19,0)") * F.col("qy"))
        .cast("double")
        .alias("syy"),
    )
    c2 = m.select(
        "np",
        "sx",
        "sy",
        (F.col("np") * F.col("sxx") - F.col("sx") * F.col("sx")).alias("dx"),
        (F.col("np") * F.col("syy") - F.col("sy") * F.col("sy")).alias("dy"),
        (F.col("np") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("cov"),
    )
    slope = F.when(F.col("dx") == 0, F.lit(None)).otherwise(
        F.col("cov") / F.col("dx")
    )
    return c2.select(
        F.col("np").cast("bigint").alias("n_points"),
        F.round(slope, 4).alias("beta"),
        F.round(
            F.exp(
                (F.col("sy") - slope * F.col("sx")) / F.col("np") / F.lit(1e9)
            ),
            4,
        ).alias("k"),
        F.round(
            F.when((F.col("dx") <= 0) | (F.col("dy") <= 0), F.lit(None))
            .otherwise(
                F.col("cov") * F.col("cov") / (F.col("dx") * F.col("dy"))
            ),
            4,
        ).alias("r2"),
    )


_SPARSE_TOP = 20
#: df-cap: drop terms present in more than this fraction of the corpus
#: (the df head carries ~zero idf weight but O(df^2) join fan-out).
_SPARSE_DF_FRAC = 0.5
#: prefix filter: keep only each doc's top-m weighted terms.
_SPARSE_TERMS_PER_DOC = 50

_SPARSE_ORACLE = f"""
    WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
                 FROM documents),
    tf AS (SELECT doc_id, term, count(*)::double AS tf
           FROM tok WHERE term <> '' GROUP BY doc_id, term),
    df AS (SELECT term, count(*)::double AS df FROM tf GROUP BY term),
    n AS (SELECT count(DISTINCT doc_id)::double AS nd FROM tf),
    wall AS (SELECT tf.doc_id, tf.term,
                    round(tf.tf * ln((SELECT nd FROM n) / df.df + 1), 9) AS w
             FROM tf JOIN df USING (term)
             WHERE df.df <= {_SPARSE_DF_FRAC} * (SELECT nd FROM n)),
    w AS (SELECT doc_id, term, w FROM wall
          QUALIFY row_number() OVER (PARTITION BY doc_id
                                     ORDER BY w DESC, term)
                  <= {_SPARSE_TERMS_PER_DOC}),
    nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY doc_id),
    dots AS (SELECT a.doc_id AS d1, b.doc_id AS d2, sum(a.w * b.w) AS dot
             FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
             GROUP BY a.doc_id, b.doc_id),
    sim AS (SELECT d1, d2,
                   round(dot / (n1.nrm * n2.nrm), 6) AS cosine
            FROM dots JOIN nrm n1 ON d1 = n1.doc_id
                      JOIN nrm n2 ON d2 = n2.doc_id)
    SELECT d1, d2, cosine
    FROM sim
    ORDER BY cosine DESC, d1, d2
    LIMIT {_SPARSE_TOP}
"""


@query("sparse_cosine_topk_docs", oracle=_SPARSE_ORACLE, category="text")
def sparse_cosine_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-IDF cosine: top-20 most lexically similar document pairs
    via the inverted-index join — the sparse-vector twin of the dense
    embedding family. A pair's dot product is the sum of w₁·w₂ over
    SHARED terms only, so the self-join runs on the postings list keyed
    by term and pairs that share nothing are never materialized — the
    fundamental sparse-MIPS advantage over any dense all-pairs pass.

    Per-term fan-out is O(df²), so the two standard guards are APPLIED in
    the plan (identically in the oracle, keeping the check exact): the df
    head is capped (terms in > {_SPARSE_DF_FRAC:.0%} of docs are dropped —
    they carry ~zero idf weight but quadratic join fan-out on one key at
    corpus scale), and each doc keeps only its top-{_SPARSE_TERMS_PER_DOC}
    weighted terms (prefix filter, deterministic (w DESC, term) tiebreak;
    w is rounded to 9 dp in plan AND oracle so the rank-50 boundary never
    flips on the ~1-ulp JVM-vs-libm log divergence),
    bounding the postings list to m·N rows and per-term fan-out to the
    cap². The operator is thus truncated-vector cosine — exact by
    definition, not an approximation of an unguarded query. idf uses
    ln(N/df + 1) so surviving terms keep a positive finite weight. Scores
    round to 6 dp before the (cosine, d1, d2) TakeOrdered.

    Duplicate-collapse (round-6 scale fix): dup-heavy corpora break the
    df² bound a different way — k identical copies of one text form a
    k-clique of cosine-1.0 pairs, so the pair join is Ω(k²) per duplicate
    group no matter how the postings are guarded (the 100× replicated
    study timed the old plan out at 500k docs / 4992 distinct texts,
    SCALING.md round 6). Identical text implies an identical truncated
    vector (tf is per-doc, df/nd are corpus-level, the top-m tiebreak is
    deterministic), so the plan collapses the corpus to one REPRESENTATIVE
    per distinct text first, runs tf-idf and the postings join over
    representatives only (df still counts every copy via the group size),
    and expands the top rep-level pairs back to doc pairs at the end.
    The expansion is exact for a global top-k: a doc pair using any id
    outside its group's k+1 smallest is dominated by k+1 smaller same-
    cosine pairs, and a rep pair outside the top-k by
    (cosine, best-expanded-pair) is dominated by k rep pairs each already
    contributing a better doc pair. Pair-join work now scales with
    DISTINCT-text volume; the dup mass costs one text-keyed shuffle.
    """
    k = _SPARSE_TOP
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    wg = Window.partitionBy("text").orderBy("doc_id")
    wga = Window.partitionBy("text")
    mem = docs.select(
        "doc_id",
        "text",
        F.row_number().over(wg).alias("rn"),
        F.min("doc_id").over(wga).alias("gid"),
    )
    reps = mem.filter(F.col("rn") == 1).select("gid", "text")
    gsz = mem.groupBy("gid").agg(F.count(F.lit(1)).alias("gsz"))
    # the k+1 smallest doc_ids per group cover every expandable top-k pair
    small = mem.filter(F.col("rn") <= k + 1).select("gid", "doc_id", "rn")

    tok = reps.select(
        "gid", F.explode(F.split(F.lower("text"), " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = tok.groupBy("gid", "term").agg(F.count(F.lit(1)).cast("double").alias("tf"))
    tfg = tf.join(gsz, "gid")
    # df counts DOCS (all copies), not distinct texts: sum the group sizes
    df = tfg.groupBy("term").agg(F.sum("gsz").cast("double").alias("df"))
    # nd = docs with >= 1 nonempty token (the oracle's count(DISTINCT
    # doc_id) FROM tf). A doc yields a nonempty token iff its text has a
    # non-space char, so this is a filtered scan count — NOT the old
    # tokenize + two-shuffle pipeline, which re-ran the whole postings
    # build eagerly at plan-construction time (~4.5 s of the bench's
    # planning_sec at sf0.1, and a pointless extra corpus pass at 100 TB).
    # Group members share identical text, so group-has-a-token == every-
    # member-has-a-token; NULL text tokenizes to nothing and rlike is
    # NULL-false, matching.
    nd = float(docs.where(F.col("text").rlike("[^ ]")).count())
    wall = tf.join(df.filter(F.col("df") <= _SPARSE_DF_FRAC * nd), "term").select(
        "gid",
        "term",
        F.round(F.col("tf") * F.log(F.lit(nd) / F.col("df") + 1), 9).alias("w"),
    )
    wtop = Window.partitionBy("gid").orderBy(F.desc("w"), F.asc("term"))
    w = (
        wall.withColumn("rn", F.row_number().over(wtop))
        .filter(F.col("rn") <= _SPARSE_TERMS_PER_DOC)
        .drop("rn")
    )
    nrm = w.groupBy("gid").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))

    a = w.select(F.col("gid").alias("g1"), "term", F.col("w").alias("w1"))
    b = w.select(F.col("gid").alias("g2"), "term", F.col("w").alias("w2"))
    dots = (
        a.join(b, "term")
        .filter(F.col("g1") < F.col("g2"))
        .groupBy("g1", "g2")
        .agg(F.sum(F.col("w1") * F.col("w2")).alias("dot"))
    )
    n1 = nrm.select(F.col("gid").alias("g1"), F.col("nrm").alias("nrm1"))
    n2 = nrm.select(F.col("gid").alias("g2"), F.col("nrm").alias("nrm2"))
    # best expanded pair of a cross rep-pair is (g1, g2) itself: gids are
    # group minima and g1 < g2, so every member of g2 exceeds g1.
    # nrm has one row per DISTINCT TEXT — unbounded at corpus scale, so it
    # is NOT broadcast (round-7 fix, same class as the MaxSim gsz change):
    # the join shuffles on g1/g2, keys the dots join already produced.
    cross = (
        dots.join(n1, "g1")
        .join(n2, "g2")
        .select(
            "g1",
            "g2",
            F.round(F.col("dot") / (F.col("nrm1") * F.col("nrm2")), 6).alias("cosine"),
            F.col("g1").alias("bd1"),
            F.col("g2").alias("bd2"),
        )
    )
    # within-group pairs (copies of one text): the vector's dot with
    # itself; only groups with >= 2 members qualify, and their best
    # expanded pair is the group's two smallest doc_ids
    pair2 = (
        small.filter(F.col("rn") <= 2)
        .groupBy("gid")
        .agg(
            F.min(F.when(F.col("rn") == 1, F.col("doc_id"))).alias("bd1"),
            F.min(F.when(F.col("rn") == 2, F.col("doc_id"))).alias("bd2"),
        )
        .filter(F.col("bd2").isNotNull())
    )
    selfdot = w.groupBy("gid").agg(F.sum(F.col("w") * F.col("w")).alias("dot"))
    selfp = (
        selfdot.join(nrm, "gid")
        .join(pair2, "gid")
        .select(
            F.col("gid").alias("g1"),
            F.col("gid").alias("g2"),
            F.round(F.col("dot") / (F.col("nrm") * F.col("nrm")), 6).alias("cosine"),
            "bd1",
            "bd2",
        )
    )
    # top-k rep pairs under (cosine DESC, best pair): a rep pair beyond
    # position k is dominated by k rep pairs each contributing a strictly
    # better doc pair, so it cannot reach the doc-level top-k
    top = (
        cross.unionByName(selfp)
        .orderBy(F.desc("cosine"), F.asc("bd1"), F.asc("bd2"))
        .limit(k)
    )
    m1 = small.select(
        F.col("gid").alias("g1"), F.col("doc_id").alias("i1"), F.col("rn").alias("r1")
    )
    m2 = small.select(
        F.col("gid").alias("g2"), F.col("doc_id").alias("i2"), F.col("rn").alias("r2")
    )
    ex_cross = (
        F.broadcast(top.filter(F.col("g1") != F.col("g2")).drop("bd1", "bd2"))
        .join(m1, "g1")
        .join(m2, "g2")
        .select(
            F.least("i1", "i2").alias("d1"),
            F.greatest("i1", "i2").alias("d2"),
            "cosine",
        )
    )
    ex_self = (
        F.broadcast(top.filter(F.col("g1") == F.col("g2")).drop("g2", "bd1", "bd2"))
        .join(m1, "g1")
        .join(m2.withColumnRenamed("g2", "g1"), "g1")
        .filter(F.col("r1") < F.col("r2"))
        .select(F.col("i1").alias("d1"), F.col("i2").alias("d2"), "cosine")
    )
    sim = ex_cross.unionByName(ex_self)
    return sim.orderBy(F.desc("cosine"), F.asc("d1"), F.asc("d2")).limit(k)


_KL_ORACLE = """
    WITH tok AS (SELECT source, unnest(string_split(lower(text), ' ')) AS w
                 FROM documents),
    tw AS (SELECT source, w, count(*)::double AS c
           FROM tok WHERE w <> '' GROUP BY source, w),
    vocab AS (SELECT DISTINCT w FROM tw),
    srcs AS (SELECT DISTINCT source FROM tw),
    vsize AS (SELECT count(*)::double AS v FROM vocab),
    ns AS (SELECT source, sum(c) AS n FROM tw GROUP BY source),
    grid AS (SELECT s.source, vb.w,
                    (coalesce(tw.c, 0) + 1)
                      / (ns.n + (SELECT v FROM vsize)) AS p
             FROM srcs s CROSS JOIN vocab vb
             LEFT JOIN tw ON tw.source = s.source AND tw.w = vb.w
             JOIN ns ON ns.source = s.source),
    pairs AS (SELECT a.source AS s1, b.source AS s2, a.w,
                     a.p AS pa, b.p AS pb, (a.p + b.p) / 2 AS m
              FROM grid a JOIN grid b
                ON a.w = b.w AND a.source < b.source)
    SELECT s1, s2,
           round(sum(round(pa * ln(pa / pb) * 1e15)
                       ::bigint::decimal(38,0))::double / 1e15, 6) AS kl_ab,
           round(sum(round(pb * ln(pb / pa) * 1e15)
                       ::bigint::decimal(38,0))::double / 1e15, 6) AS kl_ba,
           round(sum(round((pa / 2 * ln(pa / m) + pb / 2 * ln(pb / m)) * 1e15)
                       ::bigint::decimal(38,0))::double / 1e15, 6) AS jsd
    FROM pairs GROUP BY s1, s2
"""


@query("source_divergence_matrix", oracle=_KL_ORACLE, category="text")
def source_divergence_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise distributional divergence between document sources: KL in
    both directions and the symmetric Jensen-Shannon divergence over
    add-one-smoothed unigram distributions — the corpus-mixing diagnostic
    (which sources are interchangeable, which add genuinely new text)
    that sits upstream of domain-mix weighting.

    The corpus collapses to the (source, word) count table FIRST; the
    dense probability grid (sources × vocab, Laplace-smoothed so KL is
    finite everywhere) and the 190-pair join all run over
    vocabulary-bounded relations. At web scale the vocab cap (top-k by
    document frequency) bounds the grid — the divergences degrade
    gracefully to their top-k truncations.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(F.split(F.lower("text"), " ")).alias("w")
    ).filter(F.col("w") != "")
    tw = tok.groupBy("source", "w").agg(F.count(F.lit(1)).cast("double").alias("c"))
    vocab = tw.select("w").distinct()
    srcs = tw.select("source").distinct()
    v = float(vocab.count())
    ns = tw.groupBy("source").agg(F.sum("c").alias("n"))
    grid = (
        srcs.crossJoin(vocab)
        .join(tw, ["source", "w"], "left")
        .join(F.broadcast(ns), "source")
        .select(
            "source",
            "w",
            ((F.coalesce("c", F.lit(0.0)) + 1) / (F.col("n") + v)).alias("p"),
        )
    )
    a = grid.select(
        F.col("source").alias("s1"), "w", F.col("p").alias("pa")
    )
    b = grid.select(
        F.col("source").alias("s2"), "w", F.col("p").alias("pb")
    )
    pairs = a.join(b, "w").filter(F.col("s1") < F.col("s2"))
    m = (F.col("pa") + F.col("pb")) / 2
    # per-term divergence contributions (deterministic doubles) quantize
    # at 1e-15 before exact decimal sums (money.py round-11): per-term
    # error 5e-16 stays ~1e-9 below the 6dp grid even at 1e6-word vocabs
    def _q15(term):
        return F.sum(
            F.round(term * 1e15).cast("bigint").cast("decimal(38,0)")
        ).cast("double") / F.lit(1e15)

    return pairs.groupBy("s1", "s2").agg(
        F.round(
            _q15(F.col("pa") * F.log(F.col("pa") / F.col("pb"))), 6
        ).alias("kl_ab"),
        F.round(
            _q15(F.col("pb") * F.log(F.col("pb") / F.col("pa"))), 6
        ).alias("kl_ba"),
        F.round(
            _q15(
                F.col("pa") / 2 * F.log(F.col("pa") / m)
                + F.col("pb") / 2 * F.log(F.col("pb") / m)
            ),
            6,
        ).alias("jsd"),
    )
