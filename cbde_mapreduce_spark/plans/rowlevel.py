"""Row-level cross-engine probes for the transcendental quantization grids.

ADVICE r11 (money.py): the round-11 sweep quantizes per-row
transcendental outputs (ln / exp / pow sites) to fixed integer grids
before the exact integer sum. That removes the run-nondeterministic
SUM-order flake by construction, but the CROSS-ENGINE identity of the
per-row quantized integer still rests on Spark's (JVM Math) and DuckDB's
(C libm) transcendentals agreeing after quantization. A last-ulp
disagreement flips the integer only when the true value lands within
~1 ulp of a half-grid boundary; aggregate parity can mask a lone
flipped row (two flips can even cancel), so these probes compare the
quantized integers ROW BY ROW — one probe per transcendental family,
each mirroring a real production site's expressions exactly:

- ``rowlevel_ln_grid``      ln @1e9    (stats_models.py price elasticity)
- ``rowlevel_entropy_grid`` c·ln c @1e9 (text.py token_entropy_docs)
- ``rowlevel_exp_grid``     exp @1e6   (events_q.py decay_weighted_user_value)
- ``rowlevel_pow_grid``     pow @1e16  (similarity_q.py int8_quantization_stats)

Expected boundary-hit probability (documented per the advice): for a
value of magnitude m quantized to grid g, a 1-ulp libm disagreement can
flip the integer only within ~2 ulp of a half-grid point, i.e. per-row
probability ≈ 2·(m·2⁻⁵²)/g ≈ 4.4e-16·m/g IF the engines' libm differ at
that argument at all. Concretely: ln sites (m≈10, g=1e-9) ≈ 4e-6/row
worst case; exp-decay (m≈500·1, g=1e-6) ≈ 2e-7/row; pow residuals
(m≈1e-4, g=1e-16) ≈ 4e-4/row worst case but pow(x,2) is a single IEEE
multiply — exactly reproducible, so its real risk is ~0. These probes
turn that residual from "sampled by aggregate parity" into "asserted at
the row level" on every fixture and every rolled dup corpus
(tools_dup_value_sweep.py runs them after the registry loop).

These are NOT registry queries (they'd distort the driver window and the
oracled/rows-only counts); they run through the same assert_parity
harness from tests/test_money_rowlevel.py and the dup-value sweep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cbde_mapreduce_spark.functions.texttools import tokens
from cbde_mapreduce_spark.sources import load_table


def rowlevel_ln_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lineitem ln grid: the elasticity site's qx/qy, keyed per row."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("int").alias("l_linenumber"),
        F.when(
            F.col("l_quantity") > 0,
            F.round(F.log("l_quantity") * 1e9).cast("bigint"),
        ).alias("qy"),
        F.when(
            F.col("l_extendedprice") > 0,
            F.round(F.log("l_extendedprice") * 1e9).cast("bigint"),
        ).alias("qx"),
    )


ROWLEVEL_LN_SQL = """
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity > 0
                THEN round(ln(l_quantity) * 1e9)::bigint END AS qy,
           CASE WHEN l_extendedprice > 0
                THEN round(ln(l_extendedprice) * 1e9)::bigint END AS qx
    FROM lineitem
"""


def rowlevel_entropy_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(doc, token) c·ln(c) grid: token_entropy_docs' summand."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("t"))
    c = tok.groupBy("doc_id", "t").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    return c.select(
        "doc_id",
        "t",
        F.round(F.col("c") * F.log("c") * 1e9).cast("bigint").alias("q"),
    )


ROWLEVEL_ENTROPY_SQL = """
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                 FROM documents),
    c AS (SELECT doc_id, t, count(*)::double AS c
          FROM tok GROUP BY doc_id, t)
    SELECT doc_id, t, round(c * ln(c) * 1e9)::bigint AS q
    FROM c
"""


def rowlevel_exp_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event exp-decay grid: decay_weighted_user_value's summand."""
    events = load_table(spark, sf_dir, "events")
    t_max = events.agg(F.max(F.expr("ts_ns div 1000")).alias("tmax_us"))
    us = F.expr("ts_ns div 1000")
    return (
        events.crossJoin(F.broadcast(t_max))
        .select(
            "event_id",
            F.round(
                F.col("value")
                * F.exp(-(F.col("tmax_us") - us) / F.lit(86400000000.0))
                * 1000000
            )
            .cast("bigint")
            .alias("q"),
        )
    )


ROWLEVEL_EXP_SQL = """
    WITH m AS (SELECT max(ts) AS t_max FROM events)
    SELECT event_id,
           round(value * exp(-(epoch_us(t_max) - epoch_us(ts))
                             / 86400000000.0)
                 * 1000000)::bigint AS q
    FROM events, m
"""


def rowlevel_pow_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(vec, dim) squared-residual grid: int8_quantization_stats'
    summand, with vec_id carried through for the row key."""
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "i0", "v"
        ),
    ).select("vec_id", (F.col("i0") + 1).alias("i"), "v")
    st = dims.groupBy("i").agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    sc = st.select(
        "i", "lo", ((F.col("hi") - F.col("lo")) / 255.0).alias("scale")
    )
    q = dims.join(F.broadcast(sc), "i").select(
        "vec_id",
        "i",
        F.least(
            F.lit(255.0),
            F.greatest(
                F.lit(0.0),
                F.floor(
                    F.try_divide(F.col("v") - F.col("lo"), F.col("scale"))
                    + 0.5
                ),
            ),
        ).alias("code"),
        "v",
        "lo",
        "scale",
    )
    return q.select(
        "vec_id",
        "i",
        F.round(
            F.pow(
                F.col("v") - (F.col("lo") + F.col("code") * F.col("scale")),
                2,
            )
            * 1e16
        )
        .cast("bigint")
        .alias("q"),
    )


ROWLEVEL_POW_SQL = """
    WITH dims AS (
        SELECT e.vec_id, i, e.embedding[i]::double AS v
        FROM embeddings e, generate_series(1, 64) s(i)),
    st AS (SELECT i, min(v) AS lo, max(v) AS hi FROM dims GROUP BY i),
    sc AS (SELECT i, lo, (hi - lo) / 255.0 AS scale FROM st),
    q AS (SELECT d.vec_id, d.i, d.v, sc.lo, sc.scale,
                 least(255, greatest(0, floor((d.v - sc.lo) / sc.scale + 0.5)))
                   AS code
          FROM dims d JOIN sc ON d.i = sc.i)
    SELECT vec_id, i,
           round(pow(v - (lo + code * scale), 2) * 1e16)::bigint AS q
    FROM q
"""


#: (name, spark builder, DuckDB SQL) — one per transcendental family.
ROWLEVEL_PROBES = [
    ("rowlevel_ln_grid", rowlevel_ln_grid, ROWLEVEL_LN_SQL),
    ("rowlevel_entropy_grid", rowlevel_entropy_grid, ROWLEVEL_ENTROPY_SQL),
    ("rowlevel_exp_grid", rowlevel_exp_grid, ROWLEVEL_EXP_SQL),
    ("rowlevel_pow_grid", rowlevel_pow_grid, ROWLEVEL_POW_SQL),
]
