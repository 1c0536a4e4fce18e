"""Text-cleaning expressions (functions/cleaning.py) over raw-web-shaped
inputs. The fixture corpus is pre-cleaned, so the discriminating cases are
constructed here; the expressions themselves are pure JVM built-ins, so
what is asserted is the cleaning semantics, not fixture luck."""

from pyspark.sql import functions as F

from cbde_mapreduce_spark.functions.cleaning import (
    clean_text,
    normalize_ws,
    redact_pii,
    strip_html,
)

RAW = [
    # (raw, cleaned) pairs — cleaned is the expected clean_text() output
    (
        "<p>Hello   <b>world</b></p>&nbsp;mail me at bob.smith+x@example.co.uk!",
        "Hello world mail me at <EMAIL>!",
    ),
    (
        "call +1 (555) 123-4567 or 555-123-4567 \x00\x1f today",
        "call <PHONE> or <PHONE> today",
    ),
    (
        "ssn-ish 123456789012 short 1234 ip 192.168.0.1 end",
        "ssn-ish <ID> short 1234 ip <IP> end",
    ),
    (
        "no&#160;entities &lt; kept as space, price $12.99 intact",
        "no entities kept as space, price $12.99 intact",
    ),
]


def test_clean_text_end_to_end(spark):
    df = spark.createDataFrame([(i, raw) for i, (raw, _) in enumerate(RAW)], "i int, t string")
    got = {
        r["i"]: r["c"]
        for r in df.select("i", clean_text("t").alias("c")).collect()
    }
    for i, (_, want) in enumerate(RAW):
        assert got[i] == want, f"case {i}: {got[i]!r} != {want!r}"


def test_stage_isolation(spark):
    df = spark.createDataFrame(
        [("<i>x</i> a@b.co  \t two\nlines",)], "t string"
    )
    row = df.select(
        strip_html("t").alias("h"),
        redact_pii("t").alias("p"),
        normalize_ws("t").alias("w"),
    ).first()
    assert "<i>" not in row["h"] and "a@b.co" in row["h"]
    assert "<EMAIL>" in row["p"] and "<i>x</i>" in row["p"]
    assert "\t" not in row["w"] and "\n" not in row["w"]


def test_clean_is_single_projection(spark):
    """The fused expression must not introduce exchanges or extra stages."""
    df = spark.range(10).select(F.concat(F.lit("<b>"), F.col("id")).alias("t"))
    plan = df.select(clean_text("t").alias("c"))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_idempotent_on_clean_fixture(spark, sf_smoke):
    """On the already-clean corpus, cleaning is the identity — guards
    against over-eager patterns mangling legitimate text."""
    from cbde_mapreduce_spark.sources import load_table

    docs = load_table(spark, sf_smoke, "documents")
    changed = docs.filter(clean_text("text") != F.col("text")).count()
    assert changed == 0
