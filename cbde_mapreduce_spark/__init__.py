"""cbde_mapreduce_spark — a PySpark-native analytics engine.

A brand-new, idiomatic-Spark engine providing the query and data-processing
capabilities of the reference MapReduce implementation (`casassg/cbde-mapreduce`),
re-expressed on the Spark DataFrame/SQL stack, plus LLM-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis) designed for
100 TB scale.

NOTE on reference citations: `/root/reference/` contained zero files at build
time (see SURVEY.md §0), so docstrings cite the MapReduce *model* surface the
reference implements (SURVEY.md §2 rows) rather than file:line into the
reference, which would be fabricated.

Layout:
    session.py    SparkSession factory with scale-tuned defaults (AQE, skew join)
    sources/      table loaders (parquet scans, ns-timestamp handling)
    functions/    reusable column expression builders (vectors, text)
    operators/    composite operators (as-of join, MinHash-LSH, SimHash, ANN)
    plans/        the query registry: every SURVEY.md §2 operator as a named
                  (DataFrame builder, DuckDB oracle SQL) pair
    streaming/    Structured Streaming growth path (event-time, sessionization)
"""

__version__ = "0.1.0"
