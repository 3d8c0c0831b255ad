"""PySpark-native analytics engine with the query and data-processing
capabilities of ``mohamedkashifuddin/delta-lake-gcp-implementation``.

The reference is a medallion (Bronze -> Silver -> Gold star schema)
payment-gateway lakehouse built from ~12 PySpark jobs of embedded Spark
SQL over Delta tables (see SURVEY.md).  This package re-expresses every
operator the reference uses as a composable, testable, idiomatic
PySpark DataFrame library, designed for a multi-executor cluster:

- ``session``    : SparkSession factory (AQE, UTC, Arrow, shuffle sizing)
- ``tables``     : testdata loaders + schema registry
- ``sources``    : typed CSV/parquet ingest, sinks (append/overwrite/upsert)
- ``operators``  : joins, aggregations, window dedup, SCD2, validation,
                   watermark bookkeeping, GDPR delete, dedup family
                   (exact / MinHash-LSH / SimHash / n-gram Jaccard)
- ``functions``  : scalar expression helpers, text analysis, similarity
- ``plans``      : the query catalog surfaced via ``__spark_entry__``
- ``streaming``  : Structured-Streaming equivalents of the incremental
                   (high-watermark) batch semantics

No code is copied from the reference; reference files are cited as
``file:line`` in docstrings for parity checking only.
"""

__version__ = "0.1.0"
