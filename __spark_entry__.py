"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star aggregation at sf0.001;
``queries()``/``oracle_sql()`` surface the full operator catalog from
``delta_lake_gcp_implementation_spark.plans`` for the DuckDB
correctness gate at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from delta_lake_gcp_implementation_spark.plans import CATALOG


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from delta_lake_gcp_implementation_spark.plans.relational import q_star_rollup

    return q_star_rollup(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return {name: spec.builder for name, spec in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (omitted for
    non-SQL-expressible operators -> driver runs rows-only check)."""
    return {
        name: spec.oracle_sql
        for name, spec in CATALOG.items()
        if spec.oracle_sql is not None
    }
