"""Query catalog surfaced through ``__spark_entry__``.

``catalog.CATALOG`` maps query name -> QuerySpec(spark_builder,
oracle_sql).  Builders are pure functions (spark, sf_dir) -> DataFrame
using the operator library; oracle_sql is the ANSI-SQL equivalent DuckDB
runs over the same parquet for the driver's correctness gate.
"""

from .catalog import CATALOG, QuerySpec  # noqa: F401
