"""Raw-file ingest (S1/S2/S4, SURVEY.md section 2.1).

The reference reads header CSV day-drops all-string and casts
column-by-column afterwards (``validate_bronze.py:20,26-43``).  We keep
the same two-phase shape (schemaless scan -> explicit typed projection)
because it is load-bearing: a malformed value must reach the Tier-1/2
validation predicates as data, not kill the scan.

Scale notes: CSV scans parallelize per file/split; explicit projection
keeps column pruning effective downstream; ``PERMISSIVE`` mode plus the
corrupt-record column routes unparseable lines into quarantine instead
of failing the job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as sqltypes


def read_raw_csv(
    spark: SparkSession,
    path: str,
    columns: list[str],
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """S1 CSV batch scan: header CSV (glob ok), every column STRING —
    the reference's schemaless ingest, plus a corrupt-record column so
    broken lines become quarantinable rows."""
    schema = sqltypes.StructType(
        [sqltypes.StructField(c, sqltypes.StringType()) for c in columns]
        + [sqltypes.StructField(corrupt_col, sqltypes.StringType())]
    )
    return (
        spark.read.option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .schema(schema)
        .csv(path)
    )


def typed_projection(
    raw: DataFrame, casts: dict[str, str], ts_truncate: list[str] = ()
) -> DataFrame:
    """S2 typed projection: cast each column to its declared type;
    timestamp columns parsed via SUBSTRING(x,1,19) truncation exactly
    like ``validate_bronze.py:28`` (drops sub-second noise).

    Casts use ``try_cast``: the reference ran Spark 3.3 non-ANSI where
    a malformed value casts to NULL and flows into Tier-1 quarantine
    routing; Spark 4's ANSI default would instead kill the scan."""
    cols = []
    for name, dtype in casts.items():
        if name in ts_truncate:
            cols.append(
                F.try_to_timestamp(F.substring(F.col(name), 1, 19)).alias(name)
            )
        else:
            cols.append(F.col(name).try_cast(dtype).alias(name))
    return raw.select(*cols)


def date_spine(spark: SparkSession, start: str, end: str) -> DataFrame:
    """S4 in-memory VALUES source, Spark-first: the reference builds its
    2,192-row date spine with a Python loop (``gold_dim_date.py:35-64``);
    native ``sequence()`` declares it as one expression."""
    return spark.sql(
        f"SELECT explode(sequence(to_date('{start}'), to_date('{end}'))) AS full_date"
    )
