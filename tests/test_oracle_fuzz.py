"""Randomized cross-engine oracle fuzzing: hypothesis generates query
shapes (filter x group x aggregate) over the orders table; each shape
is built BOTH as a Spark DataFrame plan and as DuckDB SQL and the
results must match exactly — the property-based generalization of the
fixed catalog gate."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

# column expressions are LAZY (lambdas): building them needs an active
# SparkContext, which does not exist at module import time
FILTERS = {
    "none": ("true", lambda: F.lit(True)),
    "status_O": ("o_orderstatus = 'O'", lambda: F.col("o_orderstatus") == "O"),
    "price_hi": ("o_totalprice > 200000", lambda: F.col("o_totalprice") > 200000),
    "prio_like": ("o_orderpriority LIKE '1%'",
                  lambda: F.col("o_orderpriority").like("1%")),
    "date_lt": (
        "o_orderdate < TIMESTAMP '1996-06-01 00:00:00'",
        lambda: F.col("o_orderdate") < F.lit("1996-06-01 00:00:00").cast("timestamp"),
    ),
    "key_mod": ("o_orderkey % 7 = 0", lambda: F.col("o_orderkey") % 7 == 0),
}

GROUPS = {
    "status": "o_orderstatus",
    "priority": "o_orderpriority",
    "year": None,  # computed below
}

AGGS = {
    "cnt": ("count(*) AS cnt", lambda: F.count("*").alias("cnt")),
    "sum_price": (
        "CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(30,2)) AS sum_price",
        lambda: F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .cast("decimal(30,2)")
        .alias("sum_price"),
    ),
    "n_cust": ("count(DISTINCT o_custkey) AS n_cust",
               lambda: F.countDistinct("o_custkey").alias("n_cust")),
    "max_date": ("max(o_orderdate) AS max_date",
                 lambda: F.max("o_orderdate").alias("max_date")),
    "min_key": ("min(o_orderkey) AS min_key",
                lambda: F.min("o_orderkey").alias("min_key")),
}


@pytest.fixture(scope="module")
def orders(spark):
    df = spark.read.parquet(f"{SF}/orders.parquet")
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF}/orders.parquet'")
    return con


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    flt=st.sampled_from(sorted(FILTERS)),
    grp=st.sampled_from(sorted(GROUPS)),
    aggs=st.sets(st.sampled_from(sorted(AGGS)), min_size=1, max_size=3),
)
def test_random_query_shapes_match_duckdb(orders, ddb, flt, grp, aggs):
    aggs = sorted(aggs)
    sql_f, col_f = FILTERS[flt]
    col_f = col_f()

    if grp == "year":
        gcol = F.year("o_orderdate").alias("g")
        gsql = "CAST(year(o_orderdate) AS INTEGER)"
    else:
        gcol = F.col(GROUPS[grp]).alias("g")
        gsql = GROUPS[grp]

    sdf = (
        orders.filter(col_f)
        .groupBy(gcol)
        .agg(*[AGGS[a][1]() for a in aggs])
    )
    spark_rows = {
        tuple(str(v) for v in row) for row in sdf.collect()
    }

    agg_sql = ", ".join(AGGS[a][0] for a in aggs)
    q = f"SELECT {gsql} AS g, {agg_sql} FROM orders WHERE {sql_f} GROUP BY 1"
    ddb_rows = {tuple(str(v) for v in row) for row in ddb.execute(q).fetchall()}

    assert spark_rows == ddb_rows, f"shape filter={flt} group={grp} aggs={aggs}"


# ---------------------------------------------------------------- curation text fuzz

_PII_SNIPPETS = [
    "bob.smith+x@sub.example.org",
    "a@b.co",
    "25-989-741-2988",
    "00-000-000-0000",
    "10.0.3.4",
    "192.168.001.1",
    "not-a-phone 25-98-741-2988",
    "almost@an@email",
    "1.2.3",
]

# printable ASCII without \x0b/\x0c: Java's \s includes vertical tab,
# RE2's does not — the functions are documented ASCII-text ops, so the
# fuzz stays inside the common dialect.
_ALPHABET = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    " \t\n.-@%_+<>!,:/#()"
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    parts=st.lists(
        st.one_of(
            st.text(alphabet=_ALPHABET, min_size=0, max_size=30),
            st.sampled_from(_PII_SNIPPETS),
        ),
        min_size=1,
        max_size=6,
    )
)
def test_scrub_and_normalize_match_duckdb(spark, parts):
    """Java-regex vs RE2 parity on adversarial inputs: scrub_pii and
    normalize_text must produce byte-identical output in both engines."""
    from delta_lake_gcp_implementation_spark.functions import text as T

    s = " ".join(parts)
    df = spark.createDataFrame([(s,)], ["t"])
    row = df.select(
        T.scrub_pii(F.col("t")).alias("scrubbed"),
        T.normalize_text(F.col("t")).alias("norm"),
    ).first()
    con = duckdb.connect()
    want = con.execute(
        f"""
        SELECT regexp_replace(regexp_replace(regexp_replace(?,
                   '{T.PII_EMAIL}', '<EMAIL>', 'g'),
                   '{T.PII_PHONE}', '<PHONE>', 'g'),
                   '{T.PII_IPV4}', '<IP>', 'g') AS scrubbed,
               trim(regexp_replace(regexp_replace(lower(?),
                   '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')) AS norm
        """,
        [s, s],
    ).fetchone()
    assert row.scrubbed == want[0], f"scrub diverged on {s!r}"
    assert row.norm == want[1], f"normalize diverged on {s!r}"
