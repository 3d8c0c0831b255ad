"""Testdata table loaders.

The driver provides TPC-H-ish parquet tables (TESTDATA.md) at
``/root/testdata/sf{0.001,0.01,0.1}/``.  Loaders keep explicit column
selection out of hot paths — Catalyst prunes columns and pushes filters
into the parquet scan when the plan is declarative.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet is TIMESTAMP(NANOS), unreadable by Spark
        # without this flag.  Set at runtime so the engine also works
        # on sessions we didn't build (e.g. the verify driver's).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read via nanosAsLong; truncate to Spark's
        # native microsecond timestamps with *integer* division (ns
        # epoch exceeds 2^53 — float division would corrupt low digits).
        # Oracle-side equivalent: make_timestamp(epoch_ns(ts)//1000).
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def scale_out(df: DataFrame, *keys: str) -> DataFrame:
    """Raise partition count to the cluster's parallelism before a
    CPU-heavy per-row stage (shingling, per-token hashing).

    A small corpus arrives as one file partition (below
    ``maxPartitionBytes``), which serializes the expensive explode/hash
    work on a single core no matter how many the cluster has — measured
    7 s of single-threaded shingle stages on local[32] at sf0.1.  The
    round-robin repartition shuffles only the raw rows (cheap relative
    to the per-shingle work it parallelizes) and is a NO-OP whenever
    the scan already has enough partitions — i.e. always at real corpus
    scale, where file count >> core count; only undersized scans pay
    the extra exchange.

    Pass ``keys`` to HASH-partition instead of round-robin when a
    downstream window/groupBy clusters on those columns AFTER a
    fan-out (explode): the pre-fan-out exchange moves one row per
    source record and the post-fan-out exchange disappears — the r13
    winnowing A/B measured 27.5 s (round-robin: ~150M gram rows
    re-shuffled for the per-doc window) vs 17.5 s (hash-by-doc: only
    the 500k doc rows move).  With keys the repartition always runs —
    the downstream operator needs the clustering even when the scan is
    already wide."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if keys:
        return df.repartition(max(df.rdd.getNumPartitions(), target), *keys)
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view for ``spark.sql`` queries."""
    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
