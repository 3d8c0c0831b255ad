"""Reusable column-level function families (text analysis, similarity).

All functions here return Column expressions or DataFrames built purely
from ``pyspark.sql.functions`` — JVM-side, whole-stage-codegen friendly,
no Python UDFs in any hot path.
"""
