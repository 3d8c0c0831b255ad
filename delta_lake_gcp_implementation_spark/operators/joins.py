"""Join operators (SURVEY.md section 2.3).

- J1 star equi-join: fact source LEFT JOIN five dimensions; small dims
  are explicitly broadcast (the reference relied on auto-broadcast;
  we make it deliberate so the plan survives stats loss at scale).
- J3 anti join (NOT EXISTS new-member detection,
  ``gold_dim_customer_scd2.py:76-96``).
- J4 semi join (EXISTS, ``silver_propagate_deletes.py:53-62``).
- Point-in-time range-predicate join (SCD2 as-of semantics,
  ``README.md:311-319``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def star_join(
    fact: DataFrame,
    dims: list[tuple[DataFrame, Column | list[str]]],
    how: str = "left",
    broadcast_dims: bool = True,
) -> DataFrame:
    """J1: chain LEFT joins from a fact source to dimension tables.

    ``dims`` is a list of (dim_df, join_condition).  With
    ``broadcast_dims`` each dim is broadcast — one shuffle-free
    BroadcastHashJoin per dim regardless of fact size, the correct
    physical plan for a 100 TB fact against KB..MB dims.
    """
    out = fact
    for dim, cond in dims:
        d = F.broadcast(dim) if broadcast_dims else dim
        out = out.join(d, cond, how)
    return out


def anti_join(df: DataFrame, other: DataFrame, on: list[str] | Column) -> DataFrame:
    """J3: rows of ``df`` with no match in ``other`` (NOT EXISTS)."""
    return df.join(other, on, "left_anti")


def semi_join(df: DataFrame, other: DataFrame, on: list[str] | Column) -> DataFrame:
    """J4: rows of ``df`` with at least one match in ``other`` (EXISTS)."""
    return df.join(other, on, "left_semi")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-safe inner equi-join: when a few hot keys on the big side
    would overload single reducers, salt the big side into ``n_salts``
    sub-keys (deterministic: hash of the row's key + a monotonic id)
    and replicate the small side once per salt.  The join then spreads
    each hot key over ``n_salts`` reducers.

    AQE's skew-join split (enabled in session.py) handles most cases at
    runtime; explicit salting remains the tool when AQE cannot help —
    e.g. skewed aggregation feeding a join, or a non-splittable single
    partition.  Result equals the plain inner join (salt columns are
    internal and dropped).
    """
    salt = F.pmod(
        F.xxhash64(F.col(key), F.monotonically_increasing_id()), F.lit(n_salts)
    ).cast("int")
    big_s = big.withColumn("__salt", salt)
    salts = big.sparkSession.range(n_salts).select(
        F.col("id").cast("int").alias("__salt")
    )
    small_s = small.crossJoin(salts)
    return big_s.join(small_s, [key, "__salt"]).drop("__salt")


def two_phase_aggregate(
    df: DataFrame,
    key: str,
    amount_col: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-safe SUM/COUNT aggregation: partial-aggregate on
    (key, salt) first — hot keys spread over ``n_salts`` reducers —
    then final-aggregate on key.  Equivalent to the plain groupBy (sums
    re-associate; counts add); use for skewed keys where map-side
    combine alone leaves one reducer with the hot key's whole stream.
    """
    salted = df.withColumn(
        "__salt",
        F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int"),
    )
    partial = salted.groupBy(key, "__salt").agg(
        F.count("*").alias("__cnt"),
        F.sum(F.col(amount_col).cast("decimal(30,2)")).alias("__sum"),
    )
    return partial.groupBy(key).agg(
        F.sum("__cnt").alias("cnt"),
        F.sum("__sum").cast("decimal(30,2)").alias("total"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_value: str,
    out_ts: str = "asof_ts",
    out_value: str = "asof_value",
) -> DataFrame:
    """Time-series as-of join: attach to each left row the latest right
    row with ``right_ts <= left_ts`` for the same ``key`` (LEFT
    semantics — unmatched left rows keep NULLs).

    Implemented as the union-and-sweep plan rather than a range join:
    tag both sides, union, and run ``LAST(value) IGNORE NULLS`` over a
    per-key window ordered by ``(ts, side)`` — right rows sort before
    left rows at equal timestamps, giving ``<=`` (inclusive) matching.
    Cost is ONE hash shuffle of (|left|+|right|) rows on ``key`` and a
    linear in-partition sweep: no per-row candidate fan-out, no
    range-predicate nested loop, no broadcast requirement on either
    side — the plan that still works when both sides are 100 TB tick
    streams.  (A range-join rewrite explodes each left row into all
    earlier right candidates before picking max(ts); this never
    materializes candidates at all.)

    Right rows must be unique per (key, right_ts) — pre-aggregate ties
    (the catalog query reduces with max()) exactly as DuckDB's ASOF
    JOIN requires a deterministic pick.
    """
    rv_type = dict(right.dtypes)[right_value]
    rt_type = dict(right.dtypes)[right_ts]
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.col(right_ts).alias("__rts"),
        F.col(right_value).alias("__rv"),
        F.lit(0).alias("__side"),
    )
    l = (
        left.withColumn("__ts", F.col(left_ts))
        .withColumn("__rts", F.lit(None).cast(rt_type))
        .withColumn("__rv", F.lit(None).cast(rv_type))
        .withColumn("__side", F.lit(1))
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = u.withColumn(out_ts, F.last("__rts", ignorenulls=True).over(w)).withColumn(
        out_value, F.last("__rv", ignorenulls=True).over(w)
    )
    return swept.filter(F.col("__side") == 1).select(
        *left.columns, out_ts, out_value
    )


def point_in_time_join(
    df: DataFrame,
    dim: DataFrame,
    business_key: str,
    as_of: Column,
    start_col: str = "effective_start_date",
    end_col: str = "effective_end_date",
) -> DataFrame:
    """SCD2 as-of join: match the dimension version whose validity range
    covers ``as_of``.  Equi-join on the business key plus range
    predicate — Spark executes the equality as the hash-join key and the
    range as a post-join filter, so it stays a hash join (not a
    nested-loop), and a broadcast one when the dim is small.
    """
    cond = (
        (df[business_key] == dim[business_key])
        & (as_of >= dim[start_col])
        & (as_of <= dim[end_col])
    )
    return df.join(F.broadcast(dim), cond, "left")
