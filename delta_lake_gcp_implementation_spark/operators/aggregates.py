"""Aggregation operators (SURVEY.md section 2.4).

All are single-shuffle hash aggregations with map-side partial
aggregation (Spark default); nothing collects to the driver except
scalar control-flow reads, mirroring the reference's
``.first()['cnt']`` pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def customer_rollup(
    df: DataFrame,
    key: str,
    ts_col: str,
    amount_col: str | Column,
    active_pred: Column,
    tier_bounds: tuple[int, int, int] = (100, 50, 20),
) -> DataFrame:
    """A2: per-entity lifetime rollup + tier bucketing
    (``gold_dim_customer_scd2.py:32-54``): COUNT/MIN/MAX/SUM plus
    ``MAX(CASE WHEN ...)`` activity flag and a CASE ladder over the
    aggregated count.

    ``amount_col`` accepts a Column so money inputs can be summed
    through an exact DECIMAL cast (a raw double SUM is
    partition-order-dependent in the last ULPs — callers pass e.g.
    ``F.col("amount").cast("decimal(12,2)")``).
    """
    p, g, s = tier_bounds
    amount = F.col(amount_col) if isinstance(amount_col, str) else amount_col
    agg = df.groupBy(key).agg(
        F.count("*").alias("transaction_count"),
        F.min(ts_col).alias("first_transaction_date"),
        F.max(ts_col).alias("last_transaction_date"),
        F.sum(amount).alias("lifetime_value"),
        F.max(F.when(active_pred, True).otherwise(False)).alias("is_active"),
    )
    tier = (
        F.when(F.col("transaction_count") >= p, "Platinum")
        .when(F.col("transaction_count") >= g, "Gold")
        .when(F.col("transaction_count") >= s, "Silver")
        .otherwise("Bronze")
    )
    return agg.withColumn("customer_tier", tier)


def conditional_counts(df: DataFrame, preds: dict[str, Column]) -> DataFrame:
    """A4: ``SUM(CASE WHEN p THEN 1 ELSE 0 END)`` audit block
    (``validate_fact_transactions.py:233-241``)."""
    return df.agg(
        *[
            F.sum(F.when(p, 1).otherwise(0)).cast("bigint").alias(name)
            for name, p in preds.items()
        ]
    )


def greatest_watermark(df: DataFrame, cols: list[str]) -> DataFrame:
    """A7: ``GREATEST(MAX(a), MAX(b))`` next-watermark computation
    (``load_bronze.py:113-116``)."""
    return df.agg(
        F.greatest(*[F.max(c) for c in cols]).alias("next_watermark")
    )


def percentile_cont_grouped(
    df: DataFrame,
    group_col: str,
    value_col: str,
    tiebreak_col: str,
    ps: dict[str, float],
    count_alias: str = "n_rows",
) -> DataFrame:
    """Exact grouped PERCENTILE_CONT via rank-and-two-point-pick.

    ``percentile_cont(p)`` needs only the two order statistics
    bracketing rank ``h = (n-1)·p``, so instead of collecting or fully
    sorting each group we (1) rank rows in one per-group window shuffle,
    (2) conditionally keep just the bracketing values in a hash
    aggregation, and (3) interpolate ``v_lo + (v_hi - v_lo)·frac``.
    Linear work, one shuffle, nothing driver-side — unlike a naive
    sort-and-index this survives groups of any size.

    The interpolation is written with the SAME expression tree the
    DuckDB oracle uses: per cross-engine determinism rule (2)
    (plans/relational.py header), identical IEEE operand sequences are
    bit-deterministic, so the result hash-matches without rounding.
    ``F.percentile`` exists but interpolates with an engine-specific
    tree — fine for users, unprovable at the oracle boundary.

    r16 (guide §2.2/§2.3): the rank runs over per-(group, value)
    COUNTS, not rows.  The value at any rank is determined by the
    value multiset alone — ``tiebreak_col`` only permutes rows WITHIN
    a tied value, which cannot change which value occupies rank k —
    so a fully-parallel partial-agg count first, then the per-group
    ordered window over DISTINCT values, is output-identical.  The
    old row-level window sorted every row of a group in one task: at
    100x (60M lineitem rows, 3 return flags) that was a 90 s 3-task
    straggler vs ~600k distinct (flag, price) pairs after the count
    (measured; the verdict key fell 78 -> 8 s).  ``tiebreak_col`` is
    kept in the signature for callers that pin row-deterministic
    semantics in their docs; it no longer affects the plan.
    """
    wr = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy(group_col)
    # NULL values are excluded (PERCENTILE_CONT semantics); keeping
    # them would also diverge cross-engine on rank order (Spark sorts
    # NULLS FIRST, DuckDB NULLS LAST)
    counted = (
        df.select(group_col, value_col)
        .filter(F.col(value_col).isNotNull())
        .groupBy(group_col, value_col)
        .agg(F.count(F.lit(1)).alias("__c"))
        .withColumn("__cum", F.sum("__c").over(wr))
        .withColumn("__n", F.sum("__c").over(wn))
    )
    picks = []
    for name, p in ps.items():
        h = (F.col("__n") - 1) * F.lit(p)
        lo_rank = F.floor(h) + 1
        hi_rank = F.ceil(h) + 1
        below = F.col("__cum") - F.col("__c")  # rows strictly before v
        picks.append(
            F.max(
                F.when(
                    (below < lo_rank) & (lo_rank <= F.col("__cum")),
                    F.col(value_col),
                )
            ).alias(f"__lo_{name}")
        )
        picks.append(
            F.max(
                F.when(
                    (below < hi_rank) & (hi_rank <= F.col("__cum")),
                    F.col(value_col),
                )
            ).alias(f"__hi_{name}")
        )
    out = counted.groupBy(group_col).agg(
        F.max("__n").cast("bigint").alias(count_alias), *picks
    )
    for name, p in ps.items():
        h = (F.col(count_alias) - 1) * F.lit(p)
        frac = h - F.floor(h)
        out = out.withColumn(
            name,
            F.col(f"__lo_{name}")
            + (F.col(f"__hi_{name}") - F.col(f"__lo_{name}")) * frac,
        )
    return out.drop(
        *[c for name in ps for c in (f"__lo_{name}", f"__hi_{name}")]
    )


def pct_of_total(
    df: DataFrame, group_col: str, weight: Column | None = None
) -> DataFrame:
    """A10: grouped counts with percent-of-total.

    Implemented as groupBy + a scalar total joined back via a windowless
    cross-broadcast rather than an unpartitioned window: an
    ``OVER ()`` window funnels every group row through one partition,
    while broadcasting the 1-row total keeps the plan fully parallel.
    """
    counts = df.groupBy(group_col).agg(
        (F.count("*") if weight is None else F.sum(weight)).alias("cnt")
    )
    total = counts.agg(F.sum("cnt").alias("total"))
    # single IEEE division of exact integer operands -> deterministic
    # across engines without rounding
    return counts.join(F.broadcast(total)).select(
        group_col,
        F.col("cnt"),
        (100.0 * F.col("cnt") / F.col("total")).alias("pct"),
    )
