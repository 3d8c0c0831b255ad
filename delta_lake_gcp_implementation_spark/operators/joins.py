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

from pyspark.sql import Column, DataFrame
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
