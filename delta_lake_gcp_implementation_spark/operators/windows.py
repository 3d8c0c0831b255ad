"""Window-function operators (SURVEY.md section 2.5/2.6).

- W3 dense surrogate keys: ``ROW_NUMBER() OVER (ORDER BY business_key)
  + max_existing`` (``gold_dim_customer_scd2.py:79``).  The reference's
  global ordered window forces a single partition — fine at dim scale
  (hundreds to thousands of rows), documented anti-pattern at fact
  scale.  ``surrogate_keys`` keeps the reference's dense-int semantics
  for parity; ``scalable_keys`` is the 100 TB path
  (``monotonically_increasing_id`` / hash keys, no shuffle-to-one).
- W4 best-record pick: 2-level sort within partition
  (``gold_dim_merchant_scd2.py:59-82``).
- W5 LAG status-transition audit (``bronze/TESTING_GUIDE.md:408-425``).
- O1 top-1 by timestamp (watermark read, ``read_watermark.py:32-35``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def surrogate_keys(
    df: DataFrame,
    order_by: list[str],
    key_col: str = "surrogate_key",
    start_at: int = 0,
) -> DataFrame:
    """Dense sequential keys, deterministic under ``order_by`` (must be a
    unique ordering for oracle parity).  Single-partition window by
    construction — use only on dimension-sized inputs.
    """
    w = Window.orderBy(*[F.col(c) for c in order_by])
    return df.withColumn(
        key_col, (F.row_number().over(w) + F.lit(start_at)).cast("bigint")
    )


def scalable_keys(df: DataFrame, key_col: str = "surrogate_key") -> DataFrame:
    """Cluster-scale key assignment: globally unique, non-dense, no
    shuffle (partition-id-prefixed counter).  Swap-in for
    ``surrogate_keys`` at 100 TB where dense ints are not required.
    """
    return df.withColumn(key_col, F.monotonically_increasing_id())


def best_record(
    df: DataFrame, partition_by: list[str], order_by: list[Column]
) -> DataFrame:
    """W4: one winner per partition under a multi-key ordering (e.g.
    latest last_transaction_date, then highest transaction_count).
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def lag_transitions(
    df: DataFrame,
    partition_by: str,
    order_by: list[Column],
    value_col: str,
    out_col: str = "transition",
) -> DataFrame:
    """W5: render ``prev -> curr`` transition strings per entity."""
    w = Window.partitionBy(partition_by).orderBy(*order_by)
    prev = F.lag(F.col(value_col)).over(w)
    return df.withColumn(
        out_col, F.concat_ws(" -> ", prev, F.col(value_col))
    ).withColumn("prev_" + value_col, prev)


def top_k(df: DataFrame, order_by: list[Column], k: int) -> DataFrame:
    """O1/O2: deterministic top-k — caller must include a unique
    tie-break column in ``order_by``.  Spark plans this as TakeOrdered
    (per-partition heap + driver merge), no global sort.
    """
    return df.orderBy(*order_by).limit(k)


def topk_per_group(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rn",
    n_salts: int = 0,
) -> DataFrame:
    """Per-group top-k: rank within each group under ``order_by`` (must
    include a unique tie-break) and keep ranks 1..k.

    The plain path is one window shuffle hash-partitioned on the group
    key.  When the group count is small relative to the cluster (e.g. 3
    order statuses on 1000 executors) that window funnels ALL rows of a
    group through one reducer; ``n_salts > 0`` enables the two-phase
    plan: pre-rank within (group, salt) and keep k per salt — the salt
    spreads each group over ``n_salts`` reducers and the survivor set
    (≤ k·n_salts rows per group) provably contains the global top-k —
    then final-rank the survivors.  Same result, bounded reducer input.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    src = df
    if n_salts > 0:
        salt = F.pmod(
            F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)
        ).cast("int")
        pre = Window.partitionBy(*partition_by, "__salt").orderBy(*order_by)
        src = (
            df.withColumn("__salt", salt)
            .withColumn("__pre_rn", F.row_number().over(pre))
            .filter(F.col("__pre_rn") <= k)
            .drop("__salt", "__pre_rn")
        )
    return (
        src.withColumn(rank_col, F.row_number().over(w).cast("bigint"))
        .filter(F.col(rank_col) <= k)
    )
