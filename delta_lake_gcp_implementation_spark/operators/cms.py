"""Count-min sketch: sublinear-memory frequency estimation for heavy
hitters over a 100 TB stream.

Beyond-the-reference family (the reference computes exact GROUP BY
counts only — e.g. gold_reports.py's volume rollups; a count-min is
what replaces them when the key cardinality itself is the problem).

Design for Spark's execution model:

- The sketch is a (depth x width) grid of counters.  ``build`` is one
  map-side-combined aggregation: each row contributes ``depth``
  (row, bucket) increments, so the shuffle carries at most
  depth*width rows regardless of input size — constant-size mergeable
  state, the same contract as HLL in ``q_sketch_stats``.
- ``estimate`` joins probe items against the sketch grid (broadcast —
  it is KBs by construction) and takes the min across depth rows:
  min-of-overcounts, the CMS guarantee (never an undercount).
- Merging shards is cell-wise addition — union the build inputs or
  sum two sketch frames; both commute with the aggregation.

Cross-engine determinism: bucket_d(item) = md5(item || ':' || d)
first 15 hex -> BIGINT mod width — the DuckDB oracle replays the
sketch cell-for-cell, so estimates hash-match EXACTLY (unlike HLL,
whose internals are engine-specific and only bounds-checkable).

Error bound: est <= exact + eps*N where eps ~ e/width, with
probability 1 - (1/e)^depth; the catalog verdict query asserts both
the no-undercount and the bound on every emitted item.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WIDTH = 512
DEPTH = 3


def _bucket(item: Column, d: int, width: int) -> Column:
    h = F.conv(
        F.substring(F.md5(F.concat(item, F.lit(f":{d}"))), 1, 15), 16, 10
    ).cast("bigint")
    return h % F.lit(width)


def build_count_min(
    df: DataFrame,
    item_col: str,
    width: int = WIDTH,
    depth: int = DEPTH,
) -> DataFrame:
    """(d, bucket, total) sketch grid — one shuffled aggregation of at
    most depth*width rows."""
    item = F.col(item_col).cast("string")
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _bucket(item, d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("cell")
    )
    return (
        rows.select("cell.d", "cell.bucket")
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("total"))
    )


def estimate_counts(
    items: DataFrame,
    sketch: DataFrame,
    item_col: str,
    width: int = WIDTH,
    depth: int = DEPTH,
) -> DataFrame:
    """Per input row, the CMS estimate for ``item_col``: min across the
    depth grid rows.  The sketch side broadcasts (<= depth*width rows).

    ``width``/``depth`` MUST match the build call — probes hash into
    the same grid; a mismatch makes the inner join silently miss
    cells (the same contract as agreeing on a bloom's geometry)."""
    item = F.col(item_col).cast("string")
    probes = items.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _bucket(item, d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("cell"),
    ).select("*", "cell.d", "cell.bucket").drop("cell")
    # LEFT join + coalesce-to-0: a grid cell the build pass never
    # touched holds an implicit 0, so an unseen probe item must return
    # cms_est=0 (not vanish from the output), and a partially-empty
    # probe takes the true min-of-cells including the zeros instead of
    # overestimating from the non-empty cells alone.
    joined = probes.join(F.broadcast(sketch), ["d", "bucket"], "left")
    keys = [c for c in items.columns]
    return joined.groupBy(*keys).agg(
        F.min(F.coalesce(F.col("total"), F.lit(0).cast("bigint")))
        .cast("bigint")
        .alias("cms_est")
    )
