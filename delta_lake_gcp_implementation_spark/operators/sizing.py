"""Broadcast-vs-shuffle sizing decisions shared across operators.

One question, asked everywhere a small-side join is tempting: does this
frame *actually* fit in executor memory?  Forcing ``F.broadcast`` on a
frame that grows with the data turns into the first executor OOM at
100x batch scale; never broadcasting costs an avoidable shuffle on
every dim join.  Both callers (dedup candidate verification and the
TableStore MERGE primitives) route through the same Catalyst size
estimate so the decision is consistent and testable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Default broadcast budget: well under a healthy executor heap share,
# well over any dim/key-set a single MERGE batch produces locally.
BROADCAST_BUDGET_BYTES = 256 << 20


def fits_broadcast(df: DataFrame, budget_bytes: int = BROADCAST_BUDGET_BYTES) -> bool:
    """Catalyst size estimate for the broadcast-vs-partition decision.

    ``localCheckpoint``-ed frames report their true materialized size;
    un-materialized plans report Catalyst's estimate — both err on the
    large side for array columns, which is the safe direction here
    (falling back to the partitioned join costs a shuffle, never an
    executor OOM).
    """
    try:
        raw = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        # py4j hands java.math.BigInteger back as a Python int already;
        # older bridges return the Java object, so fall back to its
        # string form
        size = raw if isinstance(raw, int) else int(raw.toString())
    except Exception:
        return False
    return 0 <= size <= budget_bytes


def maybe_broadcast(
    df: DataFrame, budget_bytes: int = BROADCAST_BUDGET_BYTES
) -> DataFrame:
    """Broadcast ``df`` iff its size estimate fits the budget.

    Oversized frames come back unhinted, leaving Catalyst/AQE free to
    pick a shuffle join (and still promote to broadcast at runtime if
    actual stats shrink under ``autoBroadcastJoinThreshold``).
    """
    return F.broadcast(df) if fits_broadcast(df, budget_bytes) else df


def prefer_broadcast_payload(
    payload: DataFrame,
    probe: DataFrame,
    budget_bytes: int = BROADCAST_BUDGET_BYTES,
) -> bool:
    """Broadcast decision for pair-lookup joins (candidate pairs x
    per-id payload tables): broadcast the payload ONLY when it fits
    AND the probe side is itself too large to shuffle under the same
    budget.

    When both sides are small, the partitioned SHUFFLE_HASH join wins:
    the probe shuffle is a cheap in-memory exchange, while every
    broadcast is a driver-side collect + single-threaded relation
    build per consumer job (measured: forced broadcasts cost
    ngram_jaccard +0.8 s at sf0.1 on local[32], quiet interleaved
    best-of-3 A/B).  When the probe side outgrows the budget — the
    corpus-scale regime where candidate pairs dwarf the payload —
    avoiding its shuffle is exactly what the broadcast buys."""
    return fits_broadcast(payload, budget_bytes) and not fits_broadcast(
        probe, budget_bytes
    )
