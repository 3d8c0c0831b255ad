"""Bloom-filter membership: a mergeable bitset sketch for cheap
"definitely-absent" checks — the pre-filter that lets a 100 TB dedup
or MERGE touch only rows that MIGHT collide.

Beyond-the-reference family (Delta Lake ships bloom-filter indexes for
file skipping; the reference lakehouse relies on join-based existence
checks alone — e.g. load_silver.py's NOT EXISTS staging probes).

Design for Spark's execution model:

- ``bloom_build`` computes bit positions row-side (md5-derived, k
  probes per key) and folds them into 64-bit words with a
  ``bit_or`` aggregation — fully map-side combinable, one shuffle of
  at most ``m_bits/64`` rows.  The collected word array IS small by
  construction (a bloom filter is sized to fit one broadcast), so the
  driver collect is the sketch's purpose, not a scalability leak —
  exactly the same contract as a collected k-means codebook.
- ``bloom_probe_expr`` tests all k bits against the literal word
  array — a per-row projection, zero shuffle, whole-stage codegen.
  Probing a 100 TB table costs one scan and nothing else.
- Merging shards/partitions is word-wise OR, so per-file or per-batch
  filters union for free (the property Delta's file-level indexes and
  streaming dedup both rely on).

Cross-engine determinism: position_i(key) = md5(key || ':' || i)
first 15 hex chars -> BIGINT, mod m_bits — replayable verbatim in
DuckDB SQL (see plans.textops.ORACLE_BLOOM_MEMBERSHIP).

False positives: classic (1 - e^{-kn/m})^k; with defaults m=8192,
k=3 and n=500 keys the expected FPR is ~0.4%.  False negatives are
impossible — asserted row-by-row by the catalog verdict query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default sketch geometry (shared with the DuckDB oracle).
M_BITS = 8192
K_HASH = 3


def _pow2_array() -> Column:
    """Literal lookup of the 64 single-bit words (bit 63 wraps to the
    signed-long sign bit) — ``F.shiftleft`` only takes a Python-int
    shift, so variable shifts go through ``element_at`` instead."""
    vals = [(1 << b) if b < 63 else -(1 << 63) for b in range(64)]
    return F.array(*[F.lit(v).cast("bigint") for v in vals])


_LONG_MIN = -(1 << 63)


def _lit_bigints(vals: list[int]) -> Column:
    """``array<bigint>`` literal in ONE py4j round-trip (r15, same
    rationale as ``similarity.lit_vec``: per-element ``F.lit`` pays a
    py4j call each — ~0.13 s for a 128-word filter, per probe
    expression).  ``L``-suffixed SQL literals are exact; LONG_MIN
    cannot be written directly (its positive part overflows before
    unary minus) so it is spelled as a folded subtraction."""
    def one(v: int) -> str:
        if v == _LONG_MIN:
            return "(-9223372036854775807L - 1L)"
        return f"{int(v)}L"

    return F.expr("array(" + ",".join(one(v) for v in vals) + ")")


def _position(key: Column, i: int, m_bits: int) -> Column:
    """Bit position for probe ``i``: md5 of the salted key, 15 hex
    chars (60 bits, exact in BIGINT), mod the bit-space."""
    h = F.conv(
        F.substring(F.md5(F.concat(key, F.lit(f":{i}"))), 1, 15), 16, 10
    ).cast("bigint")
    return h % F.lit(m_bits)


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = M_BITS,
    k_hash: int = K_HASH,
) -> list[int]:
    """Aggregate the key column into a bloom bitset; returns the
    ``m_bits/64`` little-endian words (python ints, word w holds bits
    [64w, 64w+64)).  One map-side-combined ``bit_or`` aggregation."""
    key = F.col(key_col).cast("string")
    positions = df.select(
        F.explode(
            F.array(*[_position(key, i, m_bits) for i in range(k_hash)])
        ).alias("pos")
    )
    words = (
        positions.select(
            (F.col("pos") / 64).cast("bigint").alias("word_idx"),
            F.element_at(
                _pow2_array(), (F.col("pos") % 64).cast("int") + F.lit(1)
            ).alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    out = [0] * (m_bits // 64)
    for r in words:
        out[int(r.word_idx)] = int(r.word)
    return out


def bloom_probe_expr(
    key: Column,
    words: list[int],
    m_bits: int = M_BITS,
    k_hash: int = K_HASH,
) -> Column:
    """Boolean column: True iff every probe bit is set — "maybe
    present".  Pure projection against the literal word array (a
    filter is by definition broadcast-sized); False means DEFINITELY
    absent."""
    arr = _lit_bigints(words)
    checks = []
    for i in range(k_hash):
        pos = _position(key, i, m_bits)
        word = F.element_at(arr, ((pos / 64).cast("int") + F.lit(1)))
        bit = F.element_at(_pow2_array(), (pos % 64).cast("int") + F.lit(1))
        checks.append(word.bitwiseAND(bit) != 0)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


def bloom_merge(a: list[int], b: list[int]) -> list[int]:
    """Word-wise OR of two same-geometry filters — the mergeability
    that makes per-shard builds compose."""
    if len(a) != len(b):
        raise ValueError(f"bloom geometry mismatch: {len(a)} vs {len(b)} words")
    return [x | y for x, y in zip(a, b)]
