"""Winnowing fingerprints + content-defined chunking with a pluggable
gram-hash knob (round-6, VERDICT r5 item 6).

Both algorithms hash every character k-gram of every document, so the
per-gram hash IS the dominant CPU cost at corpus scale (the r5 100x
rehearsal measured 81.9 s for 75M md5 grams — linear, but a heavy
constant).  Two knobs:

* ``algo="md5"`` — cross-engine replayable (DuckDB
  ``('0x' || substr(md5(g), 1, n))::BIGINT``): the oracle-parity path
  the catalog queries pin, so every selected fingerprint and chunk
  boundary is verified value-for-value against SQL.
* ``algo="xxhash64"`` — Spark's JVM-native 64-bit hash
  (``F.xxhash64``): no hex-string materialization and no string->int
  ``conv``, same selection/boundary STATISTICS (uniform residues), not
  the same hash values.  The production knob for a 100 TB corpus where
  nothing replays grams in a second engine.

Reference parity note: the reference engine has no winnowing/CDC
operator; these extend its dedup surface for training-data pipelines
(SURVEY.md LLM-ops addendum).  Winnowing follows Schleimer et al.,
SIGMOD'03 (MOSS); CDC follows the LBFS/rsync zero-residue rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ALGOS = ("md5", "xxhash64")


def gram_hash(col: Column, bits: int, algo: str = "md5") -> Column:
    """Non-negative ``bits``-bit BIGINT hash of a string column.

    md5: first ``bits/4`` hex chars -> int (bits % 4 == 0, bits <= 60
    so the signed-BIGINT parse never overflows).  xxhash64: pmod into
    the same range — one JVM intrinsic per gram instead of a digest,
    a hex substring and a radix conversion."""
    if algo == "md5":
        if bits % 4 != 0 or not 0 < bits <= 60:
            raise ValueError(
                f"md5 gram_hash needs 0 < bits <= 60, bits % 4 == 0; "
                f"got {bits}"
            )
        return F.conv(F.substring(F.md5(col), 1, bits // 4), 16, 10).cast(
            "bigint"
        )
    if algo == "xxhash64":
        if not 0 < bits <= 62:
            raise ValueError(
                f"xxhash64 gram_hash needs 0 < bits <= 62 (1 << bits "
                f"must fit signed BIGINT); got {bits}"
            )
        return F.pmod(F.xxhash64(col), F.lit(1 << bits)).cast("bigint")
    raise ValueError(f"algo must be one of {ALGOS}, got {algo!r}")


def content_hash(col: Column, algo: str = "md5") -> Column:
    """Chunk/content identity hash as STRING (stable schema across
    algos): md5 hex, or the xxhash64 value rendered decimal."""
    if algo == "md5":
        return F.md5(col)
    if algo == "xxhash64":
        return F.xxhash64(col).cast("string")
    raise ValueError(f"algo must be one of {ALGOS}, got {algo!r}")


def fingerprints(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    w: int = 4,
    algo: str = "md5",
    hash_bits: int = 40,
    pos_bits: int = 20,
) -> DataFrame:
    """Winnowing document fingerprints: hash every char k-gram, slide a
    w-gram window over the hash sequence, select each window's minimum
    hash (ties -> rightmost position), emit the distinct selected
    ``(fingerprint, fp_pos)`` set per document.  Guarantees a match for
    any shared substring of length >= k + w - 1 chars while storing
    ~2/(w+1) of the grams.

    The (hash, rightmost-pos) argmin is packed into ONE bigint —
    ``hash * 2^pos_bits + (2^pos_bits - 1 - pos)`` — so a plain ``min``
    window aggregate implements the 2-key ordering identically in Spark
    and SQL.  Positions are capped at 2^pos_bits - 1 chars/doc;
    production docs beyond that would widen the budget or chunk first.

    Scale shape: the explode is linear in corpus chars; the document
    rows are HASH-partitioned by ``id_col`` before the explode, so the
    per-doc window clusters without re-shuffling the gram fan-out —
    one exchange of doc rows replaces one of gram rows (~300x more at
    k=8; r13 A/B at 100x: 27.5 -> 17.5 s).  Per-doc cost is bounded by
    the ``pos_bits`` position cap."""
    from ..tables import scale_out

    pos_mask = (1 << pos_bits) - 1
    grams = scale_out(df, id_col).select(
        id_col,
        F.explode(
            F.sequence(
                F.lit(1),
                F.greatest(F.length(text_col) - (k - 1), F.lit(1)),
            )
        ).alias("pos"),
        text_col,
    )
    hashed = grams.select(
        id_col,
        "pos",
        (
            gram_hash(F.col(text_col).substr(F.col("pos"), F.lit(k)),
                      hash_bits, algo)
            * (1 << pos_bits)
            + (F.lit(pos_mask) - F.col("pos"))
        ).alias("packed"),
    )
    win = Window.partitionBy(id_col).orderBy("pos").rowsBetween(-(w - 1), 0)
    sel = hashed.select(id_col, F.min("packed").over(win).alias("s"))
    return sel.select(
        id_col,
        F.expr(f"s div {1 << pos_bits}").alias("fingerprint"),
        (F.lit(pos_mask) - F.col("s") % (1 << pos_bits))
        .cast("bigint")
        .alias("fp_pos"),
    ).distinct()


def cdc_chunks(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    div: int = 32,
    algo: str = "md5",
    hash_bits: int = 60,
) -> DataFrame:
    """Content-defined chunking (LBFS/rsync-style): chunk boundaries
    fall where the k-gram hash ends in a zero residue mod ``div``, so
    an insertion near the front MOVES no later boundary.  Emits each
    chunk with its content hash and corpus-wide copy count.

    Scale shape: one position explode (linear in chars), per-doc
    windows for boundary ordering, one hash-partitioned window for the
    corpus copy count.  No pair joins: dedup is an equi-group on
    chunk_hash."""
    from ..tables import scale_out

    d = df.filter(F.trim(F.col(text_col)) != "")
    base = scale_out(d).select(
        id_col, text_col, F.length(text_col).alias("n")
    )
    pos = base.select(
        id_col,
        text_col,
        "n",
        F.explode(
            F.when(
                F.col("n") >= k, F.sequence(F.lit(k), F.col("n"))
            ).otherwise(F.array().cast("array<int>"))
        ).alias("i"),
    )
    gh = gram_hash(
        F.substring(text_col, F.col("i") - F.lit(k - 1), k), hash_bits, algo
    )
    bounds = pos.filter(gh % div == 0).select(id_col, "i")
    sentinel = base.select(id_col, F.col("n").cast("int").alias("i"))
    all_bounds = bounds.union(sentinel).distinct()
    w = Window.partitionBy(id_col).orderBy("i")
    chunk = F.substring(
        text_col, F.col("start"), F.col("i") - F.col("start") + 1
    )
    chunks = (
        all_bounds.withColumn(
            "start", F.coalesce(F.lag("i").over(w) + 1, F.lit(1))
        )
        .withColumn("chunk_idx", (F.row_number().over(w) - 1).cast("bigint"))
        .join(base.select(id_col, text_col), id_col)
        .select(
            id_col,
            "chunk_idx",
            F.col("start").cast("bigint").alias("start"),
            (F.col("i") - F.col("start") + 1).cast("bigint").alias("chunk_len"),
            content_hash(chunk, algo).alias("chunk_hash"),
        )
    )
    cw = Window.partitionBy("chunk_hash")
    return chunks.withColumn(
        "n_copies", F.count(F.lit(1)).over(cw).cast("bigint")
    )
