"""Corpus-curation operators for large-scale training-data pipelines.

Beyond-the-reference family (the reference lakehouse has no text
processing): deterministic stratified sampling, concat-and-chunk
sequence packing, train/eval contamination detection, and domain-mix
reporting — the selection/packing half of a 100 TB pretraining-data
pipeline (dedup/quality/similarity live in ``operators.dedup`` and
``functions.text``).

Scale notes (100 TB):

- ``stratified_sample`` is a pure per-row filter on an md5-derived
  bucket — no shuffle, no state, trivially parallel, and reproducible
  across runs/engines (the sampling decision is a function of the row
  key alone, so a re-run or a backfill keeps exactly the same rows).
- ``pack_sequences`` windows inside a (stratum, shard) partition; at
  corpus scale pass a hash-bucket shard column so no single window
  partition exceeds one executor.
- ``contamination_pairs`` broadcasts only the *eval-side* shingle table
  (eval sets are n-of-thousands by construction); the corpus side stays
  hash-partitioned and the match aggregation shuffles (corpus_id,
  eval_id) pairs, never documents.
- ``domain_mix`` is a two-level aggregation with a broadcast join of
  the per-stratum totals (a handful of rows) — the same plan shape as
  ``aggregates.pct_of_total``, deliberately avoiding an ``OVER ()``
  single-partition window.

Cross-engine determinism: hashes are md5-based (identical hex in Spark
and DuckDB, <=15 hex chars -> signed BIGINT); every ratio is a single
IEEE division of exact integer operands.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: bucket space for hash sampling: 4 md5 hex chars = 16^4 buckets, and
#: thresholds are exact bucket counts so there is no modulo bias.
SAMPLE_BUCKETS = 65536


def hash_bucket(id_col: Column, n_chars: int = 4) -> Column:
    """Deterministic bucket in [0, 16^n_chars) from md5 of the row key —
    the cross-engine reproducible substitute for ``rand()`` sampling
    (DuckDB mirror: ``('0x' || substr(md5(id::VARCHAR), 1, n))::INT``).
    """
    return F.conv(
        F.substring(F.md5(id_col.cast("string")), 1, n_chars), 16, 10
    ).cast("int")


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff its hash
    bucket falls below ``rate * SAMPLE_BUCKETS`` for its stratum — the
    domain-reweighting primitive of corpus curation (e.g. keep 30% of
    crawl, 100% of books).

    Pure filter: no shuffle, no RNG state, same rows kept on every
    engine and every re-run.
    """
    bucket = hash_bucket(F.col(id_col))
    threshold = F.lit(int(default_rate * SAMPLE_BUCKETS))
    for stratum, rate in rates.items():
        threshold = F.when(
            F.col(stratum_col) == stratum, F.lit(int(rate * SAMPLE_BUCKETS))
        ).otherwise(threshold)
    return df.filter(bucket < threshold)


def rate_sample(
    df: DataFrame,
    id_col: str,
    rates_df: DataFrame,
    join_cols: list[str],
    buckets_col: str,
) -> DataFrame:
    """Apply COMPUTED per-group keep rates: keep a row iff its md5
    bucket falls under the bucket threshold its group carries in
    ``rates_df`` — the apply-step that turns mixture weights (e.g.
    temperature-scaled domain weights) into an actual sampled corpus,
    where ``stratified_sample`` applies hand-set literal rates.

    Scale shape: ``rates_df`` has one row per domain (bounded), so the
    join broadcasts and the whole operator stays a map-side filter on
    the corpus scan — no shuffle, no RNG state, reproducible.
    """
    return df.join(F.broadcast(rates_df), join_cols).filter(
        hash_bucket(F.col(id_col)) < F.col(buckets_col)
    )


def pack_sequences(
    df: DataFrame,
    part_col: str,
    order_col: str,
    token_col: str,
    budget: int,
) -> DataFrame:
    """Concat-and-chunk sequence packing (GPT-style pretraining): lay
    documents end-to-end in ``order_col`` order within each
    ``part_col`` partition, then cut fixed ``budget``-token training
    sequences at offset boundaries.  Emits per document:

    - ``start_offset``: the document's first token position in the
      stream,
    - ``seq_index``: the training sequence its first token lands in
      (``floor(start_offset / budget)``),
    - ``spans_boundary``: whether the document straddles a cut.

    One window aggregation (running SUM) hash-partitioned on
    ``part_col``; at corpus scale pass a composite (stratum, shard)
    partition column so each window partition fits one executor.
    """
    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(token_col).over(w)
    start = (cum - F.col(token_col)).cast("bigint")
    seq_index = F.floor(start / budget).cast("bigint")
    last_seq = F.floor((cum - 1) / budget).cast("bigint")
    return df.select(
        F.col(part_col),
        F.col(order_col),
        F.col(token_col),
        start.alias("start_offset"),
        seq_index.alias("seq_index"),
        (
            F.when(F.col(token_col) > 0, last_seq > seq_index).otherwise(
                F.lit(False)
            )
        ).alias("spans_boundary"),
    )


def shingle_hashes(
    df: DataFrame, text_col: str, id_col: str, k: int
) -> DataFrame:
    """Distinct char k-shingles per document as 60-bit md5 hashes —
    the join substrate for containment checks (integer equi-join keys
    are several times cheaper to shuffle and compare than UTF8
    shingles)."""
    from ..tables import scale_out

    return scale_out(df).select(
        F.col(id_col),
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(
                        F.lit(1),
                        F.greatest(
                            F.length(F.col(text_col)) - (k - 1), F.lit(1)
                        ),
                    ),
                    lambda i: F.conv(
                        F.substring(
                            F.md5(F.col(text_col).substr(i, F.lit(k))), 1, 15
                        ),
                        16,
                        10,
                    ).cast("bigint"),
                )
            )
        ).alias("sh"),
    )


def contamination_pairs(
    corpus: DataFrame,
    eval_set: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Train/eval contamination detection: for every (corpus doc, eval
    doc) pair, the n-gram *containment* of the eval doc in the corpus
    doc — ``|shingles(corpus) ∩ shingles(eval)| / |shingles(eval)|`` —
    kept where containment >= ``threshold``.  The standard decon pass
    run before pretraining so benchmark answers don't leak into the
    training set.

    Plan shape: the eval shingle table (small by construction) is
    broadcast; corpus shingles stay hash-partitioned; the intersection
    is an equi-join on the shingle hash + a (corpus_id, eval_id)
    count aggregation — no cross join, shuffles only id pairs.
    Containment is a single division of exact integers.
    """
    corpus_sh = shingle_hashes(corpus, text_col, id_col, k).select(
        F.col(id_col).alias("corpus_id"), "sh"
    )
    eval_sh = shingle_hashes(eval_set, text_col, id_col, k).select(
        F.col(id_col).alias("eval_id"), "sh"
    )
    return contamination_pairs_from_shingles(corpus_sh, eval_sh, threshold)


def contamination_pairs_from_shingles(
    corpus_sh: DataFrame,
    eval_sh: DataFrame,
    threshold: float = 0.5,
) -> DataFrame:
    """Containment join over PRE-SHINGLED sides — ``corpus_sh`` as
    ``(corpus_id, sh)``, ``eval_sh`` as ``(eval_id, sh)``.  The fused
    entry point (r10 fusion recipe 1): when both sides split from the
    same table, the caller shingles ONCE, checkpoints, and splits the
    shingle frame — at 100 TB that removes two of three full-corpus
    re-reads that the page cache hides at test scale."""
    eval_sizes = eval_sh.groupBy("eval_id").agg(F.count("*").alias("n_eval"))
    inter = (
        corpus_sh.join(F.broadcast(eval_sh), "sh")
        .groupBy("corpus_id", "eval_id")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(F.broadcast(eval_sizes), "eval_id")
        .select(
            "corpus_id",
            "eval_id",
            (F.col("n_inter") / F.col("n_eval")).alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )


def domain_mix(
    df: DataFrame, stratum_col: str, domain_col: str, token_col: Column
) -> DataFrame:
    """Domain-mix report: per (stratum, domain) document/token counts,
    the domain's token share within its stratum, and the uniform-target
    sampling weight (``target_share / actual_share``) used to rebalance
    the mixture.

    Two-level aggregation + broadcast join of the tiny per-stratum
    totals; shares/weights are single divisions of exact BIGINTs, so
    they are bit-identical across engines.
    """
    per_domain = df.groupBy(stratum_col, domain_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(token_col).cast("bigint").alias("n_tokens"),
    )
    per_stratum = per_domain.groupBy(stratum_col).agg(
        F.sum("n_tokens").cast("bigint").alias("stratum_tokens"),
        F.count("*").alias("n_domains"),
    )
    joined = per_domain.join(F.broadcast(per_stratum), stratum_col)
    return joined.select(
        stratum_col,
        domain_col,
        "n_docs",
        "n_tokens",
        (F.col("n_tokens") / F.col("stratum_tokens")).alias("token_share"),
        (
            F.col("stratum_tokens")
            / (F.col("n_domains") * F.col("n_tokens")).cast("bigint")
        ).alias("sampling_weight"),
    )
