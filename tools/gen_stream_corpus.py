"""Generate a LARGE streaming-ingest rehearsal corpus (r13 verdict
item 7: ~1M docs/batch x 8 batches) without an hours-long driver-side
text-synthesis loop: new documents are built DISTRIBUTED, each the
concatenation of the first half of parent doc a and the second half of
parent doc b drawn from the (deterministic) 100x corpus.

Why this shape is honest for the ingest rehearsal:

* token/unigram distribution is preserved exactly (every emitted word
  comes from a real parent doc);
* a child shares ~half its shingles with each parent — Jaccard ~0.5,
  far below the near-dup verify threshold, so the stream is not an
  artificial dedup storm (a plain key-offset replication would make
  every doc an exact corpus dup after batch 1 and collapse the
  per-batch cost to the absorb path);
* parent pairing is pure doc_id arithmetic (Knuth multiplicative
  hash), so the corpus is deterministic given the parent table.

Usage:
    python tools/gen_stream_corpus.py [src_dir] [out_dir] [n_docs]
Defaults: src=/tmp/sfscale100w, out=/tmp/sfstream8m, n_docs=8_000_000.
Output: <out>/documents.parquet (doc_id LONG, text STRING, 64 files).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KNUTH = 2654435761


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfscale100w"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfstream8m"
    n_docs = int(sys.argv[3]) if len(sys.argv) > 3 else 8_000_000

    from pyspark.sql import functions as F

    from delta_lake_gcp_implementation_spark.session import get_spark

    spark = get_spark(app_name="gen_stream_corpus")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{src}/documents.parquet").select(
        "doc_id", F.split(F.trim(F.col("text")), " +").alias("w")
    )
    n_src = docs.count()

    # b's modulus is n_src - 1, NOT n_src: with modulus n_src the term
    # (i + n_src*m) * KNUTH collapses mod n_src for every replica m of
    # the same residue class (multiples of n vanish mod n), making all
    # children of one a-class EXACT duplicates — the first run of this
    # tool produced 500k distinct texts duplicated 16x and the
    # rehearsal silently measured a 94%-exact-dup absorb storm instead
    # of a growing corpus.  Coprime-ish moduli push the (a, b) cycle
    # length to lcm(n, n-1) >> n_docs.
    ids = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % n_src).alias("a"),
        ((F.col("id") * F.lit(KNUTH) + 12345) % (n_src - 1)).alias("b"),
    )
    half_a = docs.select(
        F.col("doc_id").alias("a"),
        F.slice(
            "w", 1, F.greatest(F.floor(F.size("w") / 2), F.lit(1)).cast("int")
        ).alias("wa"),
    )
    half_b = docs.select(
        F.col("doc_id").alias("b"),
        F.slice(
            "w",
            (F.floor(F.size("w") / 2) + 1).cast("int"),
            F.size("w"),
        ).alias("wb"),
    )
    (
        ids.join(half_a, "a")
        .join(half_b, "b")
        .select(
            "doc_id",
            F.array_join(F.concat("wa", "wb"), " ").alias("text"),
        )
        .repartition(64)
        .write.mode("overwrite")
        .parquet(f"{out}/documents.parquet")
    )
    print(f"wrote {out}/documents.parquet: {n_docs} docs from {n_src} parents")
    spark.stop()


if __name__ == "__main__":
    main()
