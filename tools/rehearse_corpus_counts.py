"""Round-9 rehearsal: per-batch corpus-ingest cost as the stored
corpus grows (VERDICT r8 item 4).

The r8 hot-bucket cap recomputed combined bucket membership from the
FULL stored incidence list every batch — O(corpus) per batch, O(n^2)
over an ingest history.  Round 9 replaced that with the persisted
``corpus.bucket_counts`` table (additive upsert per batch), so the
cap check is O(batch).  This script ingests N equal batches from the
100x documents table and prints per-batch wall time; flat-in-N timing
(modulo the counts-table read, which grows with DISTINCT buckets, not
rows) is the pass criterion.

Usage:
    python tools/gen_scale_docs.py /tmp/sfscale100 100   # once
    python tools/rehearse_corpus_counts.py [docs_dir] [n_batches]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    docs_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfscale100"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from pyspark.sql import functions as F

    from delta_lake_gcp_implementation_spark.pipeline import corpus
    from delta_lake_gcp_implementation_spark.pipeline.storage import TableStore
    from delta_lake_gcp_implementation_spark.session import get_spark

    spark = get_spark(app_name="rehearse_corpus_counts")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{docs_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    with tempfile.TemporaryDirectory() as tmp:
        store = TableStore(spark, tmp)
        for i in range(n_batches):
            batch = docs.filter(F.col("doc_id") % n_batches == i)
            t0 = time.perf_counter()
            r = corpus.ingest_batch(store, batch)
            dt = time.perf_counter() - t0
            print(
                f"batch {i + 1}/{n_batches}: {dt:.1f}s  "
                f"in={r['batch']} accepted={r['accepted']} "
                f"corpus={r['corpus_size']}",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
