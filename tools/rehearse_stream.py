"""100x rehearsal for the STREAMING medallion (round-7 addendum).

The r6 rehearsal proved the batch pipeline linear at 9M-row daily
batches; this drives the same volume through the streaming bronze path
(``run_bronze_stream``: file source -> foreachBatch C1+C2 stages,
availableNow trigger) so the 100 TB verdict covers the stream shape
too.  The raw day is written as ``n_files`` parquet drops and drained
``max_files_per_trigger`` at a time, so the run exercises several real
micro-batches (checkpointed offsets, per-batch MERGE), not one
mega-batch.

Usage: python tools/rehearse_stream.py [n_rows] [n_files] [files_per_trigger]
Prints drain wall time, rows/s, micro-batch count, and the end-state
bronze/quarantine counts next to a batch-pipeline run of the SAME day
for an apples-to-apples equality check.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 9_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    per_trigger = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from delta_lake_gcp_implementation_spark.pipeline import (
        fixtures,
        medallion,
    )
    from delta_lake_gcp_implementation_spark.pipeline.storage import TableStore
    from delta_lake_gcp_implementation_spark.session import get_spark
    from delta_lake_gcp_implementation_spark.streaming.medallion_stream import (
        run_bronze_stream,
    )

    spark = get_spark(app_name="rehearse_stream")
    spark.sparkContext.setLogLevel("ERROR")
    medallion.RESULT_JSON_ENABLED = False

    with tempfile.TemporaryDirectory() as tmp:
        raw_dir = os.path.join(tmp, "raw_drops")
        ckpt = os.path.join(tmp, "ckpt")
        raw = fixtures.generate_day_spark(spark, 1, n_rows)
        raw.repartition(n_files).write.parquet(raw_dir)

        stream_store = TableStore(spark, os.path.join(tmp, "stream_wh"))
        t0 = time.perf_counter()
        run_bronze_stream(
            spark,
            stream_store,
            raw_dir,
            ckpt,
            max_files_per_trigger=per_trigger,
        )
        wall = time.perf_counter() - t0
        n_batches = -(-n_files // per_trigger)
        print(
            f"stream_bronze_{n_rows}: {wall:.1f}s "
            f"({n_rows / wall:,.0f} rows/s, {n_batches} micro-batches)",
            flush=True,
        )
        s_bronze = stream_store.read("bronze.transactions").count()
        s_quar = stream_store.read("bronze.quarantine").count()

        batch_store = TableStore(spark, os.path.join(tmp, "batch_wh"))
        raw_again = spark.read.parquet(raw_dir)
        t0 = time.perf_counter()
        bid = medallion.new_batch_id()
        medallion.validate_bronze(batch_store, raw_again, bid)
        medallion.load_bronze(batch_store, bid)
        print(
            f"batch_bronze_{n_rows}: {time.perf_counter() - t0:.1f}s",
            flush=True,
        )
        b_bronze = batch_store.read("bronze.transactions").count()
        b_quar = batch_store.read("bronze.quarantine").count()
        print(
            f"end-state equality: bronze {s_bronze} vs {b_bronze} "
            f"({'OK' if s_bronze == b_bronze else 'MISMATCH'}), "
            f"quarantine {s_quar} vs {b_quar} "
            f"({'OK' if s_quar == b_quar else 'MISMATCH'})",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
