"""100x rehearsal for the STATEFUL streaming operators (round-7 addendum).

`rehearse_stream.py` covers the foreachBatch medallion path; this one
drives the watermark-bounded stateful operators (`tumbling_counts`,
`session_counts`, `dedup_events` — SURVEY.md section 2.9) in their
production shape: append output mode, event-time watermark, noop sink,
input arriving as time-ordered parquet drops drained 4 files per
trigger so state is built and EVICTED across several real
micro-batches.  Correctness (stream == batch) is already pinned by the
parity tests in tests/test_streaming.py; this measures whether the
state store survives the 100x volume.

Usage: python tools/rehearse_stream_aggs.py [n_rows] [n_files]
Prints per-operator drain wall + rows/s, and the batch-twin wall on the
same input for the stream-overhead ratio.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 9_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 12

    from pyspark.sql import functions as F

    from delta_lake_gcp_implementation_spark.session import get_spark
    from delta_lake_gcp_implementation_spark.streaming import jobs

    spark = get_spark(app_name="rehearse_stream_aggs")
    spark.sparkContext.setLogLevel("ERROR")

    with tempfile.TemporaryDirectory() as tmp:
        drops = os.path.join(tmp, "event_drops")
        # One synthetic day in EVENT_SCHEMA order; repartitionByRange on
        # ts makes lexicographic part files ascending time slices, so
        # the file source's listing order replays realistic arrival
        # order and the watermark actually advances between triggers.
        ev = (
            spark.range(n_rows)
            .select(
                F.col("id").alias("event_id"),
                (
                    F.timestamp_seconds(
                        F.lit(1_700_000_000)
                        + (F.col("id") * 86_400 / n_rows).cast("long")
                    )
                ).alias("ts"),
                F.pmod(F.xxhash64("id"), F.lit(100_000)).alias("user_id"),
                F.element_at(
                    F.array(*[F.lit(t) for t in
                              ("view", "click", "cart", "purchase",
                               "refund", "search")]),
                    (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(6)) + 1
                     ).cast("int"),
                ).alias("event_type"),
                (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(10_000))
                 / 100.0).alias("value"),
                F.lit(None).cast("string").alias("props"),
            )
        )
        ev.repartitionByRange(n_files, "ts").write.parquet(drops)

        def drain(name, build):
            ckpt = os.path.join(tmp, f"ckpt_{name}")
            stream = build(jobs.read_event_stream(spark, drops))
            t0 = time.perf_counter()
            q = (
                stream.writeStream.format("noop")
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            wall = time.perf_counter() - t0
            print(
                f"stream_{name}_{n_rows}: {wall:.1f}s "
                f"({n_rows / wall:,.0f} rows/s, "
                f"{-(-n_files // 4)} micro-batches)",
                flush=True,
            )
            shutil.rmtree(ckpt, ignore_errors=True)

        drain("tumbling", jobs.tumbling_counts)
        drain("session", jobs.session_counts)
        drain("dedup", jobs.dedup_events)

        batch = spark.read.schema(jobs.EVENT_SCHEMA).parquet(drops)
        t0 = time.perf_counter()
        (
            batch.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .write.format("noop").mode("overwrite").save()
        )
        print(f"batch_tumbling_{n_rows}: {time.perf_counter() - t0:.1f}s",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
