"""Streaming medallion: the reference's daily-batch incremental load
(C2) as a continuous pipeline.

Raw drops land as files; each micro-batch runs the SAME stage
functions as the batch pipeline (C1 validation split -> composite-key
MERGE -> watermark/job_control) inside ``foreachBatch``.  Checkpointed
source offsets + idempotent MERGE give exactly-once-ish end state —
re-running the stream reprocesses nothing, exactly like re-running the
reference's batch jobs (``load_bronze.py:66-109`` rationale).

This is the ``SURVEY.md`` section 2.9 claim made real: batch and
stream share one code path, so semantics (quarantine rules, dedup,
late-arrival flags, watermark advance) cannot drift between them.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..pipeline import medallion
from ..pipeline.fixtures import RAW_SCHEMA
from ..pipeline.storage import TableStore


def run_bronze_stream(
    spark: SparkSession,
    store: TableStore,
    input_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 2,
) -> None:
    """Drain all available raw-drop files through the C1+C2 stages,
    one micro-batch at a time (availableNow trigger)."""
    raw_stream = (
        spark.readStream.schema(RAW_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    # watermark captured ONCE at stream start, and used only to FLAG
    # late arrivals: incrementality comes from the source's checkpointed
    # file offsets, so re-applying the P1 slice filter per micro-batch
    # would wrongly drop rows of a day split across micro-batches
    # (the batch pipeline's filter exists because ITS source re-reads
    # every file on every run)
    wm0 = medallion.read_watermark(store, "bronze")

    def process(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        bid = f"STREAM_BATCH_{batch_id:06d}"
        medallion.validate_bronze(
            store, batch_df, bid, watermark=wm0, filter_slice=False
        )
        medallion.load_bronze(store, bid, run_mode="stream")

    q = (
        raw_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
