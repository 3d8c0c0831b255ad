"""Exactly-once multimodal (binary-column) corpus ingest into the
TableStore — r13 verdict item 8: close the loop between the
:mod:`..operators.multimodal` stages and the txn ingest path, the
shape a production multimodal 100 TB pipeline runs.

Two tables:

* ``media.blobs`` — the MEDIA_SCHEMA columns (opaque ``binary``
  content + typed metadata struct) plus a ``sha256`` digest column,
  so cross-corpus exact dedup is an anti-join on a pruned string
  column (parquet never touches the blob pages for it);
* ``media.features`` — the decoded feature rows (Arrow-batched
  ``mapInPandas`` over the real BMP/WAV codecs, or the deterministic
  fake for formats this container cannot decode).

Commit protocol (mirrors :func:`.corpus.ingest_batch`, the r13
design): appends run FEATURES-FIRST / BLOBS-LAST, each carrying the
``txn=(app_id, batch_id)`` marker, so the BLOBS commit is the batch's
single commit point.  A replayed batch (streaming foreachBatch
re-delivery) is skipped in O(1) off the BLOBS marker; a crash between
the FEATURES and BLOBS appends replays to the identical final state
(the decode is deterministic given the batch + committed BLOBS, and
transient orphan feature rows are invisible — features join back to
committed blobs).  Crashed-append residue is discarded up front (the
source re-delivers, so deletion is the lossless repair).

Scale: dedup is digest-hash work, linear in the batch; the decode is
Arrow-batched Python bounded by ``arrow.maxRecordsPerBatch``; nothing
scans the stored blob pages except the features that were already
paid for once.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import multimodal as mm
from . import storage as storage_mod
from .storage import TableStore

BLOBS = "media.blobs"
FEATS = "media.features"


def ingest_media_batch(
    store: TableStore,
    media_df: DataFrame,
    fake_decode: bool = False,
    txn: tuple[str, int] | None = None,
    discard_residue: bool = True,
) -> dict:
    """Dedup ``media_df`` (MEDIA_SCHEMA) against itself and the stored
    blob corpus, decode the survivors, append features then blobs.
    Returns the accounting dict.  ``media_id`` values must be globally
    unique across batches (the caller's ingest contract).  The batch's
    localCheckpoint is released before returning (constant-memory
    stream contract — see corpus.ingest_batch)."""
    pre_rdds = storage_mod.snapshot_persistent_rdds(store.spark)
    try:
        return _ingest_media_batch_impl(
            store, media_df, fake_decode, txn, discard_residue
        )
    finally:
        storage_mod.release_checkpoints_since(store.spark, pre_rdds)


def _ingest_media_batch_impl(
    store: TableStore,
    media_df: DataFrame,
    fake_decode: bool,
    txn: tuple[str, int] | None,
    discard_residue: bool,
) -> dict:
    feats_applied = False
    if txn is not None:
        app_id, ver = txn[0], int(txn[1])

        def _applied(t: str) -> bool:
            v = store.last_txn_version(t, app_id)
            return v is not None and v >= ver

        if _applied(BLOBS):
            return {
                "batch": 0, "exact_batch_dups": 0, "exact_corpus_dups": 0,
                "accepted": 0, "corpus_size": store.count(BLOBS),
                "replayed": True,
            }
        if discard_residue:
            for t in (BLOBS, FEATS):
                store.discard_uncommitted(t)
        feats_applied = _applied(FEATS)

    batch = media_df.withColumn("sha256", F.sha2(F.col("content"), 256))
    n_batch = batch.count()

    # intra-batch exact dedup: lowest media_id per digest survives
    winners = batch.groupBy("sha256").agg(
        F.min("media_id").alias("media_id")
    )
    uniq = batch.join(winners.select("media_id"), "media_id", "left_semi")
    n_exact_batch = n_batch - uniq.count()

    # cross-corpus exact dedup: anti-join on the stored DIGEST column
    # only — column pruning keeps the blob pages unread
    if store.exists(BLOBS):
        fresh = uniq.join(
            store.read(BLOBS).select("sha256"), "sha256", "left_anti"
        )
    else:
        fresh = uniq
    # materialize: the decode, both appends, and the accounting all
    # consume this slice (and appends must not re-plan over a table
    # the same batch is mutating)
    fresh = fresh.localCheckpoint()
    n_exact_corpus = n_batch - n_exact_batch - fresh.count()

    feats = mm.decode_media(
        fresh.select("media_id", "content", "meta"), fake=fake_decode
    )
    if not feats_applied:
        store.append(FEATS, feats, txn=txn)
    n_accepted = store.append(BLOBS, fresh, txn=txn)

    return {
        "batch": n_batch,
        "exact_batch_dups": n_exact_batch,
        "exact_corpus_dups": n_exact_corpus,
        "accepted": n_accepted,
        "corpus_size": store.count(BLOBS),
    }


def ingest_media_stream(
    store: TableStore,
    stream_df: DataFrame,
    checkpoint_dir: str,
    fake_decode: bool = False,
    app_id: str | None = None,
) -> None:
    """Streaming form: checkpointed offsets deliver micro-batches
    at-least-once into ``foreachBatch``; the per-batch txn marker
    chain makes the replay exactly-once.  ``app_id`` derives from the
    checkpoint location (per-query txnAppId convention — see
    :func:`.corpus.ingest_stream`)."""
    if app_id is None:
        digest = hashlib.sha256(
            os.path.abspath(checkpoint_dir).encode()
        ).hexdigest()[:16]
        app_id = f"stream::media_ingest::{digest}"
    state = {"swept": False}

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ingest_media_batch(
            store, batch_df, fake_decode=fake_decode,
            txn=(app_id, int(batch_id)),
            discard_residue=not state["swept"],
        )
        state["swept"] = True

    q = (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
