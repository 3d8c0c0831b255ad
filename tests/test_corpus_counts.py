"""Incremental bucket-count bookkeeping for the corpus-ingest
hot-bucket cap (round 9): the persisted ``corpus.bucket_counts`` table
must equal a from-scratch ``GROUP BY bucket`` recount of the incidence
list after every batch, legacy stores must migrate once, and
``rebuild_index`` must rebuild it."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delta_lake_gcp_implementation_spark.operators import dedup as dedup_ops
from delta_lake_gcp_implementation_spark.pipeline import corpus
from delta_lake_gcp_implementation_spark.pipeline.storage import TableStore

# same corpus fixtures as test_corpus_ingest (tests/ is not a package,
# so they are restated rather than imported)
A = ("the quick brown fox jumps over the lazy dog while the band plays "
     "a slow waltz under clear autumn skies near the old stone bridge")
B = ("distributed query engines shuffle hash partitions across executor "
     "nodes to aggregate massive tables with minimal network transfer cost")
B_NEAR = B[:-4] + "fees"  # last word tweaked: near-dup, not exact
C = ("parquet row groups store columnar statistics enabling predicate "
     "pushdown so scans skip entire chunks without touching the data pages")
D = ("minhash signatures estimate jaccard similarity between shingle sets "
     "allowing locality sensitive hashing to bucket similar documents")
E = ("columnar execution engines vectorize expression evaluation across "
     "record batches so tight loops stay inside cpu caches at full speed")


def _df(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture()
def store(spark, tmp_path):
    return TableStore(spark, str(tmp_path / "corpus_counts_wh"))


def _counts_rows(store):
    # COUNTS is a delta log since r10: the invariant is on the
    # per-bucket SUM, which _stored_bucket_counts materializes
    return sorted(
        (r.bucket, r.n_docs)
        for r in corpus._stored_bucket_counts(store).collect()
    )


def _recount_rows(store):
    return sorted(
        (r.bucket, r.n_docs)
        for r in store.read(corpus.BANDS)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .collect()
    )


def test_counts_match_recount_after_three_batches(spark, store):
    """The verdict's invariant: after several batches (including
    absorbed duplicates, whose band rows never land), the incremental
    counts table equals a from-scratch recount of the incidence list."""
    corpus.ingest_batch(store, _df(spark, [(1, A), (2, B)]))
    corpus.ingest_batch(store, _df(spark, [(11, A), (12, B_NEAR), (13, D)]))
    corpus.ingest_batch(store, _df(spark, [(21, C), (22, D), (23, E)]))
    rows = _counts_rows(store)
    assert rows == _recount_rows(store)
    # sanity: the counts really cover the accepted corpus (docs x bands)
    assert sum(n for _, n in rows) == store.count(corpus.BANDS)
    assert all(n >= 1 for _, n in rows)


def _legacy_ingest(store, df):
    """Persist exactly what the pre-r9 (no counts table) ingest wrote:
    docs, signatures, band incidence."""
    store.append(
        corpus.DOCS,
        df.withColumn("content_hash", F.md5("text")).select(
            "doc_id", "text", "content_hash"
        ),
    )
    sigs = corpus._signatures(df, "doc_id", "text").localCheckpoint()
    store.append(corpus.SIGS, sigs)
    store.append(
        corpus.BANDS,
        dedup_ops.minhash_band_incidence(
            sigs, "doc_id", n_hashes=corpus.MH_N, band_size=corpus.MH_BAND
        ),
    )


def test_legacy_store_migrates_then_stays_incremental(spark, store):
    """A store created before the counts table existed gains it via a
    one-time recount (on the next ingest), after which the invariant
    holds batch over batch."""
    _legacy_ingest(store, _df(spark, [(1, A), (2, B), (3, C)]))
    assert not store.exists(corpus.COUNTS)

    r = corpus.ingest_batch(store, _df(spark, [(11, D), (12, B_NEAR)]))
    assert r["near_dups"] == 1 and r["accepted"] == 1
    assert store.exists(corpus.COUNTS)
    assert _counts_rows(store) == _recount_rows(store)

    corpus.ingest_batch(store, _df(spark, [(21, E)]))
    assert _counts_rows(store) == _recount_rows(store)


def test_capped_ingest_reads_counts_not_incidence(spark, store):
    """The cap decision must come from the counts table: poison the
    incidence-derived recount by upserting an inflated count for every
    bucket and require the next batch's near-dup join to be skipped
    (cap engaged) even though the true incidence is tiny — proving the
    check is O(batch) bookkeeping, not an O(corpus) re-aggregation."""
    corpus.ingest_batch(store, _df(spark, [(1, B)]))
    inflated = store.read(corpus.COUNTS).select(
        "bucket", (F.col("n_docs") + F.lit(1000)).cast("bigint").alias("n_docs")
    )
    store.upsert(corpus.COUNTS, inflated, keys=["bucket"])
    r = corpus.ingest_batch(store, _df(spark, [(2, B_NEAR)]))
    # every shared bucket now reads >MAX_BUCKET members: near-dup missed
    assert r["near_dups"] == 0 and r["accepted"] == 1


def test_rebuild_index_rebuilds_counts(spark, store):
    corpus.ingest_batch(store, _df(spark, [(1, A), (2, B)]))
    corpus.ingest_batch(store, _df(spark, [(3, C), (4, D)]))
    inc = _counts_rows(store)
    r = corpus.rebuild_index(store)
    assert r["buckets"] == len(inc)
    assert _counts_rows(store) == inc == _recount_rows(store)


def test_crash_between_bands_append_and_counts_self_heals(spark, store):
    """ADVICE r9: a crash after ``store.append(BANDS, ...)`` but before
    the counts bookkeeping used to leave the log understated FOREVER
    (the migration recount only fired when COUNTS was absent).  The
    sync sidecar now detects the divergence and the next ingest
    recounts."""
    corpus.ingest_batch(store, _df(spark, [(1, A), (2, B)]))
    # simulate the crash window: extra incidence rows land, counts
    # bookkeeping never runs
    sigs = corpus._signatures(
        _df(spark, [(99, C)]), "doc_id", "text"
    ).localCheckpoint()
    store.append(
        corpus.BANDS,
        dedup_ops.minhash_band_incidence(
            sigs, "doc_id", n_hashes=corpus.MH_N, band_size=corpus.MH_BAND
        ),
    )
    assert _counts_rows(store) != _recount_rows(store)  # broken state
    corpus.ingest_batch(store, _df(spark, [(11, D)]))
    assert _counts_rows(store) == _recount_rows(store)  # healed


def test_orphan_bands_files_adopted_and_healed(spark, store):
    """ADVICE r10 (the narrower crash class): a crash BETWEEN the BANDS
    parquet job commit and its manifest/meta writes leaves orphan data
    files that ``read()`` sees but committed state does not — the old
    count-keyed sidecar check passed right through that state.  The
    version-keyed check plus ``adopt_uncommitted`` must detect it and
    recount on the next ingest."""
    corpus.ingest_batch(store, _df(spark, [(1, A), (2, B)]))
    sigs = corpus._signatures(
        _df(spark, [(99, C)]), "doc_id", "text"
    ).localCheckpoint()
    bands = dedup_ops.minhash_band_incidence(
        sigs, "doc_id", n_hashes=corpus.MH_N, band_size=corpus.MH_BAND
    )
    # raw spark append: parquet files land, NO meta update, NO manifest
    bands.write.mode("append").parquet(store.path(corpus.BANDS))
    spark.catalog.refreshByPath(store.path(corpus.BANDS))
    # the old check's exact blind spot: sidecar vs committed state
    # still agree, yet read() diverges from the counts log
    assert store.uncommitted_files(corpus.BANDS) != []
    assert _counts_rows(store) != _recount_rows(store)  # broken state
    corpus.ingest_batch(store, _df(spark, [(11, D)]))
    assert store.uncommitted_files(corpus.BANDS) == []
    assert _counts_rows(store) == _recount_rows(store)  # healed


def test_first_batch_skips_noop_compaction(spark, store):
    """ADVICE r10: with no sync sidecar, base defaulted to 1, so any
    first batch with >4 buckets immediately rewrote the COUNTS table it
    had just created.  The creating overwrite must now be the ONLY
    commit, with the baseline recorded at the written row count."""
    corpus.ingest_batch(store, _df(spark, [(1, A), (2, B), (3, C)]))
    assert store.count(corpus.COUNTS) > corpus._COUNTS_COMPACT_FACTOR
    assert store.current_version(corpus.COUNTS) == 1  # one commit only
    sync = corpus._load_counts_sync(store)
    assert sync["base_rows"] == store.count(corpus.COUNTS)
    assert sync["appends"] == 0


def test_counts_log_compacts_on_append_count(spark, store, monkeypatch):
    """ADVICE r10: many tiny batches over a large bucket population
    accumulate a parquet file-set + manifest per append long before the
    row-factor trigger fires; the append-count trigger bounds that."""
    corpus.ingest_batch(store, _df(spark, [(1, A)]))
    monkeypatch.setattr(corpus, "_COUNTS_COMPACT_APPENDS", 1)
    corpus.ingest_batch(store, _df(spark, [(11, B)]))
    # row factor (4x) is nowhere near exceeded by two similar batches,
    # so only the append-count trigger explains a compacted log
    distinct_buckets = (
        store.read(corpus.COUNTS).select("bucket").distinct().count()
    )
    assert store.count(corpus.COUNTS) == distinct_buckets
    assert _counts_rows(store) == _recount_rows(store)
    assert corpus._load_counts_sync(store)["appends"] == 0


def test_counts_log_appends_then_compacts(spark, store, monkeypatch):
    """Per-batch bookkeeping must APPEND delta rows (no table rewrite);
    once the log outgrows the compaction factor it collapses back to
    one row per bucket, invariant intact throughout."""
    corpus.ingest_batch(store, _df(spark, [(1, A)]))
    base_rows = store.count(corpus.COUNTS)
    corpus.ingest_batch(store, _df(spark, [(11, B)]))
    # factor 4 not yet exceeded: the log holds BOTH batches' delta rows
    assert store.count(corpus.COUNTS) > base_rows
    assert _counts_rows(store) == _recount_rows(store)
    # force the threshold: the next batch's bookkeeping must compact
    monkeypatch.setattr(corpus, "_COUNTS_COMPACT_FACTOR", 1)
    corpus.ingest_batch(store, _df(spark, [(21, C)]))
    distinct_buckets = (
        store.read(corpus.COUNTS).select("bucket").distinct().count()
    )
    assert store.count(corpus.COUNTS) == distinct_buckets  # compacted
    assert _counts_rows(store) == _recount_rows(store)


def test_missing_sync_sidecar_forces_recount(spark, store):
    """A deleted/lost sync sidecar (e.g. a pre-sidecar store, or a
    partial restore) must force a recount on the next ingest rather
    than trusting the existing COUNTS log blindly."""
    import os

    corpus.ingest_batch(store, _df(spark, [(1, A), (2, B)]))
    os.remove(corpus._counts_sync_path(store))
    # poison the log so only a recount can restore the invariant
    store.append(
        corpus.COUNTS,
        store.read(corpus.COUNTS).limit(1).select(
            "bucket", (F.col("n_docs") + 500).cast("bigint").alias("n_docs")
        ),
    )
    assert _counts_rows(store) != _recount_rows(store)
    corpus.ingest_batch(store, _df(spark, [(11, C)]))
    assert _counts_rows(store) == _recount_rows(store)
