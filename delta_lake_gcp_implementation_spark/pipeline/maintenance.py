"""Table maintenance: compaction, clustered layout, partitioned writes.

The reference documents these as absent/future work ("Partitioned By:
None", ``docs/SCHEMA_REGISTRY.md:40``; Z-ordering/compaction/VACUUM
"coming soon", ``README.md:654-659``).  At 100 TB they are mandatory:

- **Partitioned writes** (date partitions) make the watermark slice a
  partition-pruned scan instead of a full-table filter.
- **Compaction** bounds the small-file count that incremental MERGE
  fallbacks and streaming sinks accumulate (file-listing and task
  overhead grow linearly with file count).
- **Clustered (sorted) layout** is poor-man's Z-order on one key:
  sorting within partitions gives parquet row-group min/max stats
  real pruning power for range predicates on that key.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from .storage import TableStore


def file_count(store: TableStore, name: str) -> int:
    """Count parquet part files, walking hive-partitioned subdirs too
    (a top-level-only listing reports 0 for write_partitioned
    layouts)."""
    return sum(
        1
        for _dir, _subdirs, files in os.walk(store.path(name))
        for f in files
        if f.endswith(".parquet") and not f.startswith(".")
    )


def compact(store: TableStore, name: str, target_files: int = 8) -> int:
    """Rewrite a table into ``target_files`` files (coalesce — no
    shuffle; the files were already hash-scattered by prior writes).
    Returns the new file count."""
    df = store.read(name).coalesce(target_files)
    store.overwrite(name, df, size_files=False)
    return file_count(store, name)


def cluster_by(
    store: TableStore, name: str, sort_cols: list[str], n_files: int = 8
) -> None:
    """Range-partition by ``sort_cols`` then sort within partitions:
    globally ordered layout whose parquet row-group stats prune range
    scans on those columns (single-key Z-order equivalent)."""
    df = (
        store.read(name)
        .repartitionByRange(n_files, *[F.col(c) for c in sort_cols])
        .sortWithinPartitions(*sort_cols)
    )
    store.overwrite(name, df, size_files=False)


def write_partitioned(
    store: TableStore, name: str, df, partition_cols: list[str]
) -> None:
    """Overwrite as a hive-partitioned layout (e.g. Bronze by event
    date): the watermark/date-range scans then prune whole partitions
    (visible as ``PartitionFilters`` in the plan)."""
    final = store.path(name)
    tmp = f"{final}.__stage__part"
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(tmp)
    import shutil

    if os.path.isdir(final):
        shutil.rmtree(final)
    os.rename(tmp, final)
    # this write bypasses the TableStore counted path: drop the row-count
    # sidecar so store.count() self-heals with one scan
    meta = store._meta_path(name)
    if os.path.exists(meta):
        os.remove(meta)
    store.spark.catalog.refreshByPath(final)


def write_bucketed(
    spark,
    df,
    table: str,
    key: str,
    n_buckets: int = 8,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed + sorted catalog table: rows are
    hash-partitioned into ``n_buckets`` files by ``key`` AT WRITE TIME
    and sorted within each bucket.

    This is the co-located-join tool: two tables bucketed on the same
    key with the same bucket count join with ZERO Exchange (and with
    ``sortBy`` also zero Sort) — the shuffle happened once at write
    time instead of on every query.  For a 100 TB fact repeatedly
    joined on the same key, this converts the dominant per-query
    shuffle into a one-time layout cost (the plan assertion lives in
    the tests).  Bucketing needs the session catalog (file metadata
    alone cannot carry bucket info), hence ``saveAsTable`` rather than
    a bare parquet path; ``path`` makes it an external table.
    """
    w = df.write.format("parquet").mode("overwrite").bucketBy(n_buckets, key).sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def refresh_agg_incremental(
    store: TableStore,
    agg_name: str,
    delta_df,
    keys: list[str],
    sum_cols: list[str],
    count_col: str = "n_rows",
    txn: tuple[str, int] | None = None,
) -> int:
    """Incremental materialized-aggregate maintenance (the Delta Live
    Tables / Materialize pattern): fold an APPEND-ONLY delta batch into
    a stored SUM/COUNT rollup without rescanning the base table.

    Plan: aggregate ONLY the delta (one hash agg over the batch), join
    the touched keys against the stored rollup (size-gated broadcast of
    the delta-key set inside ``upsert``), and write back additive sums.
    Cost is O(delta + touched keys), not O(base) — at a 100 TB fact
    table the full-recompute alternative is the difference between
    seconds and hours.  Equivalence with full recompute is
    property-tested (``test_refresh_agg_incremental_*``).

    Additive folding is exact for SUM/COUNT of exact types (bigint /
    decimal); for floats the fold order differs from a recompute in the
    last ULPs, and AVG/MIN/MAX need retraction logs — out of scope, as
    in every incremental-view engine's additive tier.
    """
    partial = delta_df.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in sum_cols],
        F.count(F.lit(1)).cast("bigint").alias(count_col),
    )
    if not store.exists(agg_name):
        if txn is not None:
            return store.overwrite(agg_name, partial, txn=txn)
        rows = store.append(agg_name, partial)
        return rows
    current = store.read(agg_name)
    touched = current.join(
        partial.select(*keys).distinct(), keys, "left_semi"
    )
    merged = (
        touched.unionByName(partial)
        .groupBy(*keys)
        .agg(
            *[F.sum(c).alias(c) for c in sum_cols],
            F.sum(count_col).cast("bigint").alias(count_col),
        )
    )
    # upsert's write-observed count is the post-fold answer; counting
    # ``merged`` AFTER the swap would read the replaced lineage (the
    # stale-file-listing trap the storage layer docs call out)
    return store.upsert(agg_name, merged, keys, txn=txn)


def file_stats(store: TableStore, name: str, column: str) -> list[dict]:
    """Per-file [min, max] for ``column`` read from parquet FOOTERS —
    the statistics Delta keeps in its commit log.  Local metadata reads
    (no data pages touched); at cluster scale this listing itself lives
    in the manifest, written once per commit."""
    import pyarrow.parquet as pq

    out = []
    root = store.path(name)
    for fname in sorted(os.listdir(root)):
        if not fname.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(root, fname)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        if column not in idx:
            continue
        lo = hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx[column]).statistics
            if st is None or not st.has_min_max:
                lo = hi = None
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        out.append({"file": fname, "min": lo, "max": hi})
    return out


def scan_pruned(store: TableStore, name: str, column: str, lo, hi):
    """Data skipping (Delta file-pruning parity): read only the files
    whose footer [min, max] for ``column`` overlaps [lo, hi] — on a
    ``cluster_by``-laid-out table a narrow range scan touches one file
    instead of all of them, the difference between reading 100 TB and
    reading one range's worth.  Files with missing stats are kept
    (never prune on absence).  The returned DataFrame still carries the
    predicate, so correctness never depends on the stats: pruning is an
    IO optimization, the filter is the contract.  Returns ``(df,
    files_read, files_total)``."""
    stats = file_stats(store, name, column)
    root = store.path(name)
    keep = [
        s["file"]
        for s in stats
        if s["min"] is None or not (s["max"] < lo or s["min"] > hi)
    ]
    if not keep:
        return store.read(name).limit(0), 0, len(stats)
    pruned = store.spark.read.option("basePath", root).parquet(
        *[os.path.join(root, f) for f in keep]
    )
    df = pruned.filter((F.col(column) >= lo) & (F.col(column) <= hi))
    return df, len(keep), len(stats)


def _empty_like(store: TableStore, name: str):
    """Zero-row frame for a table whose directory holds no part files
    (an empty-DataFrame overwrite can emit only ``_SUCCESS``).  Parquet
    schema inference needs at least one footer, so fall back to the
    catalog registration (which snapshots the schema at write time),
    then to a zero-column frame."""
    from pyspark.sql.types import StructType

    try:
        return store.read(name).limit(0)
    except Exception:
        pass
    db, dot, tbl = name.partition(".")
    if not dot:
        db, tbl = "default", name
    try:
        return store.spark.table(f"`{db}`.`{tbl}`").limit(0)
    except Exception:
        return store.spark.createDataFrame([], StructType([]))


def build_file_bloom(
    store: TableStore, name: str, column: str,
    m_bits: int = 8192, k_hash: int = 3,
) -> dict[str, list[int]]:
    """Per-FILE bloom filters over ``column`` (Delta's bloom-filter
    index parity): one pass over the table tagged with
    ``input_file_name()``, bit positions folded per (file, word) with a
    map-side-combined ``bit_or`` — at most files * m/64 shuffled rows.
    Returns {file: words}; pair with ``scan_bloom_pruned`` for
    point-lookup file skipping where min/max stats can't help (high
    cardinality, unsorted layout)."""
    from ..operators import bloom as bloom_ops

    # Key by path RELATIVE TO THE TABLE ROOT, not basename: Spark's
    # dynamic-partition writes reuse the same basename
    # (part-NNNNN-<jobuuid>-c000.parquet) across hive partition dirs,
    # so basename keys silently bit_or distinct files into one merged
    # entry (still no false negatives, but pruning degrades and
    # per-file attribution is lost).  input_file_name() returns a URI
    # (file:///...) with percent-escaped characters (space -> %20), so
    # decode it BEFORE locating the filesystem root — matching the raw
    # URI against an unescaped root silently never matches on such
    # paths and the index stops pruning (r7 ADVICE).  url_decode is
    # x-www-form-urlencoded (decodes '+' to space), while URI paths
    # keep '+' literal: pre-escape '+' to %2B so the decode is exact
    # for every %XX sequence.  A literal '%' is always %25 inside the
    # URI, so the pre-escape cannot clash.
    root = store.path(name).rstrip("/")
    decoded = F.url_decode(
        F.regexp_replace(F.input_file_name(), r"\+", "%2B")
    )
    rel = F.substring(
        decoded,
        F.locate(root + "/", decoded) + F.lit(len(root) + 1),
        F.lit(2**30),
    )
    df = store.read(name).select(
        rel.alias("__file"),
        F.col(column).cast("string").alias("__key"),
    )
    pos = df.select(
        "__file",
        F.explode(
            F.array(
                *[
                    bloom_ops._position(F.col("__key"), i, m_bits)
                    for i in range(k_hash)
                ]
            )
        ).alias("pos"),
    )
    words = (
        pos.select(
            "__file",
            (F.col("pos") / 64).cast("int").alias("w"),
            F.element_at(
                bloom_ops._pow2_array(), (F.col("pos") % 64).cast("int") + F.lit(1)
            ).alias("bit"),
        )
        .groupBy("__file", "w")
        .agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    out: dict[str, list[int]] = {}
    for r in words:
        out.setdefault(r["__file"], [0] * (m_bits // 64))[r["w"]] = int(
            r["word"]
        )
    return out


def _py_bloom_hit(key: str, words: list[int], m_bits: int, k_hash: int) -> bool:
    import hashlib

    for i in range(k_hash):
        h = int(hashlib.md5(f"{key}:{i}".encode()).hexdigest()[:15], 16)
        p = h % m_bits
        if not (words[p // 64] >> (p % 64)) & 1:
            return False
    return True


def scan_bloom_pruned(
    store: TableStore, name: str, column: str, value,
    index: dict[str, list[int]], m_bits: int = 8192, k_hash: int = 3,
):
    """Equality-probe file skipping via the bloom index: read only
    files whose filter says "maybe present".  False means DEFINITELY
    absent (no false negatives), so skipped files cannot lose rows; the
    returned frame still carries the predicate — pruning is IO-only.
    Files missing from the index are kept (never prune on absence).
    Walks hive-partitioned subdirs like ``file_count`` (a top-level-only
    listing would silently return 0 rows for ``write_partitioned``
    layouts); the index is keyed by path relative to the table root to
    match ``build_file_bloom`` (basenames collide across hive partition
    dirs).  A table directory that exists but holds zero part files (an
    empty-DataFrame overwrite can emit only ``_SUCCESS``) returns an
    empty frame; ``FileNotFoundError`` is reserved for a missing root.
    Returns ``(df, files_read, files_total)``."""
    root = store.path(name)
    if not os.path.isdir(root):
        raise FileNotFoundError(
            f"scan_bloom_pruned: table root missing: {root}"
        )
    files = sorted(
        os.path.relpath(os.path.join(d, f), root)
        for d, _subdirs, fs in os.walk(root)
        for f in fs
        if f.endswith(".parquet") and not f.startswith(".")
    )
    if not files:
        return _empty_like(store, name), 0, 0
    keep = [
        f
        for f in files
        if f not in index
        or _py_bloom_hit(str(value), index[f], m_bits, k_hash)
    ]
    if not keep:
        return store.read(name).limit(0), 0, len(files)
    df = store.spark.read.option("basePath", root).parquet(
        *[os.path.join(root, f) for f in keep]
    )
    return df.filter(F.col(column) == value), len(keep), len(files)
