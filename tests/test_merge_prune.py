"""File-granular MERGE/DELETE/UPDATE (round 14).

Delta rewrites only the files a key-matched mutation actually touches
(per-file stats in the commit log decide which files can contain a
source key); the pre-r14 parquet fallback rewrote the whole table on
every MERGE — THE scale gap at 100 TB, where a 0.1% incremental batch
must not cost a full-table write.  These tests pin the fast path's
observable contract:

- only stat-overlapping files are rewritten; untouched files stay in
  place byte-for-byte (inode-stable),
- a merge whose keys land beyond every file's range degrades to an
  O(batch) append (zero files rewritten),
- results are IDENTICAL to the full-rewrite path on randomized merges,
- time travel, CDF, restore, and vacuum keep working across partial
  rewrites (replaced originals live in ``<lineage>.files``),
- both crash residue classes repair: strictly-additive staged-in files
  are discarded, committed-files-missing restores from the per-file
  archive,
- unsupported shapes (partitioned layout, unprunable key types,
  source-wider-than-target schemas) fall back to the full path with
  unchanged semantics.

Reference parity: the reference's MERGE jobs (`load_silver.py`,
`scd2_dim_customer.py`) run on Delta, whose MERGE is file-granular by
design — this suite is the local proof of the same behavior.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from delta_lake_gcp_implementation_spark.pipeline.storage import TableStore


def _rows(df):
    return {tuple(r) for r in df.collect()}


@pytest.fixture()
def store(spark, tmp_path):
    s = TableStore(spark, str(tmp_path / "wh_mp"))
    # production floor: tables under 256 MB skip the fast path (the
    # decision costs more than a tiny rewrite); zero it here so the
    # path under test engages on test-sized tables
    s.prune_min_table_bytes = 0
    return s


def _clustered_table(spark, store, name="db.mp", n=4000, files=4):
    """A table whose files carry disjoint key ranges — the layout
    compaction/clustering produces, and the one stats pruning wins on."""
    df = spark.range(0, n).select(
        F.col("id").alias("k"),
        (F.col("id") % 100).alias("v"),
        F.concat(F.lit("name_"), F.col("id")).alias("s"),
    )
    store.overwrite(name, df.repartitionByRange(files, "k"))
    return name


def _live_parts(store, name):
    return sorted(glob.glob(os.path.join(store.path(name), "part-*")))


def test_partial_merge_rewrites_only_overlapping_files(spark, store):
    t = _clustered_table(spark, store)
    before = {f: os.stat(f).st_ino for f in _live_parts(store, t)}
    assert len(before) == 4
    src = (
        spark.range(100, 150)
        .union(spark.range(5000, 5010))
        .select(
            F.col("id").alias("k"),
            F.lit(-1).cast("bigint").alias("v"),
            F.concat(F.lit("upd_"), F.col("id")).alias("s"),
        )
    )
    after = store.upsert(t, src, ["k"])
    m = store._latest_manifest(t)
    assert m["op"] == "merge"
    assert m["files_rewritten"] == 1 and m["files_total"] == 4
    # the three non-overlapping files were not rewritten, not even
    # re-written-identically: same inode, same bytes
    survivors = [
        f for f in before if os.path.exists(f) and os.stat(f).st_ino == before[f]
    ]
    assert len(survivors) == 3
    assert after == 4010 == store.count(t) == store.read(t).count()
    got = store.read(t)
    assert got.filter((F.col("v") == -1) & (F.col("k") < 5000)).count() == 50
    assert got.filter(F.col("k") >= 5000).count() == 10
    assert got.filter(F.col("k") == 2500).select("s").first()[0] == "name_2500"


def test_insert_only_merge_is_an_append(spark, store):
    """Keys beyond every file's range: MERGE must cost O(batch), not a
    table rewrite — zero files rewritten, every original untouched."""
    t = _clustered_table(spark, store)
    before = {f: os.stat(f).st_ino for f in _live_parts(store, t)}
    src = spark.range(50000, 50020).select(
        F.col("id").alias("k"),
        F.lit(7).cast("bigint").alias("v"),
        F.lit("ins").alias("s"),
    )
    after = store.upsert(t, src, ["k"])
    m = store._latest_manifest(t)
    assert m["op"] == "merge" and m["files_rewritten"] == 0
    assert after == 4020 == store.count(t)
    assert all(
        os.path.exists(f) and os.stat(f).st_ino == i for f, i in before.items()
    )


def test_literal_typed_source_still_takes_fast_path(spark, store):
    """F.lit(3) is an INT against a BIGINT table column — the safe
    up-cast alignment (Delta MERGE's implicit cast) must keep the fast
    path and must NOT narrow the table schema."""
    t = _clustered_table(spark, store)
    src = spark.range(10, 12).select(
        F.col("id").alias("k"), F.lit(3).alias("v"), F.lit("x").alias("s")
    )
    assert dict(src.dtypes)["v"] == "int"
    store.upsert(t, src, ["k"])
    assert store._latest_manifest(t)["op"] == "merge"
    assert dict(store.read(t).dtypes)["v"] == "bigint"


def test_source_wider_than_target_falls_back_to_full_rewrite(spark, store):
    """A LONG source column into an INT table widens the table — that
    is the full path's job (unionByName coercion), never the partial
    one (mixed-type files under one directory)."""
    store.overwrite(
        "db.narrow",
        spark.createDataFrame([(1, 1), (2, 2)], "k int, v int").repartitionByRange(
            2, "k"
        ),
    )
    src = spark.createDataFrame([(2, 2**40)], "k int, v bigint")
    store.upsert("db.narrow", src, ["k"])
    m = store._latest_manifest("db.narrow")
    assert m["op"] == "replace"
    assert dict(store.read("db.narrow").dtypes)["v"] == "bigint"
    assert _rows(store.read("db.narrow")) == {(1, 1), (2, 2**40)}


def test_small_table_floor_takes_plain_path(spark, tmp_path):
    """At the default ``prune_min_table_bytes`` a few-MB table must
    skip the prune decision entirely (the decision's jobs cost more
    than a tiny rewrite) and still mutate correctly; zeroing the floor
    re-engages the fast path on the identical layout."""
    s = TableStore(spark, str(tmp_path / "wh_floor"))
    assert s.prune_min_table_bytes == 256 << 20
    t = _clustered_table(spark, s, name="db.floor")
    src = spark.range(100, 150).select(
        F.col("id").alias("k"),
        F.lit(-1).cast("bigint").alias("v"),
        F.concat(F.lit("upd_"), F.col("id")).alias("s"),
    )
    s.upsert(t, src, ["k"])
    m = s._latest_manifest(t)
    assert m["op"] == "replace"  # under the floor: plain full rewrite
    got = s.read(t)
    assert got.filter(F.col("v") == -1).count() == 50
    assert s.count(t) == 4000
    s.prune_min_table_bytes = 0
    t2 = _clustered_table(spark, s, name="db.floor2")
    src2 = spark.range(200, 220).select(
        F.col("id").alias("k"),
        F.lit(-2).cast("bigint").alias("v"),
        F.concat(F.lit("up2_"), F.col("id")).alias("s"),
    )
    s.upsert(t2, src2, ["k"])
    m2 = s._latest_manifest(t2)
    assert m2["op"] == "merge" and m2["files_rewritten"] < m2["files_total"]
    assert s.read(t2).filter(F.col("v") == -2).count() == 20


def test_pruned_merge_equals_full_merge(spark, store, monkeypatch):
    """Equivalence property: the fast path and the forced full path
    must produce identical tables on a source that mixes updates
    across several files with inserts."""
    t = _clustered_table(spark, store, name="db.eq_fast")
    t_full = _clustered_table(spark, store, name="db.eq_full")
    src = spark.range(0, 1800, 7).union(spark.range(50000, 50010)).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
        F.concat(F.lit("u_"), F.col("id")).alias("s"),
    )
    store.upsert(t, src, ["k"])
    m = store._latest_manifest(t)
    assert m["op"] == "merge" and 1 <= m["files_rewritten"] < m["files_total"]
    monkeypatch.setattr(
        TableStore, "_file_key_stats", lambda self, *a, **k: None
    )
    store.upsert(t_full, src, ["k"])
    assert store._latest_manifest(t_full)["op"] == "replace"
    assert _rows(store.read(t)) == _rows(store.read(t_full))
    assert store.count(t) == store.count(t_full)


def test_string_and_date_keys_prune(spark, store):
    import datetime

    rows = [
        (f"c{i:05d}", datetime.date(2024, 1, 1 + i % 28), i) for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "ck string, d date, v bigint")
    store.overwrite("db.skeys", df.repartitionByRange(4, "ck"))
    src = spark.createDataFrame(
        [("c00100", datetime.date(2024, 1, 5), -5)], "ck string, d date, v bigint"
    )
    store.upsert("db.skeys", src, ["ck"])
    m = store._latest_manifest("db.skeys")
    assert m["op"] == "merge" and m["files_rewritten"] == 1
    got = store.read("db.skeys")
    assert got.count() == 2000
    assert got.filter(F.col("v") == -5).count() == 1


def test_null_keys_survive_partial_merge(spark, store):
    """NULL target keys match nothing (SQL join semantics) and an
    all-null-key file must be pruned away, not crash the stats read."""
    df = spark.createDataFrame(
        [(None, "keepme1"), (None, "keepme2")], "k bigint, s string"
    ).union(spark.range(0, 100).select(F.col("id").alias("k"), F.lit("x").alias("s")))
    store.overwrite("db.nulls", df.repartition(2))
    src = spark.createDataFrame([(5, "upd")], "k bigint, s string")
    store.upsert("db.nulls", src, ["k"])
    got = store.read("db.nulls")
    assert got.filter(F.col("k").isNull()).count() == 2
    assert got.filter(F.col("s") == "upd").count() == 1
    assert got.count() == 102


def test_time_travel_and_cdf_across_partial_merge(spark, store):
    t = _clustered_table(spark, store)
    src = spark.range(100, 103).select(
        F.col("id").alias("k"),
        F.lit(-1).cast("bigint").alias("v"),
        F.lit("upd").alias("s"),
    )
    store.upsert(t, src, ["k"])  # v2, partial
    assert store._latest_manifest(t)["files_rewritten"] == 1
    v1 = store.read_version(t, 1)
    assert v1.count() == 4000
    assert v1.filter(F.col("k") == 101).select("s").first()[0] == "name_101"
    ch = store.read_changes(t, 1, 2, ["k"])
    by_type = {r["_change_type"]: r["n"] for r in
               ch.groupBy("_change_type").agg(F.count("*").alias("n")).collect()}
    assert by_type == {"update_preimage": 3, "update_postimage": 3}
    # restore is a new commit that undoes the merge
    store.restore(t, 1)
    assert store.read(t).filter(F.col("v") == -1).count() == 0
    assert store.count(t) == 4000


def test_pruned_delete_and_update(spark, store):
    t = _clustered_table(spark, store)
    deleted = store.delete_matched(
        t, spark.createDataFrame([(200,), (201,), (999999,)], "k bigint"), ["k"]
    )
    m = store._latest_manifest(t)
    assert deleted == 2 and m["op"] == "delete" and m["files_rewritten"] == 1
    assert store.count(t) == 3998 == store.read(t).count()
    matched = store.update_matched(
        t,
        spark.createDataFrame([(300,), (888888,)], "k bigint"),
        ["k"],
        {"v": F.lit(-9).cast("bigint")},
    )
    m = store._latest_manifest(t)
    assert matched == 1 and m["op"] == "update" and m["files_rewritten"] == 1
    assert _rows(store.read(t).filter(F.col("v") == -9).select("k")) == {(300,)}
    assert store.count(t) == 3998


def test_no_match_delete_commits_without_touching_files(spark, store):
    t = _clustered_table(spark, store)
    before = {f: os.stat(f).st_ino for f in _live_parts(store, t)}
    v0 = store.current_version(t)
    deleted = store.delete_matched(
        t, spark.createDataFrame([(999999,)], "k bigint"), ["k"]
    )
    assert deleted == 0
    assert store.current_version(t) == v0 + 1  # history fidelity
    assert store._latest_manifest(t)["files_rewritten"] == 0
    assert all(
        os.path.exists(f) and os.stat(f).st_ino == i for f, i in before.items()
    )
    # no-match update observes zero without blocking on the never-run
    # observation
    assert (
        store.update_matched(
            t,
            spark.createDataFrame([(999999,)], "k bigint"),
            ["k"],
            {"v": F.lit(0).cast("bigint")},
        )
        == 0
    )


def test_crashed_partial_merge_repairs_both_residue_classes(
    spark, store, monkeypatch
):
    """Crash injection at the worst point of _publish_partial: new
    files moved in AND originals moved out, manifest commit never
    lands.  discard_uncommitted must restore the originals from the
    per-file archive, delete the additive residue, and reset the count
    sidecar; the replayed merge then lands clean."""
    t = _clustered_table(spark, store)
    pre_rows = _rows(store.read(t))
    src = spark.range(100, 103).select(
        F.col("id").alias("k"),
        F.lit(-1).cast("bigint").alias("v"),
        F.lit("upd").alias("s"),
    )
    real_commit = TableStore._commit

    def boom(self, *a, **k):
        raise RuntimeError("injected crash before manifest commit")

    monkeypatch.setattr(TableStore, "_commit", boom)
    with pytest.raises(RuntimeError, match="injected"):
        store.upsert(t, src, ["k"])
    monkeypatch.setattr(TableStore, "_commit", real_commit)
    # torn state: one committed file is in the archive, replacements
    # are uncommitted residue in the live dir
    latest = store._latest_manifest(t)
    live = set(store._list_data_files(store.path(t)))
    assert set(latest["files"]) - live, "crash must leave committed files missing"
    store.discard_uncommitted(t)
    assert _rows(store.read(t)) == pre_rows
    assert store.count(t) == 4000
    # replay lands the merge for real
    after = store.upsert(t, src, ["k"])
    assert after == 4000
    assert store._latest_manifest(t)["op"] == "merge"
    assert store.read(t).filter(F.col("v") == -1).count() == 3


def test_vacuum_expires_per_file_archives_exactly(spark, store):
    t = _clustered_table(spark, store)  # v1
    src1 = spark.range(100, 102).select(
        F.col("id").alias("k"), F.lit(-1).cast("bigint").alias("v"),
        F.lit("u1").alias("s"))
    src2 = spark.range(1100, 1102).select(
        F.col("id").alias("k"), F.lit(-2).cast("bigint").alias("v"),
        F.lit("u2").alias("s"))
    store.upsert(t, src1, ["k"])  # v2: archives file A
    store.upsert(t, src2, ["k"])  # v3: archives file B
    fdir = os.path.join(store._versions_dir(t), "1.files")
    assert len(os.listdir(fdir)) == 2
    # retain v2+v3: v1's replaced original (file A) is referenced by
    # NO retained manifest... but file B IS referenced by v2
    store.vacuum(retain_versions=2)
    remaining = os.listdir(fdir)
    assert len(remaining) == 1, "exactly the unreferenced original expires"
    # v2 (retained) still time-travels through the surviving archive
    assert store.read_version(t, 2).filter(F.col("v") == -1).count() == 2
    with pytest.raises(FileNotFoundError):
        store.read_version(t, 1)
    # retaining only the head expires the rest and drops the empty dir
    store.vacuum(retain_versions=1)
    assert not os.path.isdir(fdir)
    assert store.read_version(t, 3).count() == 4000


def test_partitioned_layout_falls_back_to_full_path(spark, store):
    from delta_lake_gcp_implementation_spark.pipeline import maintenance

    df = spark.range(0, 100).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).alias("p"),
        F.lit("a").alias("s"),
    )
    maintenance.write_partitioned(store, "db.parted", df, ["p"])
    src = spark.createDataFrame([(5, 2, "upd")], "k bigint, p bigint, s string")
    store.upsert("db.parted", src, ["k"])
    assert store._latest_manifest("db.parted")["op"] == "replace"
    got = store.read("db.parted")
    assert got.count() == 100
    assert got.filter(F.col("s") == "upd").count() == 1


def test_composite_key_prunes_on_prunable_subset(spark, store):
    """The bronze merge key is (transaction_id, updated_at) — the
    timestamp column carries no parquet stats (INT96), but pruning on
    ANY key subset is conservative-correct, so the string id alone
    must keep the fast path."""
    import datetime

    ts = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [(f"TXN_{i:06d}", ts, i) for i in range(2000)]
    df = spark.createDataFrame(rows, "tid string, updated_at timestamp, v bigint")
    store.overwrite("db.composite", df.repartitionByRange(4, "tid"))
    src = spark.createDataFrame(
        [("TXN_000100", ts, -1), ("TXN_000100", datetime.datetime(2025, 1, 1), -2)],
        "tid string, updated_at timestamp, v bigint",
    )
    store.upsert("db.composite", src, ["tid", "updated_at"])
    m = store._latest_manifest("db.composite")
    assert m["op"] == "merge" and m["files_rewritten"] == 1
    got = store.read("db.composite")
    # composite semantics: (TXN_000100, ts) updated, (TXN_000100, 2025) inserted
    assert got.count() == 2001
    assert _rows(got.filter(F.col("tid") == "TXN_000100").select("v")) == {
        (-1,), (-2,),
    }


def test_full_replace_after_partial_merges_keeps_history_readable(spark, store):
    """A full _replace archives the outgoing live dir under the
    lineage id while `<lineage>.files` already holds merge-replaced
    originals — versions before, between, and after the merges must
    resolve across all three bases (live, whole-dir archive, per-file
    archive)."""
    t = _clustered_table(spark, store)  # v1, lineage 1
    src1 = spark.range(100, 102).select(
        F.col("id").alias("k"), F.lit(-1).cast("bigint").alias("v"),
        F.lit("u1").alias("s"))
    store.upsert(t, src1, ["k"])  # v2: partial, archives a file to 1.files
    src2 = spark.range(1100, 1102).select(
        F.col("id").alias("k"), F.lit(-2).cast("bigint").alias("v"),
        F.lit("u2").alias("s"))
    store.upsert(t, src2, ["k"])  # v3: partial, archives another
    store.overwrite(
        t, spark.createDataFrame([(1, 1, "tiny")], "k bigint, v bigint, s string")
    )  # v4: full replace, new lineage; outgoing dir archived whole
    assert store.read(t).count() == 1
    assert store.read_version(t, 1).count() == 4000
    assert store.read_version(t, 1).filter(F.col("v") < 0).count() == 0
    v2 = store.read_version(t, 2)
    assert v2.filter(F.col("v") == -1).count() == 2
    assert v2.filter(F.col("v") == -2).count() == 0
    v3 = store.read_version(t, 3)
    assert v3.filter(F.col("v") == -1).count() == 2
    assert v3.filter(F.col("v") == -2).count() == 2
    # restore to the mid-merge version through the mixed bases
    store.restore(t, 3)
    assert store.read(t).count() == 4000
    assert store.count(t) == 4000


def test_txn_marker_travels_with_partial_merge(spark, store):
    """The idempotent-writer contract holds on the fast path: the txn
    marker is mirrored in the SAME atomic manifest commit that
    publishes the merge."""
    t = _clustered_table(spark, store)
    src = spark.range(100, 102).select(
        F.col("id").alias("k"), F.lit(-1).cast("bigint").alias("v"),
        F.lit("u").alias("s"))
    store.upsert(t, src, ["k"], txn=("app_mp", 7))
    m = store._latest_manifest(t)
    assert m["op"] == "merge" and m["txn"] == {"app_id": "app_mp", "version": 7}
    assert store.last_txn_version(t, "app_mp") == 7


# ------------------------------------------------- r15 hardening (ADVICE r14)


def test_adopt_refuses_on_inflight_merge_marker(spark, store):
    """Residue of a merge that crashed between its first staged move
    and its commit duplicates matched rows; adopt_uncommitted folding
    it in would commit BOTH copies.  The ``._merge_inflight`` marker
    makes adopt refuse and routes repair to discard_uncommitted."""
    import json
    import shutil

    t = _clustered_table(spark, store)
    live = _live_parts(store, t)
    # simulate the crash window: marker names the still-current
    # version, and a staged-in replacement file sits next to the
    # original it would have replaced
    with open(store._merge_marker_path(t), "w") as f:
        json.dump({"version": store.current_version(t)}, f)
    dup = os.path.join(store.path(t), "part-99999-duplicate.parquet")
    shutil.copy(live[0], dup)
    with pytest.raises(RuntimeError, match="merge is in flight"):
        store.adopt_uncommitted(t)
    # the right repair clears both the residue and the marker
    removed = store.discard_uncommitted(t)
    assert removed == 1
    assert not os.path.exists(store._merge_marker_path(t))
    assert store.adopt_uncommitted(t) is False
    assert store.read(t).count() == 4000 == store.count(t)


def test_stale_merge_marker_is_cleared_lazily(spark, store):
    """Crash AFTER the merge's commit but before marker removal: the
    version has advanced past the marker, so the table is consistent —
    adopt clears the stale marker and proceeds normally."""
    import json

    t = _clustered_table(spark, store)
    with open(store._merge_marker_path(t), "w") as f:
        json.dump({"version": store.current_version(t) - 1}, f)
    assert store.adopt_uncommitted(t) is False
    assert not os.path.exists(store._merge_marker_path(t))


def test_read_version_old_lineage_ignores_live_dir(spark, store):
    """A live file of the NEW lineage must never shadow an archived
    old-lineage file of the same name in read_version's mixed-base
    per-file resolution (ADVICE r14)."""
    import shutil

    t = _clustered_table(spark, store)
    v1 = store.current_version(t)
    v1_manifest = store._load_manifest(t, v1)
    expected = _rows(store.read_version(t, v1))
    # partial merge spreads v1's files across live + <lineage>.files
    src = spark.range(100, 150).select(
        F.col("id").alias("k"),
        F.lit(-1).cast("bigint").alias("v"),
        F.concat(F.lit("upd_"), F.col("id")).alias("s"),
    )
    store.upsert(t, src, ["k"])
    assert store._latest_manifest(t)["files_rewritten"] == 1
    # full overwrite starts a NEW lineage; v1's untouched files move
    # to the old lineage's archive dir
    store.overwrite(
        t,
        spark.range(0, 10).select(
            F.col("id").alias("k"),
            F.lit(9).cast("bigint").alias("v"),
            F.lit("new").alias("s"),
        ),
    )
    assert store._latest_manifest(t)["lineage"] != v1_manifest["lineage"]
    # plant a same-named file with WRONG content in the live dir
    archived_dir = os.path.join(
        store._versions_dir(t), str(v1_manifest["lineage"])
    )
    shadow_name = next(
        f for f in v1_manifest["files"]
        if os.path.exists(os.path.join(archived_dir, f))
    )
    live_files = _live_parts(store, t)
    shutil.copy(live_files[0], os.path.join(store.path(t), shadow_name))
    assert _rows(store.read_version(t, v1)) == expected
