"""Round-4 hardening tests: size-gated MERGE broadcasts, the
spark.sql ``db.table`` catalog surface (the reference's BI entry
point, ``Gold/Gold Layer README.md:390-447``), and the quadratic
guard on the all-pairs Jaccard default."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delta_lake_gcp_implementation_spark.operators import dedup as dedup_ops
from delta_lake_gcp_implementation_spark.operators.sizing import (
    fits_broadcast,
    maybe_broadcast,
)
from delta_lake_gcp_implementation_spark.pipeline import fixtures, medallion
from delta_lake_gcp_implementation_spark.pipeline.storage import TableStore


@pytest.fixture()
def store(spark, tmp_path):
    return TableStore(spark, str(tmp_path / "warehouse"))


# --------------------------------------------------------------- size gate


def test_fits_broadcast_reports_real_sizes(spark):
    small = spark.range(100).withColumnRenamed("id", "k")
    assert fits_broadcast(small)
    # a zero budget rejects everything: the gate actually reads sizes
    assert not fits_broadcast(small, budget_bytes=0)


def test_maybe_broadcast_gates_join_strategy(spark):
    """Oversized key sets must NOT produce a broadcast join.  With the
    auto-broadcast threshold disabled, only the explicit hint can
    create a BroadcastHashJoin — so plan strings prove the gate."""
    target = spark.range(1000).withColumnRenamed("id", "k")
    keys = spark.range(500).withColumnRenamed("id", "k")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        gated = target.join(maybe_broadcast(keys, 0), ["k"], "left_anti")
        hinted = target.join(maybe_broadcast(keys), ["k"], "left_anti")
        plan_gated = gated._jdf.queryExecution().executedPlan().toString()
        plan_hinted = hinted._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan_gated
        assert "BroadcastHashJoin" in plan_hinted
        # both strategies compute the same anti join
        assert gated.count() == hinted.count() == 500
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_upsert_correct_when_keyset_exceeds_budget(spark, store, monkeypatch):
    """MERGE primitives stay correct on the shuffle fallback path (the
    100x-batch case where the key set no longer fits a broadcast)."""
    from delta_lake_gcp_implementation_spark.pipeline import storage as storage_mod

    monkeypatch.setattr(
        storage_mod, "maybe_broadcast", lambda df, budget_bytes=0: df
    )
    base = spark.createDataFrame(
        [(i, "old") for i in range(100)], ["k", "v"]
    )
    store.overwrite("bronze.gate_probe", base)
    src = spark.createDataFrame(
        [(i, "new") for i in range(50, 150)], ["k", "v"]
    )
    store.upsert("bronze.gate_probe", src, ["k"])
    out = store.read("bronze.gate_probe")
    assert out.count() == 150
    assert out.filter(F.col("v") == "new").count() == 100
    store.delete_matched(
        "bronze.gate_probe", spark.range(25).withColumnRenamed("id", "k"), ["k"]
    )
    assert store.count("bronze.gate_probe") == 125


# ------------------------------------------------------ spark.sql surface


def test_bi_queries_via_spark_sql(spark, store):
    """The reference's four documented BI validation queries
    (``Gold/Gold Layer README.md:390-447``) must run verbatim-shaped
    through ``spark.sql`` against catalog-registered Gold tables."""
    raw, _ = (lambda b: (b.df(spark), b.counts))(fixtures.generate_day(1))
    medallion.run_incremental(store, raw)

    # null-FK audit
    nulls = spark.sql(
        """
        SELECT
            SUM(CASE WHEN status_key IS NULL THEN 1 ELSE 0 END) AS null_status,
            SUM(CASE WHEN date_key IS NULL THEN 1 ELSE 0 END) AS null_date
        FROM gold.fact_transactions
        """
    ).collect()[0]
    assert nulls.null_status == 0 and nulls.null_date == 0

    # star-schema join
    star = spark.sql(
        """
        SELECT f.transaction_id, dc.customer_tier, dm.merchant_name,
               dpm.payment_method, ds.transaction_status, dd.full_date,
               f.amount, f.gateway_revenue
        FROM gold.fact_transactions f
        JOIN gold.dim_customer dc
            ON f.customer_key = dc.customer_key AND dc.is_current = true
        JOIN gold.dim_merchant dm
            ON f.merchant_key = dm.merchant_key AND dm.is_current = true
        JOIN gold.dim_payment_method dpm
            ON f.payment_method_key = dpm.payment_method_key
        JOIN gold.dim_status ds ON f.status_key = ds.status_key
        JOIN gold.dim_date dd ON f.date_key = dd.date_key
        LIMIT 10
        """
    )
    assert star.count() == 10

    # revenue by merchant
    rev = spark.sql(
        """
        SELECT dm.merchant_name, COUNT(*) AS transaction_count,
               SUM(f.amount) AS total_amount,
               SUM(f.gateway_revenue) AS total_revenue
        FROM gold.fact_transactions f
        JOIN gold.dim_merchant dm
            ON f.merchant_key = dm.merchant_key AND dm.is_current = true
        GROUP BY dm.merchant_name
        ORDER BY total_revenue DESC
        LIMIT 10
        """
    )
    assert rev.count() > 0

    # customer tier analysis
    tiers = spark.sql(
        """
        SELECT dc.customer_tier,
               COUNT(DISTINCT f.customer_key) AS customers,
               COUNT(*) AS transactions,
               SUM(f.amount) AS total_amount,
               AVG(f.amount) AS avg_amount
        FROM gold.fact_transactions f
        JOIN gold.dim_customer dc
            ON f.customer_key = dc.customer_key AND dc.is_current = true
        GROUP BY dc.customer_tier
        ORDER BY total_amount DESC
        """
    )
    rows = tiers.collect()
    assert len(rows) > 0
    assert sum(r.transactions for r in rows) == spark.sql(
        "SELECT COUNT(*) AS n FROM gold.fact_transactions "
        "WHERE customer_key != -1"
    ).collect()[0].n


def test_catalog_sees_post_merge_state(spark, store):
    """spark.sql must observe mutations (registration is refreshed per
    write, including schema changes on overwrite)."""
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    store.overwrite("silver.cat_probe", df)
    assert spark.sql("SELECT COUNT(*) AS n FROM silver.cat_probe").collect()[0].n == 2
    store.upsert(
        "silver.cat_probe",
        spark.createDataFrame([(2, "B"), (3, "c")], ["k", "v"]),
        ["k"],
    )
    got = {
        r.k: r.v
        for r in spark.sql("SELECT k, v FROM silver.cat_probe").collect()
    }
    assert got == {1: "a", 2: "B", 3: "c"}
    # schema change on overwrite is visible (drop-and-recreate)
    store.overwrite(
        "silver.cat_probe",
        spark.createDataFrame([(1, "a", 9.5)], ["k", "v", "w"]),
    )
    assert "w" in spark.sql("SELECT * FROM silver.cat_probe").columns


def test_store_reattaches_existing_tables(spark, tmp_path):
    """A fresh TableStore over an existing warehouse re-registers the
    tables — but NOT leftover crashed-replace staging dirs, whose '.'
    would mismap to a junk catalog entry."""
    import os

    root = str(tmp_path / "wh_reattach")
    first = TableStore(spark, root)
    first.overwrite(
        "gold.reattach_probe", spark.createDataFrame([(1,)], ["k"])
    )
    # simulate a replace() that crashed between write and rename
    os.makedirs(os.path.join(root, "gold__reattach_probe.__stage__ab12"))
    spark.sql("DROP TABLE gold.reattach_probe")
    TableStore(spark, root)  # init scans + re-registers
    assert (
        spark.sql("SELECT COUNT(*) AS n FROM gold.reattach_probe").collect()[0].n
        == 1
    )
    # the stage dir must not have produced any catalog entry
    tables = {t.name for t in spark.catalog.listTables("gold")}
    assert not any("stage" in t for t in tables)


# -------------------------------------------------- write-time row stats


def test_meta_counts_track_every_mutation(spark, store):
    """store.count() answers from the write-observed sidecar (commit-
    log-style stats); it must stay exactly consistent with a real scan
    across every mutation primitive."""
    name = "silver.meta_probe"

    def check():
        assert store.count(name) == store.read(name).count()

    store.overwrite(name, spark.createDataFrame([(i, "x") for i in range(40)], ["k", "v"]))
    check()
    appended = store.append(
        name, spark.createDataFrame([(100 + i, "a") for i in range(7)], ["k", "v"])
    )
    assert appended == 7
    check()
    after = store.upsert(
        name,
        spark.createDataFrame([(i, "u") for i in range(35, 50)], ["k", "v"]),
        ["k"],
    )
    assert after == store.count(name)
    check()
    matched = store.update_where(
        name, F.col("k") < 10, {"v": F.lit("z")}
    )
    assert matched == 10
    check()
    deleted = store.delete_matched(
        name, spark.range(5).withColumnRenamed("id", "k"), ["k"]
    )
    assert deleted == 5
    check()
    # sidecar loss self-heals via one scan
    import os

    os.remove(store._meta_path(name))
    check()


def test_update_matched_returns_closed_count(spark, store):
    name = "gold.meta_upd_probe"
    store.overwrite(
        name,
        spark.createDataFrame(
            [(1, True), (2, True), (3, False), (4, True)], ["k", "cur"]
        ),
    )
    n = store.update_matched(
        name,
        spark.createDataFrame([(1,), (3,), (4,)], ["k"]),
        ["k"],
        {"cur": F.lit(False)},
        extra_cond=F.col("cur") == True,  # noqa: E712
    )
    # k=3 matched the key set but failed extra_cond; k=2 untouched
    assert n == 2
    assert store.read(name).filter(F.col("cur")).count() == 1


def test_vacuum_removes_only_orphans(spark, store):
    import os

    store.overwrite(
        "bronze.vac_probe", spark.createDataFrame([(1,)], ["k"])
    )
    # fabricate a crashed-replace staging dir and an orphan sidecar
    stale_stage = store.path("bronze.vac_probe") + ".__stage__deadbeef"
    os.makedirs(stale_stage)
    orphan_meta = store._meta_path("bronze.gone_table")
    with open(orphan_meta, "w") as f:
        f.write('{"row_count": 5}')
    # ADVICE r10: non-meta sidecar kinds (the corpus counts-sync
    # marker) must be swept too when their table dir is gone
    orphan_sync = store.path("bronze.gone_table") + ".__sync__.json"
    with open(orphan_sync, "w") as f:
        f.write('{"bands_version": 3}')
    live_sync = store.path("bronze.vac_probe") + ".__sync__.json"
    with open(live_sync, "w") as f:
        f.write('{"bands_version": 1}')
    removed = store.vacuum()
    assert stale_stage in removed and orphan_meta in removed
    assert orphan_sync in removed
    # live table, its sidecars, and its data are untouched
    assert store.count("bronze.vac_probe") == 1
    assert os.path.exists(store._meta_path("bronze.vac_probe"))
    assert os.path.exists(live_sync)


def test_adopt_uncommitted_folds_orphan_files_into_committed_state(
    spark, store
):
    """Crash window between a write's parquet job commit and its
    manifest write (ADVICE r10): ``read()`` sees the orphan rows while
    committed state (``count``/``current_version``) does not.
    ``adopt_uncommitted`` commits the directory as it stands so both
    sides agree again."""
    name = "bronze.adopt_probe"
    store.overwrite(name, spark.createDataFrame([(1,), (2,)], ["k"]))
    assert store.uncommitted_files(name) == []
    assert store.adopt_uncommitted(name) is False  # no-op when clean
    v0 = store.current_version(name)
    # simulate the crash: raw spark append, no meta, no manifest
    spark.createDataFrame([(3,)], ["k"]).write.mode("append").parquet(
        store.path(name)
    )
    spark.catalog.refreshByPath(store.path(name))
    assert store.read(name).count() == 3
    assert store.count(name) == 2  # committed state lags
    assert store.uncommitted_files(name) != []
    assert store.adopt_uncommitted(name) is True
    assert store.uncommitted_files(name) == []
    assert store.current_version(name) == v0 + 1
    assert store.count(name) == 3 == store.read(name).count()


# ------------------------------------------------------- quadratic guard


def test_ngram_jaccard_refuses_large_all_pairs(spark):
    df = spark.createDataFrame(
        [(i, f"document text number {i} with enough shingles") for i in range(12)],
        ["doc_id", "text"],
    )
    with pytest.raises(ValueError, match="all-pairs"):
        dedup_ops.ngram_jaccard_pairs(
            df, "text", "doc_id", quadratic_row_limit=5
        )
    # explicit opt-in still works
    out = dedup_ops.ngram_jaccard_pairs(
        df,
        "text",
        "doc_id",
        threshold=0.0,
        quadratic_row_limit=5,
        allow_quadratic=True,
    )
    assert out.count() == 12 * 11 // 2


# ------------------------------------------------- versioned manifests


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_time_travel_reads_pre_merge_state(spark, tmp_path):
    """Every mutation commits a manifest; read_version(n) returns the
    table exactly as of commit n, including across MERGE rewrites."""
    store = TableStore(spark, str(tmp_path / "wh_tt"))
    store.prune_min_table_bytes = 0  # engage the fast path on tiny tables
    t = "silver.tt_probe"
    store.overwrite(t, spark.createDataFrame(
        [(1, "a"), (2, "b")], ["k", "v"]))                      # v1
    store.upsert(t, spark.createDataFrame(
        [(2, "B"), (3, "c")], ["k", "v"]), keys=["k"])          # v2
    store.append(t, spark.createDataFrame([(4, "d")], ["k", "v"]))  # v3
    hist = store.versions(t)
    assert [m["version"] for m in hist] == [1, 2, 3]
    # the MERGE takes the file-granular fast path and records itself
    # honestly as op "merge" (pre-r14 it was a whole-table "replace")
    assert [m["op"] for m in hist] == ["replace", "merge", "append"]
    assert [m["row_count"] for m in hist] == [2, 3, 4]
    assert _rows(store.read_version(t, 1)) == {(1, "a"), (2, "b")}
    assert _rows(store.read_version(t, 2)) == {(1, "a"), (2, "B"), (3, "c")}
    assert _rows(store.read_version(t, 3)) == _rows(store.read(t))
    assert store.count(t) == 4


def test_vacuum_retains_requested_versions(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "wh_vac"))
    t = "silver.vac_probe"
    for i in range(4):
        store.overwrite(t, spark.createDataFrame([(i,)], ["k"]))  # v1..v4
    removed = store.vacuum(retain_versions=2)
    assert removed, "old manifests/lineages must be expired"
    assert [m["version"] for m in store.versions(t)] == [3, 4]
    # retained versions still readable, expired ones gone
    assert _rows(store.read_version(t, 3)) == {(2,)}
    assert _rows(store.read_version(t, 4)) == {(3,)}
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        store.read_version(t, 1)


def test_crashed_swap_recovers_and_stays_readable(spark, tmp_path, monkeypatch):
    """Crash between the archive rename and the promote rename: the
    latest committed version must stay readable (manifest fallback to
    the archive), and the next mutation must heal the live dir."""
    import os as _os

    from delta_lake_gcp_implementation_spark.pipeline import storage as S

    store = TableStore(spark, str(tmp_path / "wh_crash"))
    t = "silver.crash_probe"
    store.overwrite(t, spark.createDataFrame([(1, "a")], ["k", "v"]))  # v1
    real_rename = _os.rename
    calls = {"n": 0}

    def failing_rename(src, dst):
        # the promote rename moves a .__stage__ dir into place
        if ".__stage__" in src:
            raise OSError("simulated crash before promote")
        return real_rename(src, dst)

    monkeypatch.setattr(S.os, "rename", failing_rename)
    with pytest.raises(OSError, match="simulated crash"):
        store.overwrite(t, spark.createDataFrame([(2, "b")], ["k", "v"]))
    monkeypatch.setattr(S.os, "rename", real_rename)
    # committed state survives the crash via archive fallback
    assert _rows(store.read_version(t, 1)) == {(1, "a")}
    assert _rows(store.read(t)) == {(1, "a")}   # _heal promoted it back
    assert store.count(t) == 1
    # and the store is fully functional afterwards
    store.overwrite(t, spark.createDataFrame([(3, "c")], ["k", "v"]))  # v2
    assert _rows(store.read(t)) == {(3, "c")}
    assert _rows(store.read_version(t, 1)) == {(1, "a")}
    store.vacuum()  # clears the abandoned stage dir
    assert not [
        d for d in _os.listdir(store.root) if ".__stage__" in d
    ]


# --------------------------------------------------------------- schema evolution (round 5)


def test_append_refuses_schema_drift_by_default(spark, store):
    store.append("db.t_evo", spark.createDataFrame([(1, "a")], ["id", "v"]))
    drifted = spark.createDataFrame([(2, "b", 9.5)], ["id", "v", "score"])
    with pytest.raises(ValueError, match="allow_schema_evolution"):
        store.append("db.t_evo", drifted)
    # table untouched by the refused write
    assert store.count("db.t_evo") == 1


def test_append_evolution_new_column_rewrites_widened(spark, store):
    store.append("db.t_evo2", spark.createDataFrame([(1, "a")], ["id", "v"]))
    n = store.append(
        "db.t_evo2",
        spark.createDataFrame([(2, "b", 9.5)], ["id", "v", "score"]),
        allow_schema_evolution=True,
    )
    assert n == 1
    rows = {r.id: r for r in store.read("db.t_evo2").collect()}
    assert set(store.read("db.t_evo2").columns) == {"id", "v", "score"}
    assert rows[1].score is None and rows[2].score == 9.5


def test_append_evolution_missing_column_stays_append(spark, store):
    store.append(
        "db.t_evo3", spark.createDataFrame([(1, "a", 1.0)], ["id", "v", "score"])
    )
    files_before = set(__import__("os").listdir(store.path("db.t_evo3")))
    n = store.append(
        "db.t_evo3",
        spark.createDataFrame([(2, "b")], ["id", "v"]),
        allow_schema_evolution=True,
    )
    assert n == 1
    # cheap path: prior files still present (appended, not rewritten)
    files_after = set(__import__("os").listdir(store.path("db.t_evo3")))
    assert files_before <= files_after
    rows = {r.id: r for r in store.read("db.t_evo3").collect()}
    assert rows[2].score is None and rows[1].score == 1.0


def test_upsert_schema_evolution_both_directions(spark, store):
    store.append("db.t_evo4", spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]))
    src = spark.createDataFrame([(2, 7.5), (3, 8.5)], ["id", "score"])
    with pytest.raises(ValueError, match="allow_schema_evolution"):
        store.upsert("db.t_evo4", src, ["id"])
    after = store.upsert("db.t_evo4", src, ["id"], allow_schema_evolution=True)
    assert after == 3
    rows = {r.id: r for r in store.read("db.t_evo4").collect()}
    # surviving row keeps v, gains NULL score; upserted rows lose v
    assert rows[1].v == "a" and rows[1].score is None
    assert rows[2].v is None and rows[2].score == 7.5
    assert rows[3].score == 8.5


def test_upsert_evolution_requires_keys_in_source(spark, store):
    store.append("db.t_evo5", spark.createDataFrame([(1, "a")], ["id", "v"]))
    src = spark.createDataFrame([("x",)], ["other"])
    with pytest.raises(ValueError, match="key columns"):
        store.upsert("db.t_evo5", src, ["id"], allow_schema_evolution=True)


def test_read_version_preserves_pre_evolution_schema(spark, store):
    store.append("db.t_evo6", spark.createDataFrame([(1, "a")], ["id", "v"]))
    store.upsert(
        "db.t_evo6",
        spark.createDataFrame([(2, 9.5)], ["id", "score"]),
        ["id"],
        allow_schema_evolution=True,
    )
    # live table has the widened schema
    assert set(store.read("db.t_evo6").columns) == {"id", "v", "score"}
    # time travel to v1 reads the ORIGINAL schema and rows
    v1 = store.read_version("db.t_evo6", 1)
    assert set(v1.columns) == {"id", "v"}
    assert [(r.id, r.v) for r in v1.collect()] == [(1, "a")]


def test_concurrent_commit_exactly_one_winner(spark, tmp_path):
    """Two writers racing for the same version slot: os.link claims it
    atomically — one wins, the loser raises instead of clobbering."""
    import json
    import os

    from delta_lake_gcp_implementation_spark.pipeline.storage import (
        ConcurrentWriteError,
        TableStore,
    )

    store = TableStore(spark, str(tmp_path))
    store.overwrite("db.occ", spark.range(10).selectExpr("id", "id * 2 AS v"))
    v = store.current_version("db.occ")

    # writer A lands version v+1 out from under writer B's read
    store._commit("db.occ", "append", 10, new_lineage=False)
    try:
        store._commit(
            "db.occ", "append", 99, new_lineage=False, expected_version=v
        )
        assert False, "expected ConcurrentWriteError"
    except ConcurrentWriteError:
        pass
    # version history is intact: A's manifest was not clobbered
    ops = [m["op"] for m in store.versions("db.occ")]
    assert ops.count("append") == 1
    counts = [m["row_count"] for m in store.versions("db.occ")]
    assert 99 not in counts

    # slot-claim race: writer B read the manifest log BEFORE writer A
    # landed (freeze B's view with a patch), so both compute the same
    # next version — the os.link claim must fail B, not clobber A
    from unittest import mock

    stale = store._latest_manifest("db.occ")
    with mock.patch.object(
        TableStore, "_latest_manifest", return_value=stale
    ):
        rival = json.loads(json.dumps(stale))  # A lands stale.version+1
        path = store._manifest_path("db.occ", stale["version"] + 1)
        rival["version"] = stale["version"] + 1
        with open(path, "w") as f:
            json.dump(rival, f)
        try:
            store._commit("db.occ", "append", 5, new_lineage=False)
            assert False, "expected ConcurrentWriteError"
        except ConcurrentWriteError:
            pass
    # A's manifest survived untouched
    assert store._load_manifest("db.occ", rival["version"]) == rival
    os.unlink(path)


def test_overwrite_where_replaces_exactly_the_predicate_slice(spark, tmp_path):
    """replaceWhere parity: re-loading one day replaces that day only,
    is idempotent, and rows violating the predicate are refused before
    any mutation."""
    from delta_lake_gcp_implementation_spark.pipeline.storage import TableStore

    store = TableStore(spark, str(tmp_path))
    base = spark.createDataFrame(
        [(i, "2024-01-01" if i < 5 else "2024-01-02", i * 10) for i in range(10)],
        ["id", "day", "v"],
    )
    store.overwrite("db.daily", base)

    reload_day1 = spark.createDataFrame(
        [(i, "2024-01-01", i * 100) for i in range(3)], ["id", "day", "v"]
    )
    n = store.overwrite_where(
        "db.daily", F.col("day") == "2024-01-01", reload_day1
    )
    assert n == 3
    rows = {r.id: r for r in store.read("db.daily").collect()}
    assert len(rows) == 8  # 3 reloaded + 5 untouched day-2 rows
    assert all(rows[i].v == i * 100 for i in range(3))
    assert all(rows[i].day == "2024-01-02" and rows[i].v == i * 10
               for i in range(5, 10))

    # idempotent: running the same reload again changes nothing
    store.overwrite_where("db.daily", F.col("day") == "2024-01-01", reload_day1)
    again = {r.id: (r.day, r.v) for r in store.read("db.daily").collect()}
    assert again == {k: (r.day, r.v) for k, r in rows.items()}

    # predicate violation refused BEFORE mutation
    bad = spark.createDataFrame(
        [(99, "2024-02-15", 1)], ["id", "day", "v"]
    )
    before = store.count("db.daily")
    try:
        store.overwrite_where("db.daily", F.col("day") == "2024-01-01", bad)
        assert False, "expected ValueError"
    except ValueError:
        pass
    assert store.count("db.daily") == before


def test_restore_to_version_is_a_new_undoable_commit(spark, tmp_path):
    from delta_lake_gcp_implementation_spark.pipeline.storage import TableStore

    store = TableStore(spark, str(tmp_path))
    store.overwrite("db.r", spark.createDataFrame([(1, "a")], ["k", "v"]))
    v1 = store.current_version("db.r")
    store.upsert("db.r", spark.createDataFrame([(1, "B"), (2, "c")], ["k", "v"]),
                 keys=["k"])
    v2 = store.current_version("db.r")

    v3 = store.restore("db.r", v1)
    assert v3 > v2
    assert {(r.k, r.v) for r in store.read("db.r").collect()} == {(1, "a")}
    # history is append-only: the restore is itself time-travelable...
    assert {(r.k, r.v) for r in store.read_version("db.r", v2).collect()} == {
        (1, "B"), (2, "c")
    }
    # ...and undoable by restoring the pre-restore version
    store.restore("db.r", v2)
    assert {(r.k, r.v) for r in store.read("db.r").collect()} == {
        (1, "B"), (2, "c")
    }


def test_overwrite_where_null_predicate_rows_are_retained_and_flagged(
    spark, tmp_path
):
    """ADVICE r5: three-valued logic — rows where the predicate
    evaluates to NULL are NON-matching (Delta replaceWhere semantics):
    kept on the existing side, refused as violations on the incoming
    side.  A bare filter(~cond) would silently drop them."""
    from delta_lake_gcp_implementation_spark.pipeline.storage import TableStore

    store = TableStore(spark, str(tmp_path))
    base = spark.createDataFrame(
        [(1, "2024-01-01", 10), (2, "2024-01-02", 20), (3, None, 30)],
        "id int, day string, v int",
    )
    store.overwrite("db.nullday", base)
    reload_day1 = spark.createDataFrame(
        [(1, "2024-01-01", 100)], "id int, day string, v int"
    )
    n = store.overwrite_where(
        "db.nullday", F.col("day") == "2024-01-01", reload_day1
    )
    assert n == 1
    rows = {r.id: (r.day, r.v) for r in store.read("db.nullday").collect()}
    # the NULL-day row (predicate -> NULL) survives the overwrite
    assert rows == {1: ("2024-01-01", 100), 2: ("2024-01-02", 20), 3: (None, 30)}

    # an incoming NULL-predicate row is a violation, refused pre-mutation
    bad = spark.createDataFrame([(9, None, 1)], "id int, day string, v int")
    before = store.count("db.nullday")
    try:
        store.overwrite_where("db.nullday", F.col("day") == "2024-01-01", bad)
        assert False, "expected ValueError for NULL-predicate incoming row"
    except ValueError:
        pass
    assert store.count("db.nullday") == before


def _occ_worker(root: str, widx: int, n_commits: int, out_q) -> None:
    """Child process: commit n_commits manifests against a shared log,
    retrying on ConcurrentWriteError (no Spark needed — the commit
    protocol is pure filesystem)."""
    import random
    import time as _t

    from delta_lake_gcp_implementation_spark.pipeline.storage import (
        ConcurrentWriteError,
        TableStore,
    )

    store = TableStore.__new__(TableStore)  # skip __init__'s catalog scan
    store.spark = None
    store.root = root
    won = []
    for i in range(n_commits):
        while True:
            try:
                v = store._commit(
                    "db.stress", f"w{widx}-{i}", widx * 1000 + i,
                    new_lineage=False,
                )
                won.append((v, f"w{widx}-{i}"))
                break
            except ConcurrentWriteError:
                _t.sleep(random.random() * 0.01)
    out_q.put((widx, won))


def test_occ_commit_protocol_multiprocess_stress(tmp_path):
    """VERDICT r5 item 8: N OS processes x M commits racing one table
    log.  Linearizable outcome required: versions dense 1..N*M, every
    worker's every commit lands exactly once, no manifest clobbered
    (each version's op matches the single worker that believes it won
    that slot)."""
    import json as _json
    import multiprocessing as mp
    import os as _os

    from delta_lake_gcp_implementation_spark.pipeline.storage import TableStore

    n_workers, n_commits = 8, 12
    ctx = mp.get_context("fork")
    q = ctx.Queue()
    procs = [
        ctx.Process(target=_occ_worker, args=(str(tmp_path), w, n_commits, q))
        for w in range(n_workers)
    ]
    for p in procs:
        p.start()
    claims = {}
    for _ in range(n_workers):
        widx, won = q.get(timeout=120)
        for v, op in won:
            assert v not in claims, f"two workers think they won v{v}"
            claims[v] = op
    for p in procs:
        p.join(timeout=60)
        assert p.exitcode == 0

    store = TableStore.__new__(TableStore)
    store.spark = None
    store.root = str(tmp_path)
    log = store._log_dir("db.stress")
    versions = sorted(
        int(f[:-5]) for f in _os.listdir(log)
        if f.endswith(".json") and f[:-5].isdigit()
    )
    total = n_workers * n_commits
    # dense, complete, exactly one manifest per commit
    assert versions == list(range(1, total + 1))
    assert len(claims) == total
    for v in versions:
        with open(store._manifest_path("db.stress", v)) as f:
            m = _json.load(f)
        assert m["version"] == v
        # the on-disk manifest is the one its claimed winner wrote
        assert m["op"] == claims[v]
        w, i = claims[v][1:].split("-")
        assert m["row_count"] == int(w) * 1000 + int(i)
    # no stray tmp files leaked by losing writers
    assert not [f for f in _os.listdir(log) if f.startswith(".tmp-")]


# ----------------------------------------------- txn idempotent writes


def test_txn_recorded_atomically_and_survives_other_writers(spark, store):
    """Delta txnAppId/txnVersion contract: the txn marker publishes
    with the data swap (sidecar) AND in the manifest; other writers'
    replaces carry earlier sidecars forward; last_txn_version reports
    the per-app maximum."""
    df = spark.range(10).withColumnRenamed("id", "k").withColumn(
        "v", F.lit(1).cast("bigint")
    )
    store.upsert("gold.mv", df, ["k"], txn=("app_a", 0))
    assert store.last_txn_version("gold.mv", "app_a") == 0
    assert store.last_txn_version("gold.mv", "app_b") is None
    # a second app and a later version of the first
    store.upsert("gold.mv", df, ["k"], txn=("app_b", 7))
    store.upsert("gold.mv", df, ["k"], txn=("app_a", 1))
    assert store.last_txn_version("gold.mv", "app_a") == 1
    assert store.last_txn_version("gold.mv", "app_b") == 7
    # a NON-txn full overwrite must not lose the records (sidecars are
    # carried forward; manifests mirror them regardless)
    store.overwrite("gold.mv", df)
    assert store.last_txn_version("gold.mv", "app_a") == 1
    assert store.last_txn_version("gold.mv", "app_b") == 7
    # sidecars are invisible to reads and to the manifest file list
    assert store.read("gold.mv").count() == 10
    assert all(
        not f.startswith("_")
        for f in store._latest_manifest("gold.mv")["files"]
    )


def test_txn_create_path_is_staged(spark, store):
    """First-ever write with a txn routes through the staged swap so
    the sidecar and the first data publish in one rename."""
    import os

    df = spark.range(5).withColumnRenamed("id", "k").withColumn(
        "v", F.lit(2).cast("bigint")
    )
    store.upsert("gold.fresh", df, ["k"], txn=("writer", 3))
    assert store.last_txn_version("gold.fresh", "writer") == 3
    assert os.path.exists(
        os.path.join(store.path("gold.fresh"), "_txn-writer-3")
    )
    assert store.read("gold.fresh").count() == 5


def test_last_txn_version_manifest_fallback_without_sidecars(spark, store):
    """ADVICE r7 perf fix kept correct: sidecars are ground truth and
    short-circuit, but when an outside writer drops the underscore
    files the newest-first manifest walk still reports each app's
    maximum txn version."""
    import os

    df = spark.range(4).withColumnRenamed("id", "k").withColumn(
        "v", F.lit(1).cast("bigint")
    )
    store.upsert("gold.out", df, ["k"], txn=("app_a", 0))
    store.upsert("gold.out", df, ["k"], txn=("app_b", 5))
    store.upsert("gold.out", df, ["k"], txn=("app_a", 1))
    tdir = store.path("gold.out")
    for f in os.listdir(tdir):
        if f.startswith("_txn-"):
            os.unlink(os.path.join(tdir, f))
    assert store.last_txn_version("gold.out", "app_a") == 1
    assert store.last_txn_version("gold.out", "app_b") == 5
    assert store.last_txn_version("gold.out", "app_c") is None


# ------------------------------------------- ADVICE r11: adopt OCC guard


def _raw_orphan(spark, store, name, value):
    """Simulate the crash window: parquet job committed, no manifest."""
    spark.createDataFrame([(value,)], ["k"]).write.mode("append").parquet(
        store.path(name)
    )
    spark.catalog.refreshByPath(store.path(name))


def test_adopt_uncommitted_retries_past_concurrent_commit(
    spark, store, monkeypatch
):
    """ADVICE r11: a commit landing between adopt's version read and
    its adopt commit must abort that attempt (OCC expected_version)
    instead of silently folding the concurrent writer's files into a
    skewed count.  The retry then re-evaluates orphans against the
    NEW manifest — here the racing append's listing-based manifest
    absorbed the orphan, so adopt correctly becomes a no-op and the
    invalidated count sidecar self-heals by scan."""
    name = "bronze.adopt_race"
    store.overwrite(name, spark.createDataFrame([(1,), (2,)], ["k"]))
    _raw_orphan(spark, store, name, 3)
    other = TableStore(spark, store.root)
    fired = {"n": 0}
    real_uf = store.uncommitted_files

    def racing_uf(nm):
        orphans = real_uf(nm)
        if nm == name and orphans and fired["n"] == 0:
            fired["n"] += 1
            other.append(name, spark.createDataFrame([(4,)], ["k"]))
        return orphans

    monkeypatch.setattr(store, "uncommitted_files", racing_uf)
    assert store.adopt_uncommitted(name) is False
    assert fired["n"] == 1  # the race really happened
    # committed state, sidecar count, and readers all agree post-heal
    assert store.uncommitted_files(name) == []
    assert store.count(name) == 4 == store.read(name).count()


def test_adopt_uncommitted_raises_after_persistent_races(
    spark, store, monkeypatch
):
    """A writer that keeps committing mid-adoption exhausts the
    bounded retries: adopt surfaces ConcurrentWriteError (the
    single-writer contract is broken) rather than looping forever or
    committing over the other writer."""
    from delta_lake_gcp_implementation_spark.pipeline.storage import (
        ConcurrentWriteError,
    )

    name = "bronze.adopt_storm"
    store.overwrite(name, spark.createDataFrame([(1,)], ["k"]))
    other = TableStore(spark, store.root)
    state = {"next": 100}
    real_uf = store.uncommitted_files

    def storming_uf(nm):
        _raw_orphan(spark, store, nm, state["next"])
        state["next"] += 1
        orphans = real_uf(nm)
        other.append(nm, spark.createDataFrame([(state["next"],)], ["k"]))
        state["next"] += 1
        return orphans

    monkeypatch.setattr(store, "uncommitted_files", storming_uf)
    with pytest.raises(ConcurrentWriteError, match="single-writer"):
        store.adopt_uncommitted(name, attempts=2)


def test_discard_uncommitted_rolls_back_crashed_replace(spark, store):
    """ADVICE r13: a ``_replace`` that crashed between promoting its
    staging dir and committing its manifest leaves the live dir
    holding a NEW lineage while the latest manifest names the OLD
    (archived) one.  ``discard_uncommitted`` must detect the lineage
    mismatch (committed files missing from the live dir) and RESTORE
    the committed lineage from the archive — the old behavior deleted
    every live file, leaving an unreadable empty dir behind a stale
    manifest."""
    import os

    name = "bronze.replay_roll"
    store.append(name, spark.createDataFrame([(i,) for i in range(10)], ["k"]))
    latest = store._latest_manifest(name)
    final = store.path(name)
    vdir = store._versions_dir(name)
    os.makedirs(vdir, exist_ok=True)
    # simulate the crash window: committed lineage archived, a new
    # uncommitted lineage promoted into the live path, no manifest
    os.rename(final, os.path.join(vdir, str(latest["lineage"])))
    spark.createDataFrame([(99,), (98,)], ["k"]).write.parquet(final)
    spark.catalog.refreshByPath(final)

    n_live = len(store._list_data_files(final))
    removed = store.discard_uncommitted(name)
    assert removed == n_live
    # committed state restored and readable
    assert store.count(name) == 10 == store.read(name).count()
    assert set(store._list_data_files(final)) == set(latest["files"])
    # the crashed attempt's data was parked for vacuum, not destroyed
    orphans = [d for d in os.listdir(vdir) if d.startswith("replay-orphan-")]
    assert len(orphans) == 1
    # vacuum(retain) expires the parked orphan
    store.vacuum(retain_versions=1)
    assert not any(
        d.startswith("replay-orphan-") for d in os.listdir(vdir)
    ) or not os.path.isdir(vdir)


def test_discard_uncommitted_refuses_when_archive_gone(spark, store):
    """The rollback path must never silently empty a live table: with
    committed files missing from the live dir AND no intact archive,
    discard raises instead of deleting the only remaining data."""
    import os
    import shutil

    name = "bronze.replay_refuse"
    store.append(name, spark.createDataFrame([(1,), (2,)], ["k"]))
    latest = store._latest_manifest(name)
    final = store.path(name)
    vdir = store._versions_dir(name)
    os.makedirs(vdir, exist_ok=True)
    os.rename(final, os.path.join(vdir, str(latest["lineage"])))
    spark.createDataFrame([(99,)], ["k"]).write.parquet(final)
    shutil.rmtree(os.path.join(vdir, str(latest["lineage"])))
    with pytest.raises(RuntimeError, match="refusing to discard"):
        store.discard_uncommitted(name)
    # live data untouched by the refusal
    assert store._list_data_files(final)


def test_last_txn_version_survives_maintenance_commit_over_lost_sidecar(
    spark, store
):
    """ADVICE r13: a txn append that crashed before publishing its
    sidecar leaves the sidecar one version behind; if ANY non-txn
    commit (adopt / compaction / maintenance append) then lands, the
    latest manifest no longer carries the app's record.  The
    newest-first manifest walk must still report the true maximum —
    the old latest-manifest-only cross-check returned the stale
    sidecar and the replay double-appended."""
    import os

    name = "gold.mb"
    df = spark.range(4).withColumnRenamed("id", "k").withColumn(
        "v", F.lit(1).cast("bigint")
    )
    store.append(name, df, txn=("app", 4))
    store.append(name, df, txn=("app", 5))
    tdir = store.path(name)
    # crash window: v5's manifest committed, its sidecar never landed
    for f in os.listdir(tdir):
        if f.startswith("_txn-app-"):
            os.unlink(os.path.join(tdir, f))
    open(os.path.join(tdir, "_txn-app-4"), "w").close()
    # a maintenance commit buries the txn record below the latest
    store.append(name, df)
    assert store.last_txn_version(name, "app") == 5
    # the reconciliation self-repaired the missing sidecar, so the
    # answer survives even after the mirrored manifests are vacuumed
    assert os.path.exists(os.path.join(tdir, "_txn-app-5"))


def test_vacuum_tolerates_directory_matching_sidecar_pattern(spark, store):
    """ADVICE r11: a DIRECTORY whose name matches the orphan-sidecar
    regex must not crash the sweep (os.remove on a dir raises)."""
    import os

    store.overwrite("bronze.vac_live", spark.createDataFrame([(1,)], ["k"]))
    trap = os.path.join(store.root, "bronze__gone.__meta__.json")
    os.makedirs(trap)
    removed = store.vacuum()
    assert os.path.isdir(trap)  # left alone, sweep completed
    assert trap not in removed


def test_last_version_hint_resolves_head_without_listing(spark, store):
    """r14: the `_last_version` hint (Delta `_last_checkpoint` analog)
    must track the head, survive staleness via forward probe, and fall
    back to the directory listing when corrupt or pointing at a
    vacuumed/deleted manifest."""
    import os

    t = "bronze.hint_probe"
    df = spark.createDataFrame([(1,)], ["k"])
    store.overwrite(t, df)          # v1
    store.append(t, df)             # v2
    store.append(t, df)             # v3
    log = store._log_dir(t)
    hint = os.path.join(log, "_last_version")
    assert open(hint).read().strip() == "3"
    assert store.current_version(t) == 3
    # stale hint (crash between link and hint write): forward probe
    with open(hint, "w") as f:
        f.write("1")
    assert store.current_version(t) == 3
    # corrupt hint: fallback listing, self-heals on next commit
    with open(hint, "w") as f:
        f.write("not a number")
    assert store.current_version(t) == 3
    store.append(t, df)             # v4 rewrites the hint
    assert open(hint).read().strip() == "4"
    # hint pointing at a deleted manifest (the crash-simulation shape
    # in test_streaming): fallback listing finds the surviving head
    os.remove(store._manifest_path(t, 4))
    assert store.current_version(t) == 3


# ---------------------------------------------- memo vs scoped release


def test_memo_checkpoint_survives_batch_scoped_release(
    spark, sf_dir, tmp_path
):
    """r14 verdict "what's wrong" #3: a session-shared memo frame
    (the BPE train/encode memos) first materialized INSIDE an ingest
    batch's snapshot/release scope must survive
    ``release_checkpoints_since`` — without the ownership registry the
    release would unpersist the memo's localCheckpoint blocks while
    the memo dict still references the frame, and the next BPE catalog
    key would fail on dead blocks."""
    import os
    import shutil

    from delta_lake_gcp_implementation_spark.pipeline.storage import (
        release_checkpoints_since,
        snapshot_persistent_rdds,
    )
    from delta_lake_gcp_implementation_spark.plans import bpeq

    # a fresh sf dir = a fresh memo key, so the build provably happens
    # inside this test's scope even when other tests already trained
    # on the shared fixture dir
    sf_copy = str(tmp_path / "sfmemo")
    os.makedirs(sf_copy)
    for t in ("documents",):
        shutil.copy(
            os.path.join(sf_dir, f"{t}.parquet"),
            os.path.join(sf_copy, f"{t}.parquet"),
        )

    snap = snapshot_persistent_rdds(spark)
    # an UNPROTECTED checkpoint made in the same scope — the batch
    # intermediate the release exists to free
    victim = spark.range(64).localCheckpoint(eager=True)
    memo_frame = bpeq.encode_frame(spark, sf_copy)  # builds + protects
    expected = memo_frame.count()
    released = release_checkpoints_since(spark, snap)
    assert released >= 1  # the victim (at least) was freed
    # cached memo still evaluates from its (protected) blocks
    assert bpeq.encode_frame(spark, sf_copy).count() == expected
    # cleanup so later tests see no stray memo entries for tmp dirs
    bpeq._ENCODE_MEMO.pop(
        (spark.sparkContext.applicationId, os.path.abspath(sf_copy)), None
    )
    bpeq._TRAIN_MEMO.pop(
        (spark.sparkContext.applicationId, os.path.abspath(sf_copy)), None
    )


# ------------------------------------------------------- schema cache


def test_read_schema_cache_tracks_mutations_and_other_writers(
    spark, tmp_path
):
    """r15: ``read()`` serves the schema from a per-version cache
    (Delta keeps it in the log; re-inferring from footers cost one
    driver job per read).  The cache must follow every schema change —
    evolution rewrites bump the version — and a SECOND store instance
    over the same root (the multi-instance reader shape) must see the
    new schema because the version probe re-reads the manifest head."""
    a = TableStore(spark, str(tmp_path / "wh"))
    b = TableStore(spark, str(tmp_path / "wh"))
    df = spark.range(10).select(F.col("id").cast("long").alias("id"))
    a.append("db.sc", df)
    assert b.read("db.sc").columns == ["id"]  # b's cache now holds v1
    assert a.read("db.sc").columns == ["id"]
    a.append(
        "db.sc",
        df.withColumn("extra", F.lit("x")),
        allow_schema_evolution=True,
    )
    # both instances see the widened schema (a: own commit; b: stale
    # cache invalidated by the bumped manifest head)
    assert set(a.read("db.sc").columns) == {"id", "extra"}
    assert set(b.read("db.sc").columns) == {"id", "extra"}
    assert b.read("db.sc").count() == 20
    # overwrite with a narrower schema invalidates again
    a.overwrite("db.sc", df.select(F.col("id").alias("only")))
    assert b.read("db.sc").columns == ["only"]


def test_merge_pins_column_order_and_empty_merge_writes_nothing(spark, tmp_path):
    """r16: (a) a full-path MERGE must not reorder the table's columns
    (the USING-style anti join moves merge keys to the front — the
    no-op fact rerun used to flip the 30-column contract); (b) a MERGE
    whose source is empty must not write any data file (it used to
    full-rewrite the table when the key defeats pruning, or append a
    0-row schema fragment on the pruned path)."""
    import os

    store = TableStore(spark, str(tmp_path / "wh"))
    # key deliberately NOT the first column, and a STRING key so the
    # merge takes the unprunable full path
    df = spark.createDataFrame(
        [("alpha", "k1", 1.0), ("beta", "k2", 2.0)], ["name", "id", "v"]
    )
    store.overwrite("db.order", df)
    store.upsert("db.order", spark.createDataFrame(
        [("gamma", "k3", 3.0)], ["name", "id", "v"]), ["id"])
    assert store.read("db.order").columns == ["name", "id", "v"]
    assert store.count("db.order") == 3

    # pruned-path empty merge (int key -> file stats exist): no file
    # may be added or replaced
    dfi = spark.range(5).select(
        F.lit("x").alias("payload"), F.col("id").cast("long").alias("id")
    )
    store.overwrite("db.noop", dfi)
    store.prune_min_table_bytes = 0  # force the file-granular path
    path = store.path("db.noop")

    def data_files():
        return sorted(
            f for f in os.listdir(path)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )

    files_before = data_files()
    n = store.upsert("db.noop", dfi.filter(F.col("id") < 0), ["id"])
    assert n == 5  # post-merge count unchanged
    assert data_files() == files_before
    assert store.read("db.noop").columns == ["payload", "id"]
