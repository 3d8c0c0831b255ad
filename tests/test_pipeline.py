"""Medallion pipeline scenario tests — replicating the reference's
count-based testing strategy (SURVEY.md section 5, TESTING_GUIDE
scenarios): fresh load, idempotent re-run, CDC collapse, late
arrivals, GDPR dual delete, SCD2 invariants, watermark rules."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delta_lake_gcp_implementation_spark.pipeline import fixtures, medallion
from delta_lake_gcp_implementation_spark.pipeline.storage import TableStore


@pytest.fixture()
def store(spark, tmp_path):
    return TableStore(spark, str(tmp_path / "warehouse"))


def _day(spark, day, **kw):
    batch = fixtures.generate_day(day, **kw)
    return batch.df(spark), batch.counts


@pytest.fixture(scope="module")
def day1_run(spark, tmp_path_factory):
    """Shared day-1 pipeline state for READ-ONLY assertions (one
    run_incremental plus the idempotent re-run, which is itself an
    asserted scenario).  Replaces nine per-test pipeline runs — the
    driver's pytest window truncates past ~25 min (r15 verdict item 3),
    and each redundant run cost ~6 s.  Tests that MUTATE the store
    (gdpr, full refresh, backfill, retry injection) keep private
    stores."""
    import contextlib
    import io

    store = TableStore(
        spark, str(tmp_path_factory.mktemp("wh_day1") / "warehouse")
    )
    raw, counts = _day(spark, 1)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        r1 = medallion.run_incremental(store, raw)
        n_bronze = store.count("bronze.transactions")
        n_silver = store.count("silver.transactions")
        rerun = medallion.run_incremental(store, raw)
    return {
        "store": store,
        "r1": r1,
        "counts": counts,
        "rerun": rerun,
        "n_bronze_after_1": n_bronze,
        "n_silver_after_1": n_silver,
        "stdout": buf.getvalue(),
    }


@pytest.fixture(scope="module")
def day12_run(spark, tmp_path_factory):
    """Shared day-1 + day-2 incremental state for read-only CDC /
    late-arrival assertions.  test_full_refresh_silver_and_fact_match
    _incremental also consumes it but rebuilds silver/fact in place —
    it must stay the LAST consumer in definition order."""
    store = TableStore(
        spark, str(tmp_path_factory.mktemp("wh_day12") / "warehouse")
    )
    raw1, c1 = _day(spark, 1)
    r1 = medallion.run_incremental(store, raw1)
    raw2, c2 = _day(spark, 2)
    r2 = medallion.run_incremental(store, raw2)
    return {"store": store, "r1": r1, "c1": c1, "r2": r2, "c2": c2}


def test_fresh_load_counts(day1_run):
    store, r, counts = day1_run["store"], day1_run["r1"], day1_run["counts"]
    # scenario 1 (TESTING_GUIDE:76-107): exact quarantine + staged counts
    assert r["validate"]["quarantined"] == counts["tier1"]
    # staged = total - tier1 - exact dups removed by W1
    assert r["validate"]["staged"] == counts["total"] - counts["tier1"] - counts["dups"]
    assert store.count("bronze.transactions") == r["validate"]["staged"]
    # tier-2 rows loaded but flagged, never quarantined
    flagged = (
        store.read("bronze.transactions")
        .filter(F.col("data_quality_flag") == "FAILED_VALIDATION")
        .count()
    )
    assert flagged == counts["tier2"]
    # tier-3 rows fixed by COALESCE: no NULL device/location/product survive
    b = store.read("bronze.transactions")
    assert b.filter(F.col("device_type").isNull()).count() == 0
    assert b.filter(F.col("product_name").isNull()).count() == 0


def test_idempotent_rerun(day1_run):
    store = day1_run["store"]
    # scenario 2 (TESTING_GUIDE:125-161): same batch again -> no growth
    # (the fixture ran the same day-1 batch twice)
    assert store.count("bronze.transactions") == day1_run["n_bronze_after_1"]
    assert store.count("silver.transactions") == day1_run["n_silver_after_1"]
    # S11 empty-staging write: the no-new-data run overwrites staging
    # with a 0-row frame that KEEPS the exact 21-column schema, so a
    # downstream reader never sees the previous batch
    staging = store.read("silver.transactions_staging")
    assert staging.count() == 0
    assert staging.columns == medallion.SILVER_COLS


def test_cdc_collapse_and_composite_key(spark, day12_run):
    store, c2 = day12_run["store"], day12_run["c2"]
    b = store.read("bronze.transactions")
    s = store.read("silver.transactions")
    # Bronze keeps every (transaction_id, updated_at) version
    versions = (
        b.groupBy("transaction_id").count().filter(F.col("count") > 1).count()
    )
    assert versions >= c2["updates"]  # updated ids have 2 versions
    # Silver keeps exactly one row per transaction_id (invariant,
    # silver/README.md:393-407)
    assert s.groupBy("transaction_id").count().filter(F.col("count") > 1).count() == 0
    # updated ids collapsed to the new status
    updated_ids = [f"TXN_20240301_{i:06d}" for i in range(c2["updates"])]
    got = {
        r.transaction_id: r.transaction_status
        for r in s.filter(F.col("transaction_id").isin(updated_ids)).collect()
    }
    assert all(v == "Successful" for v in got.values())


def test_late_arrivals_flagged_not_dropped(day12_run):
    store, r2 = day12_run["store"], day12_run["r2"]
    late = (
        store.read("bronze.transactions")
        .filter(F.col("is_late_arrival") == True)  # noqa: E712
    )
    assert late.count() >= 1  # flagged...
    assert late.filter(F.col("arrival_delay_hours") <= 0).count() == 0
    # ...and processed (present in bronze), never dropped
    assert r2["validate"]["staged"] > 0


def test_gdpr_dual_delete(spark, store):
    raw, _ = _day(spark, 1)
    medallion.run_incremental(store, raw)
    victim = (
        store.read("silver.transactions").select("customer_id").first().customer_id
    )
    r = medallion.gdpr_delete(store, victim, "BATCH_TEST")
    assert r["bronze_soft_deleted"] > 0
    # RUNBOOK:157-216 invariants: silver count 0, bronze soft-deleted intact
    assert (
        store.read("silver.transactions")
        .filter(F.col("customer_id") == victim)
        .count()
        == 0
    )
    b = store.read("bronze.transactions").filter(F.col("customer_id") == victim)
    assert b.count() > 0
    assert b.filter(F.col("is_deleted") == False).count() == 0  # noqa: E712
    assert b.filter(F.col("delta_change_type") != "DELETE").count() == 0


def test_scd2_invariants_tier_change_and_merchant_best_record(spark, store):
    """Customer and merchant SCD2 invariants over the SAME 3-day
    progression (two separate tests each ran their own 3-day pipeline;
    merged to halve that cost — r15 verdict item 3)."""
    raw1, _ = _day(spark, 1)
    medallion.run_incremental(store, raw1)
    dim1 = store.read("gold.dim_customer")
    # exactly one current row per business key (Gold README:478-481)
    assert (
        dim1.filter(F.col("is_current") == True)  # noqa: E712
        .groupBy("customer_id").count().filter(F.col("count") > 1).count()
        == 0
    )
    n_v1 = dim1.count()
    # W4 best-record pre-dedup -> exactly one current row per merchant
    assert (
        store.read("gold.dim_merchant")
        .filter(F.col("is_current") == True)  # noqa: E712
        .groupBy("merchant_id").count().filter(F.col("count") > 1).count()
        == 0
    )
    # more days -> transaction counts grow -> some tiers change
    for day in (2, 3):
        raw, _ = _day(spark, day)
        medallion.run_incremental(store, raw)
    dim3 = store.read("gold.dim_customer")
    assert (
        dim3.filter(F.col("is_current") == True)  # noqa: E712
        .groupBy("customer_id").count().filter(F.col("count") > 1).count()
        == 0
    )
    # closed versions keep history: total rows grow, closed rows have
    # end date < 9999-12-31 and is_current=false
    closed = dim3.filter(F.col("is_current") == False)  # noqa: E712
    if dim3.count() > n_v1:
        assert closed.count() > 0
        assert closed.filter(F.col("effective_end_date") == "9999-12-31").count() == 0
    # surrogate keys unique
    assert dim3.select("customer_key").distinct().count() == dim3.count()

    dim3m = store.read("gold.dim_merchant")
    cur = dim3m.filter(F.col("is_current") == True)  # noqa: E712
    # invariant survives churn (same-day guard + replace)
    assert cur.groupBy("merchant_id").count().filter(F.col("count") > 1).count() == 0
    # no corrupted closed rows: end >= start always
    assert dim3m.filter(
        F.col("effective_end_date") < F.col("effective_start_date")
    ).count() == 0
    assert dim3m.select("merchant_key").distinct().count() == dim3m.count()
    # MERCH_9xxx never enters the dim (P6)
    assert dim3m.filter(F.col("merchant_id").like("MERCH_9%")).count() == 0


def test_watermark_advances_and_backfill_does_not(spark, store):
    raw1, _ = _day(spark, 1)
    medallion.run_incremental(store, raw1)
    wm1 = medallion.read_watermark(store, "bronze")
    assert wm1 is not None
    # backfill merges but leaves the watermark untouched
    raw_b, _ = _day(spark, 3)
    r = medallion.backfill_bronze(store, raw_b, "2024-03-03", "2024-03-03",
                                  "BATCH_BF")
    assert r["merged"] > 0
    assert medallion.read_watermark(store, "bronze") == wm1
    # incremental day2 advances it
    raw2, _ = _day(spark, 2)
    medallion.run_incremental(store, raw2)
    assert medallion.read_watermark(store, "bronze") > wm1


def test_full_refresh_resets_state(spark, store):
    raw1, _ = _day(spark, 1)
    medallion.run_incremental(store, raw1)
    raw_all = raw1
    # destructive-op gate (silver_full_refresh_dag.py:27-58 analog)
    with pytest.raises(ValueError, match="confirm"):
        medallion.full_refresh_bronze(store, raw_all, "BATCH_FR")
    r = medallion.full_refresh_bronze(store, raw_all, "BATCH_FR", confirm="YES")
    assert r["written"] == store.count("bronze.transactions")
    assert r["watermark"] is not None


def test_full_refresh_silver_and_fact_match_incremental(spark, day12_run):
    # Rebuild-in-place converges to the incrementally-built state, so
    # sharing the day-1+2 store is safe — but this must stay the LAST
    # day12_run consumer in definition order (it rewrites silver/fact).
    store = day12_run["store"]
    n_silver_inc = store.count("silver.transactions")
    n_fact_inc = store.count("gold.fact_transactions")
    rs = medallion.full_refresh_silver(store, "BATCH_FRS", confirm="YES")
    rf = medallion.full_refresh_fact(store, "BATCH_FRF", confirm="YES")
    # rebuild-from-scratch converges to the incrementally-built state
    assert rs["written"] == n_silver_inc
    assert rf["written"] == n_fact_inc
    assert (
        store.read("silver.transactions")
        .groupBy("transaction_id").count().filter(F.col("count") > 1).count()
        == 0
    )


def test_fact_star_and_null_fk_audit(day1_run):
    store, r = day1_run["store"], day1_run["r1"]
    audit = r["fact"]["null_fk"]
    # all FIVE FKs resolve (validate_fact_transactions.py:233-241)
    assert audit["null_customer_key"] == 0
    assert audit["null_merchant_key"] == 0
    assert audit["null_payment_method_key"] == 0
    assert audit["null_status_key"] == 0
    assert audit["null_date_key"] == 0
    fact = store.read("gold.fact_transactions")
    # 30-column contract (docs/SCHEMA_REGISTRY.md:155-189)
    assert fact.columns == medallion.FACT_COLS
    # measures derived correctly on a sample row
    row = fact.first()
    assert abs(row.net_customer_amount - (row.amount - row.fee_amount + row.cashback_amount)) < 1e-9
    assert abs(row.merchant_net_amount - (row.amount - row.cashback_amount)) < 1e-9
    # refund placeholders
    assert row.is_refunded is False and row.refund_amount is None
    assert row.attempt_number == 1
    # MERCH_9xxx never enters dim_merchant (P6), and null_merchant_key
    # == 0 above proves no fact row references an excluded merchant
    dim_m = store.read("gold.dim_merchant")
    assert dim_m.filter(F.col("merchant_id").like("MERCH_9%")).count() == 0
    # every fact merchant_key resolves to a current dim row
    unresolved = fact.join(
        dim_m.filter(F.col("is_current") == True).select("merchant_key"),  # noqa: E712
        "merchant_key", "left_anti",
    ).count()
    assert unresolved == 0


def test_fact_merchant_rollup_through_key(spark, day1_run):
    """Merchant-sliced revenue through merchant_key (the reference's
    top-10 revenue demo, Gold Layer README.md:417-431)."""
    store = day1_run["store"]
    fact = store.read("gold.fact_transactions")
    dim_m = store.read("gold.dim_merchant").filter(F.col("is_current") == True)  # noqa: E712
    top = (
        fact.join(F.broadcast(dim_m.select("merchant_key", "merchant_name")),
                  "merchant_key")
        .groupBy("merchant_name")
        .agg(F.sum("merchant_net_amount").alias("revenue"),
             F.count("*").alias("txns"))
        .orderBy(F.desc("revenue"))
        .limit(10)
        .collect()
    )
    assert len(top) == 10
    assert all(t.revenue is not None and t.txns > 0 for t in top)
    # descending order
    revs = [t.revenue for t in top]
    assert revs == sorted(revs, reverse=True)


def test_unknown_member_resolves_to_minus_one(spark, store):
    """docs/VALIDATION_RULES.md:167-182: unresolvable FKs become -1,
    not NULL, when unknown_member=True."""
    raw1, _ = _day(spark, 1)
    medallion.run_incremental(store, raw1)
    # orphan one customer: remove it from the dim, then rebuild
    victim = store.read("gold.dim_customer").first().customer_id
    victim_keys = (
        store.read("gold.dim_customer")
        .filter(F.col("customer_id") == victim)
        .select("customer_key")
    )
    store.overwrite("tmp.victim_keys", victim_keys)
    store.delete_matched(
        "gold.dim_customer", store.read("tmp.victim_keys"), ["customer_key"]
    )
    medallion.full_refresh_fact(
        store, "BATCH_UNK", confirm="YES", unknown_member=True
    )
    fact = store.read("gold.fact_transactions")
    orphaned = fact.filter(F.col("customer_key") == -1).count()
    assert orphaned > 0
    assert fact.filter(F.col("customer_key").isNull()).count() == 0


def test_job_control_contract_and_runbook_queries(spark, day1_run):
    """23-column job_control contract (docs/SCHEMA_REGISTRY.md:53-81)
    expressed by replaying the RUNBOOK monitoring queries
    (bronze/README.md:365-405)."""
    store = day1_run["store"]
    jc = store.read("job_control")
    assert jc.columns == [
        "job_name", "layer", "batch_id", "run_mode", "status",
        "processing_date", "start_date", "end_date",
        "last_processed_timestamp", "last_processed_batch_id",
        "records_read", "records_written", "records_failed",
        "records_quarantined", "started_at", "completed_at",
        "duration_seconds", "retry_count", "max_retries", "error_message",
        "triggered_by", "dataproc_cluster", "spark_app_id",
    ]
    jc.createOrReplaceTempView("job_control")
    # success rate (RUNBOOK)
    rates = spark.sql("""
        SELECT job_name, COUNT(*) AS total_runs,
               SUM(CASE WHEN status = 'SUCCESS' THEN 1 ELSE 0 END) AS ok,
               ROUND(100.0 * SUM(CASE WHEN status = 'SUCCESS' THEN 1 ELSE 0 END)
                     / COUNT(*), 2) AS success_rate_pct
        FROM job_control
        WHERE started_at >= CURRENT_DATE - INTERVAL 7 DAY
        GROUP BY job_name
    """).collect()
    assert rates and all(r.success_rate_pct == 100.0 for r in rates)
    # quarantine rate (RUNBOOK)
    qrate = spark.sql("""
        SELECT DATE(started_at) AS date,
               SUM(records_quarantined) AS quarantined,
               SUM(records_written) AS loaded
        FROM job_control GROUP BY DATE(started_at)
    """).collect()
    assert qrate and qrate[0].loaded > 0
    # duration by mode (RUNBOOK)
    durs = spark.sql("""
        SELECT run_mode, AVG(duration_seconds) AS avg_s,
               MAX(duration_seconds) AS max_s
        FROM job_control WHERE status = 'SUCCESS' GROUP BY run_mode
    """).collect()
    assert durs and all(d.avg_s is not None for d in durs)


def test_result_json_contract(day1_run):
    import json as _json

    lines = [
        ln for ln in day1_run["stdout"].splitlines()
        if ln.startswith("RESULT_JSON:")
    ]
    assert len(lines) >= 5  # bronze, silver, 2x scd2, fact
    for ln in lines:
        payload = _json.loads(ln[len("RESULT_JSON:"):])
        assert "job_name" in payload


def test_schema_contracts(day1_run):
    """Column-list parity with docs/SCHEMA_REGISTRY.md for quarantine
    (24), dim_customer (12), dim_merchant (10), dim_payment_method (5),
    dim_status (6)."""
    store = day1_run["store"]
    assert store.read("bronze.quarantine").columns == medallion.RAW_COLS + [
        "delta_change_type", "delta_version", "error_reason", "error_tier",
        "quarantined_at", "source_file", "processing_batch_id",
    ]
    assert store.read("gold.dim_customer").columns == [
        "customer_key", "customer_id", "customer_tier", "is_active",
        "first_transaction_date", "last_transaction_date", "lifetime_value",
        "loaded_at", "source_system", "effective_start_date",
        "effective_end_date", "is_current",
    ]
    assert store.read("gold.dim_merchant").columns == [
        "merchant_key", "merchant_id", "merchant_name", "category",
        "location_type", "loaded_at", "source_system",
        "effective_start_date", "effective_end_date", "is_current",
    ]
    assert store.read("gold.dim_payment_method").columns == [
        "payment_method_key", "payment_method", "description", "loaded_at",
        "source_system",
    ]
    assert store.read("gold.dim_status").columns == [
        "status_key", "transaction_status", "status_category",
        "is_successful", "loaded_at", "source_system",
    ]


def test_bi_star_join_smoke_and_tier_analysis(spark, day1_run):
    """Replay the reference's documented BI queries over our Gold star
    (Gold Layer README.md:390-447): the 6-table star join resolves for
    every fact row, and tier analysis aggregates through dim_customer."""
    store = day1_run["store"]
    for t in ["fact_transactions", "dim_customer", "dim_merchant",
              "dim_payment_method", "dim_status", "dim_date"]:
        store.read(f"gold.{t}").createOrReplaceTempView(t)
    joined = spark.sql("""
        SELECT f.transaction_id, dc.customer_tier, dm.merchant_name,
               dpm.payment_method, ds.transaction_status, dd.full_date,
               f.amount, f.gateway_revenue
        FROM fact_transactions f
        JOIN dim_customer dc
          ON f.customer_key = dc.customer_key AND dc.is_current = true
        JOIN dim_merchant dm
          ON f.merchant_key = dm.merchant_key AND dm.is_current = true
        JOIN dim_payment_method dpm
          ON f.payment_method_key = dpm.payment_method_key
        JOIN dim_status ds ON f.status_key = ds.status_key
        JOIN dim_date dd ON f.date_key = dd.date_key
    """)
    # inner joins lose no rows: every FK resolves
    assert joined.count() == store.count("gold.fact_transactions")
    tiers = spark.sql("""
        SELECT dc.customer_tier,
               COUNT(DISTINCT f.customer_key) AS customers,
               COUNT(*) AS transactions,
               SUM(f.amount) AS total_amount,
               AVG(f.amount) AS avg_amount
        FROM fact_transactions f
        JOIN dim_customer dc
          ON f.customer_key = dc.customer_key AND dc.is_current = true
        GROUP BY dc.customer_tier
        ORDER BY total_amount DESC
    """).collect()
    assert tiers and sum(t.transactions for t in tiers) == joined.count()


def test_fact_plan_broadcasts_all_five_dims(spark, day1_run):
    """The 100 TB-correct star plan: every dim side is a broadcast hash
    join — the silver fact stream must never shuffle for a dim."""
    store = day1_run["store"]
    silver = store.read("silver.transactions").filter(
        ~F.col("merchant_id").like("MERCH_9%")
    )
    fact = medallion._fact_frame(store, silver)
    plan = fact._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 5
    assert "SortMergeJoin" not in plan


def test_dim_date_attributes(spark, store):
    medallion.build_dim_date(store, "2024-01-01", "2024-01-31")
    dd = store.read("gold.dim_date")
    assert dd.count() == 31
    jan6 = dd.filter(F.col("full_date") == "2024-01-06").first()  # Saturday
    assert jan6.is_weekend and jan6.date_key == 20240106 and jan6.day_name == "Saturday"


# ------------------------------------------- bounded stage retries (r8)


def test_transient_stage_failure_retried_then_success_with_retry_count(
    spark, store, monkeypatch
):
    """r7 verdict item 4: a stage that fails once and then succeeds is
    retried within the DAG budget, and its OWN job_control SUCCESS row
    records retry_count=1 (the observable Airflow retries=2 contract,
    bronze_incremental_dag.py:70-77)."""
    raw, counts = _day(spark, 1)
    real = medallion.load_bronze
    calls = {"n": 0}

    def flaky(store_, batch_id, *a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected transient executor loss")
        return real(store_, batch_id, *a, **kw)

    monkeypatch.setattr(medallion, "load_bronze", flaky)
    r = medallion.run_incremental(store, raw)
    assert calls["n"] == 2
    assert r["bronze"]["merged"] > 0
    row = (
        store.read("job_control")
        .filter(
            (F.col("job_name") == "load_bronze")
            & (F.col("status") == "SUCCESS")
        )
        .orderBy(F.desc("completed_at"))
        .limit(1)
        .collect()[0]
    )
    assert row.retry_count == 1
    assert row.max_retries == medallion.DEFAULT_STAGE_RETRIES
    # downstream stages ran clean: their rows record retry_count=0
    fact_row = (
        store.read("job_control")
        .filter(F.col("job_name") == "load_fact")
        .collect()[0]
    )
    assert fact_row.retry_count == 0


def test_permanent_stage_failure_recorded_failed_after_max_retries(
    spark, store, monkeypatch
):
    """Exhausting the budget records a FAILED job_control row with
    retry_count == max_retries and the error message, then re-raises
    to the caller (the DAG marks the run failed)."""
    raw, _ = _day(spark, 1)
    calls = {"n": 0}

    def broken(store_, batch_id, *a, **kw):
        calls["n"] += 1
        raise RuntimeError("injected permanent schema drift")

    monkeypatch.setattr(medallion, "load_bronze", broken)
    with pytest.raises(RuntimeError, match="permanent schema drift"):
        medallion.run_incremental(store, raw, max_retries=2)
    assert calls["n"] == 3  # first attempt + 2 retries
    row = (
        store.read("job_control")
        .filter(
            (F.col("job_name") == "load_bronze")
            & (F.col("status") == "FAILED")
        )
        .collect()[0]
    )
    assert row.retry_count == 2
    assert row.max_retries == 2
    assert "permanent schema drift" in row.error_message
    # the failure must NOT advance the bronze watermark
    assert medallion.read_watermark(store, "bronze") is None


def test_run_incremental_releases_stage_checkpoints(spark, tmp_path):
    """r16: the gold dimension tier runs its four stages concurrently
    and each checkpointing stage is snapshot/release-scoped.  After
    run_incremental returns, no stage checkpoint blocks may remain
    pinned (the ADVICE r15 leak), and the merged-scope release must not
    have freed anything a sibling stage still needed mid-run (the run
    itself completing with correct outputs pins that)."""
    from delta_lake_gcp_implementation_spark.pipeline import storage as storage_mod

    pre = storage_mod.snapshot_persistent_rdds(spark)
    store = TableStore(spark, str(tmp_path / "wh_release"))
    raw = fixtures.generate_day_spark(spark, 1, 2_000)
    r = medallion.run_incremental(store, raw)
    assert r["fact"]["merged"] > 0
    post = storage_mod.snapshot_persistent_rdds(spark)
    app = spark.sparkContext.applicationId
    leaked = {
        rid for rid in post - pre
        if (app, rid) not in storage_mod._PROTECTED_RDD_IDS
    }
    assert leaked == set(), f"stage checkpoints leaked: {leaked}"
    # scope bookkeeping returned to idle
    assert medallion._SCOPE_STATE == {"active": 0, "snapshot": None}
