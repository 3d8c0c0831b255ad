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


def test_fresh_load_counts(spark, store):
    raw, counts = _day(spark, 1)
    r = medallion.run_incremental(store, raw)
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


def test_idempotent_rerun(spark, store):
    raw, _ = _day(spark, 1)
    medallion.run_incremental(store, raw)
    n_bronze = store.count("bronze.transactions")
    n_silver = store.count("silver.transactions")
    # scenario 2 (TESTING_GUIDE:125-161): same batch again -> no growth
    medallion.run_incremental(store, raw)
    assert store.count("bronze.transactions") == n_bronze
    assert store.count("silver.transactions") == n_silver
    # S11 empty-staging write: the no-new-data run overwrites staging
    # with a 0-row frame that KEEPS the exact 21-column schema, so a
    # downstream reader never sees the previous batch
    staging = store.read("silver.transactions_staging")
    assert staging.count() == 0
    assert staging.columns == medallion.SILVER_COLS


def test_cdc_collapse_and_composite_key(spark, store):
    raw1, _ = _day(spark, 1)
    medallion.run_incremental(store, raw1)
    raw2, c2 = _day(spark, 2)
    medallion.run_incremental(store, raw2)
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


def test_late_arrivals_flagged_not_dropped(spark, store):
    raw1, _ = _day(spark, 1)
    medallion.run_incremental(store, raw1)
    raw2, c2 = _day(spark, 2)
    r2 = medallion.run_incremental(store, raw2)
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


def test_scd2_invariants_and_tier_change(spark, store):
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


def test_scd2_merchant_best_record_and_one_current(spark, store):
    raw1, _ = _day(spark, 1)
    medallion.run_incremental(store, raw1)
    dim1 = store.read("gold.dim_merchant")
    # W4 best-record pre-dedup -> exactly one current row per merchant
    assert (
        dim1.filter(F.col("is_current") == True)  # noqa: E712
        .groupBy("merchant_id").count().filter(F.col("count") > 1).count()
        == 0
    )
    for day in (2, 3):
        raw, _ = _day(spark, day)
        medallion.run_incremental(store, raw)
    dim3 = store.read("gold.dim_merchant")
    cur = dim3.filter(F.col("is_current") == True)  # noqa: E712
    # invariant survives churn (same-day guard + replace)
    assert cur.groupBy("merchant_id").count().filter(F.col("count") > 1).count() == 0
    # no corrupted closed rows: end >= start always
    assert dim3.filter(
        F.col("effective_end_date") < F.col("effective_start_date")
    ).count() == 0
    assert dim3.select("merchant_key").distinct().count() == dim3.count()
    # MERCH_9xxx never enters the dim (P6)
    assert dim3.filter(F.col("merchant_id").like("MERCH_9%")).count() == 0


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
    r = medallion.full_refresh_bronze(store, raw_all, "BATCH_FR")
    assert r["written"] == store.count("bronze.transactions")
    assert r["watermark"] is not None


def test_full_refresh_silver_and_fact_match_incremental(spark, store):
    for day in (1, 2):
        raw, _ = _day(spark, day)
        medallion.run_incremental(store, raw)
    n_silver_inc = store.count("silver.transactions")
    n_fact_inc = store.count("gold.fact_transactions")
    rs = medallion.full_refresh_silver(store, "BATCH_FRS")
    rf = medallion.full_refresh_fact(store, "BATCH_FRF")
    # rebuild-from-scratch converges to the incrementally-built state
    assert rs["written"] == n_silver_inc
    assert rf["written"] == n_fact_inc
    assert (
        store.read("silver.transactions")
        .groupBy("transaction_id").count().filter(F.col("count") > 1).count()
        == 0
    )


def test_fact_star_and_null_fk_audit(spark, store):
    raw1, _ = _day(spark, 1)
    r = medallion.run_incremental(store, raw1)
    audit = r["fact"]["null_fk"]
    # every FK resolves except for rows we know lack dims
    assert audit["null_customer_key"] == 0
    assert audit["null_payment_method_key"] == 0
    assert audit["null_status_key"] == 0
    assert audit["null_date_key"] == 0
    fact = store.read("gold.fact_transactions")
    # measures derived correctly on a sample row
    row = fact.first()
    assert abs(row.net_customer_amount - (row.amount - row.fee_amount + row.cashback_amount)) < 1e-9
    assert abs(row.merchant_net_amount - (row.amount - row.cashback_amount)) < 1e-9
    # MERCH_9xxx excluded from gold (P6)
    assert fact.filter(F.col("merchant_id").like("MERCH_9%")).count() == 0


def test_dim_date_attributes(spark, store):
    medallion.build_dim_date(store, "2024-01-01", "2024-01-31")
    dd = store.read("gold.dim_date")
    assert dd.count() == 31
    jan6 = dd.filter(F.col("full_date") == "2024-01-06").first()  # Saturday
    assert jan6.is_weekend and jan6.date_key == 20240106 and jan6.day_name == "Saturday"
