"""Source-connector tests + physical-plan quality assertions
(pushdown, broadcast, codegen) — the 100 TB story made checkable."""

from __future__ import annotations

from pyspark.sql import functions as F

from delta_lake_gcp_implementation_spark.plans import CATALOG
from delta_lake_gcp_implementation_spark.sources import ingest


def test_read_raw_csv_permissive(spark, tmp_path):
    p = tmp_path / "day1.csv"
    p.write_text("id,amount\nT1,10.5\nT2,not_a_number\n")
    raw = ingest.read_raw_csv(spark, str(p), ["id", "amount"])
    rows = raw.collect()
    assert len(rows) == 2  # bad value survives the scan as data
    typed = ingest.typed_projection(raw, {"id": "string", "amount": "double"})
    got = {r.id: r.amount for r in typed.collect()}
    assert got["T1"] == 10.5
    assert got["T2"] is None  # cast failure -> NULL, for Tier-1 routing


def test_typed_projection_ts_truncation(spark):
    df = spark.createDataFrame(
        [("2024-01-02 03:04:05.678901",)], ["ts"]
    )
    out = ingest.typed_projection(df, {"ts": "timestamp"}, ts_truncate=["ts"])
    v = out.collect()[0].ts
    assert v.microsecond == 0 and v.second == 5


def test_date_spine_native_sequence(spark):
    out = ingest.date_spine(spark, "2024-01-01", "2024-01-10")
    assert out.count() == 10


def _plan(spark, name: str) -> str:
    df = CATALOG[name].builder(spark, "/root/testdata/sf0.001")
    return df._jdf.queryExecution().executedPlan().toString()


def test_star_rollup_broadcasts_dims(spark):
    plan = _plan(spark, "star_rollup")
    assert "BroadcastHashJoin" in plan  # dims must never shuffle the fact


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(spark, "date_range_filter")
    assert "PushedFilters: [" in plan
    # the orderdate predicate reaches the parquet reader
    assert "o_orderdate" in plan.split("PushedFilters")[1][:200]


def test_column_pruning_in_scan(spark):
    plan = _plan(spark, "token_counts")
    # ReadSchema must not include unused document columns
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" in read and "source" not in read


def test_no_python_udfs_in_catalog_plans(spark):
    # every catalog operator must stay JVM-side (whole-stage codegen);
    # BatchEvalPython/ArrowEvalPython in a plan means a Python hot path
    for name in ("fact_build", "customer_rollup", "ngram_jaccard",
                 "cosine_topk", "simhash_signatures", "quality_score"):
        plan = _plan(spark, name)
        assert "EvalPython" not in plan, name


def test_dedup_window_is_partitioned(spark):
    plan = _plan(spark, "dedup_latest_version")
    # hashpartitioning on the dedup key — never a single-partition window
    assert "hashpartitioning(user_id" in plan


def test_asof_join_plan_has_no_join_operator(spark):
    # union-and-sweep: the as-of match is a window sweep, not a join —
    # no candidate fan-out, no range nested-loop anywhere in the plan
    plan = _plan(spark, "asof_join")
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert "hashpartitioning(user_id" in plan  # one per-key shuffle


def test_interval_join_stays_hash_join(spark):
    # the user_id equality must be the join key with the time range as
    # a post-join condition — never a nested-loop/cartesian degradation
    plan = _plan(spark, "interval_join")
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_rollup_is_single_expand_pass(spark):
    # ROLLUP = one Expand + one aggregate over one scan, not a union of
    # per-level aggregation passes
    plan = _plan(spark, "rollup_hierarchy")
    assert "Expand" in plan
    assert plan.count("FileScan") == 1


def test_group_topk_prefilters_on_salt(spark):
    # two-phase top-k: the first window must partition on (group, salt)
    # so no reducer ever sees a whole group
    plan = _plan(spark, "group_topk")
    assert "__salt" in plan


def test_percentile_plan_no_single_partition_exchange(spark):
    # rank + two-point pick: everything stays hash-partitioned by
    # group — a global sort/collect would show Exchange SinglePartition
    plan = _plan(spark, "percentile_stats")
    assert "Exchange SinglePartition" not in plan
    assert "hashpartitioning(event_type" in plan


def test_sketch_stats_error_bounds(spark):
    """The verdict query's exact companions must equal an independent
    recomputation and every in-bounds boolean must hold — the HLL /
    p50-sketch error-bound story, now also hash-checked by the oracle
    (booleans flip -> driver mismatch)."""
    out = {
        r.event_type: r
        for r in CATALOG["sketch_stats"].builder(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    exact = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
        .collect()
    }
    assert set(out) == set(exact)
    for et, e in exact.items():
        a = out[et]
        assert a.n_users_exact == e.n_users, et
        assert a.n_events == e.n_events, et
        assert a.hll_ok, et
        assert a.p50_ok, et


def test_above_avg_spenders_semantics_and_broadcast(spark):
    sf = "/root/testdata/sf0.001"
    out = CATALOG["above_avg_spenders"].builder(spark, sf).collect()
    assert out, "some customer must beat its nation average"
    assert all(r.total_spend > r.nation_avg_spend for r in out)
    # above-the-mean is a strict subset of spending customers
    n_cust = spark.read.parquet(f"{sf}/customer.parquet").count()
    assert len(out) < n_cust
    plan = _plan(spark, "above_avg_spenders")
    assert "BroadcastHashJoin" in plan  # per-nation avgs never shuffle per_cust


def test_order_histogram_partitions_all_orders(spark):
    sf = "/root/testdata/sf0.001"
    rows = CATALOG["order_histogram"].builder(spark, sf).collect()
    n_orders = spark.read.parquet(f"{sf}/orders.parquet").count()
    assert sum(r.n_orders for r in rows) == n_orders
    assert abs(sum(r.order_share for r in rows) - 1.0) < 1e-9
    assert all(r.bucket_lo == r.bucket * 50_000 for r in rows)


def test_ols_trend_matches_numpy(spark, sf_dir):
    import numpy as np

    from delta_lake_gcp_implementation_spark.plans import relational as R

    out = {r.event_type: r for r in R.q_ols_trend(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    ev["x"] = (ev["ts"].dt.normalize() - __import__("pandas").Timestamp("2024-01-01")).dt.days
    for et, g in ev.groupby("event_type"):
        got = out[et]
        assert got.n_events == len(g)
        if g["x"].nunique() < 2:
            continue
        slope, intercept = np.polyfit(g["x"].to_numpy(float), g["value"].to_numpy(float), 1)
        assert abs(got.slope_per_day - slope) < 1e-6 * max(1, abs(slope)), et
        assert abs(got.intercept - intercept) < 1e-6 * max(1, abs(intercept)), et
        r = np.corrcoef(g["x"].to_numpy(float), g["value"].to_numpy(float))[0, 1]
        assert abs(got.r2 - r * r) < 1e-9, et


def test_dq_expectations_flag_crafted_violations(spark, tmp_path):
    from pyspark.sql import functions as F

    from delta_lake_gcp_implementation_spark.plans import relational as R

    spark.createDataFrame(
        [(1, "O", "1-URGENT", "2024-01-01"), (1, "F", "2-HIGH", "2024-01-02"),
         (2, None, "3-MEDIUM", "2024-01-03")],
        ["o_orderkey", "o_orderstatus", "o_orderpriority", "o_orderdate"],
    ).coalesce(1).write.parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(
        [(1, 1, 5.0), (99, 1, 10.0), (2, 1, 99.0)],
        ["l_orderkey", "l_linenumber", "l_quantity"],
    ).coalesce(1).write.parquet(f"{tmp_path}/lineitem.parquet")
    spark.createDataFrame(
        [(1, "MACHINERY"), (2, "SPACESHIPS")], ["c_custkey", "c_mktsegment"]
    ).coalesce(1).write.parquet(f"{tmp_path}/customer.parquet")
    out = {r.expectation: r for r in R.q_dq_expectations(spark, str(tmp_path)).collect()}
    assert out["orders_pk_unique"].violations == 2 and not out["orders_pk_unique"].passed
    assert out["lineitem_fk_orders"].violations == 1
    assert out["customer_segment_accepted"].violations == 1
    assert out["orders_status_not_null"].violations == 1
    assert out["lineitem_quantity_range"].violations == 1
    assert all(r.checked > 0 for r in out.values())


def test_sliding_window_covers_each_event_twice(spark, sf_dir):
    from delta_lake_gcp_implementation_spark.plans import relational as R
    from delta_lake_gcp_implementation_spark.tables import load_table
    from pyspark.sql import functions as F

    out = R.q_sliding_window(spark, sf_dir)
    total_assigned = out.agg(F.sum("n_events")).collect()[0][0]
    n_events = load_table(spark, sf_dir, "events").count()
    # width 1h / slide 30min: every event lands in exactly two windows
    assert total_assigned == 2 * n_events


def test_second_wave_plans_stay_jvm_side_and_bounded(spark):
    """Round-5 second wave: no Python eval in any plan; the broadcast
    and no-cartesian invariants that make each shape scale."""
    for name in (
        "weighted_sample",
        "hard_negatives",
        "cluster_best_doc",
        "bloom_membership",
        "count_min_verdict",
        "domain_kl",
        "sparse_cosine_pairs",
        "cdc_chunks",
        "dominant_suppliers",
    ):
        plan = _plan(spark, name)
        assert "EvalPython" not in plan, name

    # bloom probe side is a pure projection: the probe filter contains
    # no join for the membership test itself (the exact companion join
    # exists only for the verdict columns)
    p = _plan(spark, "count_min_verdict")
    assert "CartesianProduct" not in p
    # sparse cosine joins through the term postings, never all-pairs
    p = _plan(spark, "sparse_cosine_pairs")
    assert "CartesianProduct" not in p
    # dominant_suppliers: supplier dim broadcasts
    p = _plan(spark, "dominant_suppliers")
    assert "BroadcastHashJoin" in p and "CartesianProduct" not in p
    # weighted_sample: threshold table broadcasts onto the corpus scan
    p = _plan(spark, "weighted_sample")
    assert "BroadcastHashJoin" in p


def test_tpch_classic_plans(spark):
    """Q8/Q13/Q22 shapes: deep star join broadcasts every dim; the
    anti join filter pushes the date predicate to the orders scan."""
    p = _plan(spark, "market_share")
    assert p.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in p and "EvalPython" not in p
    p = _plan(spark, "custdist")
    assert "EvalPython" not in p
    p = _plan(spark, "dormant_rich_customers")
    assert "PushedFilters" in p or "o_orderdate" in p  # pushdown visible


def test_fuzzy_gate_plain_join_branch_equals_salted(spark, monkeypatch):
    """r10 ADVICE gates: above the distinct-name threshold the fuzzy
    join must take the PLAIN equi-join branch (no 32x replication) and
    return exactly the salted branch's rows."""
    from delta_lake_gcp_implementation_spark.plans import relational as R

    sf = "/root/testdata/sf0.001"
    salted = R.q_fuzzy_name_match(spark, sf)
    rows_salted = sorted(map(tuple, salted.collect()))
    monkeypatch.setattr(R, "_FUZZY_SALT_MAX_NAMES", 0)  # force plain branch
    plain = R.q_fuzzy_name_match(spark, sf)
    rows_plain = sorted(map(tuple, plain.collect()))
    assert rows_plain == rows_salted and rows_salted  # non-empty at sf0.001


def test_dq_expectations_zero_not_null_on_empty_tables(spark, tmp_path):
    """r9 ADVICE: F.sum over an empty table is NULL; the fused
    violation counters must coalesce to 0 so `violations`/`passed`
    match the oracle's count-based 0/true on empty inputs."""
    from delta_lake_gcp_implementation_spark.plans import relational as R

    src = "/root/testdata/sf0.001"
    for t in ("orders", "lineitem", "customer"):
        spark.read.parquet(f"{src}/{t}.parquet").limit(0).write.parquet(
            str(tmp_path / f"{t}.parquet")
        )
    out = R.q_dq_expectations(spark, str(tmp_path)).collect()
    assert len(out) == 5
    for r in out:
        assert r.checked == 0
        assert r.violations == 0, f"{r.expectation}: violations={r.violations}"
        assert r.passed is True
