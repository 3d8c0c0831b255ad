"""Unit tests for the operator library on small in-memory frames."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from delta_lake_gcp_implementation_spark.operators import (
    aggregates as agg_ops,
    dedup as dedup_ops,
    joins as join_ops,
    windows as win_ops,
)


def test_keep_first_version_removes_exact_dups(spark):
    df = spark.createDataFrame(
        [("t1", "2024-01-01", 1), ("t1", "2024-01-01", 2), ("t2", "2024-01-02", 3)],
        ["id", "updated_at", "payload"],
    )
    out = dedup_ops.keep_first_version(df, ["id", "updated_at"])
    assert out.count() == 2
    assert out.filter("id = 't1'").count() == 1


def test_keep_latest_collapses_cdc(spark):
    df = spark.createDataFrame(
        [("t1", 1, "Pending"), ("t1", 3, "Successful"), ("t1", 2, "Failed")],
        ["id", "version", "status"],
    )
    out = dedup_ops.keep_latest(df, ["id"], "version")
    rows = out.collect()
    assert len(rows) == 1 and rows[0].status == "Successful"


def test_keep_latest_deterministic_tiebreak(spark):
    df = spark.createDataFrame(
        [("t1", 1, "a"), ("t1", 1, "b")], ["id", "version", "v"]
    )
    out = dedup_ops.keep_latest(df, ["id"], "version", [F.col("v").desc()])
    assert out.collect()[0].v == "b"


def test_surrogate_keys_dense_and_offset(spark):
    df = spark.createDataFrame([("b",), ("a",), ("c",)], ["k"])
    out = win_ops.surrogate_keys(df, ["k"], "sk", start_at=10).orderBy("sk")
    assert [(r.sk, r.k) for r in out.collect()] == [(11, "a"), (12, "b"), (13, "c")]


def test_scalable_keys_unique(spark):
    df = spark.range(1000).repartition(8)
    out = win_ops.scalable_keys(df, "sk")
    assert out.select("sk").distinct().count() == 1000


def test_anti_semi_join(spark):
    left = spark.createDataFrame([(1,), (2,), (3,)], ["k"])
    right = spark.createDataFrame([(2,), (3,), (4,)], ["k"])
    assert join_ops.anti_join(left, right, ["k"]).collect()[0].k == 1
    assert join_ops.semi_join(left, right, ["k"]).count() == 2


def test_point_in_time_join(spark):
    fact = spark.createDataFrame(
        [Row(k="c1", d="2024-02-15"), Row(k="c1", d="2024-06-15")]
    ).withColumn("d", F.col("d").cast("timestamp"))
    dim = spark.createDataFrame(
        [
            Row(k="c1", tier="Bronze",
                effective_start_date="2024-01-01", effective_end_date="2024-03-31"),
            Row(k="c1", tier="Gold",
                effective_start_date="2024-04-01", effective_end_date="2200-01-01"),
        ]
    ).select(
        "k", "tier",
        F.col("effective_start_date").cast("timestamp").alias("effective_start_date"),
        F.col("effective_end_date").cast("timestamp").alias("effective_end_date"),
    )
    out = join_ops.point_in_time_join(fact, dim, "k", F.col("d"))
    got = {(r.d.month, r.tier) for r in out.collect()}
    assert got == {(2, "Bronze"), (6, "Gold")}


def test_customer_rollup_tiers(spark):
    rows = [("c1", f"2024-01-{i:02d}", 10.0) for i in range(1, 21)] + [
        ("c2", "2024-01-01", 5.0)
    ]
    df = spark.createDataFrame(rows, ["cid", "ts", "amount"])
    out = agg_ops.customer_rollup(
        df, "cid", "ts", "amount", F.lit(True), tier_bounds=(100, 50, 20)
    )
    tiers = {r.cid: r.customer_tier for r in out.collect()}
    assert tiers == {"c1": "Silver", "c2": "Bronze"}


def test_greatest_watermark(spark):
    df = spark.createDataFrame(
        [("2024-01-01", "2024-02-01"), ("2024-03-01", "2024-01-15")], ["a", "b"]
    ).select(F.col("a").cast("timestamp").alias("a"), F.col("b").cast("timestamp").alias("b"))
    wm = agg_ops.greatest_watermark(df, ["a", "b"]).collect()[0].next_watermark
    assert wm.month == 3


def test_pct_of_total_sums_to_100(spark):
    df = spark.createDataFrame([("x",)] * 3 + [("y",)] * 7, ["g"])
    out = agg_ops.pct_of_total(df, "g")
    total = sum(r.pct for r in out.collect())
    assert abs(total - 100.0) < 1e-9


def test_exact_content_dedup(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")], ["doc_id", "text"]
    )
    out = dedup_ops.dedup_exact_content(df, "text", "doc_id")
    kept = {r.doc_id for r in out.collect()}
    assert kept == {1, 3}


def test_minhash_lsh_finds_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog " * 5
    near = base.replace("lazy", "sleepy")
    far = "completely different content about spark engines " * 5
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], ["doc_id", "text"]
    )
    sh = dedup_ops.char_shingles(df, "text", "doc_id")
    sig = dedup_ops.minhash_signatures(sh, "doc_id", n_hashes=16)
    pairs = dedup_ops.minhash_candidate_pairs(sig, "doc_id", n_hashes=16, band_size=2)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in got
    assert (1, 3) not in got


def test_ngram_jaccard(spark):
    df = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "abcdefghij"), (3, "zzzzzzzzzz")],
        ["doc_id", "text"],
    )
    out = dedup_ops.ngram_jaccard_pairs(df, "text", "doc_id", k=5, threshold=0.9)
    rows = out.collect()
    assert len(rows) == 1 and (rows[0].id_a, rows[0].id_b) == (1, 2)
    assert abs(rows[0].jaccard - 1.0) < 1e-9


def test_pair_lookup_join_broadcast_branch_spreads_candidates(spark):
    """The broadcast branch must raise a byte-coalesced (1-partition)
    candidate frame to cluster parallelism so the per-pair verify work
    (array_intersect hash sets) cannot serialize on one core — and the
    spread must not change the joined rows (r15 optimization)."""
    from pyspark.sql import functions as F

    sets = spark.createDataFrame(
        [(i, [i, i + 1, i + 2]) for i in range(1, 7)], ["id", "s"]
    )
    a = sets.select(F.col("id").alias("id_a"), F.col("s").alias("set_a"))
    b = sets.select(F.col("id").alias("id_b"), F.col("s").alias("set_b"))
    cands = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)], ["id_a", "id_b"]
    ).coalesce(1)
    assert cands.rdd.getNumPartitions() == 1
    joined = dedup_ops._pair_lookup_join(cands, a, b, broadcast_sides=True)
    assert (
        joined.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    got = {
        (r.id_a, r.id_b, tuple(r.set_a), tuple(r.set_b))
        for r in joined.collect()
    }
    want = {
        (x, y, (x, x + 1, x + 2), (y, y + 1, y + 2))
        for x, y in [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)]
    }
    assert got == want


def test_simhash_near_vs_far(spark):
    base = "spark dataframe shuffle partition broadcast join " * 10
    near = base.replace("broadcast", "replicated")
    far = "entirely unrelated words about cooking pasta recipes " * 10
    df = spark.createDataFrame([(1, base), (2, near), (3, far)], ["doc_id", "text"])
    sig = {r.doc_id: int(r.simhash) for r in
           dedup_ops.simhash64(df, "text", "doc_id").collect()}

    def hamming(a: int, b: int) -> int:
        return bin(a ^ b).count("1")

    assert hamming(sig[1], sig[2]) < hamming(sig[1], sig[3])


def test_asof_join_picks_latest_prior_inclusive(spark):
    clicks = spark.createDataFrame(
        [
            (1, 10, "2024-01-01 10:00:00"),  # before any purchase -> NULL
            (2, 10, "2024-01-01 12:00:00"),  # equal ts -> inclusive match
            (3, 10, "2024-01-01 15:00:00"),  # after both -> latest (13:00)
            (4, 20, "2024-01-01 09:00:00"),  # user with no purchases
        ],
        ["event_id", "user_id", "click_ts"],
    ).withColumn("click_ts", F.col("click_ts").cast("timestamp"))
    purchases = spark.createDataFrame(
        [(10, "2024-01-01 12:00:00", 5.0), (10, "2024-01-01 13:00:00", 7.0)],
        ["user_id", "ts", "purchase_value"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = join_ops.asof_join(
        clicks, purchases, "user_id", "click_ts", "ts", "purchase_value"
    )
    got = {r.event_id: r.asof_value for r in out.collect()}
    assert got == {1: None, 2: 5.0, 3: 7.0, 4: None}
    assert out.count() == clicks.count()  # LEFT semantics: no row loss


def test_topk_per_group_salted_equals_plain(spark):
    df = spark.range(2000).select(
        (F.col("id") % 4).alias("g"),
        (F.xxhash64("id") % 10000).alias("score"),
        F.col("id"),
    )
    order = [F.col("score").desc(), F.col("id")]
    plain = win_ops.topk_per_group(df, ["g"], order, k=7, n_salts=0)
    salted = win_ops.topk_per_group(df, ["g"], order, k=7, n_salts=8)
    key = lambda r: (r.g, r.rn, r.id, r.score)
    assert sorted(map(key, plain.collect())) == sorted(map(key, salted.collect()))


def test_percentile_cont_grouped_matches_numpy(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    vals = rng.uniform(0, 100, 501).tolist()
    rows = [("a", i, v) for i, v in enumerate(vals)] + [
        ("b", i, float(i)) for i in range(10)
    ]
    df = spark.createDataFrame(rows, ["g", "tid", "value"])
    out = {
        r.g: r
        for r in agg_ops.percentile_cont_grouped(
            df, "g", "value", "tid", {"p50": 0.5, "p90": 0.9}
        ).collect()
    }
    assert out["a"].n_rows == 501
    assert abs(out["a"].p50 - float(np.percentile(vals, 50))) < 1e-9
    assert abs(out["a"].p90 - float(np.percentile(vals, 90))) < 1e-9
    # n=10, p=0.9 -> h=8.1: genuine two-point interpolation case
    assert abs(out["b"].p90 - 8.1) < 1e-12


def test_minhash_pairs_bucket_cap(spark):
    """max_bucket drops mega-bucket pair expansion but keeps ordinary
    near-dup pairs — the quadratic-bucket guard from the 10x scale
    rehearsal."""
    from delta_lake_gcp_implementation_spark.operators import dedup as D

    boiler = "common boilerplate template text repeated everywhere verbatim"
    uniq = ("the quick brown fox jumps over the lazy dog near the old "
            "stone bridge")
    rows = [(i, boiler) for i in range(100)]
    rows += [(1000, uniq), (1001, uniq + " x")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sh = D.char_shingles(df, "text", "doc_id", k=5)
    sig = D.minhash_signatures(sh, "doc_id", n_hashes=8).localCheckpoint()
    uncapped = D.minhash_candidate_pairs(sig, "doc_id", 8, 2)
    capped = D.minhash_candidate_pairs(sig, "doc_id", 8, 2, max_bucket=50)
    un = {(r.id_a, r.id_b) for r in uncapped.collect()}
    cp = {(r.id_a, r.id_b) for r in capped.collect()}
    assert cp <= un
    assert (1000, 1001) in cp           # ordinary near-dup survives
    assert (0, 1) in un and (0, 1) not in cp  # mega-bucket dropped
    # the boilerplate clique must still be recoverable via the linear
    # incidence + connected-components path
    inc = D.minhash_band_incidence(sig, "doc_id", n_hashes=8, band_size=2)
    comp = D.connected_components_groups(
        inc, df.select("doc_id"), "doc_id"
    )
    labels = {r.id: r.component for r in comp.collect()}
    assert len({labels[i] for i in range(100)}) == 1


def test_count_min_never_undercounts(spark):
    from delta_lake_gcp_implementation_spark.operators import cms

    rows = [(f"u{i % 40}",) for i in range(2000)] + [("hot",)] * 500
    df = spark.createDataFrame(rows, ["k"])
    sketch = cms.build_count_min(df, "k", width=64, depth=3)
    # sketch is bounded by depth*width cells
    assert sketch.count() <= 3 * 64
    exact = df.groupBy("k").agg(F.count(F.lit(1)).alias("exact"))
    est = cms.estimate_counts(exact, sketch, "k", width=64, depth=3)
    got = est.collect()
    assert got
    for r in got:
        assert r.cms_est >= r.exact  # the CMS one-sided guarantee
    # heavy hitter estimated closely (min-of-rows beats worst bucket)
    hot = [r for r in got if r.k == "hot"][0]
    assert hot.cms_est <= hot.exact + 2 * 2500 // 64


def test_count_min_merge_is_cellwise_sum(spark):
    from delta_lake_gcp_implementation_spark.operators import cms

    a = spark.createDataFrame([(f"x{i}",) for i in range(100)], ["k"])
    b = spark.createDataFrame([(f"y{i}",) for i in range(100)], ["k"])
    both = cms.build_count_min(a.union(b), "k", width=32, depth=2)
    merged = (
        cms.build_count_min(a, "k", width=32, depth=2)
        .union(cms.build_count_min(b, "k", width=32, depth=2))
        .groupBy("d", "bucket")
        .agg(F.sum("total").cast("bigint").alias("total"))
    )
    assert sorted(map(tuple, both.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_pareto_parts_matches_bruteforce(spark, sf_dir):
    from delta_lake_gcp_implementation_spark.plans import relational as R

    got = {r.p_partkey for r in R.q_pareto_parts(spark, sf_dir).collect()}
    parts = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_retailprice", "p_size"
    ).collect()
    pts = [(r.p_partkey, round(r.p_retailprice * 100), r.p_size) for r in parts]
    want = set()
    for k, pc, sz in pts:
        dominated = any(
            (pc2 <= pc and sz2 <= sz)
            and ((pc2, sz2) != (pc, sz) or k2 < k)
            for k2, pc2, sz2 in pts
            if k2 != k
        )
        if not dominated:
            want.add(k)
    assert got == want and got


def test_equi_depth_bins_balanced(spark, sf_dir):
    from delta_lake_gcp_implementation_spark.plans import relational as R

    rows = sorted(R.q_equi_depth_bins(spark, sf_dir).collect(),
                  key=lambda r: r.bin)
    assert [r.bin for r in rows] == list(range(1, 9))
    sizes = [r.n_orders for r in rows]
    assert max(sizes) - min(sizes) <= 1  # ntile guarantee
    # bins are ordered, non-overlapping ranges
    for a, b in zip(rows, rows[1:]):
        assert a.hi_price <= b.lo_price


def test_hybrid_rrf_prefers_double_ranked_neighbors(spark, sf_dir):
    from delta_lake_gcp_implementation_spark.plans import textops as X

    rows = X.q_hybrid_rrf_topk(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.rank_exact is not None or r.rank_lsh is not None
        want = 0.0
        if r.rank_exact is not None:
            want += 1.0 / (60.0 + r.rank_exact)
        if r.rank_lsh is not None:
            want += 1.0 / (60.0 + r.rank_lsh)
        assert abs(r.rrf_score - want) < 1e-12
    for q in {r.query_id for r in rows}:
        rs = sorted((r for r in rows if r.query_id == q),
                    key=lambda r: r.fused_rank)
        scores = [r.rrf_score for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_linear_interpolate_exact_ramp(spark, tmp_path):
    """A gap between two observed days fills with an exact integer
    ramp; edges never extrapolate."""
    import pandas as pd
    from datetime import datetime

    rows = [
        (1, datetime(2024, 1, 1, 9), "click", 10.0),
        (1, datetime(2024, 1, 5, 9), "click", 50.0),
        (2, datetime(2024, 1, 1, 9), "click", 7.0),
    ]
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "event_type", "value"])
    pdf["event_id"] = range(len(pdf))
    pdf["props"] = "{}"
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    from delta_lake_gcp_implementation_spark.plans import relational as R

    out = {(r.user_id, str(r.day)): r for r in
           R.q_linear_interpolate(spark, str(tmp_path)).collect()}
    # user 1: 1000 .. 5000 cents over 4 days -> +1000/day
    for i, want in enumerate([1000, 2000, 3000, 4000, 5000]):
        r = out[(1, f"2024-01-0{i + 1}")]
        assert r.value_cents == want
        assert r.observed == (i in (0, 4))
    # user 2: single observed day, no grid beyond it
    assert out[(2, "2024-01-01")].value_cents == 700
    assert len([k for k in out if k[0] == 2]) == 1


def test_session_ids_gap_rule(spark, tmp_path):
    import pandas as pd
    from datetime import datetime

    rows = [
        (1, datetime(2024, 1, 1, 9, 0)),
        (1, datetime(2024, 1, 1, 9, 20)),   # same session (20 min)
        (1, datetime(2024, 1, 1, 10, 0)),   # new session (40 min gap)
        (2, datetime(2024, 1, 1, 9, 0)),
    ]
    pdf = pd.DataFrame(rows, columns=["user_id", "ts"])
    pdf["event_id"] = range(len(pdf))
    pdf["event_type"] = "click"
    pdf["value"] = 1.0
    pdf["props"] = "{}"
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    from delta_lake_gcp_implementation_spark.plans import relational as R

    out = {r.event_id: r for r in R.q_session_ids(spark, str(tmp_path)).collect()}
    assert [out[i].session_idx for i in range(3)] == [1, 1, 2]
    assert out[3].session_idx == 1
    assert out[0].session_start and not out[1].session_start


def test_record_linkage_classes(spark, sf_dir):
    from delta_lake_gcp_implementation_spark.plans import relational as R

    rows = R.q_record_linkage(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.link_score >= 8
        want = (12 if r.num_distance == 0 else 6 if r.num_distance == 1 else 0)
        want += (4 if r.bal_close else 0) + 2
        assert r.link_score == want
        assert r.link_class in ("match", "possible")


def test_ses_forecast_matches_python_recurrence(spark, sf_dir):
    from delta_lake_gcp_implementation_spark.plans import relational as R

    rows = {r.user_id: r for r in R.q_ses_forecast(spark, sf_dir).collect()}
    assert rows
    # replay the integer recurrence in python for every user
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", F.to_date("ts").alias("day"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    ).groupBy("user_id", "day").agg(F.sum("cents").alias("c")).collect()
    series: dict[int, list] = {}
    for r in sorted(ev, key=lambda r: (r.user_id, r.day)):
        series.setdefault(r.user_id, []).append(r.c)
    for uid, xs in series.items():
        acc = xs[0]
        for x in xs[1:]:
            acc = (x + 3 * acc) // 4
        assert rows[uid].ses_cents == acc
        assert rows[uid].n_days == len(xs)
        assert rows[uid].last_cents == xs[-1]


def test_outlier_days_integer_zscore(spark, tmp_path):
    """A planted spike is flagged; steady days are not; the squared
    comparison equals the float z-score rule."""
    import pandas as pd
    from datetime import datetime

    # a single spike among n constant days has |z| = sqrt(n-1) at most,
    # so n must exceed 10 for the 3-sigma rule to fire
    rows = []
    for d in range(1, 21):
        rows.append((1, datetime(2024, 1, d, 9), "click",
                     10.0 if d != 7 else 500.0))
        rows.append((2, datetime(2024, 1, d, 9), "click", 10.0))
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "event_type", "value"])
    pdf["event_id"] = range(len(pdf))
    pdf["props"] = "{}"
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    from delta_lake_gcp_implementation_spark.plans import relational as R

    out = R.q_outlier_days(spark, str(tmp_path)).collect()
    assert {(r.user_id, r.day.day) for r in out} == {(1, 7)}
    r = out[0]
    # cross-check against the float rule
    import math

    mean = r.sum_cents / r.n
    # recompute sumsq from the planted series
    xs = [1000] * 19 + [50000]
    var = sum((x - mean) ** 2 for x in xs) / r.n
    assert abs(r.day_cents - mean) > 3 * math.sqrt(var)


def test_hll_verdict_registers_and_bounds(spark, sf_dir):
    from delta_lake_gcp_implementation_spark.plans import relational as R

    rows = R.q_hll_verdict(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.hll_ok
        assert 0 <= r.n_zero_buckets <= 256
        # the scaled harmonic sum is bounded by m * 2^53 (all-empty)
        assert 0 < r.inv_sum_scaled <= 256 * (1 << 53)
        # register replay in python: same md5 scheme
        import hashlib

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "user_id"
    ).collect()
    import hashlib

    regs: dict[tuple, int] = {}
    for e in ev:
        h = int(hashlib.md5(str(e.user_id).encode()).hexdigest()[:15], 16)
        b, v = h % 256, h // 256
        rank = 53 if v == 0 else 53 - v.bit_length()
        regs[(e.event_type, b)] = max(regs.get((e.event_type, b), 0), rank)
    for r in rows:
        zeros = 256 - len([1 for (t, _) in regs if t == r.event_type])
        assert r.n_zero_buckets == zeros


def test_max_concurrency_sweep(spark, tmp_path):
    """Hand-crafted overlapping sessions: [9:00-9:10], [9:05-9:15],
    [9:08-9:09] overlap 3-way; a lone afternoon session peaks at 1."""
    import pandas as pd
    from datetime import datetime

    rows = [
        (1, datetime(2024, 1, 1, 9, 0)), (1, datetime(2024, 1, 1, 9, 10)),
        (2, datetime(2024, 1, 1, 9, 5)), (2, datetime(2024, 1, 1, 9, 15)),
        (3, datetime(2024, 1, 1, 9, 8)), (3, datetime(2024, 1, 1, 9, 9)),
        (4, datetime(2024, 1, 1, 15, 0)),
        (1, datetime(2024, 1, 2, 9, 0)),
    ]
    pdf = pd.DataFrame(rows, columns=["user_id", "ts"])
    pdf["event_id"] = range(len(pdf))
    pdf["event_type"] = "click"
    pdf["value"] = 1.0
    pdf["props"] = "{}"
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    from delta_lake_gcp_implementation_spark.plans import relational as R

    out = {str(r.day): r for r in R.q_max_concurrency(spark, str(tmp_path)).collect()}
    assert out["2024-01-01"].max_concurrent == 3
    assert out["2024-01-01"].first_peak_ts == datetime(2024, 1, 1, 9, 8)
    assert out["2024-01-02"].max_concurrent == 1


def test_ab_test_verdict_matches_scipy_free_chi2(spark, tmp_path):
    """Crafted strongly-significant and null experiments; the integer
    cross-multiplied comparison equals the float chi-square rule."""
    import pandas as pd
    from datetime import datetime

    def write(rows, path):
        pdf = pd.DataFrame(rows, columns=["user_id", "event_type"])
        pdf["ts"] = datetime(2024, 1, 1, 9)
        pdf["value"] = 1.0
        pdf["props"] = "{}"
        pdf["event_id"] = range(len(pdf))
        spark.createDataFrame(pdf).write.mode("overwrite").parquet(
            str(path / "events.parquet")
        )

    from delta_lake_gcp_implementation_spark.plans import relational as R

    # variant A (even ids) converts 80%, B converts 20% -> significant
    strong = []
    for u in range(200):
        strong.append((u, "click"))
        conv = (u % 10 < 8) if u % 2 == 0 else (u % 10 < 2)
        if conv:
            strong.append((u, "purchase"))
    d1 = tmp_path / "strong"
    d1.mkdir()
    write(strong, d1)
    r = R.q_ab_test_verdict(spark, str(d1)).collect()[0]
    assert r.significant_5pct
    assert r.a_conv + r.a_no == 100 and r.b_conv + r.b_no == 100

    # identical conversion in both arms (decided by u//2 parity, which
    # is independent of the variant split on u parity) -> not significant
    null = []
    for u in range(200):
        null.append((u, "click"))
        if (u // 2) % 2 == 0:
            null.append((u, "purchase"))
    d2 = tmp_path / "null"
    d2.mkdir()
    write(null, d2)
    r2 = R.q_ab_test_verdict(spark, str(d2)).collect()[0]
    assert not r2.significant_5pct

    # cross-check the integer rule against the float chi-square
    def chi2(a, b, c, d):
        n = a + b + c + d
        det = a * d - b * c
        denom = (a + b) * (c + d) * (a + c) * (b + d)
        return n * det * det / denom if denom else 0.0

    assert chi2(r.a_conv, r.a_no, r.b_conv, r.b_no) > 3.841
    assert chi2(r2.a_conv, r2.a_no, r2.b_conv, r2.b_no) <= 3.841


def test_rolling_wau_window_semantics(spark, tmp_path):
    """WAU(day) counts distinct users active in [day-6, day]."""
    import pandas as pd
    from datetime import datetime

    rows = [
        (1, datetime(2024, 1, 1, 9)),
        (2, datetime(2024, 1, 3, 9)),
        (1, datetime(2024, 1, 10, 9)),
    ]
    pdf = pd.DataFrame(rows, columns=["user_id", "ts"])
    pdf["event_id"] = range(len(pdf))
    pdf["event_type"] = "click"
    pdf["value"] = 1.0
    pdf["props"] = "{}"
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    from delta_lake_gcp_implementation_spark.plans import relational as R

    out = {str(r.as_of_day): r.wau for r in
           R.q_rolling_wau(spark, str(tmp_path)).collect()}
    assert out["2024-01-01"] == 1          # user 1
    assert out["2024-01-03"] == 2          # users 1 and 2
    assert out["2024-01-07"] == 2          # both still in window
    assert out["2024-01-08"] == 1          # user 1's day-1 expired
    assert out["2024-01-09"] == 1          # user 2 still in window
    assert out["2024-01-10"] == 1          # user 1 returns


def test_count_min_unseen_items_estimate_zero(spark):
    """ADVICE r5: probing the sketch with items never built in must
    return cms_est=0 (left join + coalesce), not vanish from the
    output or overestimate from only the non-empty cells."""
    from delta_lake_gcp_implementation_spark.operators import cms

    df = spark.createDataFrame([("a",), ("a",), ("b",)], ["k"])
    sketch = cms.build_count_min(df, "k", width=64, depth=3)
    probes = spark.createDataFrame(
        [("a",), ("zz-unseen-1",), ("zz-unseen-2",)], ["k"]
    )
    est = {r.k: r.cms_est for r in
           cms.estimate_counts(probes, sketch, "k", width=64, depth=3).collect()}
    assert set(est) == {"a", "zz-unseen-1", "zz-unseen-2"}
    assert est["a"] >= 2
    # 3 items in a 64-wide grid: overwhelmingly all-empty cells for the
    # unseen probes; min-with-zero guarantees <= true CMS estimate and
    # here exactly 0 unless all 3 depth rows collide
    assert est["zz-unseen-1"] == 0 and est["zz-unseen-2"] == 0
