"""Executed-plan shape pins for the multi-consumer recompute class
(r7-r9 finding lineage): a shared subtree feeding N consumers must be
materialized once, not re-scanned per consumer.  These bounds are the
values the round-9 plan audit certified; if a localCheckpoint is
dropped (or a builder edit re-introduces per-consumer recompute) the
scan count jumps well past the bound and this fails long before the
bench or the judge notices.

Scan counts are plan properties, independent of scale factor — built
at sf0.001 so the checkpoint materializations stay cheap."""

from __future__ import annotations

import pytest

from delta_lake_gcp_implementation_spark.plans import CATALOG

SF = "/root/testdata/sf0.001"

#: key -> max allowed "Scan parquet" nodes in the executed plan.
#: Bound = the r9-audited value (0 means every consumer reads a
#: checkpointed intermediate; small positives are genuine source
#: reads: weighted_sample's single corpus scan, rolling_wau_hll's
#: exact companion arm).
SCAN_BOUNDS = {
    # round-9 fixes
    "sparse_cosine_pairs": 0,
    "ann_recall_eval": 0,
    "bigram_pmi_topk": 0,
    "weighted_sample": 1,
    "rolling_wau_hll": 2,
    # round-8 fixes that must not regress either
    "ann_pq_recall": 0,
    "semantic_dedup": 0,
    "embedding_near_dups": 0,
    "lsh_dedup_recall": 0,
    "corpus_ingest_verdict": 0,
    # round-9 late additions: dq fusion (3 = one per distinct table),
    # the 100x-sweep rewrites (record_linkage: customer + supplier;
    # fuzzy: ids + the distinct-name arm; equi-depth: checkpointed)
    "dq_expectations": 3,
    "record_linkage": 2,
    "fuzzy_name_match": 2,
    "equi_depth_bins": 0,
    # round-10 recompute-tier fixes (audited values; scd2_delta's 1 is
    # its single conditional-agg pass, above_avg_spenders' 2 is one
    # per source table)
    "bm25_topk": 0,
    "domain_kl": 0,
    "hybrid_rrf_topk": 0,
    # 2 = the single-consumer distinct + the column-pruned min/max
    # bounds scan (measured cheaper than materializing the distinct)
    "rolling_wau": 2,
    "mix_weights_temperature": 0,
    "scd2_delta": 1,
    "above_avg_spenders": 2,
    "two_phase_skew_agg": 1,
    # round-13 fixes: straggler checkpoints (ann_ivf_topk assignment,
    # corpus_curation scalars, lang_confusion cells), the tf-frame
    # fusion, and the winnowing hash-partition rework (fingerprints'
    # 1 is its single source read; containment reads the checkpointed
    # fingerprint frame only)
    "tfidf_topk": 0,
    "corpus_curation": 0,
    "ann_ivf_topk": 0,
    "lang_confusion": 0,
    "winnowing_fingerprints": 1,
    "winnowing_containment": 0,
}


def _executed_plan(spark, name: str) -> str:
    df = CATALOG[name].builder(spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", sorted(SCAN_BOUNDS))
def test_scan_count_within_audited_bound(spark, name):
    plan = _executed_plan(spark, name)
    scans = plan.count("Scan parquet")
    assert scans <= SCAN_BOUNDS[name], (
        f"{name}: {scans} parquet scans (audited bound "
        f"{SCAN_BOUNDS[name]}) — a shared subtree is being recomputed "
        f"per consumer; restore the localCheckpoint"
    )


@pytest.mark.parametrize("name", sorted(SCAN_BOUNDS))
def test_no_python_eval_nodes(spark, name):
    """The zero-UDF property (SURVEY §2.10) for the same key set —
    cheap to assert while the plans are already built."""
    assert "EvalPython" not in _executed_plan(spark, name)
