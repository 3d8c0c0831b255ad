"""100x-sweep tool guards (VERDICT r11 item 6 + ADVICE r11): the
in-sweep variance rerun decision and the prior-factor loader, so
artifact rows never need manual outlier-correction notes and pinned
keys compare like-with-like."""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from rehearse_catalog_100x import (  # noqa: E402
    comparable_prior_factor,
    load_prior_factors,
    load_prior_rows,
    should_rerun,
)


def test_should_rerun_fires_only_on_genuine_outliers():
    # the r11 cheapest_supplier case: committed 1.3x, in-sweep 10.5x
    assert should_rerun(10.5, 1.3)
    # at or under the 3x band: trust the single run
    assert not should_rerun(3.8, 1.3)
    assert not should_rerun(5.2, 5.0)
    # no prior (new key) or no factor (error row): nothing to compare
    assert not should_rerun(None, 1.3)
    assert not should_rerun(10.5, None)
    assert not should_rerun(10.5, 0.0)


def test_load_prior_factors_reads_newest_round_and_skips_errors(tmp_path):
    old = tmp_path / "BENCH_100X_r10.jsonl"
    old.write_text(json.dumps({"key": "a", "factor": 99.0}) + "\n")
    new = tmp_path / "BENCH_100X_r11.jsonl"
    rows = [
        {"key": "a", "sf01_s": 1.0, "s100x": 5.0, "factor": 5.0},
        {"key": "b", "sf01_s": 1.0, "s100x": 300.0, "error": "TIMEOUT"},
        {"key": "c", "sf01_s": None, "s100x": 2.0},  # no factor
    ]
    new.write_text("".join(json.dumps(r) + "\n" for r in rows))
    # a non-canonical variant file must not be picked as "newest"
    (tmp_path / "BENCH_100X_r11_changed.jsonl").write_text(
        json.dumps({"key": "a", "factor": 1.0}) + "\n"
    )
    factors = load_prior_factors(str(tmp_path))
    assert factors == {"a": 5.0}


def test_load_prior_factors_empty_dir(tmp_path):
    assert load_prior_factors(str(tmp_path)) == {}


def test_should_rerun_time_arm_catches_sub3x_inflation():
    """r12 second trigger: 1.8-3.2x absolute-time inflation below the
    3x factor guard re-measures when it costs real seconds."""
    # the r12 record_linkage case: prior 18.5 s -> in-sweep 59.3 s
    assert should_rerun(81.2, 31.0, s100x=59.3, prior_s100x=18.5)
    # big ratio but tiny absolute delta: leave it (sub-second noise)
    assert not should_rerun(2.0, 1.0, s100x=0.9, prior_s100x=0.3)
    # modest ratio under both arms: trust the single run
    assert not should_rerun(6.0, 5.0, s100x=22.0, prior_s100x=18.0)
    # no prior time recorded: only the factor arm can fire
    assert not should_rerun(5.0, 4.0, s100x=50.0, prior_s100x=None)


def test_load_prior_rows_exposes_times(tmp_path):
    import json as j

    (tmp_path / "BENCH_100X_r11.jsonl").write_text(
        j.dumps({"key": "a", "sf01_s": 1.0, "s100x": 5.0, "factor": 5.0})
        + "\n"
    )
    rows = load_prior_rows(str(tmp_path))
    assert rows["a"]["s100x"] == 5.0


def test_comparable_prior_factor_gates_regime_mixed_pinned_rows():
    # pinned key, prior row from the old catalog-regime sweep: the
    # factor arm must stay silent until a like-regime row exists
    assert comparable_prior_factor(
        "contamination_check", {"factor": 3.1}, {"contamination_check"}
    ) is None
    # pinned key with a like-regime prior: comparable
    assert comparable_prior_factor(
        "contamination_check",
        {"factor": 3.1, "sf01_pinned_s": 1.9},
        {"contamination_check"},
    ) == 3.1
    # unpinned key with an unpinned prior: comparable
    assert comparable_prior_factor("dim_date", {"factor": 4.0}, {"x"}) == 4.0
    assert comparable_prior_factor("dim_date", {}, set()) is None
    # key UNPINNED this round vs its old pinned-regime prior: the gate
    # is bidirectional (r13 review)
    assert comparable_prior_factor(
        "contamination_check",
        {"factor": 3.1, "sf01_pinned_s": 1.9},
        set(),
    ) is None
