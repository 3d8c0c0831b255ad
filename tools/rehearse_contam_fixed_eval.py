"""Round-10 rehearsal: contamination_check linearity with the EVAL SET
PINNED at fixed size while the corpus scales (VERDICT r9 item 3).

The full-catalog 100x sweep times out `contamination_check` because the
catalog query derives BOTH sides from the same documents table, so the
rehearsal scales the eval set with the corpus — a benchmark-construction
artifact.  Real decontamination holds the benchmark set FIXED (like the
reference's fixed tier-1 rule set, `validate_bronze.py:100-104`, scanned
against a growing batch): the eval shingle table broadcasts at constant
size and the corpus side is one linear scan + equi-join.  This script
measures exactly that shape: eval docs always from sf0.1 (every 23rd
doc_id — the catalog's own split), corpus from 1x / 10x / 100x document
tables, and prints wall time + the scaling factor per step.

Pass criterion: ~linear (factor ~= data growth, i.e. ~10x per step or
below on a fixed-core box).

Usage:
    python tools/gen_scale_docs.py /tmp/sfscale10 10     # once
    python tools/gen_scale_docs.py /tmp/sfscale100 100   # once
    python tools/rehearse_contam_fixed_eval.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALES = [
    ("1x", "/root/testdata/sf0.1"),
    ("10x", "/tmp/sfscale10"),
    ("100x", "/tmp/sfscale100"),
]


def main() -> None:
    from pyspark.sql import functions as F

    from delta_lake_gcp_implementation_spark.operators import curation as cur_ops
    from delta_lake_gcp_implementation_spark.plans.curation import (
        CONTAM_EVAL_MOD,
        CONTAM_K,
        CONTAM_THRESHOLD,
    )
    from delta_lake_gcp_implementation_spark.session import get_spark

    spark = get_spark(app_name="rehearse_contam_fixed_eval")
    spark.sparkContext.setLogLevel("ERROR")

    # FIXED eval set: the sf0.1 catalog split, never scaled
    eval_set = (
        spark.read.parquet(f"{SCALES[0][1]}/documents.parquet")
        .filter(F.col("doc_id") % CONTAM_EVAL_MOD == 0)
        .select("doc_id", "text")
        .localCheckpoint()
    )
    n_eval = eval_set.count()

    # one warmup run so JIT/session startup does not pollute the 1x row
    cur_ops.contamination_pairs(
        eval_set, eval_set, "text", "doc_id", CONTAM_K, CONTAM_THRESHOLD
    ).count()

    prev = None
    for label, path in SCALES:
        corpus = (
            spark.read.parquet(f"{path}/documents.parquet")
            .filter(F.col("doc_id") % CONTAM_EVAL_MOD != 0)
            .select("doc_id", "text")
        )
        best = None
        for _ in range(2):  # best-of-2 (bench variance protocol)
            t0 = time.perf_counter()
            rows = cur_ops.contamination_pairs(
                corpus, eval_set, "text", "doc_id",
                CONTAM_K, CONTAM_THRESHOLD,
            ).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        factor = None if prev is None else round(best / prev, 1)
        print(
            f"{label}: {best:.1f}s  flagged={rows}  eval_docs={n_eval}"
            + (f"  step_factor={factor}" if factor is not None else ""),
            flush=True,
        )
        prev = best
    spark.stop()


if __name__ == "__main__":
    main()
