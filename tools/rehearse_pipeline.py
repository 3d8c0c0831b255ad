"""100x rehearsal for the medallion/relational family (VERDICT r5
item 7): the r5 100x table covered docs/vectors only; this drives the
reference-shaped pipeline at 100x the reference's daily batch (9M rows
vs 90k) and the headline relational queries on the key-offset 100x
tables from ``gen_scale_rel.py``.

Usage:
    python tools/gen_scale_rel.py /tmp/sfrel100 100   # once
    python tools/rehearse_pipeline.py [n_rows] [rel_dir] [out_jsonl] [label]

Prints one wall-time line per stage; factors vs the sf0.1/90k bench
row are the scale verdict (linear = factor <= data growth).

With ``out_jsonl``/``label`` set, each stage also appends a JSON row
``{"stage", "scale", "rows_per_day", "s"}`` so the pipeline-scale
claims live in a committed artifact (``BENCH_PIPELINE_100X_r{N}.jsonl``)
checkable like the catalog-scale sweep, not only in BENCH_NOTES prose
(r10 verdict item 7).  Run once per scale:

    python tools/rehearse_pipeline.py 90000   /root/testdata/sf0.1 out.jsonl 1x
    python tools/rehearse_pipeline.py 9000000 /tmp/sfrel100        out.jsonl 100x
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REL_QUERIES = [
    "star_rollup",
    "rolling_wau",
    "max_concurrency",
    "topn_revenue",
    "customer_rollup",
    "fact_build",
]


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 9_000_000
    rel_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfrel100"
    out_jsonl = sys.argv[3] if len(sys.argv) > 3 else None
    scale_label = sys.argv[4] if len(sys.argv) > 4 else None
    # passes=2 reproduces the r12 warm protocol in one session: the
    # first medallion pass pays JIT + cold table reads, the second is
    # the comparable measurement; rows carry both (s = warm,
    # s_first_cold = pass 1)
    passes = int(sys.argv[5]) if len(sys.argv) > 5 else 1

    from delta_lake_gcp_implementation_spark.pipeline import (
        fixtures,
        medallion,
    )
    from delta_lake_gcp_implementation_spark.pipeline.storage import TableStore
    from delta_lake_gcp_implementation_spark.plans import CATALOG
    from delta_lake_gcp_implementation_spark.session import get_spark

    spark = get_spark(app_name="rehearse_pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    medallion.RESULT_JSON_ENABLED = False

    def record(stage: str, secs: float, first_cold: float | None = None) -> None:
        print(f"{stage}: {secs:.1f}s", flush=True)
        if out_jsonl:
            row = {
                "stage": stage,
                "scale": scale_label,
                "rows_per_day": n_rows,
                "s": round(secs, 1),
            }
            if first_cold is not None:
                row["s_first_cold"] = round(first_cold, 1)
                row["note"] = (
                    "warm second pass (r12 protocol); s_first_cold "
                    "paid JIT + cold reads"
                )
            with open(out_jsonl, "a") as f:
                f.write(json.dumps(row) + "\n")

    pass_times: list[dict[str, float]] = []

    def clock(label: str, fn) -> None:
        t0 = time.perf_counter()
        fn()
        secs = time.perf_counter() - t0
        pass_times[-1][label] = secs
        if len(pass_times) == passes:
            first = pass_times[0][label] if passes > 1 else None
            record(label, secs, first_cold=first)

    for _ in range(passes):
      pass_times.append({})
      with tempfile.TemporaryDirectory() as tmp:
        store = TableStore(spark, tmp)
        raw = fixtures.generate_day_spark(spark, 1, n_rows)
        clock(
            "medallion_incremental",
            lambda: medallion.run_incremental(store, raw),
        )
        raw2 = fixtures.generate_day_spark(spark, 2, n_rows)
        b2 = medallion.new_batch_id()
        wm = medallion.read_watermark(store, "bronze")
        medallion.validate_bronze(store, raw2, b2, watermark=wm)
        medallion.load_bronze(store, b2)
        medallion.run_silver(store, b2)
        clock(
            "scd2_dim_customer",
            lambda: medallion.scd2_dim_customer(store, b2),
        )
        clock(
            "scd2_dim_merchant",
            lambda: medallion.scd2_dim_merchant(store, b2),
        )
        victim = (
            store.read("silver.transactions")
            .select("customer_id")
            .first()
            .customer_id
        )
        clock(
            "gdpr_dual_delete",
            lambda: medallion.gdpr_delete(store, victim, "BATCH_RH_GDPR"),
        )
        clock(
            "silver_full_refresh",
            lambda: medallion.full_refresh_silver(
                store, "BATCH_RH_FRS", confirm="YES"
            ),
        )
        clock(
            "fact_full_refresh",
            lambda: medallion.full_refresh_fact(
                store, "BATCH_RH_FRF", confirm="YES"
            ),
        )

    if os.path.isdir(rel_dir):
        for name in REL_QUERIES:
            builder = CATALOG[name].builder
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                builder(spark, rel_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            record(name, best)
    else:
        print(f"(skipping relational queries: {rel_dir} missing)")
    spark.stop()


if __name__ == "__main__":
    main()
