"""Round-16 per-key measurement harness.

Times catalog keys with the noop sink (best-of-N, same methodology as
bench.py) and captures ``explain('formatted')`` for each into
``plans/r16/<key>_<tag>.txt`` so plan claims are auditable.

Usage:
    python tools/measure_r16.py --tag before [--n 3] key [key ...]
    python tools/measure_r16.py --tag before --all   # every catalog key

Timings print one JSON line per key and a summary JSON at the end; the
explain capture is skipped for keys whose builders mutate throwaway
stores (plan text of the *returned* frame is still captured — that is
the frame the driver checks).
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from delta_lake_gcp_implementation_spark.plans import CATALOG
from delta_lake_gcp_implementation_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True)
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--no-explain", action="store_true")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    keys = list(CATALOG) if args.all else args.keys
    bad = [k for k in keys if k not in CATALOG]
    if bad:
        sys.exit(f"unknown keys: {bad}")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r16",
    )
    os.makedirs(plans_dir, exist_ok=True)

    spark = get_spark(app_name=f"measure-r16-{args.tag}")
    spark.sparkContext.setLogLevel("ERROR")

    # same warmup as bench.py
    warm = "/root/testdata/sf0.001"
    if os.path.isdir(warm):
        CATALOG["star_rollup"].builder(spark, warm).write.format("noop").mode(
            "overwrite"
        ).save()

    timings: dict[str, float] = {}
    for name in keys:
        builder = CATALOG[name].builder
        best = float("inf")
        for _ in range(args.n):
            spark.sparkContext.setJobDescription(f"r16:{args.tag}:{name}")
            t0 = time.perf_counter()
            builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        timings[name] = round(best, 3)
        print(json.dumps({"key": name, "sec": timings[name]}), flush=True)
        if not args.no_explain:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                builder(spark, sf_dir).explain("formatted")
            with open(
                os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w"
            ) as f:
                f.write(buf.getvalue())

    print(json.dumps({
        "tag": args.tag,
        "n": args.n,
        "total": round(sum(timings.values()), 3),
        "queries": timings,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
