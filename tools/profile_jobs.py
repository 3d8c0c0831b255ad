"""Per-job profile of catalog keys via the UI REST API (guide §7.1).

Runs each key once with the noop sink, then dumps every Spark job the
key issued (duration, task count, description) so driver-latency-bound
loops, single-task stages and straggler tails are visible.

Usage: SPARK_GRAFT_UI=true python tools/profile_jobs.py key [key ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_UI", "true")

from delta_lake_gcp_implementation_spark.plans import CATALOG
from delta_lake_gcp_implementation_spark.session import get_spark


def main() -> None:
    keys = sys.argv[1:]
    bad = [k for k in keys if k not in CATALOG]
    if bad:
        sys.exit(f"unknown keys: {bad}")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = get_spark(app_name="profile-jobs-r15")
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    warm = "/root/testdata/sf0.001"
    if os.path.isdir(warm):
        CATALOG["star_rollup"].builder(spark, warm).write.format("noop").mode(
            "overwrite"
        ).save()

    def jobs() -> list[dict]:
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs") as r:
            return json.loads(r.read())

    for name in keys:
        n0 = len(jobs())
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        CATALOG[name].builder(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        js = sorted(jobs(), key=lambda j: j["jobId"])[n0:]
        print(f"\n=== {name}: wall={wall:.2f}s jobs={len(js)} ===")
        for j in js:
            try:
                t_sub = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
                t_end = time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
                dur = time.mktime(t_end) - time.mktime(t_sub)
            except Exception:
                dur = -1
            if dur >= 1 or j["numTasks"] <= 2:
                print(
                    f"  job {j['jobId']:4d} {dur:6.0f}s tasks={j['numTasks']:5d} "
                    f"{(j.get('description') or j.get('name', ''))[:90]}"
                )
        sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
