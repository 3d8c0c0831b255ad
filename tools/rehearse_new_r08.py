"""100x rehearsals for round 8: the composed corpus-ingest pipeline
(r7 verdict item 3 — its primitives were rehearsed individually, but
the end-to-end 9-table-write composition was not) plus the four new
r8 catalog keys.

Dirs follow the round-7 convention:
- /tmp/sfscale10 — 500k docs / 200k vectors, bootstrap-resampled from
  sf0.1 (``gen_scale_docs.py /tmp/sfscale10 100``, seed 42);
- /tmp/sfrel100 — key-offset 100x replication of the relational
  tables (``gen_scale_rel.py /tmp/sfrel100 100``).

Usage: python tools/rehearse_new_r08.py [keys...]
Prints one line per (key, dir): wall seconds best-of-2 (single run
for corpus_ingest_verdict at 100x — it is a full pipeline, not a
query; in-session variance is amortized by its own length).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

import __spark_entry__ as m

CASES = [
    # (key, baseline sf dir, 100x dir, runs_at_100x)
    ("corpus_ingest_verdict", "/root/testdata/sf0.1", "/tmp/sfscale10", 1),
    ("url_canonical_dedup", "/root/testdata/sf0.1", "/tmp/sfscale10", 2),
    ("lsh_dedup_recall", "/root/testdata/sf0.1", "/tmp/sfscale10", 2),
    ("grouped_approx_distinct", "/root/testdata/sf0.1", "/tmp/sfrel100", 2),
    ("quarantine_reprocess", "/root/testdata/sf0.1", "/tmp/sfrel100", 2),
]


def main() -> None:
    only = set(sys.argv[1:])
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = m.queries()
    for key, base, big, big_runs in CASES:
        if only and key not in only:
            continue
        for label, d, runs in (("sf0.1", base, 2), ("100x", big, big_runs)):
            times = []
            n = 0
            for _ in range(runs):
                t0 = time.monotonic()
                n = qs[key](spark, d).count()
                times.append(time.monotonic() - t0)
            print(
                f"{key} {label} best{runs}={min(times):.2f}s rows={n}",
                flush=True,
            )


if __name__ == "__main__":
    main()
