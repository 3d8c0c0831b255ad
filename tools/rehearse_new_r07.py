"""100x rehearsal for the three round-7 catalog additions.

Times each new key best-of-2 at its sf0.1-equivalent baseline dir and
at the 100x rehearsal dir (docs keys: /tmp/sfscale10, 500k docs /
200k vectors, seed 42 — the same set BENCH_NOTES' round-7 table used;
relational key: /tmp/sfrel100, key-offset 100x replication of sf0.1).

Usage: python tools/rehearse_new_r07.py
Prints one line per (key, dir): wall seconds best-of-2.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

import __spark_entry__ as m

CASES = [
    # (key, baseline sf dir, 100x dir)
    ("dedup_survivorship", "/root/testdata/sf0.1", "/tmp/sfscale10"),
    ("minhash_jaccard_estimate", "/root/testdata/sf0.1", "/tmp/sfscale10"),
    ("repeat_purchase_interval", "/root/testdata/sf0.1", "/tmp/sfrel100"),
]


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    qs = m.queries()
    for key, base, big in CASES:
        for label, d in (("sf0.1", base), ("100x", big)):
            times = []
            for _ in range(2):
                t0 = time.monotonic()
                n = qs[key](spark, d).count()
                times.append(time.monotonic() - t0)
            print(
                f"{key} {label} best2={min(times):.2f}s rows={n}",
                flush=True,
            )


if __name__ == "__main__":
    main()
