"""Generate an Nx-scale rehearsal copy of the RELATIONAL tables
(orders/lineitem/customer/supplier/part/events) by key-offset
replication — VERDICT r5 item 7's missing medallion/relational 100x
rehearsal data.

Each replica shifts every surrogate key by ``rep * (max_key + 1)`` so
join fan-outs, key cardinalities and group sizes scale linearly with
the data (a naive UNION of identical copies would instead multiply
duplicate keys, turning every join into an Nx fan-out — a different,
wrong workload).  Dates/timestamps are left untouched: per-day group
counts keep their real cardinality, per-day group SIZES grow Nx, which
is exactly the 100-TB shape (more users per day, same days).

nation/region (fixed 25/5-row dims) and documents/embeddings (covered
by gen_scale_docs.py) are copied/symlinked as-is.

Usage: python tools/gen_scale_rel.py [out_dir] [scale]
Default out_dir=/tmp/sfrel100, scale=100 (from sf0.1: 60M lineitem,
15M orders, 10M events).  Deterministic (pure key arithmetic).
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"

# per-table key columns to offset, keyed by the base that drives them
KEYED = {
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "events": {"event_id": "events", "user_id": "events_user"},
}
KEY_OF = {
    "orders": "o_orderkey",
    "customer": "c_custkey",
    "part": "p_partkey",
    "supplier": "s_suppkey",
    "events": "event_id",
    "events_user": "user_id",
}
COPY_AS_IS = ["nation", "region", "documents", "embeddings"]


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfrel100"
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    os.makedirs(out, exist_ok=True)

    from pyspark.sql import functions as F

    from delta_lake_gcp_implementation_spark.session import get_spark
    from delta_lake_gcp_implementation_spark.tables import load_table

    spark = get_spark(app_name="gen_scale_rel")
    spark.sparkContext.setLogLevel("ERROR")

    bases: dict[str, int] = {}
    for base_name, key_col in KEY_OF.items():
        tbl = "events" if base_name == "events_user" else base_name
        df = load_table(spark, SRC, tbl)
        bases[base_name] = int(
            df.agg(F.max(key_col).alias("m")).first().m
        ) + 1

    reps = spark.range(scale).withColumnRenamed("id", "__rep")
    for tbl, keymap in KEYED.items():
        # load_table normalizes events' TIMESTAMP(NANOS) to native
        # micros, so the rehearsal copy reads on any plain session
        df = load_table(spark, SRC, tbl)
        big = df.crossJoin(F.broadcast(reps))
        for col, base_name in keymap.items():
            big = big.withColumn(
                col, F.col(col) + F.col("__rep") * bases[base_name]
            )
        n_files = max(8, min(64, scale))
        (
            big.drop("__rep")
            .repartition(n_files)
            .write.mode("overwrite")
            .parquet(f"{out}/{tbl}.parquet")
        )
        print(f"{tbl}: x{scale} written", flush=True)
    for tbl in COPY_AS_IS:
        dst = f"{out}/{tbl}.parquet"
        if os.path.exists(dst):
            if os.path.isdir(dst) and not os.path.islink(dst):
                shutil.rmtree(dst)
            else:
                os.remove(dst)
        shutil.copyfile(f"{SRC}/{tbl}.parquet", dst)
    spark.stop()
    print(f"done -> {out}")


if __name__ == "__main__":
    main()
