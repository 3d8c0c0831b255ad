"""Deterministic dirty payment-data generator (FIXTURES.md section A1).

Reproduces the reference generator's perturbation classes
(``Delta_Lake_Payment_Data_Generator.py:227-258,399-558``, seeded like
``:667-668``) at test scale: per "day", a base batch of clean rows plus
injected Tier-1/2/3 errors, late arrivals, CDC status updates,
intra-batch duplicates, and soft-delete candidates — each with known
counts so scenario tests can assert exact expectations
(``bronze/TESTING_GUIDE.md`` pattern).
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as sqltypes

RAW_SCHEMA = sqltypes.StructType(
    [
        sqltypes.StructField("transaction_id", sqltypes.StringType()),
        sqltypes.StructField("customer_id", sqltypes.StringType()),
        sqltypes.StructField("transaction_timestamp", sqltypes.StringType()),
        sqltypes.StructField("merchant_id", sqltypes.StringType()),
        sqltypes.StructField("merchant_name", sqltypes.StringType()),
        sqltypes.StructField("product_category", sqltypes.StringType()),
        sqltypes.StructField("product_name", sqltypes.StringType()),
        sqltypes.StructField("amount", sqltypes.DoubleType()),
        sqltypes.StructField("fee_amount", sqltypes.DoubleType()),
        sqltypes.StructField("cashback_amount", sqltypes.DoubleType()),
        sqltypes.StructField("loyalty_points", sqltypes.IntegerType()),
        sqltypes.StructField("payment_method", sqltypes.StringType()),
        sqltypes.StructField("transaction_status", sqltypes.StringType()),
        sqltypes.StructField("device_type", sqltypes.StringType()),
        sqltypes.StructField("location_type", sqltypes.StringType()),
        sqltypes.StructField("currency", sqltypes.StringType()),
        sqltypes.StructField("updated_at", sqltypes.StringType()),
    ]
)

CATEGORIES = ["Food", "Electronics", "Travel", "Fashion", "Grocery"]
METHODS = ["UPI", "Credit Card", "Debit Card", "Wallet Balance", "Bank Transfer"]
STATUSES = ["Successful", "Failed", "Pending"]
DEVICES = ["Android", "iOS", "Web"]
LOCATIONS = ["Urban", "Suburban", "Rural"]


def _fmt(ts: datetime) -> str:
    return ts.strftime("%Y-%m-%d %H:%M:%S")


def generate_day_spark(
    spark: SparkSession, day: int, n_base: int = 90_000
) -> DataFrame:
    """Spark-native large day batch for BENCHMARKS (distributed
    generation via ``range()`` + column expressions — no driver-side
    row list).  Same schema and dirty-data classes as
    :func:`generate_day` at approximately the reference generator's
    rates (Tier-1 0.67%, Tier-2 ~0.6%, Tier-3 1.33%, dups, CDC
    updates); counts are rate-based, not exact — scenario tests use
    :func:`generate_day` instead."""
    from pyspark.sql import functions as F

    d = f"2024-03-{day:02d}"
    base = spark.range(n_base).select(
        F.col("id"),
        F.xxhash64(F.col("id") + F.lit(day * 1_000_003)).alias("h"),
    ).select(
        "id",
        "h",
        F.pmod(F.col("h"), 10_000).alias("r4"),  # 0..9999 rate dial
        (F.lit(f"{d} 08:00:00").cast("timestamp")
         + F.make_interval(secs=F.pmod(F.col("h"), 36_000))).alias("ts"),
    )
    status = (
        F.when(F.pmod(F.col("h"), 100) < 95, "Successful")
        .when(F.pmod(F.col("h"), 100) < 99, "Failed")
        .otherwise("Pending")
    )
    amount = F.round(100.0 + F.pmod(F.col("h"), 49_900_00) / 100.0, 2)
    df = base.select(
        # Tier-1 NULL id at ~0.17%; whitespace id at ~0.05%
        F.when(F.col("r4") < 17, F.lit(None).cast("string"))
        .when(F.col("r4") < 22, F.concat(F.lit("TXN BAD "), F.col("id")))
        .otherwise(F.concat(F.lit(f"TXN_202403{day:02d}_"), F.col("id")))
        .alias("transaction_id"),
        F.concat(F.lit("USER_"), F.lpad(F.pmod(F.col("h"), 1000) + 1, 4, "0"))
        .alias("customer_id"),
        # Tier-1 NULL ts ~0.17%; future ts ~0.17%
        F.when(F.col("r4").between(22, 38), F.lit(None))
        .when(F.col("r4").between(39, 55),
              F.date_format(F.col("ts") + F.expr("INTERVAL 36500 DAYS"),
                            "yyyy-MM-dd HH:mm:ss"))
        .otherwise(F.date_format("ts", "yyyy-MM-dd HH:mm:ss"))
        .alias("transaction_timestamp"),
        # Tier-2 unknown merchant ~0.3%
        F.when(F.col("r4").between(56, 85),
               F.concat(F.lit("MERCH_9"), F.lpad(F.pmod(F.col("h"), 900) + 100, 3, "0")))
        .otherwise(F.concat(F.lit("MERCH_"), F.lpad(F.pmod(F.col("h"), 500) + 1, 4, "0")))
        .alias("merchant_id"),
        F.concat(F.lit("Brand"), F.pmod(F.col("h"), 34) + 1).alias("merchant_name"),
        F.element_at(
            F.array(*[F.lit(c) for c in CATEGORIES]),
            (F.pmod(F.col("h"), len(CATEGORIES)) + 1).cast("int"),
        ).alias("product_category"),
        # Tier-3 NULL product ~0.44%
        F.when(F.col("r4").between(86, 129), F.lit(None))
        .otherwise(F.concat(F.lit("product_"), F.pmod(F.col("h"), 5)))
        .alias("product_name"),
        # Tier-1 NULL amount ~0.17%; Tier-2 negative ~0.3%
        F.when(F.col("r4").between(130, 146), F.lit(None).cast("double"))
        .when(F.col("r4").between(147, 176), -amount)
        .otherwise(amount)
        .alias("amount"),
        F.round(amount * 0.02, 2).alias("fee_amount"),
        F.when(status == "Successful", F.round(amount * 0.03, 2))
        .otherwise(F.lit(0.0))
        .alias("cashback_amount"),
        F.when(status == "Successful", F.pmod(F.col("h"), 500).cast("int"))
        .otherwise(F.lit(0))
        .alias("loyalty_points"),
        F.element_at(
            F.array(*[F.lit(m) for m in METHODS]),
            (F.pmod(F.col("h"), len(METHODS)) + 1).cast("int"),
        ).alias("payment_method"),
        status.alias("transaction_status"),
        # Tier-3 NULL device/location ~0.9%
        F.when(F.col("r4").between(177, 221), F.lit(None))
        .otherwise(F.element_at(F.array(*[F.lit(x) for x in DEVICES]),
                                (F.pmod(F.col("h"), 3) + 1).cast("int")))
        .alias("device_type"),
        F.when(F.col("r4").between(222, 266), F.lit(None))
        .otherwise(F.element_at(F.array(*[F.lit(x) for x in LOCATIONS]),
                                (F.pmod(F.col("h"), 3) + 1).cast("int")))
        .alias("location_type"),
        F.lit("INR").alias("currency"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("updated_at"),
    )
    return df


class DayBatch:
    """One day's raw CSV-shaped batch with known injected-count bookkeeping."""

    def __init__(self, rows: list[tuple], counts: dict[str, int]):
        self.rows = rows
        self.counts = counts

    def df(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(self.rows, RAW_SCHEMA)


def generate_day(
    day: int,
    n_base: int = 200,
    n_tier1: int = 4,
    n_tier2: int = 6,
    n_tier3: int = 3,
    n_late: int = 5,
    n_updates: int = 8,
    n_dups: int = 4,
    seed: int = 42,
) -> DayBatch:
    """Deterministic batch for ``day`` (1-based).  Injection counts are
    explicit so tests assert exact quarantine/flag/dedup numbers.

    CDC updates (day >= 2) re-emit day-1 transaction ids with a fresh
    ``updated_at`` and status flipped to Successful, mirroring the
    generator's status-update stream (``:490-509``).
    """
    rng = random.Random(seed * 1000 + day)
    base_date = datetime(2024, 3, day, 8, 0, 0)
    rows: list[tuple] = []

    def mk(seq: int, *, day_of: int | None = None, status: str | None = None,
           updated: datetime | None = None) -> tuple:
        d = day_of if day_of is not None else day
        ts = datetime(2024, 3, d, 8, 0, 0) + timedelta(
            seconds=rng.randint(0, 3600 * 10)
        )
        status = status or rng.choices(STATUSES, weights=[95, 4, 1])[0]
        amount = round(rng.uniform(100, 50000), 2)
        fee = round(amount * rng.uniform(0.015, 0.03), 2)
        cashback = round(amount * rng.uniform(0, 0.05), 2) if status == "Successful" else 0.0
        loyalty = int(amount / rng.uniform(10, 20)) if status == "Successful" else 0
        cat = rng.choice(CATEGORIES)
        return (
            f"TXN_202403{d:02d}_{seq:06d}",
            f"USER_{rng.randint(1, 50):04d}",
            _fmt(ts),
            f"MERCH_{rng.randint(1, 30):04d}",
            f"Brand{rng.randint(1, 20)}",
            cat,
            f"{cat}_product_{rng.randint(1, 5)}",
            amount,
            fee,
            cashback,
            loyalty,
            rng.choices(METHODS, weights=[60, 15, 15, 7, 3])[0],
            status,
            rng.choice(DEVICES),
            rng.choice(LOCATIONS),
            "INR",
            _fmt(updated if updated is not None else ts),
        )

    for i in range(n_base):
        rows.append(mk(i))

    # Tier-1: NULL id / NULL amount / NULL ts / future ts (quarantined)
    for i in range(n_tier1):
        r = list(mk(10000 + i))
        kind = i % 4
        if kind == 0:
            r[0] = None
        elif kind == 1:
            r[7] = None
        elif kind == 2:
            r[2] = None
        else:
            # far enough ahead to beat the wall clock (the Tier-1 rule
            # compares against CURRENT_TIMESTAMP, validate_bronze.py:104)
            r[2] = _fmt(base_date + timedelta(days=36500))
        rows.append(tuple(r))

    # Tier-2: negative amount / unknown merchant (loaded + flagged)
    for i in range(n_tier2):
        r = list(mk(20000 + i))
        if i % 2 == 0:
            r[7] = -abs(r[7])
        else:
            r[3] = f"MERCH_9{rng.randint(100, 999)}"
        rows.append(tuple(r))

    # Tier-3: NULL device/location/product (COALESCE-fixed)
    for i in range(n_tier3):
        r = list(mk(30000 + i))
        r[[13, 14, 6][i % 3]] = None
        rows.append(tuple(r))

    # Late arrivals: old event time, fresh updated_at
    for i in range(n_late):
        old_day = max(day - 2, 1)
        r = mk(40000 + i, day_of=old_day, updated=base_date + timedelta(hours=2))
        rows.append(r)

    # CDC status updates: re-emit day-1 ids with fresh updated_at
    n_updates_emitted = 0
    if day >= 2:
        for i in range(n_updates):
            r = list(
                mk(i, day_of=1, status="Successful",
                   updated=base_date + timedelta(hours=3))
            )
            # keep the day-1 transaction id AND its original event time
            rows.append(tuple(r))
            n_updates_emitted += 1

    # Exact intra-batch duplicates: copy of an existing row
    for i in range(n_dups):
        rows.append(rows[i])

    return DayBatch(
        rows,
        {
            "base": n_base,
            "tier1": n_tier1,
            "tier2": n_tier2,
            "tier3": n_tier3,
            "late": n_late,
            "updates": n_updates_emitted,
            "dups": n_dups,
            "total": len(rows),
        },
    )
