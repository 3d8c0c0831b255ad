"""Medallion pipeline (Bronze -> Silver -> Gold) — the reference's
composite algorithms C1-C10 (SURVEY.md section 2.11) re-expressed
Spark-first and locally runnable.

Modules:

- ``storage``  — table store: append/overwrite/upsert/delete, Delta
  MERGE when available, join-rewrite fallback otherwise (same
  observable state, SURVEY.md section 4 note (a)).
- ``fixtures`` — deterministic dirty payment-data generator
  (FIXTURES.md section A1 perturbation classes).
- ``medallion`` — the stage functions: C1 validation split, C2
  incremental load, C3 backfill, C4 full refresh, C5 CDC collapse,
  C6 GDPR dual delete, C7 SCD2 dims, C8 fact build, C9/C10 static +
  date dims, and the in-process runner that replaces Airflow.
"""
