"""Reusable operators extracted from the reference's inline SQL.

Each module maps to a SURVEY.md section-2 family:

- ``dedup``      : W1/W2 window dedup + exact/fuzzy document dedup
- ``windows``    : W3 surrogate keys, W4 best-record, W5 LAG audit
- ``joins``      : J1-J5 star/semi/anti join helpers
- ``aggregates`` : A2-A10 rollups, conditional aggs, pct-of-total
- ``validate``   : C1 three-tier validation split
- ``upsert``     : S7-S10 MERGE/UPDATE/DELETE (Delta or join-rewrite)
- ``watermark``  : job_control high-watermark bookkeeping
- ``scd2``       : C7 SCD Type 2 dimension maintenance
- ``similarity`` : embedding cosine top-k / LSH bucketed ANN
"""
