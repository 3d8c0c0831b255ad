"""Reusable operators extracted from the reference's inline SQL.

Each module maps to a SURVEY.md section-2 family:

- ``dedup``      : W1/W2 window dedup + exact/MinHash-LSH/Jaccard/
                   SimHash document dedup
- ``windows``    : W3 surrogate keys, W4 best-record, W5 LAG audit
- ``joins``      : J1-J5 star/semi/anti/point-in-time joins + skew
                   tools (salted join, two-phase aggregate)
- ``aggregates`` : A2-A10 rollups, conditional aggs, pct-of-total
- ``multimodal`` : binary media columns, mapInPandas decode/resize/
                   frame stages, content digests

The mutation sinks (S5-S12: MERGE/UPDATE/DELETE, watermark
bookkeeping) live in ``pipeline.storage`` / ``pipeline.medallion``;
vector/text column functions in ``functions.similarity`` /
``functions.text``.
"""
