"""Structured Streaming surface.

The reference is batch-CDC only (SURVEY.md section 2.9); this package
exposes its incremental semantics as true streams plus the
event-stream operators (windowed aggregation, sessionization, stateful
counters, stream upsert) a continuous pipeline needs.
"""
