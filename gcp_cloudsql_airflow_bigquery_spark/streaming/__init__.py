"""Structured Streaming over the ``events`` stream (SURVEY.md §7 M3):
windowed aggregates with watermarks, stateful dedup, custom stateful
operators — plus batch-equivalent forms of every window so correctness
stays oracle-checkable (streaming-only paths get rows-only checks).
"""
