"""Structured Streaming surfaces.

The reference is batch-only (SURVEY §2.10) — its closest analogues are
resume/skip-if-exists loops. Here incremental re-index maps to
Trigger.AvailableNow over a docs directory (exactly-once per file via
checkpoint), and the events table gets a watermarked windowed
aggregation as the streaming-analytics surface.
"""

from .incremental import incremental_index, windowed_event_counts  # noqa: F401
