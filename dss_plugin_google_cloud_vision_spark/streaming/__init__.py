"""Structured Streaming wrappers: incremental extraction over arriving page
files with exactly-once checkpointing (Trigger.AvailableNow)."""
