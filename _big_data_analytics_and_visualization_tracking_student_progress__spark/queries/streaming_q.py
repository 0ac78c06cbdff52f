"""Streaming query registrations (Structured Streaming over the events
fixture) — filled in incrementally."""
