"""Incremental per-round emission (the reference's "stream mode" is
batch-iterative emission, not a time-windowed stream — SURVEY.md §1)."""
