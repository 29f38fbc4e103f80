"""Checkpoint/resume snapshots (reference state shapes)."""
