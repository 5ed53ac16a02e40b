"""Dedup workload over ``documents`` (filled in below)."""
