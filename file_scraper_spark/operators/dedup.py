"""Deduplication operators (exact + near-dup). Placeholder."""
