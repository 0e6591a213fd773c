"""Structured Streaming query surface. Placeholder."""
