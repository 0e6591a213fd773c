"""Embedding similarity search operators. Placeholder."""
