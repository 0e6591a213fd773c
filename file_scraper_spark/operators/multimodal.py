"""Multimodal (binary column) operators. Placeholder."""
