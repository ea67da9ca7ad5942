"""Vectorized (Arrow-batched) column functions for the extraction engine."""
