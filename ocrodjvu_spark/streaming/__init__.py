"""Structured Streaming face of the extraction pipeline."""
