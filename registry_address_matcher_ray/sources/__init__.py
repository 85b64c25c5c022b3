"""Ingest/sink + deterministic synthetic fixture generation."""
