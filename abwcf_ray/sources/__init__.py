"""Corpus fixture generation and parquet layout helpers (the simulated web)."""
