"""Utilities: CSV output parity, profiling, checkpointing."""
