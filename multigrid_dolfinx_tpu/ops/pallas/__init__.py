"""Pallas TPU kernels for the hot multigrid ops."""
