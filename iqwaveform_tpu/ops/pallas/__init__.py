"""Pallas TPU kernels for hot ops (populated incrementally)."""
