"""Pallas TPU kernels for the hot decode path."""
