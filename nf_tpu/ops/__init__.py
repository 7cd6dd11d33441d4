"""Pallas TPU kernels for the hot sampling path."""
