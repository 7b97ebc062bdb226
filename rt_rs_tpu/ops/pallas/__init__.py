"""Pallas TPU kernels (the hot compute path)."""
