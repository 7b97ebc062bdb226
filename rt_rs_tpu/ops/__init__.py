"""Compute ops: intersection tests, shading, and Pallas kernels."""
