"""Pallas TPU kernels (hot-path fusions)."""
