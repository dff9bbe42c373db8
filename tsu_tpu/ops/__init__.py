"""Compute kernels: XLA-compiled reference paths and Pallas TPU kernels."""
