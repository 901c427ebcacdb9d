"""Pallas TPU kernels for the performance-bearing ops.

The reference delegates its hot kernels to NumPy/CuPy/MLX C cores
(SURVEY.md §2.2); the TPU-native equivalent is hand-written Pallas kernels
registered behind the XLA backend's op table, with jnp fallbacks for shapes,
dtypes, or platforms the kernels don't cover.
"""
