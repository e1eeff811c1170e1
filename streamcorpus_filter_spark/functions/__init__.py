"""Vectorized pandas/Arrow UDF wrappers around the pure kernels."""
