"""Forward operators and compute kernels."""
