"""Device compute kernels (JAX/XLA; Pallas variants for the hot paths)."""
