"""Compute kernels: viewport transform, escape iteration (jnp + Pallas),
coloring epilogue, extended-precision arithmetic, chaos game."""
