"""Objective math: jnp oracle losses and fused Pallas kernels."""
