"""Compute kernels: host oracles (numpy) and device paths (JAX/Pallas)."""
