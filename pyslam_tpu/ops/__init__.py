"""Batched JAX/Pallas numeric kernels: the TPU compute substrate of the framework."""
