"""Compute kernels: Pallas flash attention, decode, merge, quantization, oracle."""
