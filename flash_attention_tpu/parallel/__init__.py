"""Multi-chip scaling: mesh construction, shard_map wrappers, ring attention.

The reference is single-GPU (SURVEY.md §2 parallelism inventory: all absent);
this package provides the TPU-native equivalents over a jax.sharding.Mesh
with XLA collectives on ICI — no hand-written comm backend (the reference had
none either; NCCL would be the CUDA-world analog).
"""
