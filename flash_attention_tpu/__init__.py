"""flash_attention_tpu — a TPU-native flash-attention inference engine.

Built from scratch in JAX/Pallas with the capabilities of the
``flash-attention-cuda`` reference (see /root/repo/SURVEY.md): a fused
QKᵀ → online-softmax → PV forward pass (causal + non-causal), an adaptive
block-size dispatcher, split-KV partial attention with log-sum-exp merge,
quantized KV-cache decode, and multi-chip sharding over a ``jax.sharding.Mesh``.

Layout:
  ops/       Pallas kernels + pure-JAX oracle (the compute path)
  models/    attention / transformer modules built on the kernels
  parallel/  mesh, shard_map wrappers, ring attention
  serving/   KV-cache management + continuous batching engine
  runtime/   native (C++) scheduler / allocator components
  utils/     seeded test-input generation, diff checking, benchmarking
"""

from flash_attention_tpu.ops.reference import reference_attention
from flash_attention_tpu.ops.flash_attention import flash_attention
from flash_attention_tpu.ops.tuning import BlockSizes, select_block_sizes

__version__ = "0.1.0"

__all__ = [
    "reference_attention",
    "flash_attention",
    "BlockSizes",
    "select_block_sizes",
]
