"""Shared numerics constants + helpers for the attention kernels.

Numerics policy (SURVEY.md §5): fp32 accumulators, exp2-domain softmax with
log2(e) folded into the scale (the reference folds it the same way,
flash_attention.cu:239), and a large finite negative mask value rather than
-inf (the reference uses -10000, flash_attention.cu:238 — ours is fp32-scaled
so exp2 of it underflows to exactly 0).
"""

from __future__ import annotations

import jax.numpy as jnp

LOG2E = 1.4426950408889634
MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
LANES = 128


def ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m
