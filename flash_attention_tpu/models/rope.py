"""Rotary position embeddings (decode-aware).

Not in the reference (pure attention kernel), but required for the serving
model family the north-star targets (7B-class LLaMA-style decoding).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rope_frequencies(head_dim: int, *, theta: float = 10000.0) -> jax.Array:
    return 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )


def apply_rope(
    x: jax.Array,
    positions: jax.Array,
    *,
    theta: float = 10000.0,
) -> jax.Array:
    """Rotate [..., seq, head_dim] by per-position angles.

    positions: broadcastable to [..., seq] (int32) — absolute token positions,
    so prefill and single-token decode share one code path.
    """
    head_dim = x.shape[-1]
    freqs = rope_frequencies(head_dim, theta=theta)  # [D/2]
    angles = positions[..., None].astype(jnp.float32) * freqs  # [..., seq, D/2]
    cos = jnp.cos(angles)
    sin = jnp.sin(angles)
    x1 = x[..., 0::2].astype(jnp.float32)
    x2 = x[..., 1::2].astype(jnp.float32)
    r1 = x1 * cos - x2 * sin
    r2 = x1 * sin + x2 * cos
    out = jnp.stack([r1, r2], axis=-1).reshape(x.shape)
    return out.astype(x.dtype)
