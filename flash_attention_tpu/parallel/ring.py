"""Ring attention: sequence-parallel attention with KV rotation over ICI.

The beyond-chip generalization of the reference's intra-kernel blockwise KV
streaming (the hot loop at flash_attention.cu:417-453): instead of streaming
KV tiles HBM→smem within one GPU, KV *shards* rotate chip→chip around the
mesh's context axis via ``jax.lax.ppermute`` (point-to-point on the ICI ring),
and the per-step partial results combine with the same (m, l, O) merge math as
the reference's split-K merge kernel (flash_attention.cu:575-597) — here the
base-2 LSE form in ops/merge.py.

Causal handling decomposes each ring step by block position, mirroring the
kernel's own three-tier masking (skip / diagonal / full):
  * step 0: the local diagonal chunk → causal kernel
  * step s>0 from an earlier chunk  → full (non-causal) kernel
  * step s>0 from a later chunk     → fully masked → skipped via lax.cond
Communication is point-to-point and overlaps with compute under XLA's
latency-hiding scheduler (the ppermute for step s+1 is independent of step
s's attention).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from flash_attention_tpu.ops.flash_attention import flash_attention
from flash_attention_tpu.ops.merge import merge_two


def ring_flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    axis_name: str,
    causal: bool = False,
    sm_scale: float | None = None,
    block_sizes=None,
):
    """Per-shard ring attention body (call inside shard_map).

    Args:
      q, k, v: the local shards [B, H, S/N, D] — the sequence axis is sharded
        over `axis_name` in ring order (shard i holds positions
        [i*S/N, (i+1)*S/N)).
      axis_name: the mesh context axis forming the ring.

    Returns:
      [B, H, S/N, D] output for the local Q shard.
    """
    n = jax.lax.axis_size(axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    def attend(kv_chunk, step_causal):
        kc, vc = kv_chunk
        return flash_attention(
            q, kc, vc,
            causal=step_causal, sm_scale=sm_scale,
            block_sizes=block_sizes, save_residuals=True,
        )

    # Step 0: local (diagonal) chunk.
    o, lse = attend((k, v), causal)
    o = o.astype(jnp.float32)

    k_blk, v_blk = k, v
    for step in range(1, n):
        # Rotate first; XLA overlaps the ppermute with the previous/next
        # attention kernel since they have no data dependency.
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        if causal:
            # The chunk now held came from shard (my_idx - step) mod n; it is
            # visible iff it holds earlier positions: my_idx >= step.
            visible = my_idx >= step

            def compute(kv):
                return attend(kv, False)

            def skip(kv):
                return (
                    jnp.zeros_like(o, dtype=q.dtype),
                    jnp.full_like(lse, -jnp.inf),
                )

            o_s, lse_s = jax.lax.cond(visible, compute, skip, (k_blk, v_blk))
        else:
            o_s, lse_s = attend((k_blk, v_blk), False)
        o, lse = merge_two(o, lse, o_s, lse_s)

    return o.astype(q.dtype)


def make_ring_attention(
    mesh: Mesh,
    *,
    causal: bool = False,
    sm_scale: float | None = None,
    context_axis: str = "context",
    model_axis: str = "model",
    data_axis: str = "data",
    block_sizes=None,
):
    """jit-wrapped ring attention over [B, H, S, D] with S sharded on the
    context axis, H on the model axis, B on the data axis."""
    spec = P(data_axis, model_axis, context_axis, None)

    body = functools.partial(
        ring_flash_attention,
        axis_name=context_axis,
        causal=causal,
        sm_scale=sm_scale,
        block_sizes=block_sizes,
    )

    def _local(q, k, v):
        return body(q, k, v)

    fn = jax.shard_map(
        _local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )
    return jax.jit(fn)
