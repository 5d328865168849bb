"""Paged KV-cache attention (block-table decode) — Pallas TPU kernel.

Serving engines fragment KV memory unless the cache is paged: fixed-size
pages owned by a free-list allocator (native/src/scheduler.cpp's page
allocator), with each sequence holding a page table instead of a contiguous
region. This module is the TPU-native kernel side: the page table rides the
scalar-prefetch channel (pltpu.PrefetchScalarGridSpec) so each grid step DMAs
exactly one physical page of K and V — the same mechanism the dense decode
kernel (ops/decode.py) uses for its length-clamped block maps, extended one
level of indirection.

Relation to the reference: the reference has no serving layer at all
(SURVEY.md §2); this extends its latent split-KV machinery (flash_attention.
cu:169-180) to production cache management. Numerics are the shared contract
(ops/common.py): fp32 accumulators, exp2-domain online softmax, base-2 LSE
residuals compatible with ops/merge.py.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attention_tpu.ops.common import LANES, LOG2E, MASK_VALUE, ceil_to

MIN_GROUP_BLOCK = 16  # bf16 sublane tile height


class PagedKVCache(NamedTuple):
    """Paged KV storage.

    k_pages, v_pages: [num_pages, kv_heads, page_size, head_dim].
    page_table: [num_slots, pages_per_slot] int32 — physical page id per
      logical page; entries past the sequence's last page are unused (any
      value; the kernel clamps and predicates on ``lengths``).
    lengths: [num_slots] int32 — valid tokens per slot.
    """

    k_pages: jax.Array
    v_pages: jax.Array
    page_table: jax.Array
    lengths: jax.Array

    @property
    def page_size(self) -> int:
        return self.k_pages.shape[2]

    @property
    def pages_per_slot(self) -> int:
        return self.page_table.shape[1]


def init_paged_cache(
    *,
    num_pages: int,
    num_slots: int,
    pages_per_slot: int,
    kv_heads: int,
    page_size: int = 512,
    head_dim: int = 128,
    dtype=jnp.bfloat16,
) -> PagedKVCache:
    shape = (num_pages, kv_heads, page_size, head_dim)
    return PagedKVCache(
        k_pages=jnp.zeros(shape, dtype),
        v_pages=jnp.zeros(shape, dtype),
        page_table=jnp.zeros((num_slots, pages_per_slot), jnp.int32),
        lengths=jnp.zeros((num_slots,), jnp.int32),
    )


def paged_write_tokens(
    cache: PagedKVCache,
    k_new: jax.Array,
    v_new: jax.Array,
    slots: jax.Array,
) -> PagedKVCache:
    """Append ONE token of K/V per listed slot at its current length.

    k_new, v_new: [n, kv_heads, head_dim]; slots: [n] int32. Returns the
    updated cache (lengths advanced by 1 for the listed slots).
    """
    page_size = cache.page_size

    def write_one(carry, x):
        k_pages, v_pages, lengths = carry
        kt, vt, slot = x
        pos = lengths[slot]
        # Clamp: a slot at capacity (or an inactive slot whose length froze at
        # its final value) must not index past its page table — the write
        # lands in its last page's tail and is masked by ``lengths``.
        logical = jnp.minimum(pos // page_size, cache.pages_per_slot - 1)
        offset = pos % page_size
        phys = cache.page_table[slot, logical]
        k_pages = jax.lax.dynamic_update_slice(
            k_pages, kt[None, :, None, :].astype(k_pages.dtype), (phys, 0, offset, 0)
        )
        v_pages = jax.lax.dynamic_update_slice(
            v_pages, vt[None, :, None, :].astype(v_pages.dtype), (phys, 0, offset, 0)
        )
        lengths = lengths.at[slot].add(1)
        return (k_pages, v_pages, lengths), ()

    (k_pages, v_pages, lengths), _ = jax.lax.scan(
        write_one,
        (cache.k_pages, cache.v_pages, cache.lengths),
        (k_new, v_new, slots),
    )
    return cache._replace(k_pages=k_pages, v_pages=v_pages, lengths=lengths)


def paged_write_prefill(
    cache: PagedKVCache,
    k_new: jax.Array,
    v_new: jax.Array,
    slot,
    true_len,
) -> PagedKVCache:
    """Write a [kv_heads, T, head_dim] prefill K/V into ``slot``'s pages.

    T must be a multiple of the page size (pad the prefill; extra rows land in
    allocated pages and are masked by ``lengths``). ``true_len`` sets the
    slot's valid length.
    """
    page_size = cache.page_size
    t = k_new.shape[1]
    if t % page_size:
        raise ValueError(f"prefill length {t} not a multiple of page_size {page_size}")
    n_pages = t // page_size

    def write_page(carry, i):
        k_pages, v_pages = carry
        phys = cache.page_table[slot, i]
        ks = jax.lax.dynamic_slice(
            k_new, (0, i * page_size, 0), (k_new.shape[0], page_size, k_new.shape[2])
        )
        vs = jax.lax.dynamic_slice(
            v_new, (0, i * page_size, 0), (v_new.shape[0], page_size, v_new.shape[2])
        )
        k_pages = jax.lax.dynamic_update_slice(
            k_pages, ks[None].astype(k_pages.dtype), (phys, 0, 0, 0)
        )
        v_pages = jax.lax.dynamic_update_slice(
            v_pages, vs[None].astype(v_pages.dtype), (phys, 0, 0, 0)
        )
        return (k_pages, v_pages), ()

    (k_pages, v_pages), _ = jax.lax.scan(
        write_page, (cache.k_pages, cache.v_pages), jnp.arange(n_pages)
    )
    lengths = cache.lengths.at[slot].set(jnp.asarray(true_len, jnp.int32))
    return cache._replace(k_pages=k_pages, v_pages=v_pages, lengths=lengths)


def _paged_decode_kernel(
    lengths_ref,  # scalar prefetch: [S] int32
    table_ref,  # scalar prefetch: [S * pages_per_slot] int32 (flattened)
    q_ref,  # [1, 1, Gp, D]
    k_ref,  # [1, 1, page, D]  (one physical page, head-sliced)
    v_ref,
    o_ref,  # [1, 1, Gp, D]
    lse_ref,  # [1, 1, Gp, LANES] or None
    m_scr,
    l_scr,
    acc_scr,
    *,
    scale2: float,
    page_size: int,
    pages_per_slot: int,
    window: int | None = None,
    softcap_in: float | None = None,
    softcap_out: float | None = None,
):
    b = pl.program_id(0)
    ip = pl.program_id(2)
    length = lengths_ref[b]

    @pl.when(ip == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    if window is None:
        live = ip * page_size < length
    else:
        live = jnp.logical_and(
            ip * page_size < length, (ip + 1) * page_size > length - window
        )

    @pl.when(live)
    def _compute():
        q = q_ref[0, 0]  # [Gp, D]
        k = k_ref[0, 0]  # [page, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [Gp, page]
        if softcap_in is not None:
            s = jnp.tanh(s * softcap_in) * softcap_out
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ip * page_size
        ok = col < length
        if window is not None:
            ok = jnp.logical_and(ok, col >= length - window)
        s = jnp.where(ok, s, MASK_VALUE)

        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=-1, keepdims=True) * scale2
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s * scale2 - m_next[:, :1])
        l_scr[...] = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        m_scr[...] = m_next

        v = v_ref[0, 0]
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv

    @pl.when(ip == pages_per_slot - 1)
    def _epilogue():
        l = l_scr[...][:, :1]
        inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        o_ref[0, 0] = (acc_scr[...] * inv).astype(o_ref.dtype)
        if lse_ref is not None:
            m = m_scr[...][:, :1]
            safe_l = jnp.where(l == 0.0, 1.0, l)
            lse2 = jnp.where(l == 0.0, -jnp.inf, m + jnp.log2(safe_l))
            lse_ref[0, 0] = jnp.broadcast_to(lse2, lse_ref.shape[2:])


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale", "save_residuals", "interpret", "sliding_window",
        "logit_softcap",
    ),
)
def paged_decode_attention(
    q: jax.Array,
    cache: PagedKVCache,
    *,
    sm_scale: float | None = None,
    save_residuals: bool = False,
    interpret: bool | None = None,
    sliding_window: int | None = None,
    logit_softcap: float | None = None,
):
    """Single-token decode over the paged cache.

    Args:
      q: [num_slots, q_heads, head_dim] current-token queries (all slots; the
        caller masks out inactive slots via lengths == 0 or ignores outputs).
      cache: PagedKVCache; q_heads % kv_heads == 0 (GQA grouped as in
        ops/decode.py — group rows become MXU matmul rows).

    Returns:
      [num_slots, q_heads, head_dim] attention output (+ base-2 LSE
      [num_slots, q_heads] when save_residuals).
    """
    num_slots, num_q_heads, head_dim = q.shape
    num_pages, num_kv_heads, page_size, _ = cache.k_pages.shape
    pages_per_slot = cache.pages_per_slot
    if num_q_heads % num_kv_heads:
        raise ValueError(f"q_heads={num_q_heads} % kv_heads={num_kv_heads} != 0")
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(head_dim)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    group = num_q_heads // num_kv_heads
    group_pad = max(ceil_to(group, 8), MIN_GROUP_BLOCK)
    d_pad = ceil_to(head_dim, 128)

    qg = q.reshape(num_slots, num_kv_heads, group, head_dim)
    if group_pad != group or d_pad != head_dim:
        qg = jnp.pad(
            qg, ((0, 0), (0, 0), (0, group_pad - group), (0, d_pad - head_dim))
        )
    k_pages, v_pages = cache.k_pages, cache.v_pages
    if d_pad != head_dim:
        pads = ((0, 0), (0, 0), (0, 0), (0, d_pad - head_dim))
        k_pages = jnp.pad(k_pages, pads)
        v_pages = jnp.pad(v_pages, pads)
    # [P, H, page, D] -> [H, P, page, D]: head-major so one (head, page) block
    # is contiguous per grid step.
    k_hp = jnp.swapaxes(k_pages, 0, 1)
    v_hp = jnp.swapaxes(v_pages, 0, 1)

    table_flat = cache.page_table.reshape(-1).astype(jnp.int32)
    lengths = cache.lengths.astype(jnp.int32)

    def last_live(b, lengths_ref):
        return jnp.maximum(pl.cdiv(lengths_ref[b], page_size) - 1, 0)

    def kv_map(b, h, ip, lengths_ref, table_ref):
        ip_c = jnp.minimum(ip, last_live(b, lengths_ref))
        if sliding_window is not None:
            lo = jnp.maximum(lengths_ref[b] - sliding_window, 0) // page_size
            ip_c = jnp.maximum(ip_c, lo)
        return (h, table_ref[b * pages_per_slot + ip_c], 0, 0)

    q_spec = pl.BlockSpec(
        (1, 1, group_pad, d_pad), lambda b, h, ip, L, T: (b, h, 0, 0)
    )
    kv_spec = pl.BlockSpec((1, 1, page_size, d_pad), kv_map)
    out_shapes = [
        jax.ShapeDtypeStruct((num_slots, num_kv_heads, group_pad, d_pad), q.dtype)
    ]
    out_specs = [
        pl.BlockSpec((1, 1, group_pad, d_pad), lambda b, h, ip, L, T: (b, h, 0, 0))
    ]
    if save_residuals:
        out_shapes.append(
            jax.ShapeDtypeStruct(
                (num_slots, num_kv_heads, group_pad, LANES), jnp.float32
            )
        )
        out_specs.append(
            pl.BlockSpec(
                (1, 1, group_pad, LANES), lambda b, h, ip, L, T: (b, h, 0, 0)
            )
        )

    def wrapped(lengths_ref, table_ref, q_r, k_r, v_r, *rest):
        if save_residuals:
            o_r, lse_r = rest[0], rest[1]
            scr = rest[2:]
        else:
            o_r, lse_r = rest[0], None
            scr = rest[1:]
        _paged_decode_kernel(
            lengths_ref, table_ref, q_r, k_r, v_r, o_r, lse_r, *scr,
            scale2=sm_scale * LOG2E,
            page_size=page_size,
            pages_per_slot=pages_per_slot,
            window=sliding_window,
            softcap_in=None if logit_softcap is None else sm_scale / logit_softcap,
            softcap_out=None if logit_softcap is None else logit_softcap / sm_scale,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_slots, num_kv_heads, pages_per_slot),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((group_pad, LANES), jnp.float32),
            pltpu.VMEM((group_pad, LANES), jnp.float32),
            pltpu.VMEM((group_pad, d_pad), jnp.float32),
        ],
    )

    results = pl.pallas_call(
        wrapped,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths, table_flat, qg, k_hp, v_hp)

    out = results[0][:, :, :group, :head_dim].reshape(
        num_slots, num_q_heads, head_dim
    )
    if save_residuals:
        lse2 = results[1][:, :, :group, 0].reshape(num_slots, num_q_heads)
        return out, lse2
    return out
