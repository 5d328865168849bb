"""MFU breakdown probe: where does the non-MMA time go at short seq?

Builds a family of stripped kernels at the dispatch shapes (hb-batched,
single KV step, the seq<=768 regime) that add one pipeline stage at a time:

  mma        QK + (s->bf16) @ V                      [MXU floor]
  +max       + row max of s
  +exp2      + p = exp2(s*scale - m)
  +sum       + row sum, 1/l normalize
  +astype    (already in mma via s->bf16; exp2 output astype counted here)
  full       = the real single-step softmax pipeline
  +mask      full + causal iota/cmp/where masking
  perhead    full, but per-head unrolled dots instead of one batched dot

Timing: scan slope fit (utils/benchmarking.scan_timer) — run on a QUIET
machine, one TPU process at a time.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attention_tpu.ops.common import LOG2E, MASK_VALUE, M_FLOOR
from flash_attention_tpu.utils.benchmarking import attention_flops, scan_timer
from flash_attention_tpu.utils.testing import make_qkv


def probe_kernel(q_ref, k_ref, v_ref, o_ref, *, stage: str, scale2: float):
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    if stage == "mma":
        p = s.astype(v.dtype)
    else:
        if stage in ("mask", "full+mask"):
            shape2d = s.shape[1:]
            col = jax.lax.broadcasted_iota(jnp.int32, shape2d, 1)
            row = jax.lax.broadcasted_iota(jnp.int32, shape2d, 0)
            s = jnp.where((col <= row)[None], s, MASK_VALUE)
        m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True) * scale2, M_FLOOR)
        if stage == "max":
            p = (s - m).astype(v.dtype)
        else:
            p32 = jnp.exp2(s * scale2 - m)
            if stage == "exp2":
                p = p32.astype(v.dtype)
            else:  # full / mask
                l = jnp.sum(p32, axis=-1, keepdims=True)
                inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
                p = (p32 * inv).astype(v.dtype)
    pv = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    o_ref[...] = pv.astype(o_ref.dtype)


def perhead_kernel(q_ref, k_ref, v_ref, o_ref, *, scale2: float, hb: int):
    # Same "full" pipeline but unrolled per head: gives Mosaic independent
    # MXU/VPU chains to overlap.
    for h in range(hb):
        q = q_ref[h]
        k = k_ref[h]
        v = v_ref[h]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True) * scale2, M_FLOOR)
        p32 = jnp.exp2(s * scale2 - m)
        l = jnp.sum(p32, axis=-1, keepdims=True)
        inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        p = (p32 * inv).astype(v.dtype)
        pv = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        o_ref[h] = pv.astype(o_ref.dtype)


def run_probe(stage, q, k, v, hb, seq, d, scale2):
    bh = q.shape[0]
    grid = (bh // hb,)
    spec = pl.BlockSpec((hb, seq, d), lambda i: (i, 0, 0))
    if stage == "perhead":
        kern = functools.partial(perhead_kernel, scale2=scale2, hb=hb)
    else:
        kern = functools.partial(probe_kernel, stage=stage, scale2=scale2)
    fn = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((bh, seq, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )
    t = scan_timer(jax.jit(fn), (q, k, v), est_s=30e-6)
    return t


def main():
    print(f"devices: {jax.devices()}")
    heads = 32
    d = 128
    for seq, hb in ((512, 4), (1024, 2)):
        q, k, v = make_qkv(0, 1, heads, seq, d)
        q = q.reshape(heads, seq, d)
        k = k.reshape(heads, seq, d)
        v = v.reshape(heads, seq, d)
        scale2 = (1.0 / d**0.5) * LOG2E
        fl = attention_flops(1, heads, seq, d, causal=False)
        print(f"-- seq={seq} hb={hb} (nc flops {fl/1e9:.2f} GF)")
        for stage in ("mma", "max", "exp2", "full", "mask", "perhead"):
            t = run_probe(stage, q, k, v, hb, seq, d, scale2)
            print(
                f"  {stage:<8s} {t*1e6:8.2f} us  {fl/t/1e12:7.2f} TF"
                f"  ({fl/t/1e12/197*100:5.1f}% roofline)"
            )


if __name__ == "__main__":
    main()
