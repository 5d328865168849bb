"""Isolate the gap between the real flash_attention path and a bare
pallas_call with the identical single-step kernel body.

Suspects: the custom_vjp wrapper, the 4D->3D reshape/slice, unused scratch,
the extra grid dims, cost_estimate, dimension semantics.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attention_tpu.ops.common import LANES, LOG2E, M_FLOOR
from flash_attention_tpu.ops.flash_attention import flash_attention
from flash_attention_tpu.ops.tuning import BlockSizes
from flash_attention_tpu.utils.benchmarking import attention_flops, scan_timer
from flash_attention_tpu.utils.testing import make_qkv


def single_step_kernel(q_ref, k_ref, v_ref, o_ref, *, scale2: float):
    # Byte-for-byte the real kernel's single_step branch (no mask case).
    q = q_ref[...]
    k = k_ref[...]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True) * scale2, M_FLOOR)
    p = jnp.exp2(s * scale2 - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    v = v_ref[...]
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
    o_ref[...] = (pv * inv).astype(o_ref.dtype)


def bare(q, k, v, hb, *, grid3=False, scratch=False, cost=False, semantics=None):
    bh, seq, d = q.shape
    scale2 = (1.0 / d**0.5) * LOG2E
    kern = functools.partial(single_step_kernel, scale2=scale2)
    if grid3:
        grid = (bh // hb, 1, 1)
        spec = pl.BlockSpec((hb, seq, d), lambda i, a, b: (i, 0, 0))
        sem = semantics or ("parallel", "parallel", "arbitrary")
    else:
        grid = (bh // hb,)
        spec = pl.BlockSpec((hb, seq, d), lambda i: (i, 0, 0))
        sem = semantics or ("parallel",)
    kwargs = {}
    if scratch:
        kwargs["scratch_shapes"] = [
            pltpu.VMEM((hb, seq, LANES), jnp.float32),
            pltpu.VMEM((hb, seq, LANES), jnp.float32),
            pltpu.VMEM((hb, seq, d), jnp.float32),
        ]
        base_kern = kern
        kern = lambda q_r, k_r, v_r, o_r, m_s, l_s, a_s: base_kern(q_r, k_r, v_r, o_r)
    if cost:
        fl = 4 * bh * seq * seq * d
        kwargs["cost_estimate"] = pl.CostEstimate(
            flops=fl,
            bytes_accessed=q.size * 2 * 4,
            transcendentals=bh * seq * seq,
        )
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((bh, seq, d), q.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=sem),
        **kwargs,
    )(q, k, v)


def main():
    print(f"devices: {jax.devices()}")
    heads, d = 32, 128
    for seq, hb in ((512, 4), (1024, 2)):
        q4, k4, v4 = make_qkv(0, 1, heads, seq, d)
        q = q4.reshape(heads, seq, d)
        k = k4.reshape(heads, seq, d)
        v = v4.reshape(heads, seq, d)
        fl = attention_flops(1, heads, seq, d, causal=False)
        variants = {
            "bare": lambda q, k, v: bare(q, k, v, hb),
            "bare+grid3": lambda q, k, v: bare(q, k, v, hb, grid3=True),
            "bare+scratch": lambda q, k, v: bare(q, k, v, hb, scratch=True),
            "bare+cost": lambda q, k, v: bare(q, k, v, hb, cost=True),
            "bare+all": lambda q, k, v: bare(
                q, k, v, hb, grid3=True, scratch=True, cost=True
            ),
        }
        print(f"-- seq={seq} hb={hb}")
        for name, fn in variants.items():
            t = scan_timer(jax.jit(fn), (q, k, v), est_s=30e-6)
            print(f"  {name:<14s} {t*1e6:8.2f} us  {fl/t/1e12:7.2f} TF")
        t = scan_timer(
            jax.jit(lambda q, k, v: flash_attention(q, k, v, causal=False)),
            (q4, k4, v4),
            est_s=30e-6,
        )
        print(f"  {'real':<14s} {t*1e6:8.2f} us  {fl/t/1e12:7.2f} TF")


if __name__ == "__main__":
    main()
