"""Single-step softmax epilogue variants: where should the 1/l normalize go?

gap_probe showed normalize-after-PV (the shipped kernel) is ~10-15% SLOWER
than normalize-before-PV (mfu_probe "full"), despite touching d=128 lanes
instead of block_kv=512-1024. Sweep the epilogue design space.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attention_tpu.ops.common import LOG2E, M_FLOOR
from flash_attention_tpu.utils.benchmarking import attention_flops, scan_timer
from flash_attention_tpu.utils.testing import make_qkv


def kernel(q_ref, k_ref, v_ref, o_ref, *, scale2: float, variant: str):
    q = q_ref[...]
    k = k_ref[...]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True) * scale2, M_FLOOR)
    p32 = jnp.exp2(s * scale2 - m)
    l = jnp.sum(p32, axis=-1, keepdims=True)
    v = v_ref[...]

    def dot_pv(p):
        return jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    if variant == "after_pv":  # shipped kernel
        pv = dot_pv(p32.astype(v.dtype))
        inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        o_ref[...] = (pv * inv).astype(o_ref.dtype)
    elif variant == "after_pv_noguard":
        pv = dot_pv(p32.astype(v.dtype))
        o_ref[...] = (pv / l).astype(o_ref.dtype)
    elif variant == "before_pv":  # mfu_probe "full"
        inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        pv = dot_pv((p32 * inv).astype(v.dtype))
        o_ref[...] = pv.astype(o_ref.dtype)
    elif variant == "none":  # no normalize: upper bound
        pv = dot_pv(p32.astype(v.dtype))
        o_ref[...] = pv.astype(o_ref.dtype)
    elif variant == "after_pv_bf16":  # normalize in output dtype
        pv = dot_pv(p32.astype(v.dtype))
        inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        o_ref[...] = pv.astype(o_ref.dtype) * inv.astype(o_ref.dtype)
    else:
        raise ValueError(variant)


def run(variant, q, k, v, hb, seq, d, scale2):
    bh = q.shape[0]
    spec = pl.BlockSpec((hb, seq, d), lambda i: (i, 0, 0))
    fn = pl.pallas_call(
        functools.partial(kernel, scale2=scale2, variant=variant),
        grid=(bh // hb,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((bh, seq, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
    )
    return scan_timer(jax.jit(fn), (q, k, v), est_s=30e-6)


def main():
    print(f"devices: {jax.devices()}")
    heads, d = 32, 128
    for seq, hb in ((512, 4), (1024, 2)):
        q, k, v = make_qkv(0, 1, heads, seq, d)
        q = q.reshape(heads, seq, d)
        k = k.reshape(heads, seq, d)
        v = v.reshape(heads, seq, d)
        scale2 = (1.0 / d**0.5) * LOG2E
        fl = attention_flops(1, heads, seq, d, causal=False)
        print(f"-- seq={seq} hb={hb}")
        for variant in (
            "none", "before_pv", "after_pv", "after_pv_noguard", "after_pv_bf16"
        ):
            t = run(variant, q, k, v, hb, seq, d, scale2)
            print(f"  {variant:<18s} {t*1e6:8.2f} us  {fl/t/1e12:7.2f} TF")


if __name__ == "__main__":
    main()
