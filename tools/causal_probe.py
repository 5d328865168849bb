"""Isolate why causal block-skipping underperforms.

Variants of the forward kernel (self-contained copies) toggling:
  * skip: clamped KV index map + pl.when   vs. always-run
  * mask: lax.cond-gated                   vs. unconditional where  vs. none

'none' mask is numerically wrong — perf probe only.
"""

import functools
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attention_tpu.utils.benchmarking import attention_flops, time_fn
from flash_attention_tpu.utils.testing import make_qkv

LANES = 128
MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def make_fn(seq, bq, bkv, heads, *, skip, mask):
    nkv = seq // bkv

    def kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr):
        iq = pl.program_id(1)
        ikv = pl.program_id(2)

        @pl.when(ikv == 0)
        def _():
            m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        should_run = (ikv * bkv <= (iq + 1) * bq - 1) if skip else True

        @pl.when(should_run)
        def _compute():
            q = q_ref[0]
            k = k_ref[0]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )

            def _masked(s):
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ikv * bkv
                row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + iq * bq
                return jnp.where(col <= row, s, MASK_VALUE)

            if mask == "cond":
                need = (ikv + 1) * bkv - 1 > iq * bq
                s = jax.lax.cond(need, _masked, lambda s: s, s)
            elif mask == "always":
                s = _masked(s)
            # mask == "none": skip

            m_prev = m_scr[...]
            l_prev = l_scr[...]
            m_curr = jnp.max(s, axis=-1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp2(m_prev - m_next)
            p = jnp.exp2(s - m_next[:, :1])
            l_scr[...] = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
            m_scr[...] = m_next
            v = v_ref[0]
            pv = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv

        @pl.when(ikv == nkv - 1)
        def _epi():
            l = l_scr[...][:, :1]
            inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
            o_ref[0] = (acc_scr[...] * inv).astype(o_ref.dtype)

    def kv_index(iq, ikv):
        if not skip:
            return ikv
        return jnp.minimum(ikv, ((iq + 1) * bq - 1) // bkv)

    @jax.jit
    def fn(q, k, v):
        return pl.pallas_call(
            kernel,
            grid=(heads, seq // bq, nkv),
            in_specs=[
                pl.BlockSpec((1, bq, 128), lambda bh, iq, ikv: (bh, iq, 0)),
                pl.BlockSpec((1, bkv, 128), lambda bh, iq, ikv: (bh, kv_index(iq, ikv), 0)),
                pl.BlockSpec((1, bkv, 128), lambda bh, iq, ikv: (bh, kv_index(iq, ikv), 0)),
            ],
            out_specs=pl.BlockSpec((1, bq, 128), lambda bh, iq, ikv: (bh, iq, 0)),
            out_shape=jax.ShapeDtypeStruct((heads, seq, 128), q.dtype),
            scratch_shapes=[
                pltpu.VMEM((bq, LANES), jnp.float32),
                pltpu.VMEM((bq, LANES), jnp.float32),
                pltpu.VMEM((bq, 128), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
        )(q, k, v)

    return fn


def main():
    seq, heads = 8192, 32
    q, k, v = make_qkv(0, 1, heads, seq, 128)
    q3 = q.reshape(heads, seq, 128)
    k3 = k.reshape(heads, seq, 128)
    v3 = v.reshape(heads, seq, 128)
    for bq, bkv in [(512, 1024), (1024, 1024), (512, 512)]:
        for skip in (False, True):
            for mask in ("none", "always", "cond"):
                fn = make_fn(seq, bq, bkv, heads, skip=skip, mask=mask)
                t = min(time_fn(fn, q3, k3, v3, warmup=5, iters=20, runs=2))
                fl = attention_flops(1, heads, seq, 128, causal=True)
                print(
                    f"bq={bq} bkv={bkv} skip={int(skip)} mask={mask:6s}: "
                    f"{t*1e3:7.3f}ms  {fl/t/1e12:6.1f} cTF",
                    flush=True,
                )


if __name__ == "__main__":
    main()
