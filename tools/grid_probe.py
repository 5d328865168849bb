"""Probe per-q-block overhead: grid structure / semantics / block size sweep.

Times the raw pallas_call (no wrapper ops) via in-graph scan repeats.
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


def make_call(seq, bq, bkv, heads, *, semantics, collapse_bh_q=False):
    nkv = seq // bkv
    nq = seq // bq

    def kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr):
        ikv = pl.program_id(2 if not collapse_bh_q else 1)

        @pl.when(ikv == 0)
        def _():
            m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        q = q_ref[0]
        k = k_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
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

    if collapse_bh_q:
        # grid (bh*nq, nkv); derive indices in index maps
        grid = (heads * nq, nkv)
        in_specs = [
            pl.BlockSpec((1, bq, 128), lambda g, ikv: (g // nq, g % nq, 0)),
            pl.BlockSpec((1, bkv, 128), lambda g, ikv: (g // nq, ikv, 0)),
            pl.BlockSpec((1, bkv, 128), lambda g, ikv: (g // nq, ikv, 0)),
        ]
        out_specs = pl.BlockSpec((1, bq, 128), lambda g, ikv: (g // nq, g % nq, 0))
    else:
        grid = (heads, nq, nkv)
        in_specs = [
            pl.BlockSpec((1, bq, 128), lambda bh, iq, ikv: (bh, iq, 0)),
            pl.BlockSpec((1, bkv, 128), lambda bh, iq, ikv: (bh, ikv, 0)),
            pl.BlockSpec((1, bkv, 128), lambda bh, iq, ikv: (bh, ikv, 0)),
        ]
        out_specs = pl.BlockSpec((1, bq, 128), lambda bh, iq, ikv: (bh, iq, 0))

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=jax.ShapeDtypeStruct((heads, seq, 128), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=semantics),
    )

    reps = 8

    @jax.jit
    def fn(q, k, v):
        def body(carry, _):
            q_step = q.at[0, 0, 0].add(carry * 0)
            return carry + 1.0, call(q_step, k, v)

        _, outs = jax.lax.scan(body, jnp.bfloat16(0), None, length=reps)
        return outs[-1]

    return fn, reps


def main():
    for seq, heads in [(512, 32), (1024, 32), (2048, 32), (8192, 32)]:
        q, k, v = make_qkv(0, 1, heads, seq, 128)
        q3, k3, v3 = (x.reshape(heads, seq, 128) for x in (q, k, v))
        configs = []
        for bq in (256, 512, 1024):
            for bkv in (512, 1024, 2048):
                if bq <= seq and bkv <= seq:
                    configs.append((bq, bkv))
        for bq, bkv in configs:
            rows = []
            for name, sem, collapse in [
                ("par", ("parallel", "parallel", "arbitrary"), False),
                ("arb", ("arbitrary", "arbitrary", "arbitrary"), False),
                ("2d", ("parallel", "arbitrary"), True),
            ]:
                fn, reps = make_call(seq, bq, bkv, heads, semantics=sem, collapse_bh_q=collapse)
                t = min(time_fn(fn, q3, k3, v3, warmup=2, iters=4, runs=2)) / reps
                fl = attention_flops(1, heads, seq, 128, causal=False)
                rows.append(f"{name} {t*1e3:7.3f}ms {fl/t/1e12:6.1f}TF")
            print(f"seq={seq} bq={bq} bkv={bkv}: " + "  ".join(rows), flush=True)


if __name__ == "__main__":
    main()
