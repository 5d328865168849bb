"""Probe: fp32 vs bf16 softmax arithmetic inside the kernel.

The kernel is VPU-bound (~65% MXU util): per score element the MXU does 512
FLOPs but the VPU does ~5 passes (max, sub+exp2, sum, select, cast). Running
those passes in bf16 doubles VPU element throughput. This probe measures the
speed and the numeric cost vs the fp32-softmax kernel and the oracle.
"""

import functools
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attention_tpu.ops.reference import reference_attention
from flash_attention_tpu.utils.benchmarking import attention_flops, time_fn
from flash_attention_tpu.utils.testing import diff_report, make_qkv

LANES = 128
MASK_VALUE_F32 = -0.7 * float(jnp.finfo(jnp.float32).max)
MASK_VALUE_BF16 = -0.7 * float(jnp.finfo(jnp.bfloat16).max)


def make_fn(seq, bq, bkv, heads, *, causal, variant):
    nkv = seq // bkv

    def kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr):
        iq = pl.program_id(1)
        ikv = pl.program_id(2)

        @pl.when(ikv == 0)
        def _():
            m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        should_run = (ikv * bkv <= (iq + 1) * bq - 1) if causal else True

        @pl.when(should_run)
        def _compute():
            q = q_ref[0]
            k = k_ref[0]
            sdt = jnp.bfloat16 if variant == "bf16" else jnp.float32
            mv = MASK_VALUE_BF16 if variant == "bf16" else MASK_VALUE_F32
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            if variant == "bf16":
                s = s.astype(jnp.bfloat16)
            if causal:
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ikv * bkv
                row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + iq * bq
                s = jnp.where(col <= row, s, jnp.asarray(mv, sdt))

            m_prev = m_scr[...]
            l_prev = l_scr[...]
            m_curr = jnp.max(s, axis=-1, keepdims=True).astype(jnp.float32)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp2(m_prev - m_next)
            if variant == "bf16":
                p = jnp.exp2(s - m_next[:, :1].astype(sdt))  # bf16 exp2
                l_curr = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
            else:
                p = jnp.exp2(s - m_next[:, :1])
                l_curr = jnp.sum(p, axis=-1, keepdims=True)
            l_scr[...] = alpha * l_prev + l_curr
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
        if not causal:
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
    LOG2E = 1.4426950408889634
    for seq, heads in [(8192, 32), (2048, 32)]:
        q, k, v = make_qkv(0, 1, heads, seq, 128)
        scale = (1.0 / 128**0.5) * LOG2E
        qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
        q3 = qs.reshape(heads, seq, 128)
        k3 = k.reshape(heads, seq, 128)
        v3 = v.reshape(heads, seq, 128)
        for causal in (False, True):
            # fp32 oracle materializes [H, S, S] scores; OOM above ~4k.
            want = reference_attention(q, k, v, causal=causal) if seq <= 4096 else None
            for bq, bkv in [(512, 1024), (1024, 1024), (1024, 512), (512, 512), (256, 512)]:
                if bq > seq or bkv > seq:
                    continue
                for variant in ("f32", "bf16"):
                    fn = make_fn(seq, bq, bkv, heads, causal=causal, variant=variant)
                    if want is not None:
                        out = fn(q3, k3, v3).reshape(1, heads, seq, 128)
                        md = diff_report(out, want).max_abs_diff
                        del out
                    else:
                        md = float('nan')
                    t = min(time_fn(fn, q3, k3, v3, warmup=5, iters=20, runs=2))
                    fl = attention_flops(1, heads, seq, 128, causal=causal)
                    print(
                        f"seq={seq} c={int(causal)} bq={bq} bkv={bkv} {variant}: "
                        f"{t*1e3:7.3f}ms {fl/t/1e12:6.1f}TF  maxdiff={md:.4f}",
                        flush=True,
                    )


if __name__ == "__main__":
    main()
