"""Block-size autotuner for the forward kernel (run on real TPU).

Sweeps (block_q, block_kv) per (seq, causal) config and reports the winner,
to be baked into ops/tuning.py's dispatch table — the TPU equivalent of the
reference's hand-tuned four-tier table (flash_attention.cu:620-661).

Timing: in-graph lax.scan repeats with an optimization-barrier dependency
chain, two repeat counts, slope-fit — this cancels both the per-dispatch RPC
cost (~0.4ms) and the large fixed per-invocation relay cost (~9ms) of the
tunneled TPU environment.

Usage: python tools/autotune.py [--quick]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from flash_attention_tpu.ops.flash_attention import flash_attention
from flash_attention_tpu.ops.tuning import BlockSizes
from flash_attention_tpu.utils.benchmarking import (
    attention_flops,
    detect_mxu_peak_tflops,
    scan_timer,
)
from flash_attention_tpu.utils.testing import make_qkv

# VMEM ceiling ~16MB; score tile f32 + p bf16 + buffers must fit.
CANDIDATES = [
    (128, 128), (128, 256), (256, 256), (256, 512), (512, 512),
    (256, 1024), (512, 1024), (1024, 512), (1024, 1024),
    (512, 2048), (1024, 2048), (2048, 512), (2048, 1024),
]


def vmem_bytes(bq, bkv, d=128):
    return (
        4 * bq * bkv          # s fp32
        + 2 * bq * bkv        # p bf16
        + 2 * 2 * bkv * d * 2  # K,V double-buffered bf16
        + 2 * bq * d          # q bf16
        + 4 * bq * d          # acc fp32
        + 2 * 4 * bq * 128    # m, l fp32
    )


def main():
    quick = "--quick" in sys.argv
    peak = detect_mxu_peak_tflops()
    seqs = [512, 1024, 2048, 8192] if quick else [512, 768, 1024, 2048, 4096, 8192, 16384]
    heads = 32
    print(f"devices: {jax.devices()}  peak={peak} TFLOPS")
    winners = {}
    for causal in (False, True):
        for seq in seqs:
            kv_bytes = 2 * heads * seq * 128 * 2 * 2
            if kv_bytes > 12e9:
                continue
            q, k, v = make_qkv(0, 1, heads, seq, 128)
            best = None
            for bq, bkv in CANDIDATES:
                if bq > seq or bkv > seq or vmem_bytes(bq, bkv) > 16.8e6:
                    continue
                if quick and (bq, bkv) not in [
                    (256, 512), (512, 512), (512, 1024), (1024, 1024),
                    (512, 2048), (1024, 2048), (2048, 1024),
                ]:
                    continue
                bs = BlockSizes(block_q=bq, block_kv=bkv)
                fn = lambda q, k, v: flash_attention(q, k, v, causal=causal, block_sizes=bs)
                try:
                    t = scan_timer(fn, (q, k, v))
                except Exception as e:  # VMEM OOM etc.
                    print(f"  seq={seq} c={int(causal)} bq={bq} bkv={bkv}: FAIL {type(e).__name__}")
                    continue
                fl = attention_flops(1, heads, seq, 128, causal=causal)
                tf = fl / t / 1e12
                print(
                    f"  seq={seq} c={int(causal)} bq={bq} bkv={bkv}: "
                    f"{t*1e6:9.1f}us {tf:6.1f}TF ({tf/peak*100:4.1f}%)",
                    flush=True,
                )
                if best is None or t < best[0]:
                    best = (t, bq, bkv, tf)
            if best:
                winners[(seq, causal)] = best
                print(f"WINNER seq={seq} causal={int(causal)}: bq={best[1]} bkv={best[2]} {best[3]:.1f}TF", flush=True)

    print("\n=== summary ===")
    for (seq, causal), (t, bq, bkv, tf) in sorted(winners.items(), key=lambda x: (x[0][1], x[0][0])):
        print(f"seq={seq:6d} causal={int(causal)}: BlockSizes({bq}, {bkv})  {tf:6.1f} TFLOPS ({tf/peak*100:4.1f}%)")


if __name__ == "__main__":
    main()
