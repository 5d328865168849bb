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
# (block_q, block_kv, block_h) — block_h batches heads per grid step
# (amortizes per-step fixed costs; see ops/tuning.py).
CANDIDATES = [
    (256, 256, 1), (256, 512, 1), (512, 512, 1), (512, 512, 2), (512, 512, 4),
    (512, 1024, 1), (512, 1024, 2), (1024, 1024, 1), (1024, 1024, 2),
    (768, 768, 2), (768, 768, 4),
]


def vmem_bytes(bq, bkv, hb=1, d=128):
    return hb * (
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
            for bq, bkv, bh in CANDIDATES:
                if bq > seq or bkv > seq or vmem_bytes(bq, bkv, bh) > 16.8e6:
                    continue
                if quick and (bq, bkv, bh) not in [
                    (512, 512, 2), (512, 1024, 2), (1024, 1024, 1),
                    (1024, 1024, 2),
                ]:
                    continue
                bs = BlockSizes(block_q=bq, block_kv=bkv, block_h=bh)
                fn = lambda q, k, v: flash_attention(q, k, v, causal=causal, block_sizes=bs)
                try:
                    fl_est = attention_flops(1, heads, seq, 128, causal=causal)
                    t = scan_timer(fn, (q, k, v), est_s=fl_est / (0.3 * peak * 1e12))
                except Exception as e:  # VMEM OOM etc.
                    print(f"  seq={seq} c={int(causal)} bq={bq} bkv={bkv}: FAIL {type(e).__name__}")
                    continue
                fl = attention_flops(1, heads, seq, 128, causal=causal)
                tf = fl / t / 1e12
                print(
                    f"  seq={seq} c={int(causal)} ({bq},{bkv},h{bh}): "
                    f"{t*1e6:9.1f}us {tf:6.1f}TF ({tf/peak*100:4.1f}%)",
                    flush=True,
                )
                if best is None or t < best[0]:
                    best = (t, bq, bkv, bh, tf)
            if best:
                winners[(seq, causal)] = best
                print(
                    f"WINNER seq={seq} causal={int(causal)}: "
                    f"({best[1]},{best[2]},h{best[3]}) {best[4]:.1f}TF",
                    flush=True,
                )

    print("\n=== summary ===")
    for (seq, causal), (t, bq, bkv, bh, tf) in sorted(
        winners.items(), key=lambda x: (x[0][1], x[0][0])
    ):
        print(
            f"seq={seq:6d} causal={int(causal)}: BlockSizes({bq}, {bkv}, "
            f"block_h={bh})  {tf:6.1f} TFLOPS ({tf/peak*100:4.1f}%)"
        )


if __name__ == "__main__":
    main()
