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
# (block_q, block_kv, block_h, block_sub) — block_h batches heads per grid
# step (amortizes per-step fixed costs); block_sub > 0 selects the causal
# single-superblock sub-tiled kernel (see ops/tuning.py).
CANDIDATES = [
    (256, 256, 1, 0), (256, 512, 1, 0), (512, 512, 1, 0), (512, 512, 2, 0),
    (512, 512, 4, 0), (512, 1024, 1, 0), (512, 1024, 2, 0),
    (1024, 1024, 1, 0), (1024, 1024, 2, 0), (768, 768, 2, 0),
]


def seq_candidates(seq: int, causal: bool):
    """CANDIDATES plus the seq-specific single-block forms."""
    cands = list(CANDIDATES)
    if causal:
        # Causal single-superblock sub-tiled configs (whole problem in one
        # block pair; VMEM estimate differs — s/p tiles are [hb, sub, seq]).
        for bh in (1, 2, 4, 8):
            for sub in (128, 256):
                if seq % sub == 0 and seq > sub and seq <= 2048:
                    cands.append((seq, seq, bh, sub))
        # Multi-block tri-grid diag-subtile configs (block_q == block_kv <
        # seq; the diagonal step runs live-prefix sub-MMAs, interior steps
        # are mask-free full tiles).
        for bq in (512, 1024):
            for bh in (1, 2, 4):
                for sub in (128, 256):
                    if seq > bq and bq % sub == 0 and bq > sub:
                        cands.append((bq, bq, bh, sub))
    elif seq <= 4096:
        # Single-KV-block plain-softmax forms (bq splits the rows). Gated to
        # seq <= 4096: giant single-KV tiles at 8K+ compile for tens of
        # minutes (remote-compile wedge) and lose to the online path anyway.
        for bq in (256, 384, 512, seq):
            for bh in (1, 2, 4, 8):
                if bq <= seq and bq % 128 == 0:
                    cands.append((bq, seq, bh, 0))
    # Known Mosaic pathology: full-tile non-power-of-two single blocks at
    # bh >= 4 compile for ~15 min and run 20x slow — never sweep them.
    return [
        c for c in cands
        if not (c[0] == c[1] and c[0] % 1024 not in (0, 512) and c[2] >= 4
                and c[3] == 0)
    ]


def vmem_bytes(bq, bkv, hb=1, d=128, sub=0, multiblock=False):
    if sub and not multiblock:
        # Subtiled single superblock: q/k/v/o whole blocks (double-buffered
        # across head steps) + [hb, sub, bkv] fp32 s and p + the additive
        # mask tile.
        return (
            2 * hb * (2 * bq * d + 2 * bkv * d) * 2  # q,o,k,v bf16 x2 buf
            + 2 * 4 * hb * sub * bkv                 # s, p fp32
            + 4 * sub * bkv                          # addmask fp32
        )
    if sub:
        # Multi-block diag subtile: interior branch dominates (full online
        # estimate) plus the diag branch's addmask + sub-tiles.
        return vmem_bytes(bq, bkv, hb, d) + 4 * sub * bkv + 2 * 4 * hb * sub * bkv
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
    for a in sys.argv[1:]:
        if a.startswith("--seqs="):
            seqs = [int(s) for s in a.split("=", 1)[1].split(",")]
    modes = (False, True)
    if "--causal-only" in sys.argv:
        modes = (True,)
    if "--noncausal-only" in sys.argv:
        modes = (False,)
    only_sub = "--sub-only" in sys.argv  # sweep only block_sub > 0 configs
    heads = 32
    print(f"devices: {jax.devices()}  peak={peak} TFLOPS")
    winners = {}
    for causal in modes:
        for seq in seqs:
            kv_bytes = 2 * heads * seq * 128 * 2 * 2
            if kv_bytes > 12e9:
                continue
            q, k, v = make_qkv(0, 1, heads, seq, 128)
            best = None
            for bq, bkv, bh, sub in seq_candidates(seq, causal):
                if only_sub and not sub:
                    continue
                if bq > seq or bkv > seq or vmem_bytes(
                    bq, bkv, bh, sub=sub, multiblock=bq < seq
                ) > 16.8e6:
                    continue
                if quick and (bq, bkv, bh) not in [
                    (512, 512, 2), (512, 1024, 2), (1024, 1024, 1),
                    (1024, 1024, 2),
                ]:
                    continue
                bs = BlockSizes(
                    block_q=bq, block_kv=bkv, block_h=bh, block_sub=sub
                )
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
                    f"  seq={seq} c={int(causal)} ({bq},{bkv},h{bh},sub{sub}): "
                    f"{t*1e6:9.1f}us {tf:6.1f}TF ({tf/peak*100:4.1f}%)",
                    flush=True,
                )
                if best is None or t < best[0]:
                    best = (t, bq, bkv, bh, tf, sub)
            if best:
                winners[(seq, causal)] = best
                print(
                    f"WINNER seq={seq} causal={int(causal)}: "
                    f"({best[1]},{best[2]},h{best[3]},sub{best[5]}) {best[4]:.1f}TF",
                    flush=True,
                )

    print("\n=== summary ===")
    for (seq, causal), (t, bq, bkv, bh, tf, sub) in sorted(
        winners.items(), key=lambda x: (x[0][1], x[0][0])
    ):
        print(
            f"seq={seq:6d} causal={int(causal)}: BlockSizes({bq}, {bkv}, "
            f"block_h={bh}, block_sub={sub})  {tf:6.1f} TFLOPS ({tf/peak*100:4.1f}%)"
        )


if __name__ == "__main__":
    main()
