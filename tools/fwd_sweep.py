"""On-chip sweep: causal forward configs after the diagonal final-step fusion.

The diag-subtile kernel now writes normalized output directly at the
diagonal (no m/l/acc scratch writes, no epilogue pass), which changes the
config landscape: multi-block tri grids with fused diagonals may now beat
the single-superblock forms at 1024-2048 and want different tile/sub sizes
at 4096-16K. Winners get baked into ops/tuning.py.

Usage: python tools/fwd_sweep.py [--configs idx,idx,...]
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

_CACHE_DIR = pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"
_CACHE_DIR.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from flash_attention_tpu.ops.flash_attention import flash_attention
from flash_attention_tpu.ops.tuning import BlockSizes
from flash_attention_tpu.utils.benchmarking import (
    attention_flops,
    detect_mxu_peak_tflops,
    scan_timer,
)
from flash_attention_tpu.utils.testing import make_qkv

BATCH, HEADS, HEAD_DIM = 1, 32, 128

# (label, seq, block_sizes or None=dispatch). All causal.
SWEEP = [
    # Round-4 diag-width sweep: sub == block_q is the full-width additive-
    # mask fused diagonal (ONE wide MMA; ~50% diag MXU waste but minimal VPU
    # fixed costs), finer subs trade MXU waste for per-sub-block overhead.
    ("4096 (1024,1024,h2,sub512)", 4096, BlockSizes(1024, 1024, 2, 512)),
    ("4096 (1024,1024,h2,sub1024)", 4096, BlockSizes(1024, 1024, 2, 1024)),
    ("8192 (1024,1024,h2,sub512)", 8192, BlockSizes(1024, 1024, 2, 512)),
    ("8192 (1024,1024,h2,sub1024)", 8192, BlockSizes(1024, 1024, 2, 1024)),
    ("16384 (1024,1024,h2,sub512)", 16384, BlockSizes(1024, 1024, 2, 512)),
    ("16384 (1024,1024,h2,sub1024)", 16384, BlockSizes(1024, 1024, 2, 1024)),
    ("4096 dispatch (1024,1024,h2,sub256)", 4096, None),
    ("4096 (1024,1024,h2,sub128)", 4096, BlockSizes(1024, 1024, 2, 128)),
    ("4096 (1024,1024,h1,sub256)", 4096, BlockSizes(1024, 1024, 1, 256)),
    ("4096 (512,512,h2,sub128)", 4096, BlockSizes(512, 512, 2, 128)),
    ("4096 (512,512,h4,sub128)", 4096, BlockSizes(512, 512, 4, 128)),
    ("8192 dispatch (1024,1024,h2,sub256)", 8192, None),
    ("8192 (1024,1024,h2,sub128)", 8192, BlockSizes(1024, 1024, 2, 128)),
    ("16384 dispatch (1024,1024,h2,sub256)", 16384, None),
    ("2048 dispatch (2048,2048,h2,sub256)", 2048, None),
    ("2048 tri (1024,1024,h2,sub256)", 2048, BlockSizes(1024, 1024, 2, 256)),
    ("2048 tri (1024,1024,h2,sub128)", 2048, BlockSizes(1024, 1024, 2, 128)),
    ("2048 tri (512,512,h4,sub128)", 2048, BlockSizes(512, 512, 4, 128)),
    ("1024 dispatch (1024,1024,h4,sub256)", 1024, None),
    ("1024 super (1024,1024,h4,sub128)", 1024, BlockSizes(1024, 1024, 4, 128)),
    ("1024 tri (512,512,h4,sub128)", 1024, BlockSizes(512, 512, 4, 128)),
    ("1024 tri (256,256,h4,sub128)", 1024, BlockSizes(256, 256, 4, 128)),
    ("1024 tri (256,256,h8,sub128)", 1024, BlockSizes(256, 256, 8, 128)),
    ("768 dispatch (768,768,h8,sub128)", 768, None),
    ("768 tri (256,256,h8,sub128)", 768, BlockSizes(256, 256, 8, 128)),
    ("512 dispatch (512,512,h8,sub128)", 512, None),
    ("512 tri (256,256,h8,sub128)", 512, BlockSizes(256, 256, 8, 128)),
    # Round-4 batch 2 (indices 27+): superblock sub widths at short seqs,
    # 8192 diag-width re-confirmation, GQA diag-subtile candidates.
    ("2048 super (2048,2048,h2,sub512)", 2048, BlockSizes(2048, 2048, 2, 512)),
    ("1024 super (1024,1024,h4,sub512)", 1024, BlockSizes(1024, 1024, 4, 512)),
    ("768 super (768,768,h8,sub256)", 768, BlockSizes(768, 768, 8, 256)),
    ("768 super (768,768,h8,sub384)", 768, BlockSizes(768, 768, 8, 384)),
    ("512 super (512,512,h8,sub256)", 512, BlockSizes(512, 512, 8, 256)),
    ("8192 re (1024,1024,h2,sub256)", 8192, BlockSizes(1024, 1024, 2, 256)),
    ("8192 re (1024,1024,h2,sub512)", 8192, BlockSizes(1024, 1024, 2, 512)),
    ("8192 re (1024,1024,h2,sub1024)", 8192, BlockSizes(1024, 1024, 2, 1024)),
    ("16384 re (1024,1024,h2,sub256)", 16384, BlockSizes(1024, 1024, 2, 256)),
    ("16384 re (1024,1024,h2,sub1024)", 16384, BlockSizes(1024, 1024, 2, 1024)),
]

# GQA candidates (32 q heads / 8 kv heads), causal: the dispatched
# (512,1024,h4) tri is masked full-tile on its diagonal; diag-subtiled
# square blocks may beat it. (label, seq, block_sizes or None).
GQA_SWEEP = [
    ("gqa8192 dispatch (512,1024,h4)", 8192, None),
    ("gqa8192 (512,512,h4,sub128)", 8192, BlockSizes(512, 512, 4, 128)),
    ("gqa8192 (512,512,h4,sub256)", 8192, BlockSizes(512, 512, 4, 256)),
    ("gqa8192 (512,512,h4,sub512)", 8192, BlockSizes(512, 512, 4, 512)),
    ("gqa8192 (1024,1024,h4,sub512)", 8192, BlockSizes(1024, 1024, 4, 512)),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default=None)
    ap.add_argument("--gqa", action="store_true",
                    help="run GQA_SWEEP instead of SWEEP")
    args = ap.parse_args()
    table = GQA_SWEEP if args.gqa else SWEEP
    idxs = (
        [int(i) for i in args.configs.split(",")]
        if args.configs else range(len(table))
    )
    peak = detect_mxu_peak_tflops()
    print(f"peak {peak} TF", file=sys.stderr, flush=True)
    for i in idxs:
        label, seq, bs = table[i]
        q, k, v = make_qkv(
            0, BATCH, HEADS, seq, HEAD_DIM,
            num_kv_heads=8 if args.gqa else HEADS,
        )
        fn = lambda q, k, v: flash_attention(
            q, k, v, causal=True, block_sizes=bs
        )
        fl = attention_flops(BATCH, HEADS, seq, HEAD_DIM, causal=True)
        try:
            t = scan_timer(fn, (q, k, v), est_s=fl / (0.3 * peak * 1e12))
            tf = fl / t / 1e12
            print(
                f"[{i:2d}] {label:42s} {tf:7.2f} TF ({tf / peak * 100:4.1f}%)",
                flush=True,
            )
        except Exception as e:
            print(f"[{i:2d}] {label:42s} FAIL {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
