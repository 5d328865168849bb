"""On-chip sweep: fused one-pass backward + narrow-LSE residual forward.

Measures fwd+bwd eff-TFLOPS (3.5x-forward accounting, same protocol as
bench.py::bench_training) for the bench's three train configs, comparing the
dispatched two-pass backward against bwd_fused / lse_narrow candidates.
Winners get baked into ops/tuning.py.

Usage: python tools/train_sweep.py [--configs idx,idx,...]
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

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


def time_train(seq, causal, fwd_bs, bwd_bs, peak):
    q, k, v = make_qkv(5, BATCH, HEADS, seq, HEAD_DIM)

    def fwd_bwd(q, k, v):
        def f(q, k, v):
            return jnp.sum(
                flash_attention(
                    q, k, v, causal=causal,
                    block_sizes=fwd_bs, bwd_block_sizes=bwd_bs,
                ).astype(jnp.float32)
            )

        dq, dk, dv = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        # Tie dk/dv into the probe (scan_timer DCE trap — see bench.py).
        probe = (
            dk[0, 0, 0, 0].astype(jnp.float32)
            + dv[0, 0, 0, 0].astype(jnp.float32)
        ) * 0.0
        return dq.at[0, 0, 0, 0].add(probe.astype(dq.dtype))

    fl = attention_flops(BATCH, HEADS, seq, HEAD_DIM, causal=causal)
    eff_fl = 3.5 * fl
    t = scan_timer(fwd_bwd, (q, k, v), est_s=eff_fl / (0.25 * peak * 1e12))
    return eff_fl / t / 1e12


# (label, seq, causal, fwd block_sizes or None=dispatch, bwd block_sizes or
# None=dispatch). Current dispatched two-pass baselines first for comparison.
SWEEP = [
    # causal 2048 — dispatched: bwd (2048,2048,h2,sub128) two-pass
    ("c2048 dispatch", 2048, True, None, None),
    ("c2048 fused 2048x2048 h2 sub128", 2048, True, None,
     BlockSizes(2048, 2048, 2, 128, bwd_fused=True)),
    ("c2048 fused 2048x2048 h1 sub128", 2048, True, None,
     BlockSizes(2048, 2048, 1, 128, bwd_fused=True)),
    ("c2048 fused 2048x2048 h2 sub256", 2048, True, None,
     BlockSizes(2048, 2048, 2, 256, bwd_fused=True)),
    ("c2048 fused 512x512 h2 sub128", 2048, True, None,
     BlockSizes(512, 512, 2, 128, bwd_fused=True)),
    ("c2048 fused 512x512 h4 sub128", 2048, True, None,
     BlockSizes(512, 512, 4, 128, bwd_fused=True)),
    ("c2048 narrow-lse fwd", 2048, True,
     BlockSizes(2048, 2048, 2, 256, lse_narrow=True), None),
    # causal 8192 — dispatched: bwd (512,512,h4,sub128) two-pass diag
    ("c8192 dispatch", 8192, True, None, None),
    ("c8192 fused 512x512 h1 sub128", 8192, True, None,
     BlockSizes(512, 512, 1, 128, bwd_fused=True)),
    ("c8192 fused 256x256 h1 sub128", 8192, True, None,
     BlockSizes(256, 256, 1, 128, bwd_fused=True)),
    ("c8192 narrow-lse fwd", 8192, True,
     BlockSizes(512, 1024, 2, lse_narrow=True), None),
    # non-causal 8192 — dispatched: bwd (512,512,h4) two-pass
    ("nc8192 dispatch", 8192, False, None, None),
    ("nc8192 fused 512x512 h1", 8192, False, None,
     BlockSizes(512, 512, 1, bwd_fused=True)),
    ("nc8192 narrow-lse fwd", 8192, False,
     BlockSizes(512, 1024, 2, lse_narrow=True), None),
    # Round 2: fused winners at the other seqs + fused x narrow-lse combos.
    ("c2048 fused h2 sub128 + narrow fwd", 2048, True,
     BlockSizes(2048, 2048, 2, 256, lse_narrow=True),
     BlockSizes(2048, 2048, 2, 128, bwd_fused=True)),
    ("c1024 dispatch", 1024, True, None, None),
    ("c1024 fused 1024x1024 h2 sub128", 1024, True, None,
     BlockSizes(1024, 1024, 2, 128, bwd_fused=True)),
    ("c1024 fused 1024x1024 h4 sub128", 1024, True, None,
     BlockSizes(1024, 1024, 4, 128, bwd_fused=True)),
    ("c512 dispatch", 512, True, None, None),
    ("c512 fused 512x512 h4 sub128", 512, True, None,
     BlockSizes(512, 512, 4, 128, bwd_fused=True)),
    ("c512 fused 512x512 h8 sub128", 512, True, None,
     BlockSizes(512, 512, 8, 128, bwd_fused=True)),
    ("c4096 dispatch", 4096, True, None, None),
    ("c4096 fused 1024x1024 h1 sub256", 4096, True, None,
     BlockSizes(1024, 1024, 1, 256, bwd_fused=True)),
    ("c4096 fused 512x512 h1 sub128", 4096, True, None,
     BlockSizes(512, 512, 1, 128, bwd_fused=True)),
    ("nc2048 dispatch", 2048, False, None, None),
    ("nc2048 fused 2048x2048 h2", 2048, False, None,
     BlockSizes(2048, 2048, 2, bwd_fused=True)),
    ("nc2048 fused 512x2048 h2", 2048, False, None,
     BlockSizes(512, 2048, 2, bwd_fused=True)),
    ("nc4096 dispatch", 4096, False, None, None),
    ("nc4096 fused 512x1024 h1", 4096, False, None,
     BlockSizes(512, 1024, 1, bwd_fused=True)),
    # Round-4 additions: diag-subtiled RESIDUALS forward at causal 8192 (the
    # dispatched (512,1024,h2) residuals config runs a masked tri with no
    # diag sub-tiling — the grad-path forward is ~1/3 of train time), and
    # backward diag widths.
    ("c8192 resfwd (1024,1024,h2,sub256) narrow", 8192, True,
     BlockSizes(1024, 1024, 2, 256, lse_narrow=True), None),
    ("c8192 resfwd (1024,1024,h1,sub256)", 8192, True,
     BlockSizes(1024, 1024, 1, 256), None),
    ("c8192 resfwd (512,512,h4,sub128)", 8192, True,
     BlockSizes(512, 512, 4, 128), None),
    ("c8192 bwd (512,512,h4,sub256)", 8192, True, None,
     BlockSizes(512, 512, 4, 256)),
    ("c8192 bwd (512,512,h4,sub512)", 8192, True, None,
     BlockSizes(512, 512, 4, 512)),
    ("c8192 bwd (512,512,h8,sub128)", 8192, True, None,
     BlockSizes(512, 512, 8, 128)),
    ("c2048 bwd super sub256", 2048, True, None,
     BlockSizes(2048, 2048, 2, 256)),
    ("c2048 bwd super sub512", 2048, True, None,
     BlockSizes(2048, 2048, 2, 512)),
    # Round-4 batch 4 (37+): CHUNKED fused backward at 8192/16K (whole-KV
    # fp32 accumulators don't fit; per-4096-chunk they do), nc fused at the
    # shorter seqs, and fused x narrow-lse combos.
    ("c8192 fusedchunk 1024x1024 h1 sub256 k4096", 8192, True, None,
     BlockSizes(1024, 1024, 1, 256, bwd_fused=True, fused_kv_chunk=4096)),
    ("c8192 fusedchunk 512x512 h1 sub128 k4096", 8192, True, None,
     BlockSizes(512, 512, 1, 128, bwd_fused=True, fused_kv_chunk=4096)),
    ("c8192 fusedchunk 1024 h1 sub256 k4096 + narrow", 8192, True,
     BlockSizes(512, 1024, 2, lse_narrow=True),
     BlockSizes(1024, 1024, 1, 256, bwd_fused=True, fused_kv_chunk=4096)),
    ("nc8192 fusedchunk 512x1024 h1 k4096", 8192, False, None,
     BlockSizes(512, 1024, 1, bwd_fused=True, fused_kv_chunk=4096)),
    ("nc8192 fusedchunk 512x1024 h1 k2048", 8192, False, None,
     BlockSizes(512, 1024, 1, bwd_fused=True, fused_kv_chunk=2048)),
    ("nc2048 fused 512x1024 h1", 2048, False, None,
     BlockSizes(512, 1024, 1, bwd_fused=True)),
    ("nc2048 fused 512x1024 h2 k1024", 2048, False, None,
     BlockSizes(512, 1024, 2, bwd_fused=True, fused_kv_chunk=1024)),
    ("c4096 fused 1024 h1 sub256 + narrow", 4096, True,
     BlockSizes(512, 1024, 2, lse_narrow=True),
     BlockSizes(1024, 1024, 1, 256, bwd_fused=True)),
    ("c16384 fusedchunk 1024 h1 sub256 k4096", 16384, True, None,
     BlockSizes(1024, 1024, 1, 256, bwd_fused=True, fused_kv_chunk=4096)),
    ("nc16384 fusedchunk 512x1024 h1 k4096", 16384, False, None,
     BlockSizes(512, 1024, 1, bwd_fused=True, fused_kv_chunk=4096)),
    ("c1024 fused h2 sub128 + narrow", 1024, True,
     BlockSizes(1024, 1024, 4, 128, lse_narrow=True),
     BlockSizes(1024, 1024, 2, 128, bwd_fused=True)),
    ("c512 fused h8 sub128 + narrow", 512, True,
     BlockSizes(512, 512, 4, 128, lse_narrow=True),
     BlockSizes(512, 512, 8, 128, bwd_fused=True)),
    ("nc4096 fusedchunk 512x1024 h2 k2048", 4096, False, None,
     BlockSizes(512, 1024, 2, bwd_fused=True, fused_kv_chunk=2048)),
    # Round-4 batch 5 (50+): 16K causal chunked with the 512-block config
    # that fit at 8192, and short non-causal fused candidates.
    ("c16384 fusedchunk 512x512 h1 sub128 k4096", 16384, True, None,
     BlockSizes(512, 512, 1, 128, bwd_fused=True, fused_kv_chunk=4096)),
    ("nc1024 dispatch", 1024, False, None, None),
    ("nc1024 fused 512x1024 h1", 1024, False, None,
     BlockSizes(512, 1024, 1, bwd_fused=True)),
    ("nc1024 fused 1024x1024 h1", 1024, False, None,
     BlockSizes(1024, 1024, 1, bwd_fused=True)),
    ("nc512 dispatch", 512, False, None, None),
    ("nc512 fused 512x512 h2", 512, False, None,
     BlockSizes(512, 512, 2, bwd_fused=True)),
    ("nc512 fused 512x512 h4", 512, False, None,
     BlockSizes(512, 512, 4, bwd_fused=True)),
    ("c2048 fused 2048 h2 sub128 + narrow re", 2048, True,
     BlockSizes(2048, 2048, 2, 256, lse_narrow=True),
     BlockSizes(2048, 2048, 2, 128, bwd_fused=True)),
    ("c8192 fusedchunk 512x512 h2 sub128 k2048", 8192, True, None,
     BlockSizes(512, 512, 2, 128, bwd_fused=True, fused_kv_chunk=2048)),
    ("c8192 fusedchunk 512 h1 sub128 k4096 + narrowfwd", 8192, True,
     BlockSizes(512, 1024, 2, lse_narrow=True),
     BlockSizes(512, 512, 1, 128, bwd_fused=True, fused_kv_chunk=4096)),
    # Round-4 batch 6 (60+): standalone-safe 4096 causal fused variants
    # (the whole-KV (1024,1024,h1,sub256) failed the compile gate).
    ("c4096 fusedchunk 1024 h1 sub256 k2048", 4096, True, None,
     BlockSizes(1024, 1024, 1, 256, bwd_fused=True, fused_kv_chunk=2048)),
    ("c4096 fusedchunk 512x512 h2 sub128 k2048", 4096, True, None,
     BlockSizes(512, 512, 2, 128, bwd_fused=True, fused_kv_chunk=2048)),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default=None,
                    help="comma-separated SWEEP indices to run")
    args = ap.parse_args()
    idxs = (
        [int(i) for i in args.configs.split(",")]
        if args.configs else range(len(SWEEP))
    )
    peak = detect_mxu_peak_tflops()
    print(f"peak {peak} TF", file=sys.stderr, flush=True)
    for i in idxs:
        label, seq, causal, fwd_bs, bwd_bs = SWEEP[i]
        try:
            tf = time_train(seq, causal, fwd_bs, bwd_bs, peak)
            print(
                f"[{i:2d}] {label:40s} {tf:7.2f} eff-TF"
                f" ({tf / peak * 100:4.1f}%)",
                flush=True,
            )
        except Exception as e:
            print(f"[{i:2d}] {label:40s} FAIL {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
