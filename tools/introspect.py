"""Kernel introspection — the TPU analog of the reference's C8 block.

The reference prints per-instantiation register counts, spill bytes, and
blocks/SM from cudaFuncGetAttributes / occupancy queries
(flash_attention.cu:712-755) as a performance-regression canary. The TPU
equivalents are the XLA-compiled executable's cost analysis (FLOPs, bytes
accessed, transcendentals) and memory analysis (argument/output/temp/peak
bytes), plus the roofline time bounds they imply. Run on real TPU:

    python tools/introspect.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from flash_attention_tpu.ops.flash_attention import flash_attention
from flash_attention_tpu.ops.tuning import select_block_sizes
from flash_attention_tpu.utils.benchmarking import (
    attention_flops,
    detect_mxu_peak_tflops,
)
from flash_attention_tpu.utils.testing import make_qkv

# v5e HBM bandwidth (GB/s) for the bandwidth roofline bound.
HBM_GBPS = {"v5 lite": 819.0, "v5e": 819.0, "v4": 1228.0, "v5p": 2765.0, "v6": 1640.0}


def hbm_gbps(default=819.0):
    kind = jax.devices()[0].device_kind.lower()
    for name, bw in HBM_GBPS.items():
        if name in kind:
            return bw
    return default


def introspect_config(seq: int, causal: bool, batch=1, heads=32, head_dim=128):
    q, k, v = make_qkv(0, batch, heads, seq, head_dim)
    bs = select_block_sizes(seq, causal=causal, head_dim=head_dim)
    fn = jax.jit(lambda q, k, v: flash_attention(q, k, v, causal=causal))
    compiled = fn.lower(q, k, v).compile()
    cost = compiled.cost_analysis() or {}
    mem = compiled.memory_analysis()

    flops = attention_flops(batch, heads, seq, head_dim, causal=causal)
    io_bytes = (q.size + k.size + v.size + q.size) * q.dtype.itemsize
    peak_tf = detect_mxu_peak_tflops()
    bw = hbm_gbps()
    t_compute = flops / (peak_tf * 1e12)
    t_memory = io_bytes / (bw * 1e9)

    print(
        f"seq={seq:6d} causal={int(causal)} blocks=({bs.block_q},{bs.block_kv})\n"
        f"  xla cost: flops={cost.get('flops', 0):.3e} "
        f"bytes={cost.get('bytes accessed', 0):.3e} "
        f"transcendentals={cost.get('transcendentals', 0):.3e}\n"
        f"  memory:   args={getattr(mem, 'argument_size_in_bytes', 0)/1e6:8.1f}MB "
        f"out={getattr(mem, 'output_size_in_bytes', 0)/1e6:8.1f}MB "
        f"temp={getattr(mem, 'temp_size_in_bytes', 0)/1e6:8.1f}MB "
        f"peak={getattr(mem, 'peak_memory_in_bytes', 0)/1e6:8.1f}MB\n"
        f"  roofline: compute-bound {t_compute*1e6:8.1f}us | "
        f"HBM-bound {t_memory*1e6:8.1f}us | "
        f"{'COMPUTE' if t_compute > t_memory else 'MEMORY'}-limited "
        f"(arith intensity {flops/io_bytes:6.0f} flop/B)"
    )


def main():
    print(f"device: {jax.devices()[0]}  peak={detect_mxu_peak_tflops()} TF  hbm={hbm_gbps()} GB/s")
    for causal in (False, True):
        for seq in (512, 1024, 2048, 4096, 8192, 16384):
            introspect_config(seq, causal)


if __name__ == "__main__":
    main()
