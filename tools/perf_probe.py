"""Perf investigation probes (run on real TPU).

1. Dispatch-latency floor: time a trivial jitted kernel with the same harness.
2. Causal block-skip effectiveness: causal vs non-causal runtime at equal
   blocks; expectation ~0.55x if skipping works.
3. Block-size sweep at a few seqs.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from flash_attention_tpu.ops.flash_attention import flash_attention
from flash_attention_tpu.ops.tuning import BlockSizes
from flash_attention_tpu.utils.benchmarking import attention_flops, time_fn
from flash_attention_tpu.utils.testing import make_qkv


def main():
    print(f"devices: {jax.devices()}")

    # 1. dispatch floor
    @jax.jit
    def tiny(x):
        return x * 2.0

    x = jnp.ones((8, 128))
    t = time_fn(tiny, x, warmup=10, iters=100, runs=2)
    print(f"dispatch floor (trivial jit): {min(t)*1e6:.1f} us/iter")

    @jax.jit
    def tiny_matmul(a):
        return a @ a

    a = jnp.ones((1024, 1024), jnp.bfloat16)
    t = time_fn(tiny_matmul, a, warmup=10, iters=100, runs=2)
    print(f"dispatch floor (1k matmul):   {min(t)*1e6:.1f} us/iter")

    # 2/3. block sweep, causal vs not
    for seq in (1024, 4096, 8192):
        q, k, v = make_qkv(0, 1, 32, seq, 128)
        for bq, bkv in [(256, 256), (512, 512), (512, 1024), (1024, 512), (256, 1024), (1024, 1024)]:
            if bq > seq or bkv > seq:
                continue
            row = [f"seq={seq} bq={bq} bkv={bkv}:"]
            for causal in (False, True):
                fn = lambda q, k, v: flash_attention(
                    q, k, v, causal=causal,
                    block_sizes=BlockSizes(block_q=bq, block_kv=bkv),
                )
                t = time_fn(fn, q, k, v, warmup=5, iters=20, runs=2)
                fl = attention_flops(1, 32, seq, 128, causal=causal)
                row.append(
                    f"{'c' if causal else 'n'} {min(t)*1e3:7.3f}ms {fl/min(t)/1e12:7.2f}TF"
                )
            print("  ".join(row))


if __name__ == "__main__":
    main()
