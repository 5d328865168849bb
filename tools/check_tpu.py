"""Quick on-hardware correctness + perf smoke check for the forward kernel.

Runs the reference's correctness contract (seeded inputs, fp32 oracle,
max-abs-diff < 0.1) on the real chip, then a short benchmark at a few configs.
Usage: python tools/check_tpu.py [--full]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from flash_attention_tpu.ops.flash_attention import flash_attention
from flash_attention_tpu.ops.reference import reference_attention
from flash_attention_tpu.utils.benchmarking import attention_flops, bench_attention
from flash_attention_tpu.utils.testing import diff_report, make_qkv


def main():
    full = "--full" in sys.argv
    print(f"devices: {jax.devices()}")

    # Correctness: the reference's four cases (flash_attention.cu:757-884)
    # plus the causal-long gap case.
    cases = [
        (1, 32, 256, True),
        (1, 32, 1024, True),
        (1, 32, 1024, False),
        (1, 2, 2048, False),
        (1, 2, 2048, True),
        (1, 2, 333, True),  # ragged
    ]
    ok = True
    for batch, heads, seq, causal in cases:
        q, k, v = make_qkv(42, batch, heads, seq, 128)
        got = flash_attention(q, k, v, causal=causal)
        want = reference_attention(q, k, v, causal=causal)
        rep = diff_report(got, want)
        ok &= rep.passed
        print(f"  b{batch} h{heads} s{seq} causal={int(causal)}: {rep}")
    if not ok:
        print("CORRECTNESS FAILED")
        sys.exit(1)

    seqs = [512, 1024, 2048, 4096, 8192, 16384] if full else [1024, 4096, 8192]
    for causal in (False, True):
        for seq in seqs:
            q, k, v = make_qkv(0, 1, 32, seq, 128)
            fn = lambda q, k, v: flash_attention(q, k, v, causal=causal)
            r = bench_attention(
                fn,
                q,
                k,
                v,
                name=f"seq={seq} causal={int(causal)}",
                flops=attention_flops(1, 32, seq, 128, causal=causal),
                warmup=5,
                iters=20,
                runs=2,
            )
            print("  " + r.row())


if __name__ == "__main__":
    main()
