"""Packed-sequence (segment-ids) perf probe — bench.py's packed rows in one
process, for before/after comparison when the packed paths change.

Usage: python tools/packed_probe.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

_CACHE_DIR = pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"
_CACHE_DIR.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from flash_attention_tpu.ops.flash_attention import flash_attention
from flash_attention_tpu.utils.benchmarking import (
    attention_flops,
    detect_mxu_peak_tflops,
    scan_timer,
)
from flash_attention_tpu.utils.testing import make_qkv

BATCH, HEADS, HEAD_DIM = 1, 32, 128


def main():
    peak = detect_mxu_peak_tflops()
    seq, doc = 8192, 2048
    q, k, v = make_qkv(13, BATCH, HEADS, seq, HEAD_DIM)
    seg = jnp.asarray(
        np.repeat(np.arange(seq // doc, dtype=np.int32), doc)[None]
    )
    fl = (seq // doc) * attention_flops(BATCH, HEADS, doc, HEAD_DIM, causal=True)

    fn = lambda q, k, v: flash_attention(q, k, v, causal=True, segment_ids=seg)
    t = scan_timer(fn, (q, k, v), est_s=fl / (0.3 * peak * 1e12))
    print(f"packed fwd 4x{doc} @ {seq}: {t*1e6:9.1f}us "
          f"{fl/t/1e12:7.2f} live-TF ({fl/t/1e12/peak*100:4.1f}%)", flush=True)

    def fwd_bwd(q, k, v):
        def f(q, k, v):
            return jnp.sum(
                flash_attention(
                    q, k, v, causal=True, segment_ids=seg
                ).astype(jnp.float32)
            )

        dq, dk, dv = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        probe = (
            dk[0, 0, 0, 0].astype(jnp.float32)
            + dv[0, 0, 0, 0].astype(jnp.float32)
        ) * 0.0
        return dq.at[0, 0, 0, 0].add(probe.astype(dq.dtype))

    eff_fl = 3.5 * fl
    t = scan_timer(fwd_bwd, (q, k, v), est_s=eff_fl / (0.25 * peak * 1e12))
    print(f"packed train 4x{doc} @ {seq}: {t*1e6:9.1f}us "
          f"{eff_fl/t/1e12:7.2f} live-eff-TF ({eff_fl/t/1e12/peak*100:4.1f}%)",
          flush=True)


if __name__ == "__main__":
    main()
