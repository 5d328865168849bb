"""Engine decode-phase cost breakdown (run on real TPU).

BENCH_r03's engine row reads 131 tok/s decode-phase — vastly below the
~7k tok/s the bare kernels support at this config (4-layer 7B-shape,
b=32, ctx=8192, int8 paged). This probe times the pieces in one process:

  * the jitted k-step decode block (`_decode_multi`) in isolation,
  * a single-step paged decode logits call,
  * the full engine decode phase (host loop included),

so the gap attributes to device compute vs dispatch/relay overhead vs
host-loop bookkeeping.

Usage: python tools/engine_probe.py
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

_CACHE_DIR = pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"
_CACHE_DIR.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from flash_attention_tpu.models.transformer import ModelConfig, init_model_params
from flash_attention_tpu.serving.engine import Request
from flash_attention_tpu.serving.paged_engine import PagedServingEngine


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    batch, page, ctx = 32, 1024, 8192
    cfg = ModelConfig(
        vocab_size=32000, model_dim=4096, num_layers=4, num_q_heads=32,
        num_kv_heads=8, head_dim=128, mlp_dim=11008, kv_quant="int8",
    )
    params = init_model_params(jax.random.key(0), cfg)
    engine = PagedServingEngine(
        params, cfg, max_slots=batch,
        num_pages=batch * (ctx // page) + 1,
        pages_per_slot=ctx // page, page_size=page, prefill_chunk=1024,
    )
    # Short-prompt warmup: compiles prefill + every pow2 decode-block k.
    t0 = time.perf_counter()
    engine.run([
        Request(id=10_000 + i, prompt=(1, 2, 3, 4) * 256, max_new_tokens=15)
        for i in range(batch)
    ])
    log(f"warmup run: {time.perf_counter() - t0:.1f}s")

    # Re-admit so every slot is mid-decode, then time raw decode blocks.
    prompt = tuple(int(x) for x in np.random.RandomState(9).randint(
        0, cfg.vocab_size, 8)) * (1024 // 8)
    engine.run([Request(id=i, prompt=prompt, max_new_tokens=2)
                for i in range(batch)])

    # (a) the jitted k-step decode block in isolation (k = 8).
    d_last = jnp.asarray(engine.last_token)
    d_active = jnp.ones((batch,), bool)
    d_t = jnp.asarray(engine._temps)
    d_k = jnp.asarray(engine._topk)
    d_p = jnp.asarray(engine._topp)
    d_s = jnp.asarray(engine._seeds)
    for trial in range(3):
        t0 = time.perf_counter()
        toks, d_last, engine.caches = engine._decode_multi(
            engine.params, d_last, engine.caches, d_active,
            d_t, d_k, d_p, d_s, 8,
        )
        np.asarray(toks)
        dt = time.perf_counter() - t0
        log(f"decode block k=8 trial {trial}: {dt*1e3:8.1f}ms "
            f"({dt/8*1e3:6.1f}ms/step, {batch*8/dt:8.0f} tok/s)")

    # (b) per-step cost at k=1 (isolates per-dispatch overhead).
    for trial in range(3):
        t0 = time.perf_counter()
        toks, d_last, engine.caches = engine._decode_multi(
            engine.params, d_last, engine.caches, d_active,
            d_t, d_k, d_p, d_s, 1,
        )
        np.asarray(toks)
        dt = time.perf_counter() - t0
        log(f"decode block k=1 trial {trial}: {dt*1e3:8.1f}ms "
            f"({batch/dt:8.0f} tok/s)")

    # (c) full engine decode phase, fresh requests.
    engine.decode_tokens = 0
    engine.decode_time_s = 0.0
    t0 = time.perf_counter()
    engine.run([Request(id=100 + i, prompt=prompt, max_new_tokens=64)
                for i in range(batch)])
    total = time.perf_counter() - t0
    log(f"engine run (1K prompts, 64 new): total {total:.1f}s, "
        f"decode phase {engine.decode_time_s:.1f}s, "
        f"{engine.decode_tokens} toks, "
        f"{engine.decode_tokens/engine.decode_time_s:8.0f} tok/s")


if __name__ == "__main__":
    main()
