"""Reproduce the bench engine row (7.7K prompts) with per-block timing.

engine_probe.py showed 1445 tok/s with 1K prompts; the bench with 7.7K
prompts recorded 131 tok/s (decode blocks ~1.9 s each). This variant
times every decode block and every prefill chunk individually to find
where the long-context run loses 12x.

Usage: python tools/engine_probe2.py
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
from flash_attention_tpu.serving import decode_loop
from flash_attention_tpu.serving.paged_engine import PagedServingEngine


def log(msg):
    print(msg, file=sys.stderr, flush=True)


_orig_block = decode_loop.run_decode_block
_orig_prefill = decode_loop.advance_prefill


def timed_block(eng, active, out):
    t0 = time.perf_counter()
    _orig_block(eng, active, out)
    log(f"  decode block ({len(active)} slots): "
        f"{(time.perf_counter() - t0)*1e3:8.1f}ms")


def timed_prefill(eng, slot, out):
    t0 = time.perf_counter()
    _orig_prefill(eng, slot, out)
    dt = time.perf_counter() - t0
    if slot == 0 or dt > 0.2:
        log(f"  prefill chunk slot={slot}: {dt*1e3:8.1f}ms")


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
    t0 = time.perf_counter()
    engine.run([
        Request(id=10_000 + i, prompt=(1, 2, 3, 4) * 256, max_new_tokens=15)
        for i in range(batch)
    ])
    log(f"warmup run: {time.perf_counter() - t0:.1f}s")

    # The bench scenario: 7680-token prompts, 64 new tokens.
    prompt_len, max_new = ctx - 512, 64
    rng = np.random.RandomState(9)
    reqs = [
        Request(
            id=i,
            prompt=tuple(int(x) for x in rng.randint(0, cfg.vocab_size, 8))
            * (prompt_len // 8),
            max_new_tokens=max_new,
        )
        for i in range(batch)
    ]
    # Instrument.
    import flash_attention_tpu.serving.paged_engine as pe
    decode_loop.run_decode_block = timed_block
    pe.run_decode_block = timed_block
    engine._advance_prefill_orig = engine._advance_prefill

    def adv(slot, out):
        t0 = time.perf_counter()
        engine._advance_prefill_orig(slot, out)
        dt = time.perf_counter() - t0
        if slot == 0 or dt > 0.3:
            log(f"  prefill chunk slot={slot}: {dt*1e3:8.1f}ms")

    engine._advance_prefill = adv

    engine.decode_tokens = 0
    engine.decode_time_s = 0.0
    t0 = time.perf_counter()
    engine.run(reqs)
    total = time.perf_counter() - t0
    log(f"bench scenario: total {total:.1f}s, decode {engine.decode_time_s:.1f}s, "
        f"{engine.decode_tokens} toks, "
        f"{engine.decode_tokens/engine.decode_time_s:8.0f} tok/s")


if __name__ == "__main__":
    main()
