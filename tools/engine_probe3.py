"""Decompose the paged decode step's per-step cost (run on real TPU).

engine_probe.py measured ~16 ms/step marginal inside the k-step scan vs
~4.5 ms expected from kernel + HBM arithmetic. Time each piece alone:
full jitted decode_step_logits_paged, the bare paged attention kernel at
this config, the MLP stack, and the unembed.

Usage: python tools/engine_probe3.py
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

from flash_attention_tpu.models.transformer import (
    ModelConfig, init_model_params, init_paged_caches,
    decode_step_logits_paged,
)
from flash_attention_tpu.utils.benchmarking import time_fn


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    batch, page, ctx = 32, 1024, 8192
    cfg = ModelConfig(
        vocab_size=32000, model_dim=4096, num_layers=4, num_q_heads=32,
        num_kv_heads=8, head_dim=128, mlp_dim=11008, kv_quant="int8",
    )
    params = init_model_params(jax.random.key(0), cfg)
    caches = init_paged_caches(
        cfg, num_pages=batch * (ctx // page) + 1, num_slots=batch,
        pages_per_slot=ctx // page, page_size=page,
    )
    # Fill page tables + lengths like a real mid-decode state.
    ppr = ctx // page
    tables = np.zeros((batch, ppr), np.int32)
    for s in range(batch):
        tables[s] = 1 + s * ppr + np.arange(ppr)
    caches = [
        c._replace(
            page_table=jnp.asarray(tables),
            lengths=jnp.full((batch,), ctx - 256, jnp.int32),
        )
        for c in caches
    ]
    toks = jnp.ones((batch, 1), jnp.int32)

    # (a) full decode step (donated caches, as in production — without
    # donation every in-flight call holds a ~300 MB cache copy and ~20
    # queued dispatches abort the backend).
    step = jax.jit(
        lambda p, t, c: decode_step_logits_paged(p, cfg, t, c),
        donate_argnums=(2,),
    )
    state = [jax.tree_util.tree_map(jnp.copy, caches)]

    def run_step():
        logits, state[0] = step(params, toks, state[0])
        return logits

    logits = run_step()
    jax.block_until_ready(logits)
    t = min(time_fn(run_step, warmup=5, iters=20, runs=2))
    log(f"full decode step: {t*1e3:8.2f}ms")

    # (b) attention only (all layers): replace mlp with identity by timing
    # the bare paged decode kernel 4x.
    from flash_attention_tpu.models.attention import (
        AttentionConfig, attention_decode_paged,
    )
    acfg = cfg.attention_config()
    h = jnp.ones((batch, 1, cfg.model_dim), jnp.bfloat16)
    lp = params["layers"][0]["attn"]

    att = jax.jit(lambda p, x, c: attention_decode_paged(p, acfg, x, c))
    o, c2 = att(lp, h, caches[0])
    jax.block_until_ready(o)
    t = min(time_fn(lambda: att(lp, h, caches[0])[0], warmup=5, iters=30, runs=2))
    log(f"one attention layer (qkv proj + kernel + cache write + o proj): {t*1e3:8.2f}ms")

    # (c) bare paged decode kernel.
    from flash_attention_tpu.ops.paged import paged_decode_attention
    q = jnp.ones((batch, cfg.num_q_heads, cfg.head_dim), jnp.bfloat16)
    ker = jax.jit(lambda q, c: paged_decode_attention(q, c))
    o = ker(q, caches[0])
    jax.block_until_ready(o)
    t = min(time_fn(lambda: ker(q, caches[0]), warmup=5, iters=30, runs=2))
    log(f"bare paged decode kernel: {t*1e3:8.2f}ms")

    # (d) MLP stack alone (4 layers of swiglu at [32, 1, 4096]).
    from flash_attention_tpu.models.transformer import swiglu, rms_norm

    def mlps(params, x):
        for l in params["layers"]:
            x = x + swiglu(rms_norm(x, l["mlp_norm"], cfg.norm_eps), l["mlp"])
        return x

    mfn = jax.jit(mlps)
    o = mfn(params, h)
    jax.block_until_ready(o)
    t = min(time_fn(lambda: mfn(params, h), warmup=5, iters=30, runs=2))
    log(f"4-layer MLP stack: {t*1e3:8.2f}ms")

    # (e) unembed.
    def unemb(params, x):
        return jnp.einsum("btm,vm->btv", x, params["embed"],
                          preferred_element_type=jnp.float32)

    ufn = jax.jit(unemb)
    o = ufn(params, h)
    jax.block_until_ready(o)
    t = min(time_fn(lambda: ufn(params, h), warmup=5, iters=30, runs=2))
    log(f"unembed: {t*1e3:8.2f}ms")

    # (f) cache write path alone: what does writing one token cost?
    from flash_attention_tpu.ops.paged import paged_write_tokens
    k1 = jnp.ones((batch, cfg.num_kv_heads, cfg.head_dim), jnp.bfloat16)
    slots = jnp.arange(batch)
    wfn = jax.jit(lambda c, k, v: paged_write_tokens(c, k, v, slots))
    c2 = wfn(caches[0], k1, k1)
    jax.block_until_ready(jax.tree_util.tree_leaves(c2))
    t = min(time_fn(lambda: wfn(caches[0], k1, k1).lengths, warmup=5, iters=30, runs=2))
    log(f"paged cache write (1 token, no donation): {t*1e3:8.2f}ms")

    # (g) cache write WITH donation (the in-scan form).
    wfn2 = jax.jit(
        lambda c, k, v: paged_write_tokens(c, k, v, slots), donate_argnums=(0,)
    )
    cc = jax.tree_util.tree_map(jnp.copy, caches[0])
    cc = wfn2(cc, k1, k1)
    jax.block_until_ready(jax.tree_util.tree_leaves(cc))
    import time as _t
    t0 = _t.perf_counter()
    for _ in range(50):
        cc = wfn2(cc, k1, k1)
    jax.block_until_ready(jax.tree_util.tree_leaves(cc))
    log(f"paged cache write (donated, in-place): {(_t.perf_counter()-t0)/50*1e3:8.2f}ms")


if __name__ == "__main__":
    main()
