"""Rolling (ring-buffer) KV cache for sliding-window decode.

Mistral-class local attention only ever reads the last `window` positions,
so the cache stores position p at slot p % buffer with buffer ~= window —
O(window) memory however long the context runs. Keys carry RoPE applied at
write time and attention is permutation-invariant, so correctness reduces
to the kernel masking by reconstructed positions. The contract checked
here: a rolling configuration must produce the SAME outputs as the dense
full-context configuration at every step, through the kernel, the layer,
and the serving engine. The reference has no cache at all (single-sequence
benchmark, flash_attention.cu) — this is north-star serving capability.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_tpu.models.attention import (
    AttentionConfig,
    attention_decode,
    attention_prefill,
    attention_prefill_chunk,
    init_attention_params,
    init_kv_cache,
)
from flash_attention_tpu.ops.decode import decode_attention


def _ring_from_dense(k_full, L, buf):
    """Pack the last min(L, buf) rows of a length-L dense cache into ring
    slots p % buf (one batch row)."""
    out = np.zeros((k_full.shape[0], buf, k_full.shape[2]), np.float32)
    for p in range(max(0, L - buf), L):
        out[:, p % buf] = np.asarray(k_full[:, p], np.float32)
    return out


def test_ring_decode_kernel_matches_dense():
    rng = np.random.RandomState(0)
    B, Hq, Hkv, D, W, BUF = 3, 8, 2, 128, 256, 384
    lens = [1000, 300, 100]  # wrapped / unwrapped / shorter than window
    k_full = jnp.asarray(
        rng.uniform(-0.5, 0.5, (B, Hkv, 1024, D))
    ).astype(jnp.bfloat16)
    v_full = jnp.asarray(
        rng.uniform(-0.5, 0.5, (B, Hkv, 1024, D))
    ).astype(jnp.bfloat16)
    q = jnp.asarray(rng.uniform(-0.5, 0.5, (B, Hq, D))).astype(jnp.bfloat16)
    lengths = jnp.asarray(lens, jnp.int32)
    k_ring = jnp.asarray(
        np.stack([_ring_from_dense(np.asarray(k_full)[b], lens[b], BUF)
                  for b in range(B)])
    ).astype(jnp.bfloat16)
    v_ring = jnp.asarray(
        np.stack([_ring_from_dense(np.asarray(v_full)[b], lens[b], BUF)
                  for b in range(B)])
    ).astype(jnp.bfloat16)

    want = decode_attention(q, k_full, v_full, lengths, sliding_window=W)
    for bk in (None, 128):
        got = decode_attention(
            q, k_ring, v_ring, lengths, sliding_window=W,
            ring_buffer=True, block_kv=bk,
        )
        err = float(
            jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32)))
        )
        assert err < 0.02, (bk, err)


def test_ring_decode_validation():
    q = jnp.zeros((1, 2, 128), jnp.bfloat16)
    k = jnp.zeros((1, 1, 256, 128), jnp.bfloat16)
    lens = jnp.ones((1,), jnp.int32)
    with pytest.raises(ValueError, match="requires sliding_window"):
        decode_attention(q, k, k, lens, ring_buffer=True)
    with pytest.raises(ValueError, match="hold the whole window"):
        decode_attention(
            q, k, k, lens, ring_buffer=True, sliding_window=512
        )


@pytest.mark.parametrize("kv_quant", ["none", "int8"])
def test_rolling_layer_decode_matches_dense(kv_quant):
    """Prefill + decode past the wrap point: every step's output from the
    rolling config must match the dense full-cache config."""
    W, CTX = 96, 512
    base = dict(
        model_dim=64, num_q_heads=4, num_kv_heads=2, head_dim=32,
        sliding_window=W, kv_quant=kv_quant, dtype="float32",
    )
    cfg_dense = AttentionConfig(**base)
    cfg_roll = AttentionConfig(**base, rolling=True)
    params = init_attention_params(jax.random.key(0), cfg_dense)

    B, T0 = 2, 64
    x0 = jax.random.normal(jax.random.key(1), (B, T0, 64), jnp.float32)

    cache_d = init_kv_cache(cfg_dense, B, CTX)
    cache_r = init_kv_cache(cfg_roll, B, CTX)
    assert cache_r.k.shape[2] < cache_d.k.shape[2]  # the memory win
    assert cache_r.k.shape[2] >= W

    o_d, cache_d = attention_prefill(params, cfg_dense, x0, cache_d)
    o_r, cache_r = attention_prefill(params, cfg_roll, x0, cache_r)
    np.testing.assert_allclose(
        np.asarray(o_r), np.asarray(o_d), rtol=2e-4, atol=2e-4
    )

    # Decode 2.5x the buffer so slots wrap several times.
    steps = int(cache_r.k.shape[2] * 2.5) // 8
    for i in range(steps):
        x = jax.random.normal(jax.random.key(10 + i), (B, 1, 64), jnp.float32)
        o_d, cache_d = attention_decode(params, cfg_dense, x, cache_d)
        o_r, cache_r = attention_decode(params, cfg_roll, x, cache_r)
        np.testing.assert_allclose(
            np.asarray(o_r), np.asarray(o_d), rtol=2e-3, atol=2e-3,
            err_msg=f"step {i}",
        )
    assert int(cache_r.lengths[0]) == T0 + steps  # totals, not clamped


def test_rolling_chunked_prefill_matches_dense():
    """Chunked prefill through the ring (chunks wrap the buffer boundary)
    then decode continuation — outputs must match the dense config."""
    W = 96
    base = dict(
        model_dim=64, num_q_heads=4, num_kv_heads=2, head_dim=32,
        sliding_window=W, dtype="float32",
    )
    cfg_dense = AttentionConfig(**base)
    cfg_roll = AttentionConfig(**base, rolling=True)
    params = init_attention_params(jax.random.key(2), cfg_dense)

    CTX, CH = 512, 64
    cache_d = init_kv_cache(cfg_dense, 1, CTX)
    cache_r = init_kv_cache(cfg_roll, 1, CTX, prefill_chunk=CH)
    assert cache_r.k.shape[2] < CTX

    total = 448  # 7 chunks > 2x buffer
    xs = jax.random.normal(jax.random.key(3), (1, total, 64), jnp.float32)
    for c in range(total // CH):
        xc = xs[:, c * CH : (c + 1) * CH]
        kv_end = (c + 1) * CH
        o_d, cache_d = attention_prefill_chunk(
            params, cfg_dense, xc, cache_d, 0, c * CH, kv_end
        )
        o_r, cache_r = attention_prefill_chunk(
            params, cfg_roll, xc, cache_r, 0, c * CH, kv_end
        )
        np.testing.assert_allclose(
            np.asarray(o_r), np.asarray(o_d), rtol=2e-4, atol=2e-4,
            err_msg=f"chunk {c}",
        )
    for i in range(4):
        x = jax.random.normal(jax.random.key(20 + i), (1, 1, 64), jnp.float32)
        o_d, cache_d = attention_decode(params, cfg_dense, x, cache_d)
        o_r, cache_r = attention_decode(params, cfg_roll, x, cache_r)
        np.testing.assert_allclose(
            np.asarray(o_r), np.asarray(o_d), rtol=2e-3, atol=2e-3,
            err_msg=f"decode {i}",
        )


def _streaming_oracle(qf, kf, vf, L, sinks, W, group):
    """fp32 attention over visible positions (sinks ∪ last-W) per head."""
    import math

    Hq, D = qf.shape
    out = np.zeros((Hq, D), np.float32)
    vis = [p for p in range(L) if p < sinks or p >= L - W]
    scale = 1.0 / math.sqrt(D)
    for h in range(Hq):
        kk = kf[h // group][vis]
        vv = vf[h // group][vis]
        s = (qf[h] @ kk.T) * scale
        e = np.exp(s - s.max())
        out[h] = (e / e.sum()) @ vv
    return out


def test_ring_sinks_decode_kernel_matches_oracle():
    """StreamingLLM two-region decode: sinks slots + ring slots, masked by
    reconstructed positions, vs an fp32 sinks ∪ window oracle — deep-wrapped
    and shorter-than-window rows."""
    rng = np.random.RandomState(1)
    B, Hq, Hkv, D = 2, 4, 2, 128
    W, SINKS, SPAD = 256, 4, 128
    BUF = SPAD + 384
    lens = [1500, 90]
    kf = rng.uniform(-0.5, 0.5, (B, Hkv, 1600, D)).astype(np.float32)
    vf = rng.uniform(-0.5, 0.5, (B, Hkv, 1600, D)).astype(np.float32)
    q = jnp.asarray(
        rng.uniform(-0.5, 0.5, (B, Hq, D)).astype(np.float32)
    ).astype(jnp.bfloat16)
    k_ring = np.zeros((B, Hkv, BUF, D), np.float32)
    v_ring = np.zeros((B, Hkv, BUF, D), np.float32)
    M = BUF - SPAD
    for b, L in enumerate(lens):
        for p in range(min(L, SINKS)):
            k_ring[b, :, p] = kf[b, :, p]
            v_ring[b, :, p] = vf[b, :, p]
        for p in range(SINKS, L):
            if p >= L - M:
                k_ring[b, :, SPAD + (p - SINKS) % M] = kf[b, :, p]
                v_ring[b, :, SPAD + (p - SINKS) % M] = vf[b, :, p]
    for bk in (None, 128):
        got = decode_attention(
            q,
            jnp.asarray(k_ring).astype(jnp.bfloat16),
            jnp.asarray(v_ring).astype(jnp.bfloat16),
            jnp.asarray(lens, jnp.int32),
            sliding_window=W, ring_buffer=True, attention_sinks=SINKS,
            block_kv=bk,
        )
        got = np.asarray(got, np.float32)
        for b, L in enumerate(lens):
            kb = np.asarray(
                jnp.asarray(kf[b]).astype(jnp.bfloat16), np.float32
            )
            vb = np.asarray(
                jnp.asarray(vf[b]).astype(jnp.bfloat16), np.float32
            )
            want = _streaming_oracle(
                np.asarray(q, np.float32)[b], kb, vb, L, SINKS, W, Hq // Hkv
            )
            err = float(np.max(np.abs(got[b] - want)))
            assert err < 0.02, (bk, b, err)


def test_sinks_layer_streaming_matches_oracle():
    """Chunked prefill + decode through the sinks config vs an fp32 oracle
    rebuilt from the layer's own projections: every step past the window
    must attend sinks ∪ band exactly (the quality-collapse regression the
    sinks exist to prevent)."""
    from flash_attention_tpu.models.attention import (
        _output_proj_decode, _project_qkv,
    )

    W, SINKS, CH = 192, 32, 64
    cfg = AttentionConfig(
        model_dim=64, num_q_heads=4, num_kv_heads=2, head_dim=32,
        sliding_window=W, rolling=True, attention_sinks=SINKS,
        dtype="float32",
    )
    params = init_attention_params(jax.random.key(3), cfg)
    CTX = 2048
    cache = init_kv_cache(cfg, 1, CTX, prefill_chunk=CH)
    assert cache.k.shape[2] == 128 + 256  # spad + ceil128(W + CH)

    total = 512  # prefill well past the window
    xs = jax.random.normal(jax.random.key(4), (1, total, 64), jnp.float32)
    kf = np.zeros((2, total + 64, 32), np.float32)  # [Hkv, P, D] dense truth
    vf = np.zeros((2, total + 64, 32), np.float32)
    outs = []
    for c in range(total // CH):
        xc = xs[:, c * CH : (c + 1) * CH]
        o, cache = attention_prefill_chunk(
            params, cfg, xc, cache, 0, c * CH, (c + 1) * CH
        )
        outs.append(o)
        q_c, k_c, v_c = _project_qkv(
            params, cfg, xc, c * CH + jnp.arange(CH)[None, None, :]
        )
        kf[:, c * CH : (c + 1) * CH] = np.asarray(k_c[0], np.float32)
        vf[:, c * CH : (c + 1) * CH] = np.asarray(v_c[0], np.float32)
        # oracle for the chunk's LAST row (the next-token position)
        qf = np.asarray(q_c[0, :, -1], np.float32)  # [Hq, D]
        want_att = _streaming_oracle(qf, kf, vf, (c + 1) * CH, SINKS, W, 2)
        want = np.asarray(
            _output_proj_decode(
                params, jnp.asarray(want_att)[None], jnp.float32
            )[0, 0]
        )
        got = np.asarray(o[0, -1], np.float32)
        np.testing.assert_allclose(
            got, want, rtol=2e-3, atol=2e-3, err_msg=f"chunk {c}"
        )

    # decode a few steps past several ring wraps
    for i in range(6):
        x = jax.random.normal(jax.random.key(20 + i), (1, 1, 64), jnp.float32)
        L = int(cache.lengths[0])
        q_c, k_c, v_c = _project_qkv(
            params, cfg, x, jnp.full((1, 1, 1), L)
        )
        kf[:, L] = np.asarray(k_c[0, :, 0], np.float32)
        vf[:, L] = np.asarray(v_c[0, :, 0], np.float32)
        o, cache = attention_decode(params, cfg, x, cache)
        want_att = _streaming_oracle(
            np.asarray(q_c[0, :, 0], np.float32), kf, vf, L + 1, SINKS, W, 2
        )
        want = np.asarray(
            _output_proj_decode(
                params, jnp.asarray(want_att)[None], jnp.float32
            )[0, 0]
        )
        np.testing.assert_allclose(
            np.asarray(o[0, 0], np.float32), want, rtol=2e-3, atol=2e-3,
            err_msg=f"decode {i}",
        )


def test_sinks_engine_smoke():
    """ServingEngine with a sinks config: runs to completion with the
    bounded buffer, prompts longer than the window."""
    from flash_attention_tpu.models.transformer import (
        ModelConfig, init_model_params,
    )
    from flash_attention_tpu.serving.engine import Request, ServingEngine

    cfg = ModelConfig.tiny(
        sliding_window=192, rolling=True, attention_sinks=32,
        dtype="float32",
    )
    params = init_model_params(jax.random.key(6), cfg)
    rng = np.random.RandomState(13)
    reqs = [
        Request(
            id=i,
            prompt=tuple(int(t) for t in rng.randint(0, 256, size=n)),
            max_new_tokens=24,
        )
        for i, n in enumerate((400, 150))
    ]
    eng = ServingEngine(params, cfg, max_slots=2, max_seq=1024)
    assert eng.caches[0].k.shape[2] < 1024
    out = eng.run(reqs)
    for i in (0, 1):
        assert len(out[i].tokens) == 24


def test_paged_sinks_engine_matches_dense():
    """Paged StreamingLLM: pinned logical page 0 + ring over the rest must
    produce token-identical output to the dense rolling+sinks engine
    (itself validated against the fp32 oracle), prompts past the window."""
    from flash_attention_tpu.models.transformer import (
        ModelConfig, init_model_params,
    )
    from flash_attention_tpu.serving.engine import Request, ServingEngine
    from flash_attention_tpu.serving.paged_engine import PagedServingEngine

    cfg = ModelConfig(
        vocab_size=128, model_dim=128, num_layers=2, num_q_heads=4,
        num_kv_heads=2, head_dim=32, mlp_dim=256, dtype="float32",
        sliding_window=192, rolling=True, attention_sinks=32,
    )
    params = init_model_params(jax.random.key(8), cfg)
    rng = np.random.RandomState(17)
    reqs = [
        Request(
            id=i,
            prompt=tuple(int(t) for t in rng.randint(0, 128, size=n)),
            max_new_tokens=24,
        )
        for i, n in enumerate((500, 150))
    ]
    dense = ServingEngine(params, cfg, max_slots=2, max_seq=1024)
    want = dense.run(list(reqs))

    paged = PagedServingEngine(
        params, cfg, max_slots=2, num_pages=16, pages_per_slot=8,
        page_size=128, prefill_chunk=128,
    )
    got = paged.run(list(reqs))
    for i in (0, 1):
        assert list(got[i].tokens) == list(want[i].tokens), i
    # ring budget: ceil((192+128)/128)+2 = 5, +1 pinned = 6 phys pages for
    # the 5-logical-page long request... bounded by logical need.
    assert paged.alloc.free_count == 15  # all released


def test_paged_ring_window_engine():
    """Paged engine sliding-window ring: a window request owns only
    ceil((window+chunk)/page)+2 physical pages with a modular page table —
    the pool below admits a request the full-budget scheme could NOT
    (6 logical pages, 4 physical), and tokens match the dense engine."""
    from flash_attention_tpu.models.transformer import (
        ModelConfig, init_model_params,
    )
    from flash_attention_tpu.serving.engine import Request, ServingEngine
    from flash_attention_tpu.serving.paged_engine import PagedServingEngine

    W = 128
    cfg = ModelConfig(
        vocab_size=128, model_dim=128, num_layers=2, num_q_heads=4,
        num_kv_heads=2, head_dim=32, mlp_dim=256, dtype="float32",
        sliding_window=W,
    )
    params = init_model_params(jax.random.key(5), cfg)
    rng = np.random.RandomState(11)
    req = lambda: [Request(
        id=1, prompt=tuple(int(t) for t in rng.randint(0, 128, size=700)),
        max_new_tokens=40,
    )]
    r0 = req()
    dense = ServingEngine(params, cfg, max_slots=1, max_seq=1024)
    want = dense.run(r0)

    # ring budget = ceil((128+128)/128)+2 = 4 phys pages; logical need = 6.
    paged = PagedServingEngine(
        params, cfg, max_slots=1, num_pages=5, pages_per_slot=8,
        page_size=128, prefill_chunk=128,
    )
    got = paged.run(r0)
    assert len(paged.slot_pages) == 0  # released
    assert paged.alloc.free_count == 4
    assert list(got[1].tokens) == list(want[1].tokens)


def test_rolling_engine_tokens_match_dense():
    """End-to-end: ServingEngine with a rolling cache emits token-identical
    output to the dense-cache engine (greedy sampling), while allocating a
    fraction of the KV memory."""
    from flash_attention_tpu.models.transformer import (
        ModelConfig, init_model_params,
    )
    from flash_attention_tpu.serving.engine import Request, ServingEngine

    # float32: the ring cache legitimately dispatches a different decode
    # block size (384- vs 512-row cache), and in bf16 the 1-ulp reduction
    # differences flip greedy-argmax ties.
    W = 96
    cfg_d = ModelConfig.tiny(sliding_window=W, dtype="float32")
    cfg_r = ModelConfig.tiny(sliding_window=W, rolling=True, dtype="float32")
    params = init_model_params(jax.random.key(4), cfg_d)

    rng = np.random.RandomState(7)
    prompts = [
        tuple(int(t) for t in rng.randint(0, 256, size=n))
        for n in (180, 120)  # > window so the ring actually rolls
    ]
    reqs = lambda: [
        Request(id=i, prompt=p, max_new_tokens=40)
        for i, p in enumerate(prompts)
    ]
    eng_d = ServingEngine(params, cfg_d, max_slots=2, max_seq=512)
    eng_r = ServingEngine(params, cfg_r, max_slots=2, max_seq=512)
    assert eng_r.caches[0].k.shape[2] < eng_d.caches[0].k.shape[2]
    out_d = eng_d.run(reqs())
    out_r = eng_r.run(reqs())
    for rid in out_d:
        assert list(out_d[rid].tokens) == list(out_r[rid].tokens), rid
