"""Model layer tests: attention module prefill/decode consistency, tiny LM."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_tpu.models.attention import (
    AttentionConfig,
    attention_decode,
    attention_prefill,
    init_attention_params,
    init_kv_cache,
)
from flash_attention_tpu.models.rope import apply_rope
from flash_attention_tpu.models.transformer import (
    ModelConfig,
    decode_step,
    forward,
    init_caches,
    init_model_params,
    prefill,
)


def test_rope_rotation_preserves_norm():
    x = jax.random.normal(jax.random.key(0), (2, 4, 16, 64), jnp.float32)
    pos = jnp.arange(16)[None, None, :]
    r = apply_rope(x, pos)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(r), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1),
        rtol=1e-5,
    )


def test_rope_relative_property():
    """<rope(q,i), rope(k,j)> depends only on i-j."""
    q = jax.random.normal(jax.random.key(1), (1, 1, 1, 32), jnp.float32)
    k = jax.random.normal(jax.random.key(2), (1, 1, 1, 32), jnp.float32)
    def dot_at(i, j):
        qi = apply_rope(q, jnp.array([[[i]]]))
        kj = apply_rope(k, jnp.array([[[j]]]))
        return float(jnp.sum(qi * kj))
    assert abs(dot_at(5, 3) - dot_at(10, 8)) < 1e-4


@pytest.mark.parametrize("kv_quant", ["none", "int8"])
def test_prefill_then_decode_matches_full_prefill(kv_quant):
    """Decoding token T after prefilling T-1 must match prefilling T tokens."""
    cfg = AttentionConfig(
        model_dim=128, num_q_heads=4, num_kv_heads=2, head_dim=32,
        kv_quant=kv_quant, dtype="float32",
    )
    params = init_attention_params(jax.random.key(3), cfg)
    x = jax.random.normal(jax.random.key(4), (2, 16, 128), jnp.float32) * 0.1

    cache_full = init_kv_cache(cfg, 2, 64)
    out_full, _ = attention_prefill(params, cfg, x, cache_full)

    cache = init_kv_cache(cfg, 2, 64)
    _, cache = attention_prefill(params, cfg, x[:, :15, :], cache)
    out_last, cache = attention_decode(params, cfg, x[:, 15:16, :], cache)

    tol = 0.05 if kv_quant != "none" else 2e-2
    np.testing.assert_allclose(
        np.asarray(out_last[:, 0]), np.asarray(out_full[:, 15]), atol=tol
    )
    assert int(cache.lengths[0]) == 16


def test_tiny_lm_prefill_decode_consistency():
    cfg = ModelConfig.tiny(dtype="float32")
    params = init_model_params(jax.random.key(5), cfg)
    tokens = jax.random.randint(jax.random.key(6), (2, 12), 0, cfg.vocab_size)

    caches = init_caches(cfg, 2, 32)
    logits_full, _ = prefill(params, cfg, tokens, caches)

    caches = init_caches(cfg, 2, 32)
    _, caches = prefill(params, cfg, tokens[:, :11], caches)
    logits_step, caches = forward(params, cfg, tokens[:, 11:12], caches, decode=True)
    np.testing.assert_allclose(
        np.asarray(logits_step[:, 0]), np.asarray(logits_full[:, 11]), atol=0.05, rtol=0.05
    )


def test_tiny_lm_greedy_decode_runs():
    cfg = ModelConfig.tiny()
    params = init_model_params(jax.random.key(7), cfg)
    caches = init_caches(cfg, 2, 64)
    tokens = jax.random.randint(jax.random.key(8), (2, 8), 0, cfg.vocab_size)
    logits, caches = prefill(params, cfg, tokens, caches)
    next_tok = jnp.argmax(logits[:, -1:, :], axis=-1)
    for _ in range(3):
        next_tok, caches = decode_step(params, cfg, next_tok, caches)
    assert next_tok.shape == (2, 1)
    assert int(caches[0].lengths[0]) == 11


def test_write_cache_decode_at_capacity_drops():
    """A dense-cache decode write at max_seq must be dropped with the length
    frozen — dynamic_update_slice would clamp the position and silently
    replace the LAST live token's K/V."""
    from flash_attention_tpu.models.attention import (
        AttentionConfig,
        init_kv_cache,
        write_cache,
    )

    cfg = AttentionConfig(model_dim=64, num_q_heads=2, num_kv_heads=2, head_dim=32)
    cache = init_kv_cache(cfg, batch=2, max_seq=16)
    k1 = jnp.full((2, 2, 1, 32), 3.0, jnp.bfloat16)
    cache = write_cache(cfg, cache, k1, k1, jnp.asarray([15, 16], jnp.int32))
    # Batch 0 (pos 15, last row): written, length 16.
    assert float(cache.k[0, 0, 15, 0]) == 3.0
    assert int(cache.lengths[0]) == 16
    # Batch 1 (pos 16, AT capacity): dropped, last live row intact, frozen.
    assert float(cache.k[1, 0, 15, 0]) == 0.0
    assert int(cache.lengths[1]) == 16


def test_weight_quant_int8_close_to_bf16():
    """W8A16 weight-only quantization: same architecture, logits close to
    the bf16 model (per-output-channel int8 is near-lossless at these
    scales), and the full prefill+decode path runs on the quantized tree."""
    from flash_attention_tpu.models.transformer import (
        ModelConfig, init_model_params, init_caches, prefill,
        decode_step, quantize_model_weights,
    )
    from flash_attention_tpu.ops.quant import QuantizedTensor

    cfg = ModelConfig.tiny()
    params = init_model_params(jax.random.key(0), cfg)
    qparams = quantize_model_weights(params)
    assert isinstance(qparams["embed"], QuantizedTensor)
    assert qparams["layers"][0]["mlp"]["w_gate"].values.dtype == jnp.int8

    toks = jnp.asarray(
        np.random.RandomState(1).randint(0, cfg.vocab_size, (2, 16))
    )
    caches = init_caches(cfg, 2, 32)
    logits, caches_b = prefill(params, cfg, toks, caches)
    caches = init_caches(cfg, 2, 32)
    qlogits, caches_q = prefill(qparams, cfg, toks, caches)
    # int8 per-channel quantization error stays small relative to the
    # logits' own scale.
    scale = float(jnp.max(jnp.abs(logits)))
    err = float(jnp.max(jnp.abs(logits - qlogits)))
    assert err < 0.1 * scale + 0.05, (err, scale)

    # Decode runs end-to-end on the quantized tree.
    nt, caches_q = decode_step(
        qparams, cfg, jnp.argmax(qlogits[:, -1:, :], axis=-1).astype(jnp.int32),
        caches_q,
    )
    assert nt.shape == (2, 1)


def test_weight_quant_cfg_init():
    from flash_attention_tpu.models.transformer import (
        ModelConfig, init_model_params,
    )
    from flash_attention_tpu.ops.quant import QuantizedTensor

    cfg = ModelConfig.tiny(weight_quant="int8")
    params = init_model_params(jax.random.key(0), cfg)
    assert isinstance(params["layers"][0]["attn"]["wq"], QuantizedTensor)
