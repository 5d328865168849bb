"""KV-cache checkpoint/resume: exact decode-continuation equivalence."""

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
from flash_attention_tpu.utils.checkpoint import load_kv_cache, save_kv_cache


def _make(cfg, batch=2, max_seq=128, seed=0):
    params = init_attention_params(jax.random.key(seed), cfg)
    cache = init_kv_cache(cfg, batch, max_seq)
    x = jax.random.normal(
        jax.random.key(seed + 1), (batch, 16, cfg.model_dim), jnp.float32
    ).astype(cfg.jnp_dtype)
    return params, cache, x


@pytest.mark.parametrize("kv_quant", ["none", "int8", "fp8_e4m3"])
def test_dense_cache_roundtrip_decode_equivalence(tmp_path, kv_quant):
    cfg = AttentionConfig(
        model_dim=64, num_q_heads=4, num_kv_heads=2, head_dim=128,
        kv_quant=kv_quant,
    )
    params, cache, x = _make(cfg)
    _, cache = attention_prefill(params, cfg, x, cache)

    path = tmp_path / "cache.npz"
    save_kv_cache(path, cache)
    template = init_kv_cache(cfg, 2, 128)
    restored = load_kv_cache(path, template)

    # Bit-exact restore of every leaf (incl. quantized payloads + scales).
    for a, b in zip(
        jax.tree_util.tree_leaves(cache), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Decode continuation must be token-identical to the uninterrupted run.
    step = jax.random.normal(
        jax.random.key(9), (2, 1, cfg.model_dim), jnp.float32
    ).astype(cfg.jnp_dtype)
    out_live, cache_live = attention_decode(params, cfg, step, cache)
    out_rest, cache_rest = attention_decode(params, cfg, step, restored)
    np.testing.assert_array_equal(np.asarray(out_live), np.asarray(out_rest))
    for a, b in zip(
        jax.tree_util.tree_leaves(cache_live),
        jax.tree_util.tree_leaves(cache_rest),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_paged_cache_roundtrip(tmp_path):
    from tests.test_paged import build_scattered_cache
    from flash_attention_tpu.ops.paged import paged_decode_attention
    from flash_attention_tpu.utils.testing import make_qkv

    lengths = np.array([300, 130], np.int32)
    cache, _, _ = build_scattered_cache(11, 2, 2, lengths, 4)
    path = tmp_path / "paged.npz"
    save_kv_cache(path, cache)
    template = jax.tree_util.tree_map(jnp.zeros_like, cache)
    restored = load_kv_cache(path, template)

    q, _, _ = make_qkv(12, 2, 4, 1, 128)
    q = q[:, :, 0, :]
    a = paged_decode_attention(q, cache)
    b = paged_decode_attention(q, restored)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mismatched_template_fails(tmp_path):
    cfg = AttentionConfig(model_dim=64, num_q_heads=4, num_kv_heads=2)
    _, cache, _ = _make(cfg)
    path = tmp_path / "c.npz"
    save_kv_cache(path, cache)
    with pytest.raises(ValueError, match="template|mismatch"):
        load_kv_cache(path, init_kv_cache(cfg, 2, 256))  # wrong max_seq
    bad_cfg = AttentionConfig(
        model_dim=64, num_q_heads=4, num_kv_heads=2, kv_quant="int8"
    )
    with pytest.raises(ValueError, match="leaves|structure"):
        load_kv_cache(path, init_kv_cache(bad_cfg, 2, 128))  # extra scales
