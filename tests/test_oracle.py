"""Oracle self-consistency tests (the judge must itself be right)."""

import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_tpu.ops.reference import (
    reference_attention,
    reference_attention_with_lse,
)
from flash_attention_tpu.utils.testing import make_qkv


def _numpy_attention(q, k, v, causal):
    """Independent float64 numpy implementation (cross-check of the oracle)."""
    q = np.asarray(q, np.float64)
    k = np.asarray(k, np.float64)
    v = np.asarray(v, np.float64)
    b, h, s, d = q.shape
    scale = 1.0 / np.sqrt(d)
    scores = np.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if causal:
        mask = np.tril(np.ones((s, s), bool))
        scores = np.where(mask, scores, -np.inf)
    scores -= scores.max(axis=-1, keepdims=True)
    w = np.exp(scores)
    w /= w.sum(axis=-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", w, v)


@pytest.mark.parametrize("causal", [False, True])
def test_oracle_matches_numpy(causal):
    q, k, v = make_qkv(42, 1, 2, 64, 32, dtype=jnp.float32)
    got = reference_attention(q, k, v, causal=causal)
    want = _numpy_attention(q, k, v, causal)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_oracle_gqa_broadcast():
    q, k, v = make_qkv(0, 2, 8, 32, 16, num_kv_heads=2, dtype=jnp.float32)
    got = reference_attention(q, k, v)
    # Manually repeat kv heads and compare against MHA path.
    k_rep = jnp.repeat(k, 4, axis=1)
    v_rep = jnp.repeat(v, 4, axis=1)
    want = reference_attention(q, k_rep, v_rep)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_oracle_kv_length_masking():
    q, k, v = make_qkv(1, 2, 2, 32, 16, dtype=jnp.float32)
    lengths = jnp.array([16, 32])
    got = reference_attention(q, k, v, kv_length=lengths)
    # Element 0 must equal attention over just its 16-long prefix.
    want0 = reference_attention(q[:1, :, :, :], k[:1, :, :16], v[:1, :, :16])
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want0[0]), atol=1e-5)
    # Element 1 sees everything.
    want1 = reference_attention(q[1:], k[1:], v[1:])
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want1[0]), atol=1e-6)


@pytest.mark.parametrize("causal", [False, True])
def test_oracle_lse_consistent(causal):
    q, k, v = make_qkv(7, 1, 2, 48, 32, dtype=jnp.float32)
    out_plain = reference_attention(q, k, v, causal=causal)
    out_lse, lse2 = reference_attention_with_lse(q, k, v, causal=causal)
    np.testing.assert_allclose(
        np.asarray(out_plain), np.asarray(out_lse), atol=1e-5
    )
    assert lse2.shape == (1, 2, 48)
    assert np.all(np.isfinite(np.asarray(lse2)))


def test_oracle_fully_masked_rows_are_zero():
    """Zero-length KV slots and dead packed rows emit ZEROS from the oracle,
    matching the kernels' l == 0 guard (bare softmax over uniformly-masked
    scores would return the unweighted mean of V)."""
    q, k, v = make_qkv(21, 2, 2, 4, 32)
    out = reference_attention(q, k, v, kv_length=jnp.asarray([0, 3], jnp.int32))
    assert np.all(np.asarray(out[0]) == 0.0)
    assert not np.all(np.asarray(out[1]) == 0.0)

    from flash_attention_tpu.ops.reference import reference_attention_with_lse

    out2, lse2 = reference_attention_with_lse(
        q, k, v, kv_length=jnp.asarray([0, 3], jnp.int32)
    )
    assert np.all(np.asarray(out2[0]) == 0.0)
    assert np.all(np.isneginf(np.asarray(lse2[0])))


def test_oracle_rejects_noncausal_window():
    """Match the fused kernel's contract instead of silently computing FULL
    attention for a config the kernel rejects."""
    import pytest

    q, k, v = make_qkv(22, 1, 2, 8, 32)
    with pytest.raises(ValueError, match="sliding_window"):
        reference_attention(q, k, v, causal=False, sliding_window=4)
