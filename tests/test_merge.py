"""Split/merge primitive vs. oracle — the reference never tested its merge
path (dead code, SURVEY.md §4); we spec and test it as a first-class op."""

import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_tpu.ops.flash_attention import flash_attention
from flash_attention_tpu.ops.merge import merge_partial_attention, merge_two
from flash_attention_tpu.ops.reference import reference_attention
from flash_attention_tpu.ops.tuning import BlockSizes
from flash_attention_tpu.utils.testing import assert_close, make_qkv

BS = BlockSizes(block_q=128, block_kv=128)


@pytest.mark.parametrize("num_splits", [2, 4])
def test_merge_equals_full_attention(num_splits):
    """Attention over KV splits + LSE merge == attention over full KV."""
    q, k, v = make_qkv(21, 1, 2, 128, 128, kv_seq=512)
    want = reference_attention(q, k, v)

    split = 512 // num_splits
    os, lses = [], []
    for s in range(num_splits):
        ks = k[:, :, s * split : (s + 1) * split]
        vs = v[:, :, s * split : (s + 1) * split]
        o, lse2 = flash_attention(q, ks, vs, block_sizes=BS, save_residuals=True)
        os.append(o)
        lses.append(lse2)
    merged, _ = merge_partial_attention(jnp.stack(os), jnp.stack(lses))
    assert_close(merged, want, msg=f"merge x{num_splits}")


def test_merge_two_running_combine():
    """Sequential merge_two over parts == batch merge == full attention."""
    q, k, v = make_qkv(22, 1, 1, 128, 128, kv_seq=384)
    want = reference_attention(q, k, v)
    o = None
    lse = None
    for s in range(3):
        ks = k[:, :, s * 128 : (s + 1) * 128]
        vs = v[:, :, s * 128 : (s + 1) * 128]
        o_s, lse_s = flash_attention(q, ks, vs, block_sizes=BS, save_residuals=True)
        if o is None:
            o, lse = o_s, lse_s
        else:
            o, lse = merge_two(o, lse, o_s, lse_s)
    assert_close(o, want, msg="merge_two chain")


def test_merge_handles_empty_split():
    """A split whose rows are all -inf LSE contributes nothing."""
    q, k, v = make_qkv(23, 1, 1, 128, 128, kv_seq=256)
    o1, lse1 = flash_attention(q, k, v, block_sizes=BS, save_residuals=True)
    o_empty = jnp.zeros_like(o1)
    lse_empty = jnp.full_like(lse1, -jnp.inf)
    merged, lse_m = merge_partial_attention(
        jnp.stack([o1, o_empty]), jnp.stack([lse1, lse_empty])
    )
    np.testing.assert_allclose(
        np.asarray(merged, np.float32), np.asarray(o1, np.float32), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(lse_m), np.asarray(lse1), atol=1e-5
    )


def test_merge_all_empty_is_zero():
    o = jnp.ones((2, 1, 4, 8), jnp.float32)
    lse = jnp.full((2, 1, 4), -jnp.inf)
    merged, lse_m = merge_partial_attention(
        jnp.stack([o, o]), jnp.stack([lse, lse])
    )
    assert np.all(np.asarray(merged) == 0.0)
    assert np.all(np.isneginf(np.asarray(lse_m)))


def test_merge_negative_axis_matches_positive():
    """A negative axis names the split dim of o_parts; lse_parts has one
    fewer dim, so raw moveaxis on both would diverge — the normalization
    must make them agree."""
    rng = np.random.RandomState(7)
    o = jnp.asarray(rng.randn(2, 3, 4, 8), jnp.float32)  # [B, s, q, d]
    lse = jnp.asarray(rng.randn(2, 3, 4), jnp.float32)  # [B, s, q]
    got_o, got_l = merge_partial_attention(o, lse, axis=-3)
    want_o, want_l = merge_partial_attention(o, lse, axis=1)
    np.testing.assert_allclose(np.asarray(got_o), np.asarray(want_o), atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_l), np.asarray(want_l), atol=1e-6)


def test_merge_rejects_bad_shapes():
    import pytest

    o = jnp.ones((2, 4, 8), jnp.float32)
    with pytest.raises(ValueError, match="lse_parts shape"):
        merge_partial_attention(o, jnp.ones((2, 5), jnp.float32))
    with pytest.raises(ValueError, match="axis"):
        merge_partial_attention(o, jnp.ones((2, 4), jnp.float32), axis=-1)
