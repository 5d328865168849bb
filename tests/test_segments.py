"""Packed-sequence (segment ids) attention vs the fp32 oracle.

The reference has no packing support (single-sequence benchmark); this is the
packed-pretraining contract: positions attend only within their own segment,
composing with causal masking, GQA, sub-tiled causal configs, soft-caps, and
gradients. A packed batch must reproduce the per-document unpacked results
exactly (up to the usual 0.1 fused-kernel tolerance).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_tpu.ops.flash_attention import flash_attention
from flash_attention_tpu.ops.reference import reference_attention
from flash_attention_tpu.ops.tuning import BlockSizes
from flash_attention_tpu.utils.testing import assert_close, make_qkv


def make_segments(batch, seq, boundaries):
    """Segment ids [batch, seq] splitting each row at `boundaries`."""
    ids = np.zeros((batch, seq), np.int32)
    for b in range(batch):
        for i, cut in enumerate(boundaries):
            ids[b, cut:] = i + 1
    return jnp.asarray(ids)


@pytest.mark.parametrize("causal", [False, True])
def test_segments_match_oracle(causal):
    q, k, v = make_qkv(31, 2, 4, 256, 128)
    seg = make_segments(2, 256, [100, 180])
    got = flash_attention(
        q, k, v, causal=causal, segment_ids=seg,
        block_sizes=BlockSizes(128, 128),
    )
    want = reference_attention(q, k, v, causal=causal, segment_ids=seg)
    assert_close(got, want, msg=f"causal={causal}")


def test_segments_subtile_config():
    """Segment masking inside the causal single-superblock sub-tiled path."""
    q, k, v = make_qkv(32, 1, 4, 512, 128)
    seg = make_segments(1, 512, [200, 400])
    got = flash_attention(
        q, k, v, causal=True, segment_ids=seg,
        block_sizes=BlockSizes(512, 512, 4, 128),
    )
    want = reference_attention(q, k, v, causal=True, segment_ids=seg)
    assert_close(got, want)


def test_segments_gqa_and_softcap():
    q, k, v = make_qkv(33, 2, 8, 256, 128, num_kv_heads=2)
    seg = make_segments(2, 256, [128])
    got = flash_attention(
        q, k, v, causal=True, segment_ids=seg, logit_softcap=30.0,
        block_sizes=BlockSizes(128, 128),
    )
    want = reference_attention(
        q, k, v, causal=True, segment_ids=seg, logit_softcap=30.0
    )
    assert_close(got, want)


def test_packed_equals_unpacked():
    """A 2-doc packed row must equal the two docs attended separately."""
    q, k, v = make_qkv(34, 1, 2, 256, 128)
    cut = 128
    seg = make_segments(1, 256, [cut])
    packed = flash_attention(
        q, k, v, causal=True, segment_ids=seg,
        block_sizes=BlockSizes(128, 128),
    )
    doc0 = flash_attention(
        q[:, :, :cut], k[:, :, :cut], v[:, :, :cut], causal=True,
        block_sizes=BlockSizes(128, 128),
    )
    doc1 = flash_attention(
        q[:, :, cut:], k[:, :, cut:], v[:, :, cut:], causal=True,
        block_sizes=BlockSizes(128, 128),
    )
    np.testing.assert_allclose(
        np.asarray(packed[:, :, :cut], np.float32),
        np.asarray(doc0, np.float32), rtol=0.02, atol=0.02,
    )
    np.testing.assert_allclose(
        np.asarray(packed[:, :, cut:], np.float32),
        np.asarray(doc1, np.float32), rtol=0.02, atol=0.02,
    )


def test_segments_gradients():
    """Backward: packed grads must match jax.grad of the oracle."""
    q, k, v = make_qkv(35, 1, 2, 256, 128)
    seg = make_segments(1, 256, [150])

    def f(q, k, v):
        return jnp.sum(
            flash_attention(
                q, k, v, causal=True, segment_ids=seg,
                block_sizes=BlockSizes(128, 128),
                bwd_block_sizes=BlockSizes(128, 128),
            ).astype(jnp.float32)
        )

    def g(q, k, v):
        return jnp.sum(
            reference_attention(
                q, k, v, causal=True, segment_ids=seg
            ).astype(jnp.float32)
        )

    got = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(g, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", got, want):
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        assert err < 0.1, f"d{name} max err {err}"


def test_segments_validation():
    q, k, v = make_qkv(36, 1, 2, 128, 128)
    with pytest.raises(ValueError, match="segment_ids shape"):
        flash_attention(q, k, v, segment_ids=jnp.zeros((1, 64), jnp.int32))
    q2 = q[:, :, :64]
    with pytest.raises(ValueError, match="q_seq == kv_seq"):
        flash_attention(
            q2, k, v, causal=True,
            segment_ids=jnp.zeros((1, 128), jnp.int32),
        )
