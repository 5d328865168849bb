"""Flash-attention kernel vs. fp32 oracle.

Mirrors + extends the reference's four correctness cases (C9, SURVEY.md §4;
flash_attention.cu:757-884) and fixes its documented coverage gaps: causal
long-seq, non-block-multiple seqs, GQA, residual (LSE) output, fp16 dtype.
Shapes are scaled down where the reference used seq=1024/2048 at heads=32 —
interpreter-mode runtime, same code paths (block boundaries, masking tiers).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_tpu.ops.flash_attention import flash_attention
from flash_attention_tpu.ops.reference import (
    reference_attention,
    reference_attention_with_lse,
)
from flash_attention_tpu.ops.tuning import BlockSizes
from flash_attention_tpu.utils.testing import assert_close, make_qkv

BS = BlockSizes(block_q=128, block_kv=128)


# The reference's four cases (ragged short causal / causal / non-causal /
# long-seq big-block tier), reduced heads for test speed.
REFERENCE_CASES = [
    dict(seq=256, heads=4, causal=True),
    dict(seq=512, heads=2, causal=True),
    dict(seq=512, heads=2, causal=False),
    dict(seq=1024, heads=1, causal=False),
    # The gap the reference never covered (SURVEY.md §4): causal long-seq.
    dict(seq=1024, heads=1, causal=True),
]


@pytest.mark.parametrize("case", REFERENCE_CASES, ids=lambda c: f"s{c['seq']}_c{int(c['causal'])}")
def test_reference_cases(case):
    q, k, v = make_qkv(42, 1, case["heads"], case["seq"], 128)
    got = flash_attention(q, k, v, causal=case["causal"], block_sizes=BS)
    want = reference_attention(q, k, v, causal=case["causal"])
    assert_close(got, want, msg=f"{case}")


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("seq", [128, 200, 384, 640])
def test_ragged_seq_lengths(seq, causal):
    """Sequences that are not multiples of the block sizes (padding + masking)."""
    q, k, v = make_qkv(3, 1, 2, seq, 128)
    got = flash_attention(q, k, v, causal=causal, block_sizes=BS)
    want = reference_attention(q, k, v, causal=causal)
    assert_close(got, want, msg=f"seq={seq} causal={causal}")


@pytest.mark.parametrize("causal", [False, True])
def test_block_size_sweep(causal):
    """Numerics must be invariant to block-size choice (the dispatcher's whole
    config space, mirroring the reference's 4 tiers)."""
    q, k, v = make_qkv(9, 1, 1, 512, 128)
    want = reference_attention(q, k, v, causal=causal)
    for bq, bkv in [(128, 128), (256, 128), (128, 256), (256, 512), (512, 256)]:
        got = flash_attention(
            q, k, v, causal=causal, block_sizes=BlockSizes(block_q=bq, block_kv=bkv)
        )
        assert_close(got, want, msg=f"bq={bq} bkv={bkv} causal={causal}")


@pytest.mark.parametrize("causal", [False, True])
def test_gqa(causal):
    q, k, v = make_qkv(5, 2, 8, 256, 128, num_kv_heads=2)
    got = flash_attention(q, k, v, causal=causal, block_sizes=BS)
    want = reference_attention(q, k, v, causal=causal)
    assert_close(got, want, msg=f"gqa causal={causal}")


def test_mqa():
    q, k, v = make_qkv(6, 1, 4, 256, 128, num_kv_heads=1)
    got = flash_attention(q, k, v, causal=True, block_sizes=BS)
    want = reference_attention(q, k, v, causal=True)
    assert_close(got, want, msg="mqa")


@pytest.mark.parametrize("causal", [False, True])
def test_cross_attention_kv_longer(causal):
    """q_seq != kv_seq (chunked prefill / cross attention). Causal aligns the
    last query with the last key (decode convention)."""
    q, k, v = make_qkv(8, 1, 2, 128, 128, kv_seq=512)
    got = flash_attention(q, k, v, causal=causal, block_sizes=BS)
    want = reference_attention(q, k, v, causal=causal)
    assert_close(got, want, msg=f"cross causal={causal}")


def test_fp16_io():
    q, k, v = make_qkv(11, 1, 2, 256, 128, dtype=jnp.float16)
    got = flash_attention(q, k, v, causal=True, block_sizes=BS)
    assert got.dtype == jnp.float16
    want = reference_attention(q, k, v, causal=True)
    assert_close(got, want, msg="fp16")


def test_fp32_io():
    q, k, v = make_qkv(12, 1, 2, 256, 128, dtype=jnp.float32)
    got = flash_attention(q, k, v, block_sizes=BS)
    want = reference_attention(q, k, v)
    assert_close(got, want, tolerance=1e-3, msg="fp32")


def test_head_dim_64_padding():
    q, k, v = make_qkv(13, 1, 2, 256, 64)
    got = flash_attention(q, k, v, causal=True, block_sizes=BS)
    want = reference_attention(q, k, v, causal=True)
    assert_close(got, want, msg="head_dim=64")


@pytest.mark.parametrize("causal", [False, True])
def test_head_dim_64_unpadded(causal):
    """d64_unpadded keeps the 64-lane minor dim end to end (no HBM zero-pad);
    numerics must match the padded path exactly."""
    import dataclasses

    q, k, v = make_qkv(13, 2, 4, 384, 64)
    bs = dataclasses.replace(BS, d64_unpadded=True)
    got = flash_attention(q, k, v, causal=causal, block_sizes=bs)
    want = reference_attention(q, k, v, causal=causal)
    assert_close(got, want, msg=f"head_dim=64 unpadded causal={causal}")


def test_head_dim_64_unpadded_subtile_and_hb():
    import dataclasses

    q, k, v = make_qkv(17, 1, 8, 512, 64)
    bs = dataclasses.replace(BS, block_h=4, block_sub=128, d64_unpadded=True)
    got = flash_attention(q, k, v, causal=True, block_sizes=bs)
    want = reference_attention(q, k, v, causal=True)
    assert_close(got, want, msg="head_dim=64 unpadded subtile+hb")


@pytest.mark.parametrize("causal", [False, True])
def test_lse_residuals(causal):
    q, k, v = make_qkv(14, 1, 2, 256, 128)
    got, lse2 = flash_attention(
        q, k, v, causal=causal, block_sizes=BS, save_residuals=True
    )
    want, want_lse2 = reference_attention_with_lse(q, k, v, causal=causal)
    assert_close(got, want, msg="lse output")
    np.testing.assert_allclose(
        np.asarray(lse2), np.asarray(want_lse2), atol=2e-2, rtol=1e-3
    )


def test_custom_scale():
    q, k, v = make_qkv(15, 1, 2, 256, 128)
    got = flash_attention(q, k, v, sm_scale=0.5, block_sizes=BS)
    want = reference_attention(q, k, v, sm_scale=0.5)
    assert_close(got, want, msg="sm_scale=0.5")


def test_batched():
    q, k, v = make_qkv(16, 4, 2, 256, 128)
    got = flash_attention(q, k, v, causal=True, block_sizes=BS)
    want = reference_attention(q, k, v, causal=True)
    assert_close(got, want, msg="batch=4")


def test_gqa_head_batching():
    """block_h spanning whole KV groups (in-kernel KV expansion) matches the
    oracle across batch elements, including the single-step path."""

    for (b, hq, hkv, hb, seq, causal) in [
        (2, 8, 2, 4, 256, True),   # hb == group
        (2, 8, 2, 8, 256, False),  # hb == 2 groups
        (1, 8, 4, 4, 384, True),   # group 2
        (2, 8, 2, 4, 128, False),  # single-step path with kv expansion
    ]:
        q, k, v = make_qkv(0, b, hq, seq, 128, num_kv_heads=hkv)
        bs = BlockSizes(block_q=128, block_kv=128, block_h=hb)
        got = flash_attention(q, k, v, causal=causal, block_sizes=bs)
        want = reference_attention(q, k, v, causal=causal)
        assert_close(got, want, msg=f"b={b} hq={hq} hkv={hkv} hb={hb}")


def test_causal_subtile_configs():
    """Causal single-superblock sub-tiling (block_sub): per-row-block
    live-prefix MMAs must match the oracle across MHA/GQA, padding, and
    kv_len > q_len diagonal offsets."""
    cases = [
        # (batch, q_heads, kv_heads, q_len, kv_len, bs)
        (1, 4, 4, 512, 512, BlockSizes(512, 512, 4, 128)),
        (1, 4, 4, 640, 640, BlockSizes(640, 640, 2, 128)),  # ragged pad
        (2, 8, 2, 512, 512, BlockSizes(512, 512, 8, 128)),  # GQA in-kernel
        (1, 2, 2, 256, 512, BlockSizes(256, 512, 2, 128)),  # diag offset
        (1, 2, 2, 512, 512, BlockSizes(512, 512, 1, 256)),  # wider sub
    ]
    for batch, hq, hkv, qs, ks, bs in cases:
        q, k, v = make_qkv(11, batch, hq, qs, 128, num_kv_heads=hkv, kv_seq=ks)
        got = flash_attention(q, k, v, causal=True, block_sizes=bs)
        want = reference_attention(q, k, v, causal=True)
        assert_close(got, want, msg=f"subtile {bs}")


def test_causal_subtile_lse_matches_tiled():
    """The subtile path's LSE residual must agree with the multi-block
    online-softmax path (the split/ring merge contract)."""
    q, k, v = make_qkv(12, 1, 2, 512, 128)
    out_a, lse_a = flash_attention(
        q, k, v, causal=True, save_residuals=True,
        block_sizes=BlockSizes(512, 512, 2, 128),
    )
    out_b, lse_b = flash_attention(
        q, k, v, causal=True, save_residuals=True, block_sizes=BS
    )
    assert_close(out_a, out_b)
    np.testing.assert_allclose(
        np.asarray(lse_a), np.asarray(lse_b), rtol=1e-3, atol=1e-3
    )


def test_causal_subtile_softcap():
    q, k, v = make_qkv(13, 1, 2, 512, 128)
    got = flash_attention(
        q, k, v, causal=True, logit_softcap=30.0,
        block_sizes=BlockSizes(512, 512, 2, 128),
    )
    want = reference_attention(q, k, v, causal=True, logit_softcap=30.0)
    assert_close(got, want)


def test_causal_diag_subtile_configs():
    """Multi-block causal diag sub-tiling (block_q == block_kv < seq with
    block_sub): diagonal steps run live-prefix sub-MMAs merged into the
    online state; interior steps are mask-free. Must match the oracle across
    MHA/GQA, head batching, sub widths, and aligned chunked-prefill offsets."""
    cases = [
        # (batch, q_heads, kv_heads, q_len, kv_len, bs)
        (1, 2, 2, 512, 512, BlockSizes(128, 128, 1, 128)),  # sub==bq: inert
        (1, 2, 2, 512, 512, BlockSizes(256, 256, 1, 128)),
        (1, 2, 2, 768, 768, BlockSizes(256, 256, 2, 128)),
        (2, 4, 4, 512, 512, BlockSizes(256, 256, 4, 128)),
        (1, 8, 2, 512, 512, BlockSizes(256, 256, 4, 128)),  # GQA spans groups
        (1, 2, 2, 1024, 1024, BlockSizes(512, 512, 1, 256)),
        # aligned chunked-prefill: q_len < kv_len, offset % block_kv == 0
        (1, 2, 2, 256, 512, BlockSizes(256, 256, 1, 128)),
    ]
    for batch, hq, hkv, qs, ks, bs in cases:
        q, k, v = make_qkv(17, batch, hq, qs, 128, num_kv_heads=hkv, kv_seq=ks)
        got = flash_attention(q, k, v, causal=True, block_sizes=bs)
        want = reference_attention(q, k, v, causal=True)
        assert_close(got, want, msg=f"diag subtile {qs}/{ks} {bs}")


def test_causal_diag_subtile_lse_and_grad():
    """Diag-subtile LSE must match the plain tri grid's, and the backward
    (which consumes the residuals forward) must stay correct."""
    import jax

    q, k, v = make_qkv(18, 1, 2, 768, 128)
    bs = BlockSizes(256, 256, 2, 128)
    out_a, lse_a = flash_attention(
        q, k, v, causal=True, save_residuals=True, block_sizes=bs
    )
    out_b, lse_b = flash_attention(
        q, k, v, causal=True, save_residuals=True, block_sizes=BS
    )
    assert_close(out_a, out_b)
    np.testing.assert_allclose(
        np.asarray(lse_a), np.asarray(lse_b), rtol=1e-3, atol=1e-3
    )

    def loss(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, causal=True, block_sizes=bs).astype(
                jnp.float32
            )
            ** 2
        )

    def loss_ref(q, k, v):
        return jnp.sum(
            reference_attention(q, k, v, causal=True).astype(jnp.float32) ** 2
        )

    got = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        assert_close(g, w, msg=f"d{name}")


def test_causal_diag_subtile_softcap():
    q, k, v = make_qkv(19, 1, 2, 512, 128)
    got = flash_attention(
        q, k, v, causal=True, logit_softcap=30.0,
        block_sizes=BlockSizes(256, 256, 1, 128),
    )
    want = reference_attention(q, k, v, causal=True, logit_softcap=30.0)
    assert_close(got, want)


def test_rejects_batch_or_head_dim_mismatch():
    """A q/kv batch mismatch must raise: Mosaic CLAMPS out-of-bounds block
    indices, so the kernel would silently attend another row's K/V."""
    import pytest

    q, k, v = make_qkv(70, 2, 2, 128, 128)
    with pytest.raises(ValueError, match="q/kv shape mismatch"):
        flash_attention(q, k[:1], v[:1], causal=True)
    with pytest.raises(ValueError, match="q/kv shape mismatch"):
        flash_attention(q[:, :, :, :64], k, v, causal=True)


def test_lse_narrow_matches_default():
    """lse_narrow emits the LSE residual 1 lane wide instead of
    LANES-broadcast; values and downstream gradients must be identical."""
    import dataclasses

    q, k, v = make_qkv(31, 1, 4, 512, 128)
    base = BS
    narrow = dataclasses.replace(BS, lse_narrow=True)
    for causal in (False, True):
        o0, l0 = flash_attention(
            q, k, v, causal=causal, block_sizes=base, save_residuals=True
        )
        o1, l1 = flash_attention(
            q, k, v, causal=causal, block_sizes=narrow, save_residuals=True
        )
        assert_close(o0, o1, tolerance=1e-6)
        np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), atol=1e-6)

    # Gradients through the narrow residuals path (res_block_sizes is the
    # under-grad forward config).
    import jax

    w = jax.random.normal(jax.random.key(6), q.shape)

    def loss(bs):
        def f(q, k, v):
            return jnp.sum(
                flash_attention(q, k, v, causal=True, block_sizes=bs).astype(
                    jnp.float32
                )
                * w
            )
        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    g0 = loss(base)
    g1 = loss(narrow)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=1e-6
        )
