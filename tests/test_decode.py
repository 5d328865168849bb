"""Decode (flash-decoding) kernel vs. oracle, incl. quantized KV caches."""

import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_tpu.ops.decode import decode_attention, decode_attention_split
from flash_attention_tpu.ops.quant import dequantize, quantize_kv
from flash_attention_tpu.ops.reference import reference_attention
from flash_attention_tpu.utils.testing import assert_close, make_qkv


def _decode_oracle(q, k, v, lengths):
    out = reference_attention(q[:, :, None, :], k, v, kv_length=lengths)
    return out[:, :, 0, :]


def test_decode_mha():
    q, k, v = make_qkv(31, 2, 4, 1, 128, kv_seq=512)
    q = q[:, :, 0, :]
    lengths = jnp.array([512, 300], jnp.int32)
    got = decode_attention(q, k, v, lengths, block_kv=128)
    want = _decode_oracle(q, k, v, lengths)
    assert_close(got, want, msg="decode mha")


def test_decode_gqa():
    q, k, v = make_qkv(32, 2, 8, 1, 128, num_kv_heads=2, kv_seq=384)
    q = q[:, :, 0, :]
    lengths = jnp.array([384, 129], jnp.int32)
    got = decode_attention(q, k, v, lengths, block_kv=128)
    want = _decode_oracle(q, k, v, lengths)
    assert_close(got, want, msg="decode gqa")


def test_decode_short_lengths():
    """Lengths smaller than one KV block, incl. length=1."""
    q, k, v = make_qkv(33, 3, 2, 1, 128, kv_seq=256)
    q = q[:, :, 0, :]
    lengths = jnp.array([1, 17, 128], jnp.int32)
    got = decode_attention(q, k, v, lengths, block_kv=128)
    want = _decode_oracle(q, k, v, lengths)
    assert_close(got, want, msg="decode short lengths")


def test_decode_unaligned_cache():
    q, k, v = make_qkv(34, 1, 2, 1, 128, kv_seq=200)
    q = q[:, :, 0, :]
    lengths = jnp.array([200], jnp.int32)
    got = decode_attention(q, k, v, lengths, block_kv=128)
    want = _decode_oracle(q, k, v, lengths)
    assert_close(got, want, msg="decode unaligned cache")


def test_decode_head_dim_64():
    q, k, v = make_qkv(35, 1, 2, 1, 64, kv_seq=256)
    q = q[:, :, 0, :]
    lengths = jnp.array([256], jnp.int32)
    got = decode_attention(q, k, v, lengths, block_kv=128)
    want = _decode_oracle(q, k, v, lengths)
    assert_close(got, want, msg="decode head_dim=64")


def test_decode_residuals_match_reference_lse():
    from flash_attention_tpu.ops.reference import reference_attention_with_lse

    q, k, v = make_qkv(36, 1, 2, 1, 128, kv_seq=256)
    q = q[:, :, 0, :]
    lengths = jnp.array([256], jnp.int32)
    got, lse2 = decode_attention(q, k, v, lengths, block_kv=128, save_residuals=True)
    want, want_lse2 = reference_attention_with_lse(q[:, :, None, :], k, v)
    assert_close(got, want[:, :, 0, :], msg="decode+lse out")
    np.testing.assert_allclose(
        np.asarray(lse2), np.asarray(want_lse2[:, :, 0]), atol=2e-2, rtol=1e-3
    )


@pytest.mark.parametrize("mode", ["int8", "fp8_e4m3", "fp8_e5m2"])
def test_decode_quantized_kv(mode):
    q, k, v = make_qkv(37, 2, 4, 1, 128, kv_seq=384)
    q = q[:, :, 0, :]
    lengths = jnp.array([384, 250], jnp.int32)
    kq, vq = quantize_kv(k, v, mode)
    got = decode_attention(q, kq, vq, lengths, block_kv=128)
    # Judge against the oracle running on the DEQUANTIZED cache (isolates the
    # kernel's fused-dequant correctness from the quantization error itself)…
    want_dq = _decode_oracle(
        q, dequantize(kq, k.dtype), dequantize(vq, v.dtype), lengths
    )
    assert_close(got, want_dq, tolerance=0.02, msg=f"fused dequant {mode}")
    # …and against the fp16-class oracle within the reference tolerance
    # (quantization error stays within the 0.1 bar for U(-0.5,0.5) inputs).
    want = _decode_oracle(q, k, v, lengths)
    assert_close(got, want, msg=f"end-to-end {mode}")


@pytest.mark.parametrize("num_splits", [2, 4])
def test_decode_split_merge(num_splits):
    q, k, v = make_qkv(38, 2, 4, 1, 128, kv_seq=512)
    q = q[:, :, 0, :]
    lengths = jnp.array([512, 200], jnp.int32)
    got = decode_attention_split(q, k, v, lengths, num_splits=num_splits, block_kv=128)
    want = _decode_oracle(q, k, v, lengths)
    assert_close(got, want, msg=f"flash-decoding x{num_splits}")


def test_decode_split_merge_quantized():
    q, k, v = make_qkv(39, 1, 4, 1, 128, kv_seq=512)
    q = q[:, :, 0, :]
    lengths = jnp.array([450], jnp.int32)
    kq, vq = quantize_kv(k, v, "int8")
    got = decode_attention_split(q, kq, vq, lengths, num_splits=4, block_kv=128)
    want = _decode_oracle(q, k, v, lengths)
    assert_close(got, want, msg="flash-decoding int8")


def test_should_split_decode_gate():
    from flash_attention_tpu.ops.decode import should_split_decode

    # Fires: small batch x kv_heads, long context.
    assert should_split_decode(1, 8, 16384, 4096) > 1
    assert should_split_decode(2, 8, 16384, 4096) > 1
    # Silent: big batch or short context (split regresses there; v5e sweep).
    assert should_split_decode(32, 8, 8192, 4096) == 0
    assert should_split_decode(1, 8, 4096, 4096) == 0
    assert should_split_decode(4, 8, 8192, 4096) == 0  # b*kvh = 32 > 16


def test_decode_auto_split_matches_plain():
    """The auto-dispatched flash-decoding path is numerics-equivalent."""
    import jax.numpy as jnp

    from flash_attention_tpu.ops.decode import decode_attention

    q, k, v = make_qkv(21, 1, 8, 1, 128, num_kv_heads=2, kv_seq=8192)
    q = q[:, :, 0, :]
    lengths = jnp.asarray([7000], jnp.int32)
    auto = decode_attention(q, k, v, lengths, auto_split=True)  # gate fires
    plain = decode_attention(q, k, v, lengths, auto_split=False)
    np.testing.assert_allclose(
        np.asarray(auto, np.float32), np.asarray(plain, np.float32),
        rtol=2e-2, atol=2e-2,
    )
