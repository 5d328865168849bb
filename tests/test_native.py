"""Native (C++) component tests: scheduler state machine + fp32 oracle.

The oracle is checked against the JAX fp32 reference (two independent
implementations of the contract from flash_attention.cu:668-697 must agree).
"""

import ctypes

import numpy as np
import pytest

from flash_attention_tpu.serving.scheduler import ContinuousBatchScheduler


def test_scheduler_lifecycle():
    s = ContinuousBatchScheduler(max_slots=2, max_seq=64)
    assert s.submit(10, prompt_len=8, max_new_tokens=4)
    assert s.submit(11, prompt_len=8, max_new_tokens=2)
    assert s.submit(12, prompt_len=8, max_new_tokens=3)  # queued, no slot yet

    admitted = s.admit()
    assert [r for r, _ in admitted] == [10, 11]
    slots = {r: sl for r, sl in admitted}
    st = s.stats()
    assert (st.queued, st.prefilling, st.decoding, st.free_slots) == (1, 2, 0, 0)

    for _, sl in admitted:
        s.prefill_done(sl)
    assert sorted(s.active_slots()) == sorted(slots.values())

    # req 11 budget is 2: second token finishes it and frees the slot.
    assert not s.record_token(slots[11], is_eos=False)
    assert s.record_token(slots[11], is_eos=False)
    assert s.slot_request(slots[11]) is None

    # req 12 is admitted into the freed slot.
    admitted2 = s.admit()
    assert [r for r, _ in admitted2] == [12]
    assert admitted2[0][1] == slots[11]

    # EOS finishes early regardless of budget.
    assert s.record_token(slots[10], is_eos=True)
    assert s.stats().completed == 2
    s.close()


def test_scheduler_rejects_oversized():
    s = ContinuousBatchScheduler(max_slots=1, max_seq=32)
    assert not s.submit(1, prompt_len=30, max_new_tokens=10)  # 40 > 32
    assert s.stats().rejected == 1
    s.close()


def test_scheduler_fifo_order():
    s = ContinuousBatchScheduler(max_slots=4, max_seq=64)
    for i in range(6):
        s.submit(i, 4, 4)
    assert [r for r, _ in s.admit()] == [0, 1, 2, 3]
    s.close()


def _cpp_oracle(q, k, v, causal, scale, kv_lengths=None):
    from flash_attention_tpu import native

    lib = native.load()
    b, hq, sq, d = q.shape
    _, hkv, skv, _ = k.shape
    out = np.zeros_like(q, dtype=np.float32)
    qf = np.ascontiguousarray(q, np.float32)
    kf = np.ascontiguousarray(k, np.float32)
    vf = np.ascontiguousarray(v, np.float32)
    lens = (
        np.ascontiguousarray(kv_lengths, np.int32)
        if kv_lengths is not None
        else None
    )
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    lib.fat_oracle_attention(
        qf.ctypes.data_as(fp), kf.ctypes.data_as(fp), vf.ctypes.data_as(fp),
        out.ctypes.data_as(fp),
        b, hq, hkv, sq, skv, d, int(causal), ctypes.c_float(scale),
        lens.ctypes.data_as(ip) if lens is not None else None,
    )
    return out


@pytest.mark.parametrize("causal", [False, True])
def test_cpp_oracle_matches_jax_oracle(causal):
    import jax.numpy as jnp

    from flash_attention_tpu.ops.reference import reference_attention
    from flash_attention_tpu.utils.testing import make_qkv

    q, k, v = make_qkv(0, 2, 4, 64, 32, num_kv_heads=2, dtype=jnp.float32)
    want = reference_attention(q, k, v, causal=causal, out_dtype=jnp.float32)
    got = _cpp_oracle(np.asarray(q), np.asarray(k), np.asarray(v), causal, 32**-0.5)
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-4)


def test_cpp_oracle_kv_lengths():
    import jax.numpy as jnp

    from flash_attention_tpu.ops.reference import reference_attention
    from flash_attention_tpu.utils.testing import make_qkv

    q, k, v = make_qkv(1, 2, 2, 48, 32, dtype=jnp.float32)
    lengths = np.array([17, 48], np.int32)
    want = reference_attention(
        q, k, v, kv_length=jnp.asarray(lengths), out_dtype=jnp.float32
    )
    got = _cpp_oracle(
        np.asarray(q), np.asarray(k), np.asarray(v), False, 32**-0.5, lengths
    )
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-4)
