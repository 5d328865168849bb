"""Randomized cross-feature fuzz: forward and gradients vs the fp32 oracle.

The per-feature test files enumerate each option against the oracle in
isolation (plus a few hand-picked pairs); this file samples the full cross
product — ragged shapes, GQA groups, cross-attention lengths, causal,
sliding_window, logit_softcap, segment_ids, sm_scale, dtype — with a
DETERMINISTIC seed per case, so every run checks the same ~30 corners of the
option space that no one enumerated by hand. Bar: the reference's oracle
contract, max-abs-diff < 0.1 vs fp32 attention (flash_attention.cu:784).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_tpu.ops.flash_attention import flash_attention
from flash_attention_tpu.ops.reference import reference_attention
from flash_attention_tpu.utils.testing import assert_close, make_qkv


def sample_case(idx: int, *, for_grad: bool = False):
    """Deterministically sample one option combination."""
    rng = np.random.RandomState(1000 + idx)
    batch = int(rng.choice([1, 2]))
    group = int(rng.choice([1, 1, 2, 4]))
    hkv = int(rng.choice([1, 2]))
    hq = hkv * group
    head_dim = int(rng.choice([128, 128, 64]))
    causal = bool(rng.rand() < 0.6)

    # Ragged lengths on purpose: non-multiples of every block size.
    q_len = int(rng.randint(1, 513)) if not for_grad else int(rng.randint(16, 385))
    if causal:
        # Self-attention or the chunked-prefill convention (kv longer, the
        # last query sees the whole KV prefix).
        kv_len = q_len if rng.rand() < 0.7 else q_len + int(rng.randint(0, 257))
    else:
        kv_len = q_len if rng.rand() < 0.5 else int(rng.randint(1, 641))

    window = None
    if causal and rng.rand() < 0.4:
        window = int(rng.randint(1, kv_len + 64))
    softcap = float(rng.choice([0.0, 0.0, 15.0, 30.0])) or None
    sm_scale = None if rng.rand() < 0.7 else float(rng.uniform(0.05, 0.3))

    segments = None
    if q_len == kv_len and rng.rand() < 0.35:
        n_bounds = int(rng.randint(1, 4))
        bounds = np.sort(rng.randint(1, q_len, size=n_bounds)) if q_len > 1 else []
        ids = np.zeros((batch, q_len), np.int32)
        for b in bounds:
            ids[:, b:] += 1
        segments = jnp.asarray(ids)

    dtype = jnp.bfloat16 if rng.rand() < 0.8 else jnp.float16
    return dict(
        batch=batch, hq=hq, hkv=hkv, q_len=q_len, kv_len=kv_len,
        head_dim=head_dim, causal=causal, window=window, softcap=softcap,
        sm_scale=sm_scale, segments=segments, dtype=dtype, seed=idx,
    )


def run_case(c):
    q, k, v = make_qkv(
        c["seed"], c["batch"], c["hq"], c["q_len"], c["head_dim"],
        num_kv_heads=c["hkv"], kv_seq=c["kv_len"], dtype=c["dtype"],
    )
    kwargs = dict(
        causal=c["causal"], sm_scale=c["sm_scale"],
        sliding_window=c["window"], logit_softcap=c["softcap"],
        segment_ids=c["segments"],
    )
    got = flash_attention(q, k, v, **kwargs)
    want = reference_attention(q, k, v, **{
        k2: v2 for k2, v2 in kwargs.items()
    })
    assert_close(got, want, msg=f"fuzz case {c}")
    if c["segments"] is not None and c["causal"] and c["q_len"] > 128:
        # Force a multi-block grid so the packed block-skipping path (the
        # runtime tri compaction) sees the same random layout — the default
        # dispatch tiers at fuzz-sized seqs are single-superblock and never
        # take it.
        from flash_attention_tpu.ops.tuning import BlockSizes

        got2 = flash_attention(
            q, k, v, block_sizes=BlockSizes(128, 128), **kwargs
        )
        assert_close(got2, want, msg=f"fuzz packed-skip case {c}")


@pytest.mark.parametrize("idx", range(24))
def test_fuzz_forward(idx):
    run_case(sample_case(idx))


@pytest.mark.parametrize("idx", range(100, 106))
def test_fuzz_grads(idx):
    c = sample_case(idx, for_grad=True)
    q, k, v = make_qkv(
        c["seed"], c["batch"], c["hq"], c["q_len"], c["head_dim"],
        num_kv_heads=c["hkv"], kv_seq=c["kv_len"], dtype=c["dtype"],
    )
    kwargs = dict(
        causal=c["causal"], sm_scale=c["sm_scale"],
        sliding_window=c["window"], logit_softcap=c["softcap"],
        segment_ids=c["segments"],
    )
    w = jax.random.normal(jax.random.key(c["seed"]), q.shape)

    def loss(fn):
        def f(q, k, v):
            return jnp.sum(fn(q, k, v).astype(jnp.float32) * w)
        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    got = loss(lambda q, k, v: flash_attention(q, k, v, **kwargs))
    want = loss(
        lambda q, k, v: reference_attention(
            q, k, v, out_dtype=jnp.float32, **kwargs
        )
    )
    for g, wnt, name in zip(got, want, ("dq", "dk", "dv")):
        assert_close(g, wnt, msg=f"{name} fuzz case {c}")


def test_fuzz_q1_decode_shaped():
    """q_len=1 through the prefill kernel (the decode convention: the single
    query attends the whole KV prefix)."""
    q, k, v = make_qkv(9, 2, 4, 1, 128, kv_seq=333)
    got = flash_attention(q, k, v, causal=True)
    want = reference_attention(q, k, v, causal=True)
    assert_close(got, want)


def test_fuzz_head_dim_256():
    """head_dim=256 (above every tuned tier) must still dispatch correctly."""
    q, k, v = make_qkv(11, 1, 2, 256, 256)
    got = flash_attention(q, k, v, causal=True)
    want = reference_attention(q, k, v, causal=True)
    assert_close(got, want)
