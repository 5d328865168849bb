"""Sampling layer tests (serving/sampling.py).

The reference has no sampling at all (its harness is forward-only); the bar
here is the standard serving contract: temperature 0 is EXACT greedy, top-k /
top-p truncate support correctly, and stateless seeding makes completions
bit-reproducible across engine restarts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_tpu.models.transformer import ModelConfig, init_model_params
from flash_attention_tpu.serving.engine import Request, ServingEngine
from flash_attention_tpu.serving.sampling import SamplingParams, sample_tokens


def _sample(logits, temp, topk, topp, seed, pos):
    b = logits.shape[0]
    return np.asarray(
        sample_tokens(
            jnp.asarray(logits, jnp.float32),
            jnp.full((b,), temp, jnp.float32),
            jnp.full((b,), topk, jnp.int32),
            jnp.full((b,), topp, jnp.float32),
            jnp.full((b,), seed, jnp.int32),
            jnp.full((b,), pos, jnp.int32),
        )
    )


def test_temperature_zero_is_exact_greedy():
    logits = np.asarray(jax.random.normal(jax.random.key(0), (8, 64)))
    got = _sample(logits, 0.0, 0, 1.0, 7, 3)
    np.testing.assert_array_equal(got, logits.argmax(-1))


def test_top_k_one_is_greedy_even_when_hot():
    logits = np.asarray(jax.random.normal(jax.random.key(1), (8, 64)))
    got = _sample(logits, 1.5, 1, 1.0, 11, 0)
    np.testing.assert_array_equal(got, logits.argmax(-1))


def test_tiny_top_p_is_greedy():
    logits = np.asarray(jax.random.normal(jax.random.key(2), (8, 64)))
    got = _sample(logits, 1.0, 0, 1e-9, 5, 2)
    np.testing.assert_array_equal(got, logits.argmax(-1))


def test_top_k_never_escapes_the_kept_set():
    # Rows with a clear top-3; with top_k=3 every draw must land in it.
    logits = np.zeros((4, 32), np.float32)
    top3 = [(1, 5, 9), (0, 2, 31), (7, 8, 9), (30, 20, 10)]
    for r, idx in enumerate(top3):
        logits[r, list(idx)] = [5.0, 4.0, 3.0]
    for pos in range(20):
        got = _sample(logits, 2.0, 3, 1.0, 123, pos)
        for r, idx in enumerate(top3):
            assert got[r] in idx, f"row {r} drew {got[r]} outside top-3 {idx}"


def test_top_p_excludes_tail():
    # One token holds ~95% of the mass; top_p=0.9 keeps only it.
    logits = np.full((2, 16), -4.0, np.float32)
    logits[:, 3] = 4.0
    for pos in range(10):
        got = _sample(logits, 1.0, 0, 0.9, 77, pos)
        np.testing.assert_array_equal(got, [3, 3])


def test_seeded_reproducible_and_position_varies():
    logits = np.asarray(jax.random.normal(jax.random.key(3), (1, 256))) * 0.1
    a = [_sample(logits, 1.0, 0, 1.0, 42, p)[0] for p in range(32)]
    b = [_sample(logits, 1.0, 0, 1.0, 42, p)[0] for p in range(32)]
    assert a == b  # stateless: same (seed, position) -> same token
    assert len(set(a)) > 1  # position folding draws fresh randomness


def test_sampling_params_validation():
    with pytest.raises(ValueError):
        SamplingParams(temperature=-0.1)
    with pytest.raises(ValueError):
        SamplingParams(top_k=-1)
    with pytest.raises(ValueError):
        SamplingParams(top_p=0.0)
    with pytest.raises(ValueError):
        SamplingParams(top_p=1.5)


@pytest.fixture(scope="module")
def model():
    cfg = ModelConfig(
        vocab_size=128, model_dim=128, num_layers=2, num_q_heads=4,
        num_kv_heads=2, head_dim=32, mlp_dim=256, dtype="float32",
    )
    params = init_model_params(jax.random.key(0), cfg)
    return cfg, params


def test_engine_sampled_completion_reproducible(model):
    cfg, params = model
    sp = SamplingParams(temperature=0.9, top_k=40, top_p=0.95, seed=1234)
    req = Request(id=1, prompt=(5, 9, 2, 77), max_new_tokens=8, sampling=sp)
    runs = []
    for _ in range(2):
        eng = ServingEngine(params, cfg, max_slots=2, max_seq=64)
        runs.append(eng.run([req])[1].tokens)
    assert runs[0] == runs[1]
    assert len(runs[0]) == 8


def test_engine_mixed_greedy_and_sampled_slots(model):
    cfg, params = model
    sp = SamplingParams(temperature=1.2, seed=7)
    reqs = [
        Request(id=1, prompt=(5, 9, 2), max_new_tokens=6),  # greedy default
        Request(id=2, prompt=(100, 3, 44), max_new_tokens=6, sampling=sp),
    ]
    eng = ServingEngine(params, cfg, max_slots=2, max_seq=64)
    got = eng.run(reqs)
    # The greedy slot must be unaffected by its sampled neighbor.
    solo = ServingEngine(params, cfg, max_slots=1, max_seq=64)
    want = solo.run([reqs[0]])
    assert got[1].tokens == want[1].tokens
    assert len(got[2].tokens) == 6


def test_decode_block_folds_fresh_positions():
    """The multi-step decode block must fold the position the sampled token
    will OCCUPY (old length + 1): the first decode step used to re-fold the
    same position _sample_first already consumed, so with temperature > 0
    and similar logits, token 2 duplicated token 1's Gumbel draw."""
    from typing import NamedTuple

    from flash_attention_tpu.serving.decode_loop import make_decode_multi

    vocab, length0, seed = 101, 7, 3

    class StubCache(NamedTuple):
        lengths: jax.Array

    def stub_logits(params, cfg, tok, caches):
        # Constant uniform logits: the sampled token is a pure function of
        # the folded (seed, position) Gumbel vector.
        logits = jnp.zeros((tok.shape[0], vocab), jnp.float32)
        return logits, [c._replace(lengths=c.lengths + 1) for c in caches]

    decode_multi = make_decode_multi(None, stub_logits)
    first = int(
        sample_tokens(
            jnp.zeros((1, vocab), jnp.float32),
            jnp.ones((1,), jnp.float32),  # temperature 1
            jnp.zeros((1,), jnp.int32),
            jnp.ones((1,), jnp.float32),
            jnp.full((1,), seed, jnp.int32),
            jnp.full((1,), length0, jnp.int32),  # _sample_first folds L
        )[0]
    )
    caches = [StubCache(lengths=jnp.full((1,), length0, jnp.int32))]
    toks, _, _ = decode_multi(
        None,
        jnp.full((1,), first, jnp.int32),
        caches,
        jnp.ones((1,), bool),
        jnp.ones((1,), jnp.float32),
        jnp.zeros((1,), jnp.int32),
        jnp.ones((1,), jnp.float32),
        jnp.full((1,), seed, jnp.int32),
        2,
    )
    toks = [int(t) for t in np.asarray(toks)[:, 0]]
    # Identical logits every step: only the fold position distinguishes the
    # draws. Token 2 must NOT reuse the first token's (seed, L) Gumbel.
    assert toks[0] != first, "first decode step re-folded _sample_first's position"
    assert toks[1] != toks[0]
