"""Continuous-batching serving engine tests.

Correctness bar: continuous batching is an *exactness-preserving* scheduling
optimization — each request's tokens must equal what a dedicated
prefill+decode loop produces for that request alone (same model fns,
batch=1). fp32 model weights keep argmax ties deterministic across batch
shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_tpu.models.transformer import (
    ModelConfig,
    decode_step,
    init_caches,
    init_model_params,
    prefill,
)
from flash_attention_tpu.serving.engine import Request, ServingEngine


@pytest.fixture(scope="module")
def model():
    cfg = ModelConfig(
        vocab_size=128, model_dim=128, num_layers=2, num_q_heads=4,
        num_kv_heads=2, head_dim=32, mlp_dim=256, dtype="float32",
    )
    params = init_model_params(jax.random.key(0), cfg)
    return cfg, params


def generate_alone(cfg, params, prompt, max_new, max_seq, eos_id=None):
    """Dedicated batch=1 loop: the ground truth the engine must reproduce."""
    # Engine pads prompts to a power-of-two bucket; match it so the fused
    # kernels see identical shapes (bit-identical argmax inputs).
    bucket = 16
    while bucket < len(prompt):
        bucket *= 2
    toks = np.zeros((1, bucket), np.int32)
    toks[0, : len(prompt)] = prompt
    caches = init_caches(cfg, 1, max_seq)
    small = init_caches(cfg, 1, bucket)
    logits, small = prefill(params, cfg, jnp.asarray(toks), small)
    # Transplant prefix KV into the serving-sized cache.
    fixed = []
    for big, sm in zip(caches, small):
        upd = dict(
            k=jax.lax.dynamic_update_slice(big.k, sm.k.astype(big.k.dtype), (0, 0, 0, 0)),
            v=jax.lax.dynamic_update_slice(big.v, sm.v.astype(big.v.dtype), (0, 0, 0, 0)),
            lengths=jnp.full_like(big.lengths, len(prompt)),
        )
        if big.k_scales is not None:
            upd["k_scales"] = jax.lax.dynamic_update_slice(
                big.k_scales, sm.k_scales, (0, 0, 0, 0)
            )
            upd["v_scales"] = jax.lax.dynamic_update_slice(
                big.v_scales, sm.v_scales, (0, 0, 0, 0)
            )
        fixed.append(big._replace(**upd))
    caches = fixed
    out = [int(jnp.argmax(logits[0, len(prompt) - 1]))]
    while len(out) < max_new and (eos_id is None or out[-1] != eos_id):
        nxt, caches = decode_step(
            params, cfg, jnp.asarray([[out[-1]]], jnp.int32), caches
        )
        out.append(int(nxt[0, 0]))
    return out


def test_single_request_matches_dedicated_loop(model):
    cfg, params = model
    eng = ServingEngine(params, cfg, max_slots=2, max_seq=64)
    prompt = (5, 9, 2, 77, 31)
    got = eng.run([Request(id=1, prompt=prompt, max_new_tokens=8)])
    want = generate_alone(cfg, params, prompt, 8, 64)
    assert got[1].tokens == want


def test_concurrent_requests_match_dedicated_loops(model):
    cfg, params = model
    eng = ServingEngine(params, cfg, max_slots=3, max_seq=64)
    reqs = [
        Request(id=1, prompt=(5, 9, 2), max_new_tokens=6),
        Request(id=2, prompt=(100, 3, 44, 8, 21, 60, 7), max_new_tokens=9),
        Request(id=3, prompt=(64,), max_new_tokens=4),
        Request(id=4, prompt=(11, 12, 13, 14), max_new_tokens=5),  # queued
        Request(id=5, prompt=(90, 2), max_new_tokens=3),  # queued
    ]
    got = eng.run(reqs)
    for r in reqs:
        want = generate_alone(cfg, params, r.prompt, r.max_new_tokens, 64)
        assert got[r.id].tokens == want, f"request {r.id}"
    # Continuous batching actually batched: fewer decode steps than the sum
    # of per-request decode steps.
    total_decode = sum(len(got[r.id].tokens) - 1 for r in reqs)
    assert eng.steps < total_decode
    st = eng.sched.stats()
    assert st.completed == 5 and st.queued == 0 and st.decoding == 0


def test_eos_stops_early(model):
    cfg, params = model
    # Find what the model emits, then use its 2nd token as the EOS id.
    toks = generate_alone(cfg, params, (5, 9, 2), 6, 64)
    eos = toks[1]
    eng = ServingEngine(params, cfg, max_slots=1, max_seq=64, eos_id=eos)
    got = eng.run([Request(id=1, prompt=(5, 9, 2), max_new_tokens=6)])
    want = generate_alone(cfg, params, (5, 9, 2), 6, 64, eos_id=eos)
    assert got[1].tokens == want
    assert want[-1] == eos
    assert got[1].finished_by_eos


def test_oversized_request_rejected(model):
    cfg, params = model
    eng = ServingEngine(params, cfg, max_slots=1, max_seq=32)
    got = eng.run(
        [
            Request(id=1, prompt=tuple(range(30)), max_new_tokens=10),  # 40 > 32
            Request(id=2, prompt=(1, 2), max_new_tokens=2),
        ]
    )
    assert got[1].tokens == []
    assert len(got[2].tokens) == 2


def test_quantized_cache_serving():
    cfg = ModelConfig(
        vocab_size=128, model_dim=128, num_layers=1, num_q_heads=4,
        num_kv_heads=2, head_dim=32, mlp_dim=256, dtype="float32",
        kv_quant="int8",
    )
    params = init_model_params(jax.random.key(1), cfg)
    eng = ServingEngine(params, cfg, max_slots=2, max_seq=64)
    got = eng.run(
        [
            Request(id=1, prompt=(3, 5, 8), max_new_tokens=4),
            Request(id=2, prompt=(9, 1), max_new_tokens=4),
        ]
    )
    want1 = generate_alone(cfg, params, (3, 5, 8), 4, 64)
    want2 = generate_alone(cfg, params, (9, 1), 4, 64)
    assert got[1].tokens == want1
    assert got[2].tokens == want2


def test_block_steps_equivalent(model):
    """decode_block_steps is a pure dispatch-granularity knob for the dense
    engine too: K=1 and K=8 must produce identical tokens (mirror of the
    paged engine's test), with fewer fused dispatches at K=8."""
    cfg, params = model
    reqs = [
        Request(id=1, prompt=(5, 9, 2), max_new_tokens=6),
        Request(id=2, prompt=(100, 3, 44, 8, 21, 60, 7), max_new_tokens=9),
        Request(id=3, prompt=(64,), max_new_tokens=4),
    ]
    one = ServingEngine(params, cfg, max_slots=3, max_seq=64, decode_block_steps=1)
    want = one.run(reqs)
    blocked = ServingEngine(params, cfg, max_slots=3, max_seq=64, decode_block_steps=8)
    got = blocked.run(reqs)
    for r in reqs:
        assert got[r.id].tokens == want[r.id].tokens, f"request {r.id}"
    dispatches = lambda e: sum(1 for ev in e.events if ev[0] == "decode")
    assert dispatches(blocked) < dispatches(one)


def test_eos_mid_block(model):
    """A dense-engine slot hitting EOS inside a decode block: trailing
    computed tokens are trimmed and the completion matches K=1 exactly."""
    cfg, params = model
    toks = generate_alone(cfg, params, (5, 9, 2), 12, 64)
    idx = next(i for i in range(2, len(toks) - 1) if toks[i] not in toks[:i])
    eos = toks[idx]
    for k in (1, 8):
        eng = ServingEngine(
            params, cfg, max_slots=1, max_seq=64, eos_id=eos,
            decode_block_steps=k,
        )
        got = eng.run([Request(id=1, prompt=(5, 9, 2), max_new_tokens=12)])
        assert got[1].tokens == toks[: idx + 1], f"K={k}"
        assert got[1].finished_by_eos, f"K={k}"


def test_warmup_precompiles_and_resets_counters(model):
    """engine.warmup() must leave results identical to a cold engine and
    zero the perf counters (steps/tokens/time/events), so a measured run
    after warmup reports steady state only."""
    cfg, params = model
    cold = ServingEngine(params, cfg, max_slots=2, max_seq=64)
    warm = ServingEngine(params, cfg, max_slots=2, max_seq=64)
    warm.warmup()
    assert warm.steps == 0
    assert warm.decode_tokens == 0
    assert warm.decode_time_s == 0.0
    assert warm.events == []
    req = Request(id=1, prompt=(5, 9, 2), max_new_tokens=6)
    got_cold = cold.run([req])[1].tokens
    got_warm = warm.run([req])[1].tokens
    assert got_warm == got_cold
    assert warm.decode_tokens > 0


def test_warmup_walks_every_block_length(model):
    """The warmup request's budget must visit every pow2 block length
    (miss one and its compile lands in the first production run)."""
    cfg, params = model
    eng = ServingEngine(params, cfg, max_slots=1, max_seq=64,
                        decode_block_steps=8)
    orig = eng._decode_multi
    seen = set()

    def spy(params, last, caches, active, t, k_, p, s, k, greedy=False):
        seen.add(k)
        return orig(params, last, caches, active, t, k_, p, s, k, greedy)

    eng._decode_multi = spy
    eng.warmup()
    assert seen == {8, 4, 2, 1}, seen


def test_pipelined_decode_equivalent(model):
    """pipeline_decode dispatches block i+1 before reading block i's tokens;
    it must be a pure latency optimization: identical tokens to the
    sequential engine, including EOS mid-block (where the in-flight overrun
    block's tokens are discarded at retirement) and slot reuse afterwards
    (a queued request admitted into the freed slot while the overrun block
    was still in flight)."""
    cfg, params = model
    toks = generate_alone(cfg, params, (5, 9, 2), 12, 64)
    idx = next(i for i in range(2, len(toks) - 1) if toks[i] not in toks[:i])
    eos = toks[idx]
    reqs = [
        Request(id=1, prompt=(5, 9, 2), max_new_tokens=12),
        Request(id=2, prompt=(100, 3, 44, 8), max_new_tokens=9),
        Request(id=3, prompt=(64, 7), max_new_tokens=7),  # queued: 2 slots
    ]
    engines = {
        flag: ServingEngine(
            params, cfg, max_slots=2, max_seq=64, eos_id=eos,
            decode_block_steps=4, pipeline_decode=flag,
        )
        for flag in (False, True)
    }
    outs = {flag: eng.run(reqs) for flag, eng in engines.items()}
    for r in reqs:
        assert outs[True][r.id].tokens == outs[False][r.id].tokens, (
            f"request {r.id}"
        )
        assert (
            outs[True][r.id].finished_by_eos
            == outs[False][r.id].finished_by_eos
        )
    assert engines[True]._pending_block is None  # drained at exit
