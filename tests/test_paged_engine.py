"""Paged serving engine: must reproduce the dense engine's exact tokens
(paging is a memory-layout optimization, not a numerics change), recycle
pages, and defer admission when the pool is exhausted."""

import jax
import numpy as np
import pytest

from flash_attention_tpu.models.transformer import ModelConfig, init_model_params
from flash_attention_tpu.serving.engine import Request, ServingEngine
from flash_attention_tpu.serving.paged_engine import PagedServingEngine


@pytest.fixture(scope="module")
def model():
    cfg = ModelConfig(
        vocab_size=128, model_dim=128, num_layers=2, num_q_heads=4,
        num_kv_heads=2, head_dim=32, mlp_dim=256, dtype="float32",
    )
    params = init_model_params(jax.random.key(0), cfg)
    return cfg, params


REQS = [
    Request(id=1, prompt=(5, 9, 2), max_new_tokens=6),
    Request(id=2, prompt=(100, 3, 44, 8, 21, 60, 7), max_new_tokens=9),
    Request(id=3, prompt=(64,), max_new_tokens=4),
    Request(id=4, prompt=(11, 12, 13, 14), max_new_tokens=5),
    Request(id=5, prompt=(90, 2), max_new_tokens=3),
]


def test_paged_engine_matches_dense_engine(model):
    cfg, params = model
    dense = ServingEngine(params, cfg, max_slots=3, max_seq=256)
    want = dense.run(REQS)
    paged = PagedServingEngine(
        params, cfg, max_slots=3, num_pages=16, pages_per_slot=2, page_size=128
    )
    got = paged.run(REQS)
    for r in REQS:
        assert got[r.id].tokens == want[r.id].tokens, f"request {r.id}"
    # All pages released at the end (15 allocatable; page 0 is the dump page).
    assert paged.alloc.free_count == 15
    assert paged.sched.stats().completed == 5


def test_paged_prefix_cache(model):
    """vLLM-style shared prompt prefixes: a later request with the same
    system prefix reuses the registered pages, skips the covered prefill
    chunks, and produces identical tokens; zero-ref pages stay cached and
    evict under pool pressure."""
    cfg, params = model
    rng = np.random.RandomState(23)
    prefix = tuple(int(t) for t in rng.randint(0, 128, size=256))  # 2 pages
    tail_a = tuple(int(t) for t in rng.randint(0, 128, size=40))
    tail_b = tuple(int(t) for t in rng.randint(0, 128, size=40))
    req_a = lambda: Request(id=1, prompt=prefix + tail_a, max_new_tokens=8)
    req_b = lambda: Request(id=2, prompt=prefix + tail_b, max_new_tokens=8)

    def chunks_run(eng):
        return sum(1 for e in eng.events if e[0] == "chunk")

    # Reference outputs without the cache.
    plain = PagedServingEngine(
        params, cfg, max_slots=2, num_pages=16, pages_per_slot=4,
        page_size=128, prefill_chunk=128,
    )
    want_a = plain.run([req_a()])
    want_b = plain.run([req_b()])
    chunks_fresh = chunks_run(plain) // 2  # same chunk count for both

    eng = PagedServingEngine(
        params, cfg, max_slots=2, num_pages=16, pages_per_slot=4,
        page_size=128, prefill_chunk=128, prefix_cache=True,
    )
    got_a = eng.run([req_a()])
    assert list(got_a[1].tokens) == list(want_a[1].tokens)
    c_after_a = chunks_run(eng)
    assert len(eng._prefix) == 2  # both full prefix pages registered

    got_b = eng.run([req_b()])
    assert list(got_b[2].tokens) == list(want_b[2].tokens)
    chunks_b = chunks_run(eng) - c_after_a
    assert chunks_b == chunks_fresh - 2  # two shared chunks skipped
    assert eng.prefix_hits == 2

    # Zero-ref shared pages stay retained (pool short by 2) and evict on
    # demand, restoring the full pool.
    assert eng.alloc.free_count == 15 - 2
    assert eng._evict_prefix_pages()
    assert eng.alloc.free_count == 15
    assert not eng._prefix
    # After eviction the prefix recomputes from scratch, still correct.
    got_b2 = eng.run([req_b()])
    assert list(got_b2[2].tokens) == list(want_b[2].tokens)


def test_paged_engine_page_pool_backpressure(model):
    cfg, params = model
    # Pool of 3 allocatable pages, each request needs 1: with 4 slots but only
    # 3 pages, the 4th admission defers until a page frees, then completes.
    paged = PagedServingEngine(
        params, cfg, max_slots=4, num_pages=4, pages_per_slot=2, page_size=128
    )
    reqs = [Request(id=i, prompt=(3 * i + 1, 2), max_new_tokens=3) for i in range(4)]
    got = paged.run(reqs)
    dense = ServingEngine(params, cfg, max_slots=4, max_seq=256)
    want = dense.run(reqs)
    for r in reqs:
        assert got[r.id].tokens == want[r.id].tokens, f"request {r.id}"
    assert paged.alloc.free_count == 3


def test_paged_engine_pool_too_small_raises(model):
    cfg, params = model
    paged = PagedServingEngine(
        params, cfg, max_slots=1, num_pages=2, pages_per_slot=2, page_size=128
    )
    # Needs 2 pages (prompt+budget > 128) but only 1 allocatable: deferred forever.
    req = Request(id=1, prompt=tuple(range(120)), max_new_tokens=20)
    with pytest.raises(RuntimeError, match="page pool too small"):
        paged.run([req])


def test_paged_engine_reuse_across_runs(model):
    cfg, params = model
    paged = PagedServingEngine(
        params, cfg, max_slots=2, num_pages=8, pages_per_slot=2, page_size=128
    )
    got1 = paged.run([Request(id=1, prompt=(7, 8), max_new_tokens=4)])
    got2 = paged.run([Request(id=2, prompt=(7, 8), max_new_tokens=4)])
    assert got1[1].tokens == got2[2].tokens  # same prompt, recycled pages


def test_paged_engine_quantized_matches_dense(model):
    cfg0, _ = model
    import dataclasses

    cfg = dataclasses.replace(cfg0, kv_quant="int8")
    params = init_model_params(jax.random.key(2), cfg)
    dense = ServingEngine(params, cfg, max_slots=2, max_seq=256)
    want = dense.run(REQS[:3])
    paged = PagedServingEngine(
        params, cfg, max_slots=2, num_pages=12, pages_per_slot=2, page_size=128
    )
    got = paged.run(REQS[:3])
    for r in REQS[:3]:
        assert got[r.id].tokens == want[r.id].tokens, f"request {r.id}"


def test_paged_engine_block_steps_equivalent(model):
    """decode_block_steps is a pure dispatch-granularity knob: K=1 and K=8
    (default) must produce identical tokens."""
    cfg, params = model
    one = PagedServingEngine(
        params, cfg, max_slots=3, num_pages=16, pages_per_slot=2,
        page_size=128, decode_block_steps=1,
    )
    want = one.run(REQS)
    assert one.steps >= max(r.max_new_tokens for r in REQS) - 1
    blocked = PagedServingEngine(
        params, cfg, max_slots=3, num_pages=16, pages_per_slot=2,
        page_size=128, decode_block_steps=8,
    )
    got = blocked.run(REQS)
    for r in REQS:
        assert got[r.id].tokens == want[r.id].tokens, f"request {r.id}"
    dispatches = lambda e: sum(1 for ev in e.events if ev[0] == "decode")
    assert dispatches(blocked) < dispatches(one)  # blocks fused dispatches


def test_paged_engine_eos_mid_block(model):
    """A slot hitting EOS inside a decode block: trailing tokens trimmed,
    pages released, and the completion matches the K=1 engine exactly."""
    cfg, params = model
    probe = PagedServingEngine(
        params, cfg, max_slots=1, num_pages=8, pages_per_slot=2, page_size=128
    )
    free = probe.run([Request(id=1, prompt=(5, 9, 2), max_new_tokens=12)])
    # EOS = a mid-stream token at its FIRST occurrence, so truncation there
    # is unambiguous.
    toks = free[1].tokens
    idx = next(i for i in range(2, len(toks) - 1) if toks[i] not in toks[:i])
    eos = toks[idx]
    for k in (1, 8):
        eng = PagedServingEngine(
            params, cfg, max_slots=1, num_pages=8, pages_per_slot=2,
            page_size=128, eos_id=eos, decode_block_steps=k,
        )
        got = eng.run([Request(id=1, prompt=(5, 9, 2), max_new_tokens=12)])
        assert got[1].tokens == toks[: idx + 1], f"K={k}"
        assert got[1].finished_by_eos, f"K={k}"
        assert eng.alloc.free_count == 7, f"K={k}: pages not released"
