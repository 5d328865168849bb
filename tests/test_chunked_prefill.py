"""Chunked prefill: long prompts must interleave with decode steps (no
head-of-line blocking) while producing EXACTLY the tokens a one-shot prefill
produces.

This is the scheduler-level analog of the reference's streaming-KV hot loop
(flash_attention.cu:417-453): there the kernel streams KV tiles through one
query block; here the engine streams prompt chunks through the batch while
decode slots keep making progress.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_tpu.models.transformer import (
    ModelConfig,
    init_caches,
    init_model_params,
    prefill_chunk,
)
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


def test_chunked_prefill_matches_one_shot(model):
    """prefill_chunk over N chunks == one big chunk, same cache + logits."""
    cfg, params = model
    prompt = tuple(int(x) for x in np.arange(40) % 128)
    max_seq, chunk = 64, 16
    n_chunks = -(-len(prompt) // chunk)
    padded = np.zeros((n_chunks * chunk,), np.int32)
    padded[: len(prompt)] = prompt

    caches = init_caches(cfg, 1, max_seq)
    for c in range(n_chunks):
        toks = jnp.asarray(padded[None, c * chunk : (c + 1) * chunk])
        logits, caches = prefill_chunk(
            params, cfg, toks, caches, 0, c * chunk, (c + 1) * chunk
        )
    last_chunked = np.asarray(
        logits[0, (len(prompt) - 1) - (n_chunks - 1) * chunk]
    )

    caches1 = init_caches(cfg, 1, max_seq)
    logits1, caches1 = prefill_chunk(
        params, cfg, jnp.asarray(padded[None, :]), caches1, 0, 0, len(padded)
    )
    last_one_shot = np.asarray(logits1[0, len(prompt) - 1])

    np.testing.assert_allclose(last_chunked, last_one_shot, rtol=2e-5, atol=2e-5)
    # Cache contents agree over the true prefix.
    for cc, c1 in zip(caches, caches1):
        np.testing.assert_allclose(
            np.asarray(cc.k[:, :, : len(prompt)]),
            np.asarray(c1.k[:, :, : len(prompt)]),
            rtol=1e-5, atol=1e-5,
        )


def test_long_prompt_interleaves_with_decode(model):
    """A long prompt must NOT stall decode: decode events land between its
    chunk events, and its tokens still match a dedicated run."""
    cfg, params = model
    long_prompt = tuple(int(x) for x in (np.arange(40) * 7) % 128)
    short = Request(id=1, prompt=(5, 9), max_new_tokens=10)
    long_req = Request(id=2, prompt=long_prompt, max_new_tokens=5)

    eng = ServingEngine(params, cfg, max_slots=2, max_seq=64, prefill_chunk=16)
    got = eng.run([short, long_req])

    # The long request took 3 chunks; find its slot's chunk events.
    chunk_events = [i for i, e in enumerate(eng.events) if e[0] == "chunk"]
    decode_events = [i for i, e in enumerate(eng.events) if e[0] == "decode"]
    assert len(chunk_events) >= 4  # 3 for long + 1 for short
    # Interleaving: at least one decode step ran BEFORE the last chunk.
    assert any(d < chunk_events[-1] for d in decode_events), (
        f"no decode interleaved with prefill chunks: {eng.events}"
    )

    # Exactness: each request matches its dedicated single-request run.
    for req in (short, long_req):
        solo = ServingEngine(
            params, cfg, max_slots=1, max_seq=64, prefill_chunk=16
        )
        want = solo.run([req])
        assert got[req.id].tokens == want[req.id].tokens, f"request {req.id}"


def test_paged_long_prompt_interleaves_with_decode(model):
    """Same interleaving contract for the paged engine (chunk = page size)."""
    cfg, params = model
    long_prompt = tuple(int(x) for x in (np.arange(300) * 11) % 128)
    short = Request(id=1, prompt=(5, 9), max_new_tokens=12)
    long_req = Request(id=2, prompt=long_prompt, max_new_tokens=4)

    eng = PagedServingEngine(
        params, cfg, max_slots=2, num_pages=12, pages_per_slot=4,
        page_size=128, prefill_chunk=128,
    )
    got = eng.run([short, long_req])

    chunk_events = [i for i, e in enumerate(eng.events) if e[0] == "chunk"]
    decode_events = [i for i, e in enumerate(eng.events) if e[0] == "decode"]
    assert len(chunk_events) >= 4  # 3 for long + 1 for short
    assert any(d < chunk_events[-1] for d in decode_events), (
        f"no decode interleaved with prefill chunks: {eng.events}"
    )

    # Exactness vs the dense engine at the same chunk size.
    dense = ServingEngine(
        params, cfg, max_slots=2, max_seq=512, prefill_chunk=128
    )
    want = dense.run([short, long_req])
    for rid in (1, 2):
        assert got[rid].tokens == want[rid].tokens, f"request {rid}"


def test_paged_small_page_chunks_fall_back_to_gather(model):
    """page_size=64 makes every chunk a page multiple but NOT a 128
    multiple: the in-place paged prefill kernel can't take it (128-aligned
    Q grid), so the layer must fall back to the dense-gather path and stay
    exact vs the dense engine."""
    cfg, params = model
    prompt = tuple(int(x) for x in (np.arange(150) * 7) % 128)
    reqs = [Request(id=1, prompt=prompt, max_new_tokens=4)]
    paged = PagedServingEngine(
        params, cfg, max_slots=1, num_pages=8, pages_per_slot=6,
        page_size=64, prefill_chunk=64,
    )
    got = paged.run(reqs)
    dense = ServingEngine(params, cfg, max_slots=1, max_seq=384, prefill_chunk=64)
    want = dense.run(reqs)
    assert got[1].tokens == want[1].tokens


def test_dense_chunk_grid_clamped_to_max_seq(model):
    """max_seq need not be a chunk multiple: a prompt whose padded chunk
    grid would overshoot max_seq must clamp the final chunk (it used to
    trace a dynamic-slice past the cache and crash the whole run)."""
    cfg, params = model
    prompt = tuple(int(x) for x in (np.arange(70) * 13) % 128)
    reqs = [Request(id=1, prompt=prompt, max_new_tokens=8)]
    eng = ServingEngine(params, cfg, max_slots=1, max_seq=80, prefill_chunk=32)
    got = eng.run(reqs)  # ceil(70/32)*32 = 96 > 80: final chunk is 16 rows
    want = ServingEngine(
        params, cfg, max_slots=1, max_seq=128, prefill_chunk=128
    ).run(reqs)
    assert got[1].tokens == want[1].tokens


def test_paged_chunk_grid_clamped_to_capacity(model):
    """Paged: a padded chunk grid past the page table used to clamp the
    out-of-bounds page gather onto the slot's LAST real page, silently
    overwriting live prompt KV with padding garbage."""
    cfg, params = model
    prompt = tuple(int(x) for x in (np.arange(300) * 17) % 128)
    reqs = [Request(id=1, prompt=prompt, max_new_tokens=20)]
    paged = PagedServingEngine(
        params, cfg, max_slots=1, num_pages=4, pages_per_slot=3,
        page_size=128, prefill_chunk=256,
    )  # capacity 384; ceil(300/256)*256 = 512 > 384: final chunk is 128
    got = paged.run(reqs)
    dense = ServingEngine(
        params, cfg, max_slots=1, max_seq=512, prefill_chunk=256
    )
    want = dense.run(reqs)
    assert got[1].tokens == want[1].tokens
