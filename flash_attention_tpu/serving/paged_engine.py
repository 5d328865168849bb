"""Continuous-batching serving engine over a PAGED KV cache.

The production memory model: instead of reserving max_seq rows per slot (the
dense engine, serving/engine.py), KV lives in fixed-size pages owned by the
native free-list allocator (native/src/allocator.cpp). A request's page
budget — ceil((prompt + max_new) / page_size) pages per layer-shared table —
is acquired at admission and released at completion, so cache memory scales
with actual usage, not with max_slots x max_seq.

Page-table discipline:
  * all layers share one page table (each layer has its own page arrays, so
    physical page i in layer L is independent storage).
  * physical page 0 is the DUMP page: never allocated; released slots point
    their whole table at it so the decode step's unconditional token writes
    (inactive lanes ride along in the batched kernel) land harmlessly there.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from flash_attention_tpu.models.transformer import (
    ModelConfig,
    decode_step_logits_paged,
    init_paged_caches,
    prefill_chunk_paged,
)
from flash_attention_tpu.serving.allocator import PageAllocator
from flash_attention_tpu.serving.decode_loop import (
    advance_prefill,
    make_decode_multi,
    retire_decode_block,
    run_decode_block,
    start_prefill,
    warmup_engine,
)
from flash_attention_tpu.serving.engine import Completion, Request, _PrefillState
from flash_attention_tpu.serving.sampling import sample_tokens
from flash_attention_tpu.serving.scheduler import ContinuousBatchScheduler


class PagedServingEngine:
    """Continuous batching over paged KV memory (chunked prefill + sampling).

    Args:
      params, cfg: the model (init_model_params / ModelConfig).
      max_slots: concurrent sequences (decode batch size).
      num_pages: physical page pool size per layer (page 0 is reserved).
      pages_per_slot: page-table width = ceil(max supported seq / page_size).
      page_size: tokens per page (a multiple of 128).
      eos_id: optional end-of-sequence token.
      prefill_chunk: tokens per prefill chunk (rounded up to a page multiple);
        each engine iteration advances pending prefills one chunk and then
        decodes, so long prompts don't stall the decode batch.
      shard_caches: optional fn applied once to the freshly-initialized paged
        caches — place each layer's page pool on a device mesh (e.g. kv_heads
        over the model axis, page tables/lengths replicated) and return the
        resharded list. Tokens are placement-invariant (see
        tests/test_sharded_serving.py).
      prefix_cache: share identical prompt-prefix pages across requests
        (vLLM-style). Full prompt pages register by chained content hash
        when their prefill completes; later requests with a matching prefix
        point their tables at the shared physical pages, skip the covered
        prefill chunks entirely, and the shared pages are refcounted —
        released to the pool only when evicted under pool pressure. Shared
        pages are immutable by construction (decode writes land past the
        last full prompt page). Incompatible with sliding-window configs
        (their ring recycles prompt pages in place).
    """

    def __init__(
        self,
        params,
        cfg: ModelConfig,
        *,
        max_slots: int,
        num_pages: int,
        pages_per_slot: int,
        page_size: int = 128,
        eos_id: int | None = None,
        prefill_chunk: int = 256,
        decode_block_steps: int = 16,
        pipeline_decode: bool = True,
        shard_caches=None,
        prefix_cache: bool = False,
    ):
        if cfg.attention_sinks:
            if cfg.sliding_window is None:
                raise ValueError("attention_sinks requires sliding_window")
            if cfg.attention_sinks >= page_size:
                raise ValueError(
                    f"attention_sinks ({cfg.attention_sinks}) must fit the "
                    f"pinned first page ({page_size} rows)"
                )
        self.params = params
        self.cfg = cfg
        self.max_slots = max_slots
        self.page_size = page_size
        self.pages_per_slot = pages_per_slot
        self.max_seq = pages_per_slot * page_size
        self.eos_id = eos_id
        chunk = max(page_size, -(-prefill_chunk // page_size) * page_size)
        self.chunk = min(chunk, self.max_seq)
        self.sched = ContinuousBatchScheduler(max_slots, self.max_seq)
        # Page 0 is the dump page: burn it out of the pool by acquiring once.
        self.alloc = PageAllocator(num_pages)
        dump = self.alloc.acquire(1)
        assert dump == [0], f"expected dump page 0, got {dump}"
        self.caches = init_paged_caches(
            cfg, num_pages=num_pages, num_slots=max_slots,
            pages_per_slot=pages_per_slot, page_size=page_size,
        )
        if shard_caches is not None:
            self.caches = shard_caches(self.caches)
        if prefix_cache and cfg.sliding_window is not None:
            raise ValueError(
                "prefix_cache is incompatible with sliding-window configs "
                "(the paged ring recycles prompt pages in place)"
            )
        self.prefix_cache_enabled = prefix_cache
        # key (chained prompt-prefix digest) -> [phys_page, refcount]
        self._prefix: dict[bytes, list[int]] = {}
        self._slot_shared: dict[int, list[int]] = {}  # slot -> matched keys
        self._share_skip: dict[int, int] = {}  # slot -> prefill rows skipped
        self.prefix_hits = 0  # shared pages reused (observability)
        self.slot_pages: dict[int, list[int]] = {}
        self.last_token = np.zeros((max_slots,), np.int32)
        self._temps = np.zeros((max_slots,), np.float32)
        self._topk = np.zeros((max_slots,), np.int32)
        self._topp = np.ones((max_slots,), np.float32)
        self._seeds = np.zeros((max_slots,), np.int32)
        self._prefills: dict[int, _PrefillState] = {}
        # Multi-step decode: one dispatch + one device->host readback per
        # BLOCK of up to `decode_block_steps` tokens per slot, instead of per
        # token. Sampling params / active mask / last tokens live on device
        # and re-upload only when slot membership changes (_dev_dirty); a slot
        # finishing mid-block (EOS or budget) has its trailing tokens
        # discarded on the host — bounded waste, the standard serving
        # trade-off for cutting the per-step host round-trips.
        self.decode_block_steps = max(1, decode_block_steps)
        # Pipelined decode: dispatch block i+1 before reading back block i's
        # tokens (decode_loop.run_decode_block hides the readback RTT).
        self.pipeline_decode = pipeline_decode
        self._pending_block = None
        self._dev = None
        self._dev_dirty = True
        self._remaining = np.zeros((max_slots,), np.int64)  # decode budget
        self._cur_len = np.zeros((max_slots,), np.int64)
        self.steps = 0
        self.decode_tokens = 0
        # Wall-clock spent in the decode section of the serving loop (the
        # jitted decode_all dispatch + device sync + host token bookkeeping)
        # — the denominator of engine-level decode tokens/s.
        self.decode_time_s = 0.0
        self.events: list[tuple] = []

        model_cfg = cfg

        @functools.partial(jax.jit, donate_argnums=(1,))
        def _set_slot_table(table_row, caches, slot):
            # Same table for every layer (physical pages are per-layer).
            return [
                c._replace(
                    page_table=jax.lax.dynamic_update_slice(
                        c.page_table, table_row[None, :], (slot, 0)
                    )
                )
                for c in caches
            ]

        @functools.partial(jax.jit, static_argnums=(5,), donate_argnums=(2,))
        def _prefill_chunk_step(params, tokens, caches, slot, start, kv_end):
            return prefill_chunk_paged(
                params, model_cfg, tokens, caches, slot, start, kv_end
            )

        @functools.partial(jax.jit, donate_argnums=(0,))
        def _set_slot_length(caches, slot, true_len):
            val = jnp.asarray(true_len, jnp.int32)[None]
            return [
                c._replace(
                    lengths=jax.lax.dynamic_update_slice(
                        c.lengths, val.astype(c.lengths.dtype), (slot,)
                    )
                )
                for c in caches
            ]

        @jax.jit
        def _sample_first(logits, temp, topk, topp, seed, position):
            return sample_tokens(
                logits,
                temp[None], topk[None], topp[None], seed[None], position[None],
            )[0]

        self._set_slot_table = _set_slot_table
        self._prefill_chunk_step = _prefill_chunk_step
        self._set_slot_length_fn = _set_slot_length
        self._decode_multi = make_decode_multi(model_cfg, decode_step_logits_paged)
        self._sample_first = _sample_first

    def warmup(self, *, prompt_len: int | None = None) -> None:
        """Pre-compile every prefill-chunk and decode-block program (see
        decode_loop.warmup_engine) and reset the perf counters."""
        warmup_engine(self, prompt_len=prompt_len)

    def _on_slot_finished(self, slot: int) -> None:
        self._release(slot)  # sets _dev_dirty

    # ------------------------------------------------------------------
    def _admit_one(self, req: Request, slot: int) -> bool:
        """Acquire the slot's page budget; False if the pool is exhausted.

        Sliding-window models get a PAGED RING: the slot owns only
        ceil((window + chunk) / page) + 2 physical pages and the table maps
        logical page lp to pages[lp % n] for the request's whole logical
        range — O(window) KV memory however long the context. No runtime
        maintenance is needed: the kernels mask by POSITION (table-
        independent), so a logical page that rolled out of the window
        aliasing the physical page now holding newer rows is never scored,
        and writes land exactly where the next window needs them. The live
        span (window + one prefill chunk + page straddle) always fits the
        ring by construction.
        """
        n_logical = -(-(len(req.prompt) + req.max_new_tokens) // self.page_size)
        n_logical = min(n_logical, self.pages_per_slot)
        window = self.cfg.sliding_window
        sinks = self.cfg.attention_sinks

        shared_keys: list[int] = []
        shared_phys: list[int] = []
        if self.prefix_cache_enabled:
            shared_keys, shared_phys = self._match_prefix(req)

        n_phys = n_logical - len(shared_phys)
        if window is not None:
            ring = -(-(window + self.chunk) // self.page_size) + 2
            # StreamingLLM: logical page 0 is PINNED (it holds the sink
            # positions) and the ring cycles over the remaining pages.
            n_phys = min(n_logical, ring + (1 if sinks else 0))
        pages = self.alloc.acquire(n_phys)
        if pages is None and self._evict_prefix_pages():
            pages = self.alloc.acquire(n_phys)
        if pages is None:
            return False
        self.slot_pages[slot] = pages
        row = np.zeros((self.pages_per_slot,), np.int32)  # rest -> dump page
        if sinks and n_phys > 1:
            row[0] = pages[0]
            for lp in range(1, n_logical):
                row[lp] = pages[1 + (lp - 1) % (n_phys - 1)]
        elif window is not None:
            for lp in range(n_logical):
                row[lp] = pages[lp % n_phys]
        else:
            row[: len(shared_phys)] = shared_phys
            for i, lp in enumerate(range(len(shared_phys), n_logical)):
                row[lp] = pages[i]
            for key in shared_keys:
                self._prefix[key][1] += 1
            self._slot_shared[slot] = shared_keys
            self._share_skip[slot] = len(shared_phys) * self.page_size
            self.prefix_hits += len(shared_phys)
        self.caches = self._set_slot_table(
            jnp.asarray(row), self.caches, jnp.int32(slot)
        )
        return True

    def _match_prefix(self, req: Request) -> tuple[list[int], list[int]]:
        """Longest run of registered pages covering this prompt's prefix.

        Keys chain over the WHOLE prefix (page i's key hashes
        prompt[:(i+1)*page]), so a page matches only when everything before
        it matched too. Capped so the final prefill chunk always runs (its
        logits sample the first token)."""
        n_chunks = max(1, -(-len(req.prompt) // self.chunk))
        cap_rows = (n_chunks - 1) * self.chunk
        max_pages = min(len(req.prompt) // self.page_size,
                        cap_rows // self.page_size)
        keys, phys = [], []
        for i in range(max_pages):
            key = self._prefix_key(req.prompt, i)
            ent = self._prefix.get(key)
            if ent is None:
                break
            keys.append(key)
            phys.append(ent[0])
        # Floor to a whole number of prefill chunks: a partially-covered
        # chunk would re-run and write (identical) rows into shared pages.
        cpp = self.chunk // self.page_size
        n = (len(keys) // cpp) * cpp
        return keys[:n], phys[:n]

    def _prefix_key(self, prompt, i: int) -> bytes:
        """Content key for prompt page i: a cryptographic digest of the
        WHOLE prefix through that page (chained, so a page matches only
        when everything before it matches; collisions would silently share
        wrong KV, so python hash() is not enough)."""
        import hashlib

        data = np.asarray(
            prompt[: (i + 1) * self.page_size], np.int64
        ).tobytes()
        return hashlib.blake2b(data, digest_size=16).digest()

    def _register_prefix(self, slot: int, req: Request) -> None:
        """Move the slot's full prompt pages into the prefix cache (called
        when its prefill completes, so page contents are final)."""
        n_full = len(req.prompt) // self.page_size
        already = len(self._slot_shared.get(slot, []))
        owned = self.slot_pages.get(slot, [])
        shared_count = self._share_skip.get(slot, 0) // self.page_size
        new_keys = self._slot_shared.setdefault(slot, [])
        for i in range(already, n_full):
            owned_idx = i - shared_count
            if owned_idx >= len(owned):
                break
            key = self._prefix_key(req.prompt, i)
            if key in self._prefix:
                # Same content registered meanwhile; stop here so the
                # transferred pages stay a contiguous prefix of `owned`.
                break
            # Transfer ownership: the page now belongs to the prefix cache
            # (refcount 1 = this slot); the slot's release decrements it
            # instead of freeing it.
            self._prefix[key] = [owned[owned_idx], 1]
            new_keys.append(key)
        # Drop transferred pages from the owned list (kept pages shift).
        transferred = len(new_keys) - already
        if transferred:
            self.slot_pages[slot] = owned[transferred:]

    def _evict_prefix_pages(self) -> bool:
        """Free all zero-ref prefix-cache pages back to the pool."""
        dead = [k for k, ent in self._prefix.items() if ent[1] <= 0]
        for k in dead:
            self.alloc.release([self._prefix.pop(k)[0]])
        return bool(dead)

    def _release(self, slot: int) -> None:
        self._dev_dirty = True
        self.alloc.release(self.slot_pages.pop(slot, []))
        for key in self._slot_shared.pop(slot, []):
            ent = self._prefix.get(key)
            if ent is not None:
                ent[1] -= 1  # zero-ref pages stay cached until pool pressure
        self._share_skip.pop(slot, None)
        row = np.zeros((self.pages_per_slot,), np.int32)  # all -> dump page
        self.caches = self._set_slot_table(
            jnp.asarray(row), self.caches, jnp.int32(slot)
        )

    def _start_prefill(self, req: Request, slot: int) -> None:
        start_prefill(self, req, slot)
        skip = self._share_skip.get(slot, 0)
        if skip:
            # Shared-prefix pages already hold these rows' K/V: fast-forward
            # past the covered chunks (capped in _match_prefix so the final
            # chunk — whose logits sample the first token — always runs).
            self._prefills[slot].next_chunk = skip // self.chunk

    def _advance_prefill(self, slot: int, out: dict[int, Completion]) -> None:
        """Run ONE chunk of the pending prefill on `slot` (shared loop)."""
        req = self._prefills[slot].req
        advance_prefill(self, slot, out)
        if self.prefix_cache_enabled and slot not in self._prefills:
            # Prefill completed: page contents are final — register them.
            self._register_prefix(slot, req)

    def run(self, requests: list[Request]) -> dict[int, Completion]:
        """Serve requests to completion; returns {id: Completion}."""
        by_id = {r.id: r for r in requests}
        out: dict[int, Completion] = {}
        deferred: list[tuple[int, int]] = []  # admitted but no pages yet
        for r in requests:
            if not self.sched.submit(r.id, len(r.prompt), r.max_new_tokens):
                out[r.id] = Completion(r.id, [], finished_by_eos=False)

        while True:
            for req_id, slot in deferred + self.sched.admit():
                req = by_id[req_id]
                if not self._admit_one(req, slot):
                    # Page pool exhausted: hold the slot until pages free up.
                    if (req_id, slot) not in deferred:
                        deferred.append((req_id, slot))
                    continue
                if (req_id, slot) in deferred:
                    deferred.remove((req_id, slot))
                self._start_prefill(req, slot)

            # Advance every pending prefill by ONE chunk (interleaved with
            # the decode step below — no head-of-line blocking).
            for slot in sorted(self._prefills):
                self._advance_prefill(slot, out)

            active = self.sched.active_slots()
            if not active:
                # An in-flight block may still exist (its slots finished at
                # the previous retirement): drain it before the exit check.
                retire_decode_block(self, out)
                if self._prefills:
                    continue
                st = self.sched.stats()
                if deferred and st.decoding == 0 and not self._prefills:
                    # Nothing in flight can ever release pages: the deferred
                    # requests are unserveable with this pool.
                    raise RuntimeError(
                        "page pool too small: deferred requests can never be "
                        f"admitted ({deferred})"
                    )
                if st.queued == 0 and st.prefilling == 0 and st.decoding == 0:
                    break
                continue

            run_decode_block(self, active, out)

        return out
