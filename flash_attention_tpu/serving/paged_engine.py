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
    decode_step_paged,
    init_paged_caches,
    prefill_paged,
)
from flash_attention_tpu.serving.allocator import PageAllocator
from flash_attention_tpu.serving.engine import Completion, Request, _bucket
from flash_attention_tpu.serving.scheduler import ContinuousBatchScheduler


class PagedServingEngine:
    """Greedy-decoding continuous batching over paged KV memory.

    Args:
      params, cfg: the model (init_model_params / ModelConfig).
      max_slots: concurrent sequences (decode batch size).
      num_pages: physical page pool size per layer (page 0 is reserved).
      pages_per_slot: page-table width = ceil(max supported seq / page_size).
      page_size: tokens per page (a multiple of 128).
      eos_id: optional end-of-sequence token.
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
    ):
        self.params = params
        self.cfg = cfg
        self.max_slots = max_slots
        self.page_size = page_size
        self.pages_per_slot = pages_per_slot
        self.max_seq = pages_per_slot * page_size
        self.eos_id = eos_id
        self.sched = ContinuousBatchScheduler(max_slots, self.max_seq)
        # Page 0 is the dump page: burn it out of the pool by acquiring once.
        self.alloc = PageAllocator(num_pages)
        dump = self.alloc.acquire(1)
        assert dump == [0], f"expected dump page 0, got {dump}"
        self.caches = init_paged_caches(
            cfg, num_pages=num_pages, num_slots=max_slots,
            pages_per_slot=pages_per_slot, page_size=page_size,
        )
        self.slot_pages: dict[int, list[int]] = {}
        self.last_token = np.zeros((max_slots,), np.int32)
        self.steps = 0
        self.decode_tokens = 0

        model_cfg = cfg

        @functools.partial(jax.jit, donate_argnums=(2,))
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

        @functools.partial(jax.jit, donate_argnums=(2,))
        def _prefill_slot(params, tokens, caches, slot, true_len):
            logits, caches = prefill_paged(
                params, model_cfg, tokens, caches, slot, true_len
            )
            return logits, caches

        @functools.partial(jax.jit, donate_argnums=(2,))
        def _decode_all(params, tokens, caches, active):
            old_lengths = [c.lengths for c in caches]
            next_tok, new_caches = decode_step_paged(
                params, model_cfg, tokens, caches
            )
            fixed = [
                c._replace(lengths=jnp.where(active, c.lengths, old))
                for c, old in zip(new_caches, old_lengths)
            ]
            return next_tok[:, 0], fixed

        self._set_slot_table = _set_slot_table
        self._prefill_slot = _prefill_slot
        self._decode_all = _decode_all

    # ------------------------------------------------------------------
    def _admit_one(self, req: Request, slot: int) -> bool:
        """Acquire the slot's page budget; False if the pool is exhausted."""
        n_pages = -(-(len(req.prompt) + req.max_new_tokens) // self.page_size)
        n_pages = min(n_pages, self.pages_per_slot)
        pages = self.alloc.acquire(n_pages)
        if pages is None:
            return False
        self.slot_pages[slot] = pages
        row = np.zeros((self.pages_per_slot,), np.int32)  # rest -> dump page
        row[: len(pages)] = pages
        self.caches = self._set_slot_table(
            jnp.asarray(row), self.caches, jnp.int32(slot)
        )
        return True

    def _release(self, slot: int) -> None:
        self.alloc.release(self.slot_pages.pop(slot, []))
        row = np.zeros((self.pages_per_slot,), np.int32)  # all -> dump page
        self.caches = self._set_slot_table(
            jnp.asarray(row), self.caches, jnp.int32(slot)
        )

    def _run_prefill(self, req: Request, slot: int) -> int:
        bucket = max(min(_bucket(len(req.prompt)), self.max_seq), self.page_size)
        toks = np.zeros((1, bucket), np.int32)
        toks[0, : len(req.prompt)] = req.prompt
        logits, self.caches = self._prefill_slot(
            self.params, jnp.asarray(toks), self.caches, jnp.int32(slot),
            jnp.int32(len(req.prompt)),
        )
        return int(jnp.argmax(logits[0, len(req.prompt) - 1]))

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
                first = self._run_prefill(req, slot)
                self.sched.prefill_done(slot)
                out.setdefault(req_id, Completion(req_id, [], False))
                out[req_id].tokens.append(first)
                self.last_token[slot] = first
                is_eos = self.eos_id is not None and first == self.eos_id
                if is_eos:
                    out[req_id].finished_by_eos = True
                if self.sched.record_token(slot, is_eos):
                    self._release(slot)

            active = self.sched.active_slots()
            if not active:
                st = self.sched.stats()
                if deferred and st.decoding == 0:
                    # Nothing in flight can ever release pages: the deferred
                    # requests are unserveable with this pool.
                    raise RuntimeError(
                        "page pool too small: deferred requests can never be "
                        f"admitted ({deferred})"
                    )
                if st.queued == 0 and st.prefilling == 0 and st.decoding == 0:
                    break
                continue

            active_mask = np.zeros((self.max_slots,), bool)
            active_mask[active] = True
            next_tok, self.caches = self._decode_all(
                self.params,
                jnp.asarray(self.last_token[:, None]),
                self.caches,
                jnp.asarray(active_mask),
            )
            next_np = np.asarray(next_tok)
            self.steps += 1
            self.decode_tokens += len(active)
            for slot in active:
                req_id = self.sched.slot_request(slot)
                tok = int(next_np[slot])
                out[req_id].tokens.append(tok)
                self.last_token[slot] = tok
                is_eos = self.eos_id is not None and tok == self.eos_id
                if is_eos:
                    out[req_id].finished_by_eos = True
                if self.sched.record_token(slot, is_eos):
                    self._release(slot)

        return out
