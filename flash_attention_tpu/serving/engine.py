"""Continuous-batching serving engine.

The end-to-end serving loop the north-star demands (BASELINE.json config 5):
a fixed-slot batch of sequences advances one decode step per iteration while
finished slots are refilled from the queue — the C++ scheduler
(native/src/scheduler.cpp) owns the request lifecycle, this module owns the
device work:

  * prefill: one request at a time into its slot, prompt padded to a
    power-of-two bucket (bounds jit cache size), KV written into the slot's
    rows of the batched cache.
  * decode: ONE jitted step for all slots — inactive slots compute but their
    cache lengths are frozen, so their (masked) lanes are free riders on the
    batched kernels; this is what makes continuous batching continuous.

Both steps donate the cache pytree, so the KV cache is updated in place on
device (no per-step reallocation of the multi-GiB cache).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from flash_attention_tpu.models.transformer import (
    ModelConfig,
    decode_step,
    init_caches,
    prefill,
)
from flash_attention_tpu.serving.scheduler import ContinuousBatchScheduler


@dataclasses.dataclass(frozen=True)
class Request:
    id: int
    prompt: tuple[int, ...]
    max_new_tokens: int


@dataclasses.dataclass
class Completion:
    id: int
    tokens: list[int]
    finished_by_eos: bool


def _bucket(n: int, lo: int = 16) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


class ServingEngine:
    """Greedy-decoding continuous-batching engine over the transformer stack.

    Args:
      params: model params pytree (init_model_params).
      cfg: ModelConfig.
      max_slots: concurrent sequences (the decode batch size).
      max_seq: KV capacity per slot; admission requires
        prompt_len + max_new_tokens <= max_seq.
      eos_id: optional end-of-sequence token id.
      shard_caches: optional fn applied once to the freshly-initialized cache
        pytree (e.g. device_put with NamedShardings for multi-chip serving);
        the jitted steps then preserve the placement.
    """

    def __init__(
        self,
        params,
        cfg: ModelConfig,
        *,
        max_slots: int,
        max_seq: int,
        eos_id: int | None = None,
        shard_caches: Callable | None = None,
    ):
        self.params = params
        self.cfg = cfg
        self.max_slots = max_slots
        self.max_seq = max_seq
        self.eos_id = eos_id
        self.sched = ContinuousBatchScheduler(max_slots, max_seq)
        caches = init_caches(cfg, max_slots, max_seq)
        if shard_caches is not None:
            caches = shard_caches(caches)
        self.caches = caches
        self.last_token = np.zeros((max_slots,), np.int32)
        self.steps = 0
        self.decode_tokens = 0

        model_cfg = cfg

        @functools.partial(jax.jit, static_argnums=(4,), donate_argnums=(2,))
        def _prefill_into_slot(params, tokens, caches, slot, true_len_bucket):
            # tokens: [1, bucket]; causal masking makes rows < true_len exact
            # regardless of right padding.
            del true_len_bucket
            small = init_caches(model_cfg, 1, tokens.shape[1])
            logits, small = prefill(params, model_cfg, tokens, small)
            return logits, small, caches

        # true_len is traced (one compile per bucket, not per length).
        @functools.partial(jax.jit, donate_argnums=(1,))
        def _merge_slot(small_caches, caches, slot, true_len):
            new = []
            for big, sm in zip(caches, small_caches):
                upd = dict(
                    k=jax.lax.dynamic_update_slice(big.k, sm.k.astype(big.k.dtype), (slot, 0, 0, 0)),
                    v=jax.lax.dynamic_update_slice(big.v, sm.v.astype(big.v.dtype), (slot, 0, 0, 0)),
                    lengths=jax.lax.dynamic_update_slice(
                        big.lengths, true_len[None].astype(big.lengths.dtype), (slot,)
                    ),
                )
                if big.k_scales is not None:
                    upd["k_scales"] = jax.lax.dynamic_update_slice(
                        big.k_scales, sm.k_scales, (slot, 0, 0, 0)
                    )
                    upd["v_scales"] = jax.lax.dynamic_update_slice(
                        big.v_scales, sm.v_scales, (slot, 0, 0, 0)
                    )
                new.append(big._replace(**upd))
            return new

        @functools.partial(jax.jit, donate_argnums=(2,))
        def _decode_all(params, tokens, caches, active):
            old_lengths = [c.lengths for c in caches]
            next_tok, new_caches = decode_step(params, model_cfg, tokens, caches)
            fixed = [
                c._replace(lengths=jnp.where(active, c.lengths, old))
                for c, old in zip(new_caches, old_lengths)
            ]
            return next_tok[:, 0], fixed

        self._prefill_into_slot = _prefill_into_slot
        self._merge_slot = _merge_slot
        self._decode_all = _decode_all

    # ------------------------------------------------------------------
    def submit(self, req: Request) -> bool:
        return self.sched.submit(req.id, len(req.prompt), req.max_new_tokens)

    def _run_prefill(self, req: Request, slot: int) -> int:
        bucket = min(_bucket(len(req.prompt)), self.max_seq)
        toks = np.zeros((1, bucket), np.int32)
        toks[0, : len(req.prompt)] = req.prompt
        logits, small, self.caches = self._prefill_into_slot(
            self.params, jnp.asarray(toks), self.caches, slot, bucket
        )
        self.caches = self._merge_slot(
            small, self.caches, jnp.int32(slot), jnp.int32(len(req.prompt))
        )
        first = int(jnp.argmax(logits[0, len(req.prompt) - 1]))
        return first

    def run(self, requests: list[Request]) -> dict[int, Completion]:
        """Serve a batch of requests to completion; returns {id: Completion}."""
        by_id = {r.id: r for r in requests}
        out: dict[int, Completion] = {}
        for r in requests:
            if not self.submit(r):
                out[r.id] = Completion(r.id, [], finished_by_eos=False)

        while True:
            # Admit + prefill newly-scheduled requests one at a time.
            for req_id, slot in self.sched.admit():
                req = by_id[req_id]
                first = self._run_prefill(req, slot)
                self.sched.prefill_done(slot)
                out.setdefault(req_id, Completion(req_id, [], False))
                out[req_id].tokens.append(first)
                self.last_token[slot] = first
                is_eos = self.eos_id is not None and first == self.eos_id
                if is_eos:
                    out[req_id].finished_by_eos = True
                self.sched.record_token(slot, is_eos)

            active = self.sched.active_slots()
            if not active:
                st = self.sched.stats()
                if st.queued == 0 and st.prefilling == 0 and st.decoding == 0:
                    break
                continue

            active_mask = np.zeros((self.max_slots,), bool)
            active_mask[active] = True
            toks = jnp.asarray(self.last_token[:, None])
            next_tok, self.caches = self._decode_all(
                self.params, toks, self.caches, jnp.asarray(active_mask)
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
                self.sched.record_token(slot, is_eos)

        return out
