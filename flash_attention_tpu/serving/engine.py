"""Continuous-batching serving engine.

The end-to-end serving loop the north-star demands (BASELINE.json config 5):
a fixed-slot batch of sequences advances one decode step per iteration while
finished slots are refilled from the queue — the C++ scheduler
(native/src/scheduler.cpp) owns the request lifecycle, this module owns the
device work:

  * CHUNKED prefill: prompts are split into fixed-size chunks; each engine
    iteration advances every pending prefill by ONE chunk and then runs ONE
    decode step for all active slots, so a long prompt no longer stalls the
    decode batch head-of-line (the scheduler-level analog of the reference's
    streaming-KV hot loop, flash_attention.cu:417-453). Chunk boundaries are
    fixed multiples, so the visible-KV horizon is static per chunk index
    (bounded jit cache: one compile per chunk position, not per prompt).
  * decode: ONE jitted step for all slots — inactive slots compute but their
    cache lengths are frozen, so their (masked) lanes are free riders on the
    batched kernels; this is what makes continuous batching continuous.
  * sampling: per-request temperature / top-k / top-p (serving/sampling.py),
    vectorized over slots inside the jitted decode step; temperature 0 is
    exact greedy. Stateless keys (seed folded with token position) make
    completions reproducible.

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
    decode_step_logits,
    init_caches,
)
from flash_attention_tpu.models.transformer import prefill_chunk as _prefill_chunk_fn
from flash_attention_tpu.serving.decode_loop import (
    advance_prefill,
    make_decode_multi,
    retire_decode_block,
    run_decode_block,
    start_prefill,
    warmup_engine,
)
from flash_attention_tpu.serving.sampling import GREEDY, SamplingParams, sample_tokens
from flash_attention_tpu.serving.scheduler import ContinuousBatchScheduler


@dataclasses.dataclass(frozen=True)
class Request:
    id: int
    prompt: tuple[int, ...]
    max_new_tokens: int
    sampling: SamplingParams = GREEDY


@dataclasses.dataclass
class Completion:
    id: int
    tokens: list[int]
    finished_by_eos: bool


@dataclasses.dataclass
class _PrefillState:
    req: Request
    padded: np.ndarray  # [n_chunks * chunk] int32 prompt, right-padded
    next_chunk: int = 0


class ServingEngine:
    """Continuous-batching engine over the transformer stack.

    Args:
      params: model params pytree (init_model_params).
      cfg: ModelConfig.
      max_slots: concurrent sequences (the decode batch size).
      max_seq: KV capacity per slot; admission requires
        prompt_len + max_new_tokens <= max_seq.
      eos_id: optional end-of-sequence token id.
      prefill_chunk: tokens per prefill chunk (chunked prefill granularity).
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
        prefill_chunk: int = 256,
        shard_caches: Callable | None = None,
        decode_block_steps: int = 16,
        pipeline_decode: bool = True,
    ):
        self.params = params
        self.cfg = cfg
        self.max_slots = max_slots
        self.max_seq = max_seq
        self.eos_id = eos_id
        self.chunk = min(prefill_chunk, max_seq)
        if cfg.attention_sinks:
            # The chunked-prefill sink merge needs chunks to start at or
            # after the sink region once past the window (models/attention).
            self.chunk = min(
                self.chunk, cfg.sliding_window - cfg.attention_sinks
            )
        self.sched = ContinuousBatchScheduler(max_slots, max_seq)
        caches = init_caches(cfg, max_slots, max_seq, prefill_chunk=self.chunk)
        if shard_caches is not None:
            caches = shard_caches(caches)
        self.caches = caches
        self.last_token = np.zeros((max_slots,), np.int32)
        # Per-slot sampling parameters (set at admission).
        self._temps = np.zeros((max_slots,), np.float32)
        self._topk = np.zeros((max_slots,), np.int32)
        self._topp = np.ones((max_slots,), np.float32)
        self._seeds = np.zeros((max_slots,), np.int32)
        self._prefills: dict[int, _PrefillState] = {}
        # Multi-step decode blocks: see PagedServingEngine — one dispatch +
        # one readback per up-to-decode_block_steps tokens; device-resident
        # sampling state re-uploaded only on slot-membership changes.
        self.decode_block_steps = max(1, decode_block_steps)
        # Pipelined decode: dispatch block i+1 before reading back block i's
        # tokens, hiding the per-block host readback RTT behind device
        # compute (see decode_loop.run_decode_block).
        self.pipeline_decode = pipeline_decode
        self._pending_block = None
        self._dev = None
        self._dev_dirty = True
        self._remaining = np.zeros((max_slots,), np.int64)
        self._cur_len = np.zeros((max_slots,), np.int64)
        self.steps = 0
        self.decode_tokens = 0
        # Wall-clock in the decode section (jitted block dispatch + sync +
        # host token bookkeeping) — denominator of engine-level tokens/s.
        self.decode_time_s = 0.0
        self.events: list[tuple] = []  # ("chunk", slot) / ("decode", n_appended)

        model_cfg = cfg

        @functools.partial(jax.jit, static_argnums=(5,), donate_argnums=(2,))
        def _prefill_chunk_step(params, tokens, caches, slot, start, kv_end):
            # tokens: [1, chunk]; start + chunk == kv_end (static).
            return _prefill_chunk_fn(
                params, model_cfg, tokens, caches, slot, start, kv_end
            )

        @jax.jit
        def _sample_first(logits, temp, topk, topp, seed, position):
            # logits: [1, vocab] at the prompt's last position.
            return sample_tokens(
                logits,
                temp[None], topk[None], topp[None], seed[None], position[None],
            )[0]

        self._prefill_chunk_step = _prefill_chunk_step
        self._set_slot_length_fn = _set_slot_length
        self._decode_multi = make_decode_multi(model_cfg, decode_step_logits)
        self._sample_first = _sample_first

    def _on_slot_finished(self, slot: int) -> None:
        self._dev_dirty = True

    # ------------------------------------------------------------------
    def warmup(self, *, prompt_len: int | None = None) -> None:
        """Pre-compile every prefill-chunk and decode-block program (see
        decode_loop.warmup_engine) and reset the perf counters."""
        warmup_engine(self, prompt_len=prompt_len)

    def submit(self, req: Request) -> bool:
        return self.sched.submit(req.id, len(req.prompt), req.max_new_tokens)

    def _start_prefill(self, req: Request, slot: int) -> None:
        start_prefill(self, req, slot)

    def _advance_prefill(self, slot: int, out: dict[int, Completion]) -> None:
        """Run ONE chunk of the pending prefill on `slot` (shared loop)."""
        advance_prefill(self, slot, out)

    def run(self, requests: list[Request]) -> dict[int, Completion]:
        """Serve a batch of requests to completion; returns {id: Completion}."""
        by_id = {r.id: r for r in requests}
        out: dict[int, Completion] = {}
        for r in requests:
            if not self.submit(r):
                out[r.id] = Completion(r.id, [], finished_by_eos=False)

        while True:
            # Admit newly-scheduled requests into prefill states.
            for req_id, slot in self.sched.admit():
                self._start_prefill(by_id[req_id], slot)

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
                if st.queued == 0 and st.prefilling == 0 and st.decoding == 0:
                    break
                continue

            run_decode_block(self, active, out)

        return out


@functools.partial(jax.jit, donate_argnums=(0,))
def _set_slot_length(caches, slot, true_len):
    slot = jnp.asarray(slot, jnp.int32)
    val = jnp.asarray(true_len, jnp.int32)[None]
    return [
        c._replace(
            lengths=jax.lax.dynamic_update_slice(
                c.lengths, val.astype(c.lengths.dtype), (slot,)
            )
        )
        for c in caches
    ]
