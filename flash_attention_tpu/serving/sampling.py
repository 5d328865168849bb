"""Per-request token sampling for the serving engines.

The reference has no serving layer at all (SURVEY.md §5); both engines here
were greedy-argmax only in round 1. This module adds the standard sampling
stack — temperature, top-k, top-p (nucleus) — vectorized over the slot batch
with PER-SLOT parameters, so one jitted decode step serves heterogeneous
requests:

  * temperature == 0 → greedy argmax for that slot (exact, not a 1/T limit),
  * top_k == 0 → no k-truncation; top_p == 1 → no nucleus truncation,
  * sampling uses the Gumbel-max trick (argmax(logits/T + G)) — one pass, no
    cumulative-probability renormalization needed,
  * randomness is stateless: the per-slot key is folded with the slot's
    current position, so a (seed, position) pair always yields the same token
    — reproducible across runs and across engine restarts (checkpoint/resume
    keeps determinism).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    """Per-request sampling configuration.

    temperature: 0.0 = greedy; > 0 scales logits by 1/T before sampling.
    top_k: keep only the k highest-probability tokens (0 = disabled).
    top_p: keep the smallest prefix of the sorted distribution with
      cumulative probability >= top_p (1.0 = disabled).
    seed: per-request RNG seed (stateless; folded with token position).
    """

    temperature: float = 0.0
    top_k: int = 0
    top_p: float = 1.0
    seed: int = 0

    def __post_init__(self):
        if self.temperature < 0:
            raise ValueError(f"temperature must be >= 0, got {self.temperature}")
        if self.top_k < 0:
            raise ValueError(f"top_k must be >= 0, got {self.top_k}")
        if not 0.0 < self.top_p <= 1.0:
            raise ValueError(f"top_p must be in (0, 1], got {self.top_p}")


GREEDY = SamplingParams()


def sample_tokens(
    logits: jax.Array,
    temperature: jax.Array,
    top_k: jax.Array,
    top_p: jax.Array,
    seeds: jax.Array,
    positions: jax.Array,
) -> jax.Array:
    """Sample one token per row of ``logits``.

    Args:
      logits: [batch, vocab] fp32.
      temperature: [batch] fp32 (0 = greedy for that row).
      top_k: [batch] int32 (0 = disabled).
      top_p: [batch] fp32 (1 = disabled).
      seeds: [batch] int32/uint32 per-slot seeds.
      positions: [batch] int32 — current token position (folded into the key
        so each step draws fresh, reproducible randomness).

    Returns:
      [batch] int32 token ids.
    """
    batch, vocab = logits.shape
    logits = logits.astype(jnp.float32)
    greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    # Sorted (descending) copy drives both truncation rules.
    sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]

    # top-k: keep logits >= the k-th largest. k=0 → keep all.
    k = jnp.clip(top_k.astype(jnp.int32), 0, vocab)
    k_idx = jnp.where(k > 0, k - 1, vocab - 1)
    kth = jnp.take_along_axis(sorted_logits, k_idx[:, None], axis=-1)
    keep_k = logits >= kth

    # top-p over the softmax of the TEMPERATURE-SCALED distribution (matching
    # the distribution actually sampled). Row-max subtraction for stability.
    temp_safe = jnp.where(temperature > 0, temperature, 1.0)[:, None]
    z = sorted_logits / temp_safe
    z = z - z[:, :1]
    probs = jax.nn.softmax(z, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # Keep entries whose PRECEDING mass is < top_p (always keeps the first).
    sorted_keep = jnp.concatenate(
        [jnp.ones((batch, 1), bool), cum[:, :-1] < top_p[:, None]], axis=-1
    )
    # Translate the sorted keep-prefix into a logit threshold: the smallest
    # kept sorted logit. Masked-out entries -> +inf so min() ignores them.
    thresh = jnp.min(
        jnp.where(sorted_keep, sorted_logits, jnp.inf), axis=-1, keepdims=True
    )
    keep_p = logits >= thresh

    keep = keep_k & keep_p
    masked = jnp.where(keep, logits, -jnp.inf)

    # Gumbel-max: one fresh key per (seed, position) pair, vmapped per row.
    def gumbel_row(seed, pos):
        key = jax.random.fold_in(jax.random.key(seed), pos)
        return jax.random.gumbel(key, (vocab,), jnp.float32)

    g = jax.vmap(gumbel_row)(seeds.astype(jnp.uint32), positions.astype(jnp.int32))
    sampled_tok = jnp.argmax(
        masked / temp_safe + g, axis=-1
    ).astype(jnp.int32)

    return jnp.where(temperature > 0, sampled_tok, greedy_tok)
