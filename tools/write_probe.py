"""On-TPU check + timing of the Pallas paged_write_tokens scatter kernel.

Correctness vs the (slow) XLA scatter reference at the serving config, then
donated-loop timing of the new path (was 4.67 ms per call).

Usage: python tools/write_probe.py
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from flash_attention_tpu.ops.paged import (
    init_paged_cache, paged_write_tokens, _quantize_rows,
)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def xla_reference_write(cache, k_new, v_new, slots):
    """The old XLA scatter path, kept as the correctness oracle."""
    page_size = cache.page_size
    pos = cache.lengths[slots]
    in_range = pos < cache.pages_per_slot * page_size
    logical = jnp.minimum(pos // page_size, cache.pages_per_slot - 1)
    offset = pos % page_size
    num_pages = cache.k_pages.shape[0]
    phys = jnp.where(in_range, cache.page_table[slots, logical], num_pages)
    if cache.quantized():
        kq, ks = jax.vmap(lambda x: _quantize_rows(x, cache.k_pages.dtype))(k_new)
        vq, vs = jax.vmap(lambda x: _quantize_rows(x, cache.v_pages.dtype))(v_new)
        cache = cache._replace(
            k_scales=cache.k_scales.at[phys, :, 0, offset].set(ks[:, :, 0], mode="drop"),
            v_scales=cache.v_scales.at[phys, :, 0, offset].set(vs[:, :, 0], mode="drop"),
        )
    else:
        kq, vq = k_new, v_new
    k_pages = cache.k_pages.at[phys, :, offset, :].set(
        kq.astype(cache.k_pages.dtype), mode="drop")
    v_pages = cache.v_pages.at[phys, :, offset, :].set(
        vq.astype(cache.v_pages.dtype), mode="drop")
    lengths = cache.lengths.at[slots].add(in_range.astype(cache.lengths.dtype))
    return cache._replace(k_pages=k_pages, v_pages=v_pages, lengths=lengths)


def main():
    batch, page, ppr = 32, 1024, 8
    for quant in ("int8", "none"):
        cache = init_paged_cache(
            num_pages=batch * ppr + 1, num_slots=batch, pages_per_slot=ppr,
            kv_heads=8, page_size=page, kv_quant=quant,
        )
        rng = np.random.RandomState(0)
        tables = np.zeros((batch, ppr), np.int32)
        for s in range(batch):
            tables[s] = 1 + s * ppr + np.arange(ppr)
        # Mixed lengths incl. one at capacity (must not write) and page edges.
        lengths = rng.randint(0, page * ppr, size=batch).astype(np.int32)
        lengths[0] = page * ppr        # at capacity
        lengths[1] = page - 1          # last row of page 0
        lengths[2] = page              # first row of page 1
        lengths[3] = page * ppr - 1    # last row of last page
        cache = cache._replace(
            page_table=jnp.asarray(tables), lengths=jnp.asarray(lengths)
        )
        k_new = jnp.asarray(rng.randn(batch, 8, 128), jnp.bfloat16)
        v_new = jnp.asarray(rng.randn(batch, 8, 128), jnp.bfloat16)
        slots = jnp.arange(batch)

        got = jax.jit(paged_write_tokens)(cache, k_new, v_new, slots)
        want = jax.jit(xla_reference_write)(cache, k_new, v_new, slots)
        for name in ("k_pages", "v_pages", "lengths", "k_scales", "v_scales"):
            g, w = getattr(got, name), getattr(want, name)
            if g is None:
                continue
            diff = np.max(np.abs(np.asarray(g, np.float32) - np.asarray(w, np.float32)))
            status = "ok" if diff == 0 else f"FAIL diff={diff}"
            log(f"[{quant}] {name}: {status}")

        # Timing: donated loop (in-place, as inside the decode scan).
        wfn = jax.jit(
            lambda c, k, v: paged_write_tokens(c, k, v, slots),
            donate_argnums=(0,),
        )
        cc = jax.tree_util.tree_map(jnp.copy, cache)
        cc = wfn(cc, k_new, v_new)
        jax.block_until_ready(jax.tree_util.tree_leaves(cc))
        t0 = time.perf_counter()
        for _ in range(100):
            cc = wfn(cc, k_new, v_new)
        jax.block_until_ready(jax.tree_util.tree_leaves(cc))
        log(f"[{quant}] pallas write (donated): "
            f"{(time.perf_counter()-t0)/100*1e3:8.3f}ms  (was ~4.7ms)")


if __name__ == "__main__":
    main()
