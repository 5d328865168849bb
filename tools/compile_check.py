"""Standalone-compile gate for every dispatch-table default config.

The 16 MB scoped-VMEM limit is checked by Mosaic at COMPILE time, and a
config that fits inside a lax.scan benchmark wrapper can OOM when compiled
standalone (the benchmark shares the scan's buffers; a bare jit does not).
Three separate rounds of on-chip verification caught default configs that
the CPU test suite and the in-scan sweeps both missed — so this tool
AOT-compiles (lower().compile(), no execution, no data upload) every public
dispatch surface at every tier and reports pass/fail + compile time.

Run on the real chip after ANY dispatch-table or kernel change:

    python tools/compile_check.py              # everything (~10-20 min warm)
    python tools/compile_check.py fwd bwd      # just those parts

The first big Mosaic compile in a process takes ~6-7 min through the remote
compile helper (cold start); every subsequent one is seconds. Exit code != 0
iff any compile failed.

Reference analog: the introspection canary that compiled six instantiations
up front and printed their resource usage (flash_attention.cu:712-755).
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from flash_attention_tpu.ops.flash_attention import flash_attention
from flash_attention_tpu.ops.decode import decode_attention
from flash_attention_tpu.ops.paged import (
    paged_decode_attention,
    paged_prefill_attention,
)
from flash_attention_tpu.ops.paged import PagedKVCache
from flash_attention_tpu.ops.quant import QuantizedTensor, payload_dtype
from flash_attention_tpu.ops.tuning import select_decode_block_sizes

FAILED = []


def aval(*shape, dtype=jnp.bfloat16):
    return jax.ShapeDtypeStruct(shape, dtype)


def qkv_avals(batch, q_heads, seq, d, kv_heads=None, kv_seq=None):
    """ShapeDtypeStruct stand-ins for make_qkv: lower() compiles from
    avals alone — no device arrays, no data upload over the tunnel."""
    kv_heads = kv_heads or q_heads
    kv_seq = kv_seq or seq
    return (
        aval(batch, q_heads, seq, d),
        aval(batch, kv_heads, kv_seq, d),
        aval(batch, kv_heads, kv_seq, d),
    )


def quant_aval(batch, kv_heads, seq, d, mode):
    return QuantizedTensor(
        values=aval(batch, kv_heads, seq, d, dtype=payload_dtype(mode)),
        scales=aval(batch, kv_heads, seq, 1, dtype=jnp.float32),
    )


def paged_cache_avals(num_pages, num_slots, pages_per_slot, kv_heads, page, d, mode):
    payload = payload_dtype(mode or "none") or jnp.bfloat16
    quant = mode is not None
    return PagedKVCache(
        k_pages=aval(num_pages, kv_heads, page, d, dtype=payload),
        v_pages=aval(num_pages, kv_heads, page, d, dtype=payload),
        page_table=aval(num_slots, pages_per_slot, dtype=jnp.int32),
        lengths=aval(num_slots, dtype=jnp.int32),
        k_scales=aval(num_pages, kv_heads, 1, page, dtype=jnp.float32) if quant else None,
        v_scales=aval(num_pages, kv_heads, 1, page, dtype=jnp.float32) if quant else None,
    )


def check(tag, fn, *args, **kwargs):
    t0 = time.time()
    try:
        jax.jit(fn).lower(*args, **kwargs).compile()
        print(f"PASS {tag:58s} {time.time() - t0:6.1f}s", flush=True)
    except Exception as e:
        FAILED.append(tag)
        msg = str(e).replace("\n", " ")[:160]
        print(f"FAIL {tag:58s} {time.time() - t0:6.1f}s {msg}", flush=True)


SEQS = (512, 768, 1024, 2048, 4096, 8192, 16384)


def part_fwd():
    for seq in SEQS:
        for causal in (False, True):
            q, k, v = qkv_avals(1, 32, seq, 128)
            check(
                f"fwd seq={seq} causal={int(causal)}",
                lambda q, k, v, c=causal: flash_attention(q, k, v, causal=c),
                q, k, v,
            )


def part_resid():
    # save_residuals adds an fp32 LSE output block per tile — the canonical
    # VMEM-cliff trigger. This is also the under-grad forward. Both LSE
    # widths compile: LANES-broadcast (default) and lse_narrow (1-lane
    # store — the Mosaic store-path risk the flag is gated on).
    import dataclasses

    from flash_attention_tpu.ops.tuning import select_block_sizes

    for seq in (512, 1024, 2048, 4096, 8192):
        for causal in (False, True):
            q, k, v = qkv_avals(1, 32, seq, 128)
            for tag, narrow in (("", False), (" narrow", True)):
                bs = dataclasses.replace(
                    select_block_sizes(
                        seq, causal=causal, save_residuals=True
                    ),
                    lse_narrow=narrow,
                )
                check(
                    f"fwd+lse seq={seq} causal={int(causal)}{tag}",
                    lambda q, k, v, c=causal, b=bs: flash_attention(
                        q, k, v, causal=c, save_residuals=True, block_sizes=b
                    ),
                    q, k, v,
                )


def part_bwd():
    # 16384 exercises the chunked fused backward (4 KV chunks).
    for seq in (512, 1024, 2048, 4096, 8192, 16384):
        for causal in (False, True):
            q, k, v = qkv_avals(1, 32, seq, 128)

            def train(q, k, v, c=causal):
                def loss(q, k, v):
                    return jnp.sum(
                        flash_attention(q, k, v, causal=c).astype(jnp.float32)
                    )

                return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

            check(f"bwd seq={seq} causal={int(causal)}", train, q, k, v)


def part_gqa():
    for seq in (2048, 8192):
        for group, hkv in ((4, 8), (8, 4)):
            for causal in (False, True):
                q, k, v = qkv_avals(1, 32, seq, 128, kv_heads=hkv)
                check(
                    f"gqa g={group} seq={seq} causal={int(causal)}",
                    lambda q, k, v, c=causal: flash_attention(q, k, v, causal=c),
                    q, k, v,
                )


def part_feat():
    # window / softcap / segments each add per-tile temporaries.
    for seq in (2048, 4096):
        q, k, v = qkv_avals(1, 32, seq, 128)
        seg = aval(1, seq, dtype=jnp.int32)
        check(
            f"window seq={seq}",
            lambda q, k, v, s=seq: flash_attention(
                q, k, v, causal=True, sliding_window=s // 4
            ),
            q, k, v,
        )
        check(
            f"softcap seq={seq}",
            lambda q, k, v: flash_attention(q, k, v, causal=True, logit_softcap=30.0),
            q, k, v,
        )
        check(
            f"segments seq={seq}",
            lambda q, k, v, s: flash_attention(q, k, v, causal=True, segment_ids=s),
            q, k, v, seg,
        )

        def win_grad(q, k, v, s=seq):
            def loss(q, k, v):
                return jnp.sum(
                    flash_attention(
                        q, k, v, causal=True, sliding_window=s // 4,
                        logit_softcap=30.0,
                    ).astype(jnp.float32)
                )

            return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

        check(f"window+softcap grad seq={seq}", win_grad, q, k, v)


def part_packed():
    # Packed-sequence block skipping: the fwd's runtime [B, T] tri
    # enumeration (argsort compaction feeding 2D scalar-prefetch index
    # maps) and the bwd's prefetch-gated dense grids. Mosaic-lowering
    # risks unique to this path: 2D SMEM reads inside index maps and
    # kernels, prefetch args produced by argsort/take_along_axis.
    for batch in (1, 2):
        q, k, v = qkv_avals(batch, 32, 8192, 128)
        seg = aval(batch, 8192, dtype=jnp.int32)
        check(
            f"packed fwd b={batch} seq=8192",
            lambda q, k, v, s: flash_attention(
                q, k, v, causal=True, segment_ids=s
            ),
            q, k, v, seg,
        )

    q, k, v = qkv_avals(2, 32, 8192, 128)
    seg = aval(2, 8192, dtype=jnp.int32)

    def packed_grad(q, k, v, s):
        def loss(q, k, v):
            return jnp.sum(
                flash_attention(
                    q, k, v, causal=True, segment_ids=s
                ).astype(jnp.float32)
            )

        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    check("packed grad b=2 seq=8192", packed_grad, q, k, v, seg)

    check(
        "packed nc fwd b=2 seq=8192",
        lambda q, k, v, s: flash_attention(
            q, k, v, causal=False, segment_ids=s
        ),
        q, k, v, seg,
    )

    qg, kg, vg = qkv_avals(2, 32, 8192, 128, kv_heads=8)

    def packed_gqa_grad(q, k, v, s):
        def loss(q, k, v):
            return jnp.sum(
                flash_attention(
                    q, k, v, causal=True, segment_ids=s
                ).astype(jnp.float32)
            )

        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    check("packed gqa grad b=2 seq=8192", packed_gqa_grad, qg, kg, vg, seg)


def part_d64():
    for seq in (1024, 4096):
        for causal in (False, True):
            q, k, v = qkv_avals(1, 32, seq, 64)
            check(
                f"d64 seq={seq} causal={int(causal)}",
                lambda q, k, v, c=causal: flash_attention(q, k, v, causal=c),
                q, k, v,
            )


def part_decode():
    b, hq, hkv, seq, d = 32, 32, 8, 8192, 128
    q1 = aval(b, hq, d)
    lengths = aval(b, dtype=jnp.int32)
    k = aval(b, hkv, seq, d)
    check("decode bf16 seq=8192", lambda q, k, v, l: decode_attention(q, k, v, l), q1, k, k, lengths)
    for mode in ("int8", "fp8_e4m3", "fp8_e5m2"):
        kq = quant_aval(b, hkv, seq, d, mode)
        check(
            f"decode {mode} seq=8192",
            lambda q, kq, vq, l: decode_attention(q, kq, vq, l),
            q1, kq, kq, lengths,
        )
    # Rolling (ring-buffer) cache: Mistral-class W=4096 window in a
    # 5120-row buffer — the remainder-remapped mask is new VPU work.
    kr = aval(b, hkv, 5120, d)
    check(
        "decode ring w=4096 buf=5120",
        lambda q, k, v, l: decode_attention(
            q, k, v, l, sliding_window=4096, ring_buffer=True
        ),
        q1, kr, kr, lengths,
    )
    krq = quant_aval(b, hkv, 5120, d, "int8")
    check(
        "decode ring int8 w=4096 buf=5120",
        lambda q, kq, vq, l: decode_attention(
            q, kq, vq, l, sliding_window=4096, ring_buffer=True
        ),
        q1, krq, krq, lengths,
    )
    # StreamingLLM sinks: two-region remapped mask (extra VPU selects).
    ks = aval(b, hkv, 5248, d)
    check(
        "decode ring sinks=64 w=4096 buf=5248",
        lambda q, k, v, l: decode_attention(
            q, k, v, l, sliding_window=4096, ring_buffer=True,
            attention_sinks=64,
        ),
        q1, ks, ks, lengths,
    )
    # Odd cache length: block_kv must divide the padded length.
    k2 = aval(b, hkv, 6144, d)
    check(
        "decode bf16 seq=6144 (non-pow2)",
        lambda q, k, v, l: decode_attention(
            q, k, v, l, block_kv=select_decode_block_sizes(6144).block_kv
        ),
        q1, k2, k2, lengths,
    )
    # 4224 = 128*33 has no 256-multiple divisor, so packed fp8 must fall
    # back to the unpacked widen — the packed scale block would be a
    # lane-misaligned 128*odd/2 and Mosaic rejects it only at real compile.
    k3q = quant_aval(b, hkv, 4224, d, "fp8_e4m3")
    check(
        "decode fp8_e4m3 seq=4224 (odd divisor)",
        lambda q, kq, vq, l: decode_attention(q, kq, vq, l),
        q1, k3q, k3q, lengths,
    )


def part_paged():
    hq, hkv, d, page = 32, 8, 128, 1024
    for mode in (None, "int8", "fp8_e4m3"):
        cache = paged_cache_avals(64, 8, 8, hkv, page, d, mode)
        q = aval(8, hq, d)
        check(
            f"paged decode {mode or 'bf16'}",
            lambda q, c: paged_decode_attention(q, c),
            q, cache,
        )
        qc = aval(1, hq, 512, d)
        check(
            f"paged prefill chunk {mode or 'bf16'}",
            lambda q, c, ke: paged_prefill_attention(q, c, 0, ke, chunk_len=512),
            qc, cache, aval(dtype=jnp.int32),
        )
    # Sliding-window band-limited page walk (the paged-ring prefill path).
    cache = paged_cache_avals(64, 8, 8, hkv, page, d, "int8")
    qc = aval(1, hq, 512, d)
    check(
        "paged prefill chunk int8 window=4096",
        lambda q, c, ke: paged_prefill_attention(
            q, c, 0, ke, chunk_len=512, sliding_window=4096
        ),
        qc, cache, aval(dtype=jnp.int32),
    )
    # StreamingLLM paged sinks: pinned logical page 0 + sink mask term.
    check(
        "paged decode int8 window=4096 sinks=64",
        lambda q, c: paged_decode_attention(
            q, c, sliding_window=4096, attention_sinks=64
        ),
        aval(8, hq, d), cache,
    )
    check(
        "paged prefill chunk int8 window=4096 sinks=64",
        lambda q, c, ke: paged_prefill_attention(
            q, c, 0, ke, chunk_len=512, sliding_window=4096,
            attention_sinks=64,
        ),
        qc, cache, aval(dtype=jnp.int32),
    )


PARTS = {
    "fwd": part_fwd,
    "resid": part_resid,
    "bwd": part_bwd,
    "gqa": part_gqa,
    "feat": part_feat,
    "packed": part_packed,
    "d64": part_d64,
    "decode": part_decode,
    "paged": part_paged,
}


def main():
    names = [a for a in sys.argv[1:] if a in PARTS] or list(PARTS)
    print(f"devices: {jax.devices()}  parts: {names}", flush=True)
    t0 = time.time()
    for n in names:
        PARTS[n]()
    print(f"done in {time.time() - t0:.0f}s; failures: {FAILED or 'none'}")
    sys.exit(1 if FAILED else 0)


if __name__ == "__main__":
    main()
