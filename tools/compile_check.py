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
    init_paged_cache,
    paged_decode_attention,
    paged_prefill_attention,
    paged_write_prefill,
)
from flash_attention_tpu.ops.quant import quantize_kv
from flash_attention_tpu.ops.tuning import select_decode_block_sizes
from flash_attention_tpu.utils.testing import make_qkv

FAILED = []


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
            q, k, v = make_qkv(0, 1, 32, seq, 128)
            check(
                f"fwd seq={seq} causal={int(causal)}",
                lambda q, k, v, c=causal: flash_attention(q, k, v, causal=c),
                q, k, v,
            )


def part_resid():
    # save_residuals adds an fp32 LSE output block per tile — the canonical
    # VMEM-cliff trigger. This is also the under-grad forward.
    for seq in (512, 1024, 2048, 4096, 8192):
        for causal in (False, True):
            q, k, v = make_qkv(0, 1, 32, seq, 128)
            check(
                f"fwd+lse seq={seq} causal={int(causal)}",
                lambda q, k, v, c=causal: flash_attention(
                    q, k, v, causal=c, save_residuals=True
                ),
                q, k, v,
            )


def part_bwd():
    for seq in (512, 1024, 2048, 4096, 8192):
        for causal in (False, True):
            q, k, v = make_qkv(0, 1, 32, seq, 128)

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
                q, k, v = make_qkv(0, 1, 32, seq, 128, num_kv_heads=hkv)
                check(
                    f"gqa g={group} seq={seq} causal={int(causal)}",
                    lambda q, k, v, c=causal: flash_attention(q, k, v, causal=c),
                    q, k, v,
                )


def part_feat():
    # window / softcap / segments each add per-tile temporaries.
    for seq in (2048, 4096):
        q, k, v = make_qkv(0, 1, 32, seq, 128)
        seg = jnp.zeros((1, seq), jnp.int32).at[:, seq // 2 :].set(1)
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
            lambda q, k, v, s=seg: flash_attention(q, k, v, causal=True, segment_ids=s),
            q, k, v,
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


def part_d64():
    for seq in (1024, 4096):
        for causal in (False, True):
            q, k, v = make_qkv(0, 1, 32, seq, 64)
            check(
                f"d64 seq={seq} causal={int(causal)}",
                lambda q, k, v, c=causal: flash_attention(q, k, v, causal=c),
                q, k, v,
            )


def part_decode():
    b, hq, hkv, seq, d = 32, 32, 8, 8192, 128
    q, k, v = make_qkv(0, b, hq, 1, d, num_kv_heads=hkv, kv_seq=seq)
    q1 = q[:, :, 0, :]
    lengths = jnp.full((b,), seq, jnp.int32)
    check("decode bf16 seq=8192", lambda q, k, v, l: decode_attention(q, k, v, l), q1, k, v, lengths)
    for mode in ("int8", "fp8_e4m3", "fp8_e5m2"):
        kq, vq = quantize_kv(k, v, mode)
        check(
            f"decode {mode} seq=8192",
            lambda q, kq, vq, l: decode_attention(q, kq, vq, l),
            q1, kq, vq, lengths,
        )
    # Odd cache length: block_kv must divide the padded length.
    q2, k2, v2 = make_qkv(0, b, hq, 1, d, num_kv_heads=hkv, kv_seq=6144)
    check(
        "decode bf16 seq=6144 (non-pow2)",
        lambda q, k, v, l: decode_attention(
            q, k, v, l, block_kv=select_decode_block_sizes(6144).block_kv
        ),
        q2[:, :, 0, :], k2, v2, jnp.full((b,), 6144, jnp.int32),
    )
    # 4224 = 128*33 has no 256-multiple divisor, so packed fp8 must fall
    # back to the unpacked widen — the packed scale block would be a
    # lane-misaligned 128*odd/2 and Mosaic rejects it only at real compile.
    q3, k3, v3 = make_qkv(0, b, hq, 1, d, num_kv_heads=hkv, kv_seq=4224)
    k3q, v3q = quantize_kv(k3, v3, "fp8_e4m3")
    check(
        "decode fp8_e4m3 seq=4224 (odd divisor)",
        lambda q, kq, vq, l: decode_attention(q, kq, vq, l),
        q3[:, :, 0, :], k3q, v3q, jnp.full((b,), 4224, jnp.int32),
    )


def part_paged():
    hq, hkv, d, page = 32, 8, 128, 1024
    for mode in (None, "int8", "fp8_e4m3"):
        cache = init_paged_cache(
            num_pages=64, num_slots=8, pages_per_slot=8, kv_heads=hkv,
            page_size=page, head_dim=d, kv_quant=mode or "none",
        )
        k, v = (
            jnp.zeros((hkv, 4096, d), jnp.bfloat16),
            jnp.zeros((hkv, 4096, d), jnp.bfloat16),
        )
        cache = paged_write_prefill(cache, k, v, 0, jnp.int32(4096))
        q = jnp.zeros((8, hq, d), jnp.bfloat16)
        check(
            f"paged decode {mode or 'bf16'}",
            lambda q, c: paged_decode_attention(q, c),
            q, cache,
        )
        qc = jnp.zeros((1, hq, 512, d), jnp.bfloat16)
        check(
            f"paged prefill chunk {mode or 'bf16'}",
            lambda q, c: paged_prefill_attention(
                q, c, 0, jnp.int32(4096), chunk_len=512
            ),
            qc, cache,
        )


PARTS = {
    "fwd": part_fwd,
    "resid": part_resid,
    "bwd": part_bwd,
    "gqa": part_gqa,
    "feat": part_feat,
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
