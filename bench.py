"""Headline benchmark (run by the driver on real TPU hardware).

Re-creates the reference's benchmark harness C10 (flash_attention.cu:886-971):
the same 7 sequence lengths x {non-causal, causal} at batch=1, heads=32,
head_dim=128, the same FLOPs formula (4·B·H·S²·D, halved for causal), plus the
decode/quantized-KV configs from BASELINE.json the reference never had.

Timing: in-graph lax.scan repeats at two repeat counts with a slope fit —
the TPU-side equivalent of cudaEvent around a 100-dispatch loop; on this
tunneled environment it also cancels the ~9 ms fixed per-invocation relay
cost (see utils/benchmarking.py).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "TFLOPS", "vs_baseline": N}
where value = geometric mean TFLOPS over the 14 forward configs and
vs_baseline compares against the reference's published geomean on its GPU
(BASELINE.md). Detail rows go to stderr and BENCH_DETAIL.json.
"""

import dataclasses
import json
import math
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp

# Persistent compilation cache: the bench compiles ~30 scan-wrapped kernel
# programs; cached compiles turn a >10 min cold run into ~2 min on reruns.
_CACHE_DIR = pathlib.Path(__file__).resolve().parent / ".jax_cache"
_CACHE_DIR.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from flash_attention_tpu.ops.decode import decode_attention
from flash_attention_tpu.ops.flash_attention import flash_attention
from flash_attention_tpu.ops.quant import quantize_kv
from flash_attention_tpu.ops.reference import reference_attention
from flash_attention_tpu.utils.benchmarking import (
    attention_flops,
    detect_mxu_peak_tflops,
    scan_timer,
)
from flash_attention_tpu.utils.testing import make_qkv

# Reference published TFLOPS (README.md:15-33; BASELINE.md), RTX 3080 Ti Laptop.
REFERENCE_TFLOPS = {
    (512, True): 19.72, (768, True): 22.91, (1024, True): 23.56,
    (2048, True): 24.33, (4096, True): 26.91, (8192, True): 27.84,
    (16384, True): 26.62,
    (512, False): 21.72, (768, False): 24.86, (1024, False): 25.78,
    (2048, False): 29.62, (4096, False): 30.09, (8192, False): 30.37,
    (16384, False): 30.20,
}

BATCH, HEADS, HEAD_DIM = 1, 32, 128


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _sweep_candidates():
    """Config overrides swept INSIDE the bench process (FA_BENCH_SWEEP=1).

    Out-of-process sweeps drift 6-8% against the bench on this chip (r4
    tuning notes), so dispatch-table decisions are made only from rows
    timed here — same seed-0 inputs, same est_s time model (identical
    scan lengths), same process state as the headline rows. Sweep rows go
    to stderr only, never the artifact geomean.
    """
    from flash_attention_tpu.ops.tuning import BlockSizes as B

    # Round-3 batch (2026-08-20): superblock head-unroll (per-(sub-step,
    # head) chains with hoisted 2D QK matmuls) for the short-seq causal
    # tiers and the GQA 2048 superblock.
    return {
        (512, True): [
            B(512, 512, 8, 128, head_unroll=True, diag_pipe=True),
        ],
        (768, True): [
            B(768, 768, 8, 128, head_unroll=True, diag_pipe=True),
            B(768, 768, 8, 128, head_unroll=True),
        ],
        (1024, True): [
            B(1024, 1024, 8, 128),
            B(1024, 1024, 8, 128, diag_pipe=True),
            B(1024, 1024, 8, 256, diag_pipe=True),
        ],
        (2048, True): [
            B(2048, 2048, 4, 128, diag_pipe=True),
        ],
        # (gqa 8192: (256,1024,h4[,hu]) and (512,2048,h4) all measured
        # BELOW the (512,1024,h4) dispatch in a fresh process — an
        # apparent +7.9% came from a drifted-process baseline.)
        ("gqa", 2048, True): [
            B(2048, 2048, 4, 128, head_unroll=True, diag_pipe=True),
            B(2048, 2048, 4, 256, head_unroll=True, diag_pipe=True),
        ],
        ("packed",): [
            B(1024, 1024, 2, 256),
        ],
        # Fused-backward sub-step pipelining (diag_pipe in the bwd kernel).
        ("train", 2048, True): [
            B(2048, 2048, 2, 256, bwd_fused=True, diag_pipe=True),
            B(2048, 2048, 2, 128, bwd_fused=True, diag_pipe=True),
        ],
        ("train", 8192, True): [
            B(1024, 1024, 1, 256, bwd_fused=True, fused_kv_chunk=2048,
              diag_pipe=True),
            B(1024, 1024, 1, 512, bwd_fused=True, fused_kv_chunk=2048,
              diag_pipe=True),
        ],
    }


def _sweep_rows(key, make_fn, args, fl, est_s, base_t, label):
    """Time each candidate for `key` with the bench's own protocol and log
    vs the dispatch row's time (FA_BENCH_SWEEP only; stderr only)."""
    import os

    if not os.environ.get("FA_BENCH_SWEEP"):
        return
    for bs in _sweep_candidates().get(key, []):
        try:
            ts = scan_timer(make_fn(bs), args, est_s=est_s)
            log(
                f"  sweep {label} {_bs_label(bs):40s} {fl/ts/1e12:7.2f} TF"
                f" ({base_t/ts*100 - 100:+5.1f}% vs dispatch)"
            )
        except Exception as e:
            log(
                f"  sweep {label} {_bs_label(bs):40s} FAIL"
                f" {type(e).__name__}: {str(e)[:120]}"
            )


def _bs_label(bs):
    tags = "".join(
        f",{t}" for t, on in (
            ("hu", bs.head_unroll), ("pipe", bs.diag_pipe),
            ("nlse", bs.lse_narrow),
        ) if on
    )
    return f"({bs.block_q},{bs.block_kv},h{bs.block_h},sub{bs.block_sub}{tags})"


def smoke_correctness(on_tpu):
    """On-chip correctness smoke at the REAL dispatch tiers (~60 s).

    Interpreter-mode tests can't catch TPU-only failures (scoped-VMEM
    cliffs, Mosaic layout bugs — see the reference's cpu_attention gate,
    flash_attention.cu:757-884); this runs the reference's cases + GQA +
    decode ON THE CHIP with the production block configs and asserts the
    <0.1 bar before any timing. A failure aborts the bench loudly.
    """
    if not on_tpu:
        return []
    cases = [
        # The reference's four harness cases + its documented gaps.
        dict(seq=256, heads=4, causal=True),
        dict(seq=512, heads=32, causal=True),
        dict(seq=512, heads=32, causal=False),
        dict(seq=1024, heads=32, causal=False),
        dict(seq=1024, heads=32, causal=True),
        dict(seq=2048, heads=32, causal=True),
        dict(seq=640, heads=8, causal=True),  # ragged/non-pow2 tier
    ]
    rows = []
    for c in cases:
        q, k, v = make_qkv(17, 1, c["heads"], c["seq"], HEAD_DIM)
        got = flash_attention(q, k, v, causal=c["causal"])
        want = reference_attention(q, k, v, causal=c["causal"])
        err = float(
            jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32)))
        )
        rows.append(dict(kind="smoke", **c, max_err=err))
        status = "ok" if err < 0.1 else "FAIL"
        log(f"smoke fwd {c}: max_err={err:.5f} {status}")
        if err >= 0.1:
            raise AssertionError(f"on-TPU smoke failed: {c} max_err={err}")
    # fp16 I/O at real dispatch tiers — the reference's own bit-width
    # (flash_attention.cu:784 asserts <0.1 against an fp32 oracle for fp16
    # inputs); one causal multi-block case + one single-superblock case.
    for seq in (1024, 4096):
        q, k, v = make_qkv(20, 1, 32, seq, HEAD_DIM, dtype=jnp.float16)
        got = flash_attention(q, k, v, causal=True)
        want = reference_attention(q, k, v, causal=True)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want)))
        rows.append(dict(kind="smoke", case=f"fp16_causal_{seq}", max_err=err))
        log(f"smoke fp16 causal @{seq}: max_err={err:.5f} "
            f"{'ok' if err < 0.1 else 'FAIL'}")
        if err >= 0.1:
            raise AssertionError(f"on-TPU fp16 smoke failed @{seq}: {err}")
    # GQA at dispatch tiers.
    q, k, v = make_qkv(18, 1, 32, 2048, HEAD_DIM, num_kv_heads=8)
    got = flash_attention(q, k, v, causal=True)
    want = reference_attention(q, k, v, causal=True)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want)))
    rows.append(dict(kind="smoke", case="gqa_2048_g4", max_err=err))
    log(f"smoke gqa 32/8 @2048: max_err={err:.5f} {'ok' if err < 0.1 else 'FAIL'}")
    if err >= 0.1:
        raise AssertionError(f"on-TPU GQA smoke failed: max_err={err}")
    # Decode (bf16 + int8) at the real decode tiers against a dense oracle.
    batch, qh, kvh, seq = 8, 32, 8, 2048
    qd, kd, vd = make_qkv(19, batch, qh, 1, HEAD_DIM, num_kv_heads=kvh, kv_seq=seq)
    qd = qd[:, :, 0, :]
    lengths = jnp.full((batch,), seq, jnp.int32)
    want = reference_attention(
        qd[:, :, None, :], kd, vd, causal=True
    )[:, :, 0, :]
    for mode, tol in (("none", 0.1), ("int8", 0.1), ("fp8_e4m3", 0.1)):
        kq, vq = quantize_kv(kd, vd, mode)
        got = decode_attention(qd, kq, vq, lengths)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want)))
        rows.append(dict(kind="smoke", case=f"decode_{mode}", max_err=err))
        log(f"smoke decode kv={mode}: max_err={err:.5f} {'ok' if err < tol else 'FAIL'}")
        if err >= tol:
            raise AssertionError(f"on-TPU decode smoke failed ({mode}): {err}")
    return rows


def bench_forward(on_tpu):
    import os

    peak = detect_mxu_peak_tflops()
    seqs = [512, 768, 1024, 2048, 4096, 8192, 16384] if on_tpu else [256]
    sweep = _sweep_candidates() if os.environ.get("FA_BENCH_SWEEP") else {}
    rows = []
    for causal in (False, True):
        for seq in seqs:
            q, k, v = make_qkv(0, BATCH, HEADS, seq, HEAD_DIM)
            fn = lambda q, k, v: flash_attention(q, k, v, causal=causal)
            fl = attention_flops(BATCH, HEADS, seq, HEAD_DIM, causal=causal)
            # Deterministic time model (assume 30% of peak) => reproducible
            # scan lengths => persistent-cache hits on every rerun.
            t = scan_timer(fn, (q, k, v), est_s=fl / (0.3 * peak * 1e12))
            tf = fl / t / 1e12
            for bs in sweep.get((seq, causal), []):
                fns = lambda q, k, v, bs=bs: flash_attention(
                    q, k, v, causal=causal, block_sizes=bs
                )
                try:
                    ts = scan_timer(
                        fns, (q, k, v), est_s=fl / (0.3 * peak * 1e12)
                    )
                    log(
                        f"  sweep seq={seq} c={int(causal)} {_bs_label(bs):36s}"
                        f" {fl/ts/1e12:7.2f} TF"
                        f" ({(fl/ts/1e12)/tf*100 - 100:+5.1f}% vs dispatch)"
                    )
                except Exception as e:
                    log(
                        f"  sweep seq={seq} c={int(causal)} {_bs_label(bs):36s}"
                        f" FAIL {type(e).__name__}: {str(e)[:120]}"
                    )
            ref = REFERENCE_TFLOPS.get((seq, causal))
            rows.append(
                dict(
                    kind="forward", seq=seq, causal=causal,
                    time_us=t * 1e6, tflops=tf,
                    roofline_frac=tf / peak,
                    reference_tflops=ref,
                    vs_reference=(tf / ref) if ref else None,
                )
            )
            log(
                f"fwd seq={seq:6d} causal={int(causal)}: {t*1e6:9.1f}us "
                f"{tf:7.2f} TFLOPS ({tf/peak*100:4.1f}% roofline)"
                + (f"  vs ref {ref:5.2f} = {tf/ref:4.1f}x" if ref else "")
            )
    return rows


def bench_gqa(on_tpu):
    """GQA (7B-class 32q/8kv) causal prefill rows — detail only (the headline
    geomean stays MHA 32/32 to remain comparable with the reference's
    protocol and earlier rounds)."""
    rows = []
    if not on_tpu:
        return rows
    peak = detect_mxu_peak_tflops()
    for seq, causal in ((2048, True), (8192, True), (8192, False)):
        q, k, v = make_qkv(7, BATCH, HEADS, seq, HEAD_DIM, num_kv_heads=8)
        fn = lambda q, k, v, c=causal: flash_attention(q, k, v, causal=c)
        fl = attention_flops(BATCH, HEADS, seq, HEAD_DIM, causal=causal)
        t = scan_timer(fn, (q, k, v), est_s=fl / (0.3 * peak * 1e12))
        tf = fl / t / 1e12
        _sweep_rows(
            ("gqa", seq, causal),
            lambda bs: lambda q, k, v, c=causal, bs=bs: flash_attention(
                q, k, v, causal=c, block_sizes=bs
            ),
            (q, k, v), fl, fl / (0.3 * peak * 1e12), t,
            f"gqa seq={seq} c={int(causal)}",
        )
        rows.append(
            dict(kind="gqa_forward", seq=seq, causal=causal, q_heads=HEADS,
                 kv_heads=8, time_us=t * 1e6, tflops=tf,
                 roofline_frac=tf / peak)
        )
        log(
            f"gqa 32/8 seq={seq:6d} causal={int(causal)}: {t*1e6:9.1f}us "
            f"{tf:7.2f} TFLOPS ({tf/peak*100:4.1f}% roofline)"
        )
    return rows


def bench_window(on_tpu):
    """Sliding-window rows (Mistral-class): long context, fixed attention
    band. The tri grid enumerates only the live (q, kv) block pairs inside
    the band, so time should scale with the band area (window·seq), not
    seq² — the detail row records band-FLOPs TFLOPS plus the speedup over
    the full-causal row at the same seq."""
    rows = []
    if not on_tpu:
        return rows
    peak = detect_mxu_peak_tflops()
    for seq, window in ((16384, 4096), (16384, 1024)):
        q, k, v = make_qkv(11, BATCH, HEADS, seq, HEAD_DIM)
        fn = lambda q, k, v, w=window: flash_attention(
            q, k, v, causal=True, sliding_window=w
        )
        fl = attention_flops(
            BATCH, HEADS, seq, HEAD_DIM, causal=True, window=window
        )
        try:
            t = scan_timer(fn, (q, k, v), est_s=fl / (0.3 * peak * 1e12))
        except Exception as e:  # new row: never abort the whole bench run
            log(f"window seq={seq} w={window}: FAIL {e!r}")
            continue
        _sweep_rows(
            ("window", window),
            lambda bs: lambda q, k, v, w=window, bs=bs: flash_attention(
                q, k, v, causal=True, sliding_window=w, block_sizes=bs
            ),
            (q, k, v), fl, fl / (0.3 * peak * 1e12), t,
            f"window w={window}",
        )
        tf = fl / t / 1e12
        rows.append(
            dict(
                kind="window_forward", seq=seq, window=window,
                time_us=t * 1e6, tflops=tf, roofline_frac=tf / peak,
            )
        )
        log(
            f"window seq={seq} w={window:5d}: {t*1e6:9.1f}us "
            f"{tf:7.2f} band-TFLOPS ({tf/peak*100:4.1f}% roofline)"
        )
    return rows


def bench_packed(on_tpu):
    """Packed-sequence rows: 4 documents of 2048 packed into one 8192 row.
    FLOPs accounting counts only the live per-document causal areas (4 x
    causal(2048)), so the TFLOPS read near the full-causal rate only if the
    segment-aware block skipping actually removes the ~2/3 dead cross-doc
    work (without skipping the same rows read ~0.35x)."""
    rows = []
    if not on_tpu:
        return rows
    import numpy as np

    peak = detect_mxu_peak_tflops()
    seq, doc = 8192, 2048
    q, k, v = make_qkv(13, BATCH, HEADS, seq, HEAD_DIM)
    seg = jnp.asarray(
        np.repeat(np.arange(seq // doc, dtype=np.int32), doc)[None]
    )
    fl = (seq // doc) * attention_flops(
        BATCH, HEADS, doc, HEAD_DIM, causal=True
    )

    fn = lambda q, k, v: flash_attention(q, k, v, causal=True, segment_ids=seg)
    try:
        t = scan_timer(fn, (q, k, v), est_s=fl / (0.3 * peak * 1e12))
        _sweep_rows(
            ("packed",),
            lambda bs: lambda q, k, v, bs=bs: flash_attention(
                q, k, v, causal=True, segment_ids=seg, block_sizes=bs
            ),
            (q, k, v), fl, fl / (0.3 * peak * 1e12), t,
            "packed fwd",
        )
        tf = fl / t / 1e12
        rows.append(
            dict(
                kind="packed_forward", seq=seq, doc_len=doc, time_us=t * 1e6,
                tflops=tf, roofline_frac=tf / peak,
            )
        )
        log(
            f"packed fwd 4x{doc} @ {seq}: {t*1e6:9.1f}us "
            f"{tf:7.2f} live-TFLOPS ({tf/peak*100:4.1f}% roofline)"
        )
    except Exception as e:
        log(f"packed fwd: FAIL {e!r}")

    def fwd_bwd(q, k, v):
        def f(q, k, v):
            return jnp.sum(
                flash_attention(
                    q, k, v, causal=True, segment_ids=seg
                ).astype(jnp.float32)
            )

        dq, dk, dv = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        probe = (
            dk[0, 0, 0, 0].astype(jnp.float32)
            + dv[0, 0, 0, 0].astype(jnp.float32)
        ) * 0.0
        return dq.at[0, 0, 0, 0].add(probe.astype(dq.dtype))

    eff_fl = 3.5 * fl
    try:
        t = scan_timer(fwd_bwd, (q, k, v), est_s=eff_fl / (0.25 * peak * 1e12))
        tf = eff_fl / t / 1e12
        rows.append(
            dict(
                kind="packed_train", seq=seq, doc_len=doc, time_us=t * 1e6,
                eff_tflops=tf, roofline_frac=tf / peak,
            )
        )
        log(
            f"packed train 4x{doc} @ {seq}: {t*1e6:9.1f}us "
            f"{tf:7.2f} live-eff-TFLOPS ({tf/peak*100:4.1f}% roofline)"
        )
    except Exception as e:
        log(f"packed train: FAIL {e!r}")
    return rows


def bench_d64(on_tpu):
    """head_dim=64 rows (GPT-2-class): the d64_unpadded path keeps the
    block minor dim at 64 instead of zero-padding to 128 in HBM — half the
    Q/K/V/O bytes and half the MXU contraction FLOPs of the padded path."""
    rows = []
    if not on_tpu:
        return rows
    peak = detect_mxu_peak_tflops()
    for seq in (1024, 4096):
        q, k, v = make_qkv(25, BATCH, HEADS, seq, 64)
        fn = lambda q, k, v: flash_attention(q, k, v, causal=True)
        fl = attention_flops(BATCH, HEADS, seq, 64, causal=True)
        t = scan_timer(fn, (q, k, v), est_s=fl / (0.15 * peak * 1e12))
        tf = fl / t / 1e12
        _sweep_rows(
            ("d64", seq),
            lambda bs: lambda q, k, v, bs=bs: flash_attention(
                q, k, v, causal=True, block_sizes=bs
            ),
            (q, k, v), fl, fl / (0.15 * peak * 1e12), t,
            f"d64 seq={seq}",
        )
        rows.append(
            dict(kind="d64_forward", seq=seq, head_dim=64, causal=True,
                 time_us=t * 1e6, tflops=tf, roofline_frac=tf / peak)
        )
        log(
            f"d64  seq={seq:6d} causal=1: {t*1e6:9.1f}us "
            f"{tf:7.2f} TFLOPS ({tf/peak*100:4.1f}% roofline)"
        )
    return rows


def bench_training(on_tpu):
    """Training rows: forward + backward through the custom VJP.

    Effective TFLOPS uses the standard flash-attention accounting of
    1x forward + 2.5x backward = 3.5x the forward FLOPs (dq recomputes the
    score matmul and runs two more; dkv likewise), over the measured
    value_and_grad time.
    """
    rows = []
    if not on_tpu:
        return rows
    peak = detect_mxu_peak_tflops()
    for seq, causal in ((2048, True), (8192, False), (8192, True)):
        q, k, v = make_qkv(5, BATCH, HEADS, seq, HEAD_DIM)

        # Residuals forward standalone (the under-grad forward): its tiers
        # carry the extra LSE output and are swept on their own key.
        fl_f = attention_flops(BATCH, HEADS, seq, HEAD_DIM, causal=causal)
        import os as _os

        if _os.environ.get("FA_BENCH_SWEEP"):
            fnr = lambda q, k, v: flash_attention(
                q, k, v, causal=causal, save_residuals=True
            )
            t_res = scan_timer(
                fnr, (q, k, v), est_s=fl_f / (0.3 * peak * 1e12)
            )
            log(
                f"  resfwd seq={seq} c={int(causal)} dispatch"
                f" {fl_f/t_res/1e12:7.2f} TF"
            )
            _sweep_rows(
                ("resfwd", seq, causal),
                lambda bs: lambda q, k, v, bs=bs: flash_attention(
                    q, k, v, causal=causal, save_residuals=True,
                    block_sizes=bs
                ),
                (q, k, v), fl_f, fl_f / (0.3 * peak * 1e12), t_res,
                f"resfwd seq={seq} c={int(causal)}",
            )

        def fwd_bwd(q, k, v):
            def f(q, k, v):
                return jnp.sum(
                    flash_attention(q, k, v, causal=causal).astype(jnp.float32)
                )

            dq, dk, dv = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
            # Tie dk/dv into the timed chain's probe element: scan_timer
            # consumes only the first output leaf's first element, and the
            # dkv pallas call would otherwise be dead-code-eliminated
            # (see scan_timer's trap notes).
            probe = (
                dk[0, 0, 0, 0].astype(jnp.float32)
                + dv[0, 0, 0, 0].astype(jnp.float32)
            ) * 0.0
            return dq.at[0, 0, 0, 0].add(probe.astype(dq.dtype))

        fl = attention_flops(BATCH, HEADS, seq, HEAD_DIM, causal=causal)
        eff_fl = 3.5 * fl
        t = scan_timer(fwd_bwd, (q, k, v), est_s=eff_fl / (0.25 * peak * 1e12))

        def make_train(bs):
            def fb(q, k, v, bs=bs):
                def f(q, k, v):
                    return jnp.sum(
                        flash_attention(
                            q, k, v, causal=causal, bwd_block_sizes=bs
                        ).astype(jnp.float32)
                    )

                dq, dk, dv = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
                probe = (
                    dk[0, 0, 0, 0].astype(jnp.float32)
                    + dv[0, 0, 0, 0].astype(jnp.float32)
                ) * 0.0
                return dq.at[0, 0, 0, 0].add(probe.astype(dq.dtype))

            return fb

        _sweep_rows(
            ("train", seq, causal), make_train, (q, k, v), eff_fl,
            eff_fl / (0.25 * peak * 1e12), t,
            f"train seq={seq} c={int(causal)}",
        )
        tf = eff_fl / t / 1e12
        rows.append(
            dict(kind="train", seq=seq, causal=causal, time_us=t * 1e6,
                 eff_tflops=tf, roofline_frac=tf / peak)
        )
        log(
            f"train seq={seq:6d} causal={int(causal)}: {t*1e6:9.1f}us "
            f"{tf:7.2f} eff-TFLOPS ({tf/peak*100:4.1f}% roofline)"
        )
    return rows


def bench_decode(on_tpu):
    """Decode tokens/s/chip: seq=8192 batch=32 (BASELINE.json config)."""
    rows = []
    if not on_tpu:
        return rows
    batch, q_heads, kv_heads, seq = 32, 32, 8, 8192
    q, k, v = make_qkv(1, batch, q_heads, 1, HEAD_DIM, num_kv_heads=kv_heads, kv_seq=seq)
    q = q[:, :, 0, :]
    lengths = jnp.full((batch,), seq, jnp.int32)
    for mode in ("none", "int8", "fp8_e4m3", "fp8_e5m2"):
        kq, vq = quantize_kv(k, v, mode)
        # The KV cache must be a jit ARGUMENT of the timing loop, not a
        # closure: GB-scale closure constants inside a lax.scan hang XLA's
        # loop optimizer. chain="add" keeps the invariant cache args out of
        # the scan carry (barrier-chaining them hangs the same pass).
        fn = lambda q, kq, vq: decode_attention(q, kq, vq, lengths)
        kv_payload = sum(
            x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves((kq, vq))
        )
        # Decode is HBM-bound: model the step time as the KV read at 60% of
        # peak bandwidth (~819 GB/s on v5e) for deterministic scan lengths.
        t = scan_timer(
            fn, (q, kq, vq), est_s=kv_payload / (0.6 * 819e9), chain="add"
        )
        toks_per_s = batch / t
        # decode attention reads the whole KV cache (kv_payload) once per step
        bw = kv_payload / t / 1e9
        rows.append(
            dict(
                kind="decode", kv_quant=mode, batch=batch, seq=seq,
                time_us=t * 1e6, tokens_per_s=toks_per_s, kv_read_gbps=bw,
            )
        )
        log(
            f"decode kv={mode:9s} b={batch} s={seq}: {t*1e6:8.1f}us/step "
            f"{toks_per_s:9.0f} tok/s  (KV read {bw:5.0f} GB/s)"
        )
    return rows


def bench_paged(on_tpu):
    """Paged-cache rows: decode through the page-table kernel (int8,
    page_size=1024 — the documented serving config) and the in-place paged
    PREFILL kernel's per-chunk time at the first vs last chunk (flat = the
    O(S²/chunk) gather bytes are gone)."""
    rows = []
    if not on_tpu:
        return rows
    import numpy as np

    peak = detect_mxu_peak_tflops()

    from flash_attention_tpu.ops.paged import (
        init_paged_cache,
        paged_decode_attention,
        paged_prefill_attention,
        paged_write_prefill,
    )

    batch, q_heads, kv_heads, seq, page = 32, 32, 8, 8192, 1024
    pages_per_slot = seq // page
    num_pages = batch * pages_per_slot + 1
    cache = init_paged_cache(
        num_pages=num_pages, num_slots=batch, pages_per_slot=pages_per_slot,
        kv_heads=kv_heads, page_size=page, kv_quant="int8",
    )
    rng = np.random.RandomState(3)
    table = (1 + rng.permutation(num_pages - 1))[: batch * pages_per_slot]
    cache = cache._replace(
        page_table=jnp.asarray(table.reshape(batch, pages_per_slot), jnp.int32)
    )
    _, k, v = make_qkv(21, batch, kv_heads, 1, HEAD_DIM, kv_seq=seq)
    for slot in range(batch):
        cache = paged_write_prefill(cache, k[slot], v[slot], slot, seq)
    q = make_qkv(22, batch, q_heads, 1, HEAD_DIM)[0][:, :, 0, :]

    fn = lambda q, cache: paged_decode_attention(q, cache)
    kv_bytes = cache.k_pages.size + cache.v_pages.size  # int8 payload
    t = scan_timer(fn, (q, cache), est_s=kv_bytes / (0.6 * 819e9), chain="add")
    rows.append(
        dict(
            kind="decode", kv_quant="int8_paged", batch=batch, seq=seq,
            page_size=page, time_us=t * 1e6, tokens_per_s=batch / t,
            kv_read_gbps=kv_bytes / t / 1e9,
        )
    )
    log(
        f"decode kv=int8_paged b={batch} s={seq} page={page}: "
        f"{t*1e6:8.1f}us/step {batch/t:9.0f} tok/s "
        f"(KV read {kv_bytes/t/1e9:5.0f} GB/s)"
    )

    # Paged prefill chunk times: first chunk (sees 1 page) vs last chunk
    # (sees the whole 8K prefix in place). The gather path's per-chunk cost
    # grew linearly in the chunk index; the kernel's grows only by the live
    # pages it actually reads.
    chunk = 512
    qc = make_qkv(23, 1, q_heads, chunk, HEAD_DIM)[0]
    for label, kv_end in (("first", chunk), ("last", seq)):
        fnp = lambda qc, cache, ke: paged_prefill_attention(
            qc, cache, 0, ke, chunk_len=chunk
        )
        fl = attention_flops(
            1, q_heads, chunk, HEAD_DIM, causal=False, kv_seq=kv_end
        )
        t = scan_timer(
            fnp, (qc, cache, jnp.int32(kv_end)),
            est_s=max(fl / (0.2 * peak * 1e12), 20e-6), chain="add",
        )
        rows.append(
            dict(
                kind="paged_prefill", chunk=label, chunk_len=chunk,
                kv_end=kv_end, page_size=page, time_us=t * 1e6,
            )
        )
        log(
            f"paged prefill chunk={label:5s} kv_end={kv_end:5d}: "
            f"{t*1e6:8.1f}us"
        )
    return rows


def bench_engine(on_tpu):
    """Engine-level decode tokens/s through PagedServingEngine — scheduler,
    per-request sampling, paged cache writes and the host serving loop all
    included (the reference analog: its harness timed the whole dispatch
    path, flash_attention.cu:941-960). Model: 4-layer 7B-shaped decoder
    (model_dim 4096, 32q/8kv) so the number reflects the serving stack, not
    a toy. NOTE: on the tunneled bench host every loop iteration pays the
    ~9 ms relay RTT (reported as relay_overhead_us); on a directly-attached
    host that term vanishes."""
    rows = []
    if not on_tpu:
        return rows
    import numpy as np
    import time

    from flash_attention_tpu.models.transformer import (
        ModelConfig, init_model_params,
    )
    from flash_attention_tpu.serving.engine import Request
    from flash_attention_tpu.serving.paged_engine import PagedServingEngine
    from flash_attention_tpu.utils.benchmarking import calibrate_overhead_s

    batch, page, ctx = 32, 1024, 8192
    cfg = ModelConfig(
        vocab_size=32000, model_dim=4096, num_layers=4, num_q_heads=32,
        num_kv_heads=8, head_dim=HEAD_DIM, mlp_dim=11008, kv_quant="int8",
    )
    params = init_model_params(jax.random.key(0), cfg)
    prompt_len, max_new = ctx - 512, 64
    engine = PagedServingEngine(
        params, cfg, max_slots=batch,
        num_pages=batch * (ctx // page) + 1,
        pages_per_slot=ctx // page, page_size=page, prefill_chunk=1024,
    )
    rng = np.random.RandomState(9)
    reqs = [
        Request(
            id=i,
            prompt=tuple(int(x) for x in rng.randint(0, cfg.vocab_size, 8))
            * (prompt_len // 8),
            max_new_tokens=max_new,
        )
        for i in range(batch)
    ]
    # Warmup: engine.warmup() pre-compiles EVERY prefill-chunk horizon (a
    # full-length synthetic prompt walks all static kv_end programs) and
    # every pow2 decode-block length, then zeroes the counters. The round-3
    # bench hand-rolled this with max_new=15 and 1K prompts — the remaining
    # budget after the prefill-sampled token is max_new-1=14, which walks
    # k through 8,4,2 only, so the k=1 compile (~21 s) landed INSIDE the
    # timed decode phase and the row read 131 tok/s.
    engine.warmup(prompt_len=prompt_len)
    t0 = time.perf_counter()
    engine.run(reqs)
    total = time.perf_counter() - t0
    toks = engine.decode_tokens
    tps = toks / engine.decode_time_s
    rows.append(
        dict(
            kind="engine", engine="paged", batch=batch, seq=ctx,
            page_size=page, kv_quant="int8", model_layers=cfg.num_layers,
            decode_tokens=toks, decode_time_s=engine.decode_time_s,
            tokens_per_s=tps, total_run_s=total,
            relay_overhead_us=calibrate_overhead_s() * 1e6,
        )
    )
    log(
        f"engine paged b={batch} ctx={ctx} int8 ({cfg.num_layers}L 7B-shape): "
        f"{tps:8.0f} tok/s decode-phase ({toks} toks, "
        f"total run {total:.1f}s incl prefill)"
    )
    del engine

    # W8A16 variant: same model/config with weight-only int8 params —
    # decode is weight-read bound, so this is the serving-efficiency row
    # (ops/quant.py::quantize_weight; measured near-lossless logits).
    cfg8 = dataclasses.replace(cfg, weight_quant="int8")
    params8 = init_model_params(jax.random.key(0), cfg8)
    engine8 = PagedServingEngine(
        params8, cfg8, max_slots=batch,
        num_pages=batch * (ctx // page) + 1,
        pages_per_slot=ctx // page, page_size=page, prefill_chunk=1024,
    )
    engine8.warmup(prompt_len=prompt_len)
    t0 = time.perf_counter()
    engine8.run(reqs)
    total8 = time.perf_counter() - t0
    toks8 = engine8.decode_tokens
    tps8 = toks8 / engine8.decode_time_s
    rows.append(
        dict(
            kind="engine", engine="paged_w8", batch=batch, seq=ctx,
            page_size=page, kv_quant="int8", weight_quant="int8",
            model_layers=cfg.num_layers, decode_tokens=toks8,
            decode_time_s=engine8.decode_time_s, tokens_per_s=tps8,
            total_run_s=total8,
        )
    )
    log(
        f"engine paged W8 b={batch} ctx={ctx} int8+w8 ({cfg.num_layers}L "
        f"7B-shape): {tps8:8.0f} tok/s decode-phase ({toks8} toks, "
        f"total run {total8:.1f}s incl prefill)"
    )
    return rows


def bench_engine_breakdown(on_tpu):
    """Per-phase decomposition of the engine decode step (the reference's
    per-config introspection analog, flash_attention.cu:712-755): full
    jitted step, attention kernel, MLP stack, unembed, batched cache write,
    sampling — so 'is the serving stack fast?' is answerable from the
    artifact. Times via time_fn (relay overhead subtracted by its sync
    calibration; donated where production donates)."""
    if not on_tpu:
        return None
    import numpy as np

    from flash_attention_tpu.models.transformer import (
        ModelConfig, init_model_params, init_paged_caches,
        decode_step_logits_paged,
    )
    from flash_attention_tpu.ops.paged import (
        paged_decode_attention, paged_write_tokens_multi,
    )
    from flash_attention_tpu.models.transformer import swiglu, rms_norm
    from flash_attention_tpu.utils.benchmarking import time_fn

    batch, page, ctx = 32, 1024, 8192
    cfg = ModelConfig(
        vocab_size=32000, model_dim=4096, num_layers=4, num_q_heads=32,
        num_kv_heads=8, head_dim=HEAD_DIM, mlp_dim=11008, kv_quant="int8",
    )
    params = init_model_params(jax.random.key(0), cfg)
    caches = init_paged_caches(
        cfg, num_pages=batch * (ctx // page) + 1, num_slots=batch,
        pages_per_slot=ctx // page, page_size=page,
    )
    ppr = ctx // page
    tables = np.zeros((batch, ppr), np.int32)
    for s in range(batch):
        tables[s] = 1 + s * ppr + np.arange(ppr)
    caches = [
        c._replace(
            page_table=jnp.asarray(tables),
            lengths=jnp.full((batch,), ctx - 256, jnp.int32),
        )
        for c in caches
    ]
    toks = jnp.ones((batch, 1), jnp.int32)
    out = {}

    step = jax.jit(
        lambda p, t, c: decode_step_logits_paged(p, cfg, t, c),
        donate_argnums=(2,),
    )
    state = [jax.tree_util.tree_map(jnp.copy, caches)]

    def run_step():
        logits, state[0] = step(params, toks, state[0])
        return logits

    jax.block_until_ready(run_step())
    out["full_step_ms"] = min(time_fn(run_step, warmup=5, iters=20, runs=2)) * 1e3

    q = jnp.ones((batch, cfg.num_q_heads, cfg.head_dim), jnp.bfloat16)
    ker = jax.jit(lambda q, c: paged_decode_attention(q, c))
    jax.block_until_ready(ker(q, caches[0]))
    t = min(time_fn(lambda: ker(q, caches[0]), warmup=5, iters=30, runs=2))
    out["attention_kernel_ms_x_layers"] = t * 1e3 * cfg.num_layers

    h = jnp.ones((batch, 1, cfg.model_dim), jnp.bfloat16)

    def mlps(params, x):
        for l in params["layers"]:
            x = x + swiglu(rms_norm(x, l["mlp_norm"], cfg.norm_eps), l["mlp"])
        return x

    mfn = jax.jit(mlps)
    jax.block_until_ready(mfn(params, h))
    out["mlp_stack_ms"] = min(
        time_fn(lambda: mfn(params, h), warmup=5, iters=30, runs=2)
    ) * 1e3

    ufn = jax.jit(
        lambda params, x: jnp.einsum(
            "btm,vm->btv", x, params["embed"],
            preferred_element_type=jnp.float32,
        )
    )
    jax.block_until_ready(ufn(params, h))
    out["unembed_ms"] = min(
        time_fn(lambda: ufn(params, h), warmup=5, iters=30, runs=2)
    ) * 1e3

    # Batched multi-layer cache write (the deferred-write path's one call).
    k1 = jnp.ones((batch, cfg.num_kv_heads, cfg.head_dim), jnp.bfloat16)
    slots = jnp.arange(batch)
    wfn = jax.jit(
        lambda c: paged_write_tokens_multi(
            c, [k1] * cfg.num_layers, [k1] * cfg.num_layers, slots
        )
    )
    jax.block_until_ready(jax.tree_util.tree_leaves(wfn(caches)))
    out["multi_write_ms"] = min(
        time_fn(
            lambda: jax.tree_util.tree_leaves(wfn(caches))[0],
            warmup=5, iters=30, runs=2,
        )
    ) * 1e3

    from flash_attention_tpu.serving.sampling import sample_tokens

    logits = jnp.ones((batch, cfg.vocab_size), jnp.float32)
    temps = jnp.full((batch,), 0.8, jnp.float32)
    topks = jnp.full((batch,), 40, jnp.int32)
    topps = jnp.full((batch,), 0.95, jnp.float32)
    seeds = jnp.arange(batch, dtype=jnp.uint32)
    poss = jnp.full((batch,), 100, jnp.int32)
    sfn = jax.jit(
        lambda l: sample_tokens(l, temps, topks, topps, seeds, poss)
    )
    try:
        jax.block_until_ready(sfn(logits))
        out["sampling_ms"] = min(
            time_fn(lambda: sfn(logits), warmup=5, iters=30, runs=2)
        ) * 1e3
    except Exception as e:
        out["sampling_ms"] = None
        log(f"engine breakdown sampling: FAIL {e!r}")
    # Device-side decode-block rate (relay-independent): N chained k=16
    # blocks on donated caches with ONE readback — the rate a
    # directly-attached host's serving loop would see (the engine row on
    # THIS tunneled host additionally pays the per-block relay RTT, see
    # relay_overhead_us). Measured for the bf16 tree and the W8A16 tree.
    import time as _time

    from flash_attention_tpu.models.transformer import quantize_model_weights
    from flash_attention_tpu.serving.decode_loop import make_decode_multi
    from flash_attention_tpu.models.transformer import (
        decode_step_logits_paged as _dslp,
    )

    dm = make_decode_multi(cfg, _dslp)
    last = jnp.ones((batch,), jnp.int32)
    active = jnp.ones((batch,), bool)
    z32 = jnp.zeros((batch,), jnp.float32)
    zi = jnp.zeros((batch,), jnp.int32)
    ones = jnp.ones((batch,), jnp.float32)
    seeds = jnp.arange(batch, dtype=jnp.int32)
    for label, p in (("bf16", params), ("w8", quantize_model_weights(params))):
        c = [jax.tree_util.tree_map(jnp.copy, ci) for ci in caches]
        toks2, l2, c = dm(p, last, c, active, z32, zi, ones, seeds, 16, True)
        np.asarray(toks2[0, :1])
        t0 = _time.perf_counter()
        n_blocks = 5
        for _ in range(n_blocks):
            toks2, l2, c = dm(p, l2, c, active, z32, zi, ones, seeds, 16, True)
        np.asarray(toks2[0, :1])
        dt = (_time.perf_counter() - t0) / n_blocks
        out[f"block16_tok_s_{label}"] = batch * 16 / dt

    for k2, v2 in out.items():
        log(f"engine breakdown {k2}: {v2:.2f}" if v2 is not None else
            f"engine breakdown {k2}: n/a")
    return out


def main():
    on_tpu = jax.default_backend() == "tpu"
    log(f"devices: {jax.devices()}  backend={jax.default_backend()}")
    smoke_rows = smoke_correctness(on_tpu)
    fwd_rows = bench_forward(on_tpu)
    gqa_rows = bench_gqa(on_tpu)
    win_rows = bench_window(on_tpu)
    packed_rows = bench_packed(on_tpu)
    d64_rows = bench_d64(on_tpu)
    train_rows = bench_training(on_tpu)
    dec_rows = bench_decode(on_tpu)
    dec_rows += bench_paged(on_tpu)
    eng_rows = bench_engine(on_tpu)
    eng_breakdown = bench_engine_breakdown(on_tpu)

    ref_rows = [r for r in fwd_rows if r["reference_tflops"]]
    if ref_rows:
        geo = math.exp(sum(math.log(r["tflops"]) for r in ref_rows) / len(ref_rows))
        ref_geo = math.exp(
            sum(math.log(r["reference_tflops"]) for r in ref_rows) / len(ref_rows)
        )
        vs = geo / ref_geo
    else:  # CPU smoke fallback
        geo = fwd_rows[0]["tflops"] if fwd_rows else 0.0
        vs = 0.0

    detail = dict(
        device=str(jax.devices()[0]),
        peak_tflops=detect_mxu_peak_tflops(),
        smoke=smoke_rows,
        forward=fwd_rows,
        gqa_forward=gqa_rows,
        window_forward=win_rows,
        packed=packed_rows,
        d64_forward=d64_rows,
        train=train_rows,
        decode=[r for r in dec_rows if r["kind"] == "decode"],
        paged_prefill=[r for r in dec_rows if r["kind"] == "paged_prefill"],
        engine=eng_rows[0] if eng_rows else None,
        engine_w8=next(
            (r for r in eng_rows if r.get("engine") == "paged_w8"), None
        ),
        engine_breakdown=eng_breakdown,
        geomean_tflops=geo,
        vs_baseline=vs,
    )
    # Only a real-TPU run may replace the committed artifact: the CPU
    # fallback's single smoke row would otherwise clobber the measured
    # numbers (and break the generated-docs pin, tests/test_docs.py).
    name = "BENCH_DETAIL.json" if on_tpu else "BENCH_DETAIL_cpu.json"
    (pathlib.Path(__file__).resolve().parent / name).write_text(
        json.dumps(detail, indent=2)
    )

    print(
        json.dumps(
            dict(
                metric="attention_fwd_geomean_tflops_seq512-16k",
                value=round(geo, 2),
                unit="TFLOPS",
                vs_baseline=round(vs, 3),
            )
        )
    )


if __name__ == "__main__":
    main()
