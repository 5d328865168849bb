"""Benchmark timing harness with the reference's exact protocol.

Re-creates C10 (SURVEY.md §2; flash_attention.cu:886-971): per config, a fixed
warmup count, a timed loop, several runs averaged, and
TFLOPS = 4·B·H·S²·D / time, halved for causal (flash_attention.cu:938-939).
cudaEvent timing becomes ``jax.block_until_ready`` wall-clock timing; the
regs/occupancy introspection block (C8) becomes %-of-MXU-roofline reporting.
"""

from __future__ import annotations

import dataclasses
import statistics
import time

import jax


def attention_flops(
    batch: int, heads: int, seq: int, head_dim: int, *, causal: bool,
    kv_seq: int | None = None, window: int | None = None,
) -> float:
    """The reference's FLOPs formula: 4·B·H·Sq·Skv·D, halved for causal
    (flash_attention.cu:938-939). With a causal sliding window only the
    live band counts: row r attends to min(r+1, window) columns, so the
    band area is W(W+1)/2 + (S-W)·W for S >= W."""
    kv = seq if kv_seq is None else kv_seq
    if window is not None:
        if not causal or kv_seq is not None:
            raise ValueError("window FLOPs accounting assumes causal self-attention")
        w = min(window, seq)
        band = w * (w + 1) / 2 + (seq - w) * w
        return 4.0 * batch * heads * band * head_dim
    flops = 4.0 * batch * heads * seq * kv * head_dim
    if causal:
        flops /= 2
    return flops


# bf16 MXU peak per chip, by TPU generation, in TFLOP/s. Used for roofline
# reporting the way C8 reports occupancy vs. published targets.
MXU_PEAK_TFLOPS = {
    "v4": 275.0,
    "v5 lite": 197.0,  # v5e
    "v5e": 197.0,
    "v5p": 459.0,
    "v6 lite": 918.0,  # v6e / Trillium
    "v6e": 918.0,
}


def detect_mxu_peak_tflops(default: float = 197.0) -> float:
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return default
    for name, peak in MXU_PEAK_TFLOPS.items():
        if name in kind:
            return peak
    return default


@dataclasses.dataclass
class BenchResult:
    name: str
    avg_time_s: float
    run_times_s: list
    tflops: float
    roofline_frac: float

    def row(self) -> str:
        runs = " ".join(f"{t * 1e3:8.3f}ms" for t in self.run_times_s)
        return (
            f"{self.name:<28s} {runs}  avg {self.avg_time_s * 1e3:8.3f}ms  "
            f"{self.tflops:7.2f} TFLOPS  ({self.roofline_frac * 100:5.1f}% roofline)"
        )


def _force(out):
    """Force completion with a host readback of a tiny slice.

    On tunneled/relayed TPU platforms ``jax.block_until_ready`` can return
    before the (lazily triggered) compile + execution has actually run; a
    host readback is the only reliable sync point. The slice keeps the
    device->host transfer negligible.
    """
    leaf = jax.tree_util.tree_leaves(out)[-1]
    import numpy as np  # local: keep module import light

    np.asarray(jax.device_get(leaf.reshape(-1)[:1]))


def time_fn(
    fn,
    *args,
    warmup: int = 20,
    iters: int = 100,
    runs: int = 3,
    inter_run_sleep_s: float = 0.0,
) -> list:
    """The reference's timing protocol: `warmup` untimed dispatches, then
    `iters` timed dispatches, repeated `runs` times (flash_attention.cu:941-956).
    cudaEvent timing becomes wall-clock around the dispatch loop with a forced
    readback sync, minus the calibrated fixed readback/RPC cost.
    Returns per-run average seconds per iteration."""
    # warmup=0 (cold-start timing) still needs one result for the sync-cost
    # calibration below — tree_leaves(None) is empty and _force would crash.
    out = fn(*args)
    for _ in range(max(0, warmup - 1)):
        out = fn(*args)
    jax.block_until_ready(out)
    _force(out)
    # Calibrate the fixed sync cost (device is idle now): a dispatch-free
    # forced readback of an already-computed value.
    sync_costs = []
    for _ in range(3):
        t0 = time.perf_counter()
        _force(out)
        sync_costs.append(time.perf_counter() - t0)
    sync_cost = min(sync_costs)

    run_times = []
    for _ in range(runs):
        start = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        _force(out)
        elapsed = time.perf_counter() - start - sync_cost
        run_times.append(max(elapsed, 1e-9) / iters)
        if inter_run_sleep_s:
            time.sleep(inter_run_sleep_s)
    return run_times


_OVERHEAD_S: float | None = None


def calibrate_overhead_s() -> float:
    """Fixed per-invocation cost of a jitted dispatch on this platform.

    On the tunneled TPU the relay adds ~9 ms per call with multi-ms jitter;
    any per-op timing must make device time >> this, then subtract it.
    """
    global _OVERHEAD_S
    if _OVERHEAD_S is None:
        import jax.numpy as jnp

        x = jnp.zeros((8, 128), jnp.float32)
        f = jax.jit(lambda x: x + 1.0)
        _OVERHEAD_S = min(time_fn(f, x, warmup=3, iters=5, runs=3))
    return _OVERHEAD_S


def _round_pow2(x: float, lo: int, hi: int) -> int:
    import math as _math

    k = max(0, round(_math.log2(max(x, 1.0))))
    return max(lo, min(hi, 2**k))


def scan_timer(
    fn,
    args,
    *,
    target_lo_s: float = 0.04,
    target_hi_s: float = 0.16,
    iters: int = 3,
    runs: int = 3,
    est_s: float | None = None,
    chain: str = "barrier",
) -> float:
    """Robust seconds-per-op via in-graph lax.scan repeats + slope fit.

    The op runs ``reps`` times inside one jitted scan, dependency-chained so
    XLA cannot hoist or dedupe iterations, at two repeat counts sized so the
    *difference* in device time is >> the relay jitter; the slope between
    them cancels every fixed per-invocation cost. This is the TPU-tunnel
    equivalent of the reference's cudaEvent-around-100-dispatches loop
    (flash_attention.cu:949-956).

    chain: "barrier" threads every arg through optimization_barrier each
      iteration; "add" perturbs only the first arg with tok*0 (cannot be
      algebraically folded: NaN*0 = NaN). Use "add" when the op captures
      large arrays — barrier-in-carry plus multi-hundred-MB operands hangs
      XLA's loop optimizer.

    TWO TRAPS (both observed on v5e, 2026-08-17):
      * Partial-output DCE: the chain consumes only the FIRST element of the
        first output leaf. If ``fn`` is a COMPOSITE whose other outputs don't
        feed that element (e.g. a concat of several kernel calls), XLA
        dead-code-eliminates the rest and the timing is fiction (>peak
        TFLOPS). Single pallas_call outputs are safe (the call is atomic).
      * VMEM pinning: arrays ``fn`` DERIVES from scan-invariant args (e.g. a
        reshaped KV cache) can be hoisted AND pinned in physical VMEM
        (128 MB), timing VMEM bandwidth instead of HBM. Perturb such inputs
        with the chain token when production would recompute them per step.
    """
    import jax.numpy as jnp

    def make(reps):
        if chain == "barrier":

            @jax.jit
            def run(*a):
                def body(carry, _):
                    ca, tok = carry
                    o = fn(*ca)
                    leaf = jax.tree_util.tree_leaves(o)[0]
                    tok2 = leaf.reshape(-1)[0].astype(jnp.float32)
                    ca2 = jax.lax.optimization_barrier(a + (tok2,))
                    return (ca2[:-1], ca2[-1]), ()

                init = jax.lax.optimization_barrier(a + (jnp.float32(0),))
                (_, tok), _ = jax.lax.scan(
                    body, (init[:-1], init[-1]), None, length=reps
                )
                return tok

        else:

            @jax.jit
            def run(*a):
                def body(tok, _):
                    a0 = a[0] + tok.astype(a[0].dtype) * 0
                    o = fn(a0, *a[1:])
                    leaf = jax.tree_util.tree_leaves(o)[0]
                    return leaf.reshape(-1)[0].astype(jnp.float32), ()

                tok, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
                return tok

        return run

    if est_s is not None:
        # Deterministic reps from a caller-supplied time model: skips the
        # calibration compile AND makes scan lengths reproducible across runs
        # (100% persistent-compilation-cache hits on re-benchmarks).
        est = max(est_s, 1e-7)
    else:
        overhead = calibrate_overhead_s()
        # Calibration pass: estimate per-op time from a small fixed-reps scan.
        t8 = min(time_fn(make(8), *args, warmup=2, iters=3, runs=2))
        est = max((t8 - overhead) / 8, 1e-7)
    reps_hi = _round_pow2(target_hi_s / est, 16, 8192)
    reps_lo = reps_hi // 4
    run_lo, run_hi = make(reps_lo), make(reps_hi)
    # Sanity-guarded slope: under host contention (another process hogging
    # the cores that drive the tunnel) the short-scan run can time SLOWER
    # than the long one, collapsing the slope to ~0 and reading as >1000x
    # roofline (observed: a 274e6-TFLOPS forward row while the test suite
    # ran concurrently). A result far below the caller's physical time
    # model est_s cannot be real — retry, then fail loudly rather than
    # emit fiction into the committed artifact.
    floor = est / 20.0
    for attempt in range(3):
        t_lo = min(time_fn(run_lo, *args, warmup=1, iters=iters, runs=runs))
        t_hi = min(time_fn(run_hi, *args, warmup=1, iters=iters, runs=runs))
        per_op = (t_hi - t_lo) / (reps_hi - reps_lo)
        if per_op > floor:
            return per_op
    raise RuntimeError(
        f"scan_timer slope non-physical after 3 attempts: {per_op:.3e}s/op "
        f"vs model {est:.3e}s (host contention?)"
    )


def bench_attention(
    fn,
    *args,
    name: str,
    flops: float,
    warmup: int = 20,
    iters: int = 100,
    runs: int = 3,
    peak_tflops: float | None = None,
) -> BenchResult:
    run_times = time_fn(fn, *args, warmup=warmup, iters=iters, runs=runs)
    avg = statistics.mean(run_times)
    tflops = flops / avg / 1e12
    peak = peak_tflops if peak_tflops is not None else detect_mxu_peak_tflops()
    return BenchResult(
        name=name,
        avg_time_s=avg,
        run_times_s=run_times,
        tflops=tflops,
        roofline_frac=tflops / peak,
    )
