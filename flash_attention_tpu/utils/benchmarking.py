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
    batch: int, heads: int, seq: int, head_dim: int, *, causal: bool, kv_seq: int | None = None
) -> float:
    """The reference's FLOPs formula: 4·B·H·Sq·Skv·D, halved for causal
    (flash_attention.cu:938-939)."""
    kv = seq if kv_seq is None else kv_seq
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
    out = None
    for _ in range(warmup):
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
