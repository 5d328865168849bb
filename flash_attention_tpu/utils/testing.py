"""Seeded input generation + oracle-diff checking.

Re-creates the reference's correctness-harness contract (C9 in SURVEY.md §2;
flash_attention.cu:757-884): deterministic-seeded inputs uniform in
(-0.5, 0.5), half-precision storage, and PASS iff max-abs-diff vs. the fp32
oracle is < 0.1 (flash_attention.cu:784).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

# The reference's pass bar: max abs diff < 0.1 vs fp32 oracle
# (flash_attention.cu:784, 816, 848, 880).
REFERENCE_TOLERANCE = 0.1


def make_qkv(
    seed: int,
    batch: int,
    num_q_heads: int,
    seq: int,
    head_dim: int,
    *,
    num_kv_heads: int | None = None,
    kv_seq: int | None = None,
    dtype=jnp.bfloat16,
):
    """Seeded U(-0.5, 0.5) Q/K/V, mirroring the reference's input distribution
    (srand(42); (rand()/RAND_MAX - 0.5), flash_attention.cu:764-769)."""
    if num_kv_heads is None:
        num_kv_heads = num_q_heads
    if kv_seq is None:
        kv_seq = seq
    kq, kk, kv = jax.random.split(jax.random.key(seed), 3)
    q = jax.random.uniform(kq, (batch, num_q_heads, seq, head_dim), jnp.float32, -0.5, 0.5)
    k = jax.random.uniform(kk, (batch, num_kv_heads, kv_seq, head_dim), jnp.float32, -0.5, 0.5)
    v = jax.random.uniform(kv, (batch, num_kv_heads, kv_seq, head_dim), jnp.float32, -0.5, 0.5)
    return q.astype(dtype), k.astype(dtype), v.astype(dtype)


@dataclasses.dataclass
class DiffReport:
    max_abs_diff: float
    mean_abs_diff: float
    tolerance: float

    @property
    def passed(self) -> bool:
        return self.max_abs_diff < self.tolerance

    def __str__(self) -> str:
        status = "PASS" if self.passed else "FAIL"
        return (
            f"[{status}] max_abs_diff={self.max_abs_diff:.6f} "
            f"mean_abs_diff={self.mean_abs_diff:.6f} (tol {self.tolerance})"
        )


def diff_report(got: jax.Array, want: jax.Array, tolerance: float = REFERENCE_TOLERANCE) -> DiffReport:
    d = jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))
    return DiffReport(
        max_abs_diff=float(jnp.max(d)),
        mean_abs_diff=float(jnp.mean(d)),
        tolerance=tolerance,
    )


def assert_close(got: jax.Array, want: jax.Array, tolerance: float = REFERENCE_TOLERANCE, msg: str = ""):
    rep = diff_report(got, want, tolerance)
    assert rep.passed, f"{msg} {rep}"
    return rep
