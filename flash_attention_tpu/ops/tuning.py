"""Adaptive block-size dispatch table.

TPU-native re-design of the reference's four-tier adaptive dispatcher C6
(flash_attention.cu:606-663): where the CUDA kernel keys (causal, seq>=2048)
to pick BLOCK_M/BLOCK_N/warps/occupancy/grid-order/load-mode, we key
(seq, causal) to pick Pallas block sizes. The CUDA grid-swap/reversed-Q causal
balancing trick (flash_attention.cu:103-111) has no TPU analog — Pallas grids
are not SM-scheduled — so causal work-skipping is done with clamped KV index
maps + predicated compute inside the kernel instead.

Tuned on TPU v5e with tools/autotune.py (slope-fit in-graph timing). Measured
winners at batch=1, heads=32, head_dim=128, bf16:

  seq      non-causal            causal
  512      (512,512)   57.6 TF   (512,512)     31.2 TF
  768      (768,768)   93.5 TF   (768,768)     58.3 TF
  1024     (1024,1024) 140.9 TF  (1024,1024)   78.7 TF
  2048     (1024,2048) 151.2 TF  (2048,2048)   87.9 TF
  4096     (1024,1024) 143.9 TF  (1024,1024)  109.8 TF
  8192     (1024,1024) 150.8 TF  (1024,1024)  114.0 TF
  16384    (1024,1024) 152.4 TF  (1024,1024)  121.5 TF

The emergent rule: below ~2K, one grid step per (batch*head) — the whole
sequence as a single (bq=bkv=seq) tile — amortizes per-tile VPU overheads;
above 2K, (1024,1024) tiles keep the score tile + double-buffered KV inside
the ~16 MB VMEM budget ((2048,2048) only fits when there is exactly one KV
block, i.e. seq==2048, because a single block is not double-buffered).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class BlockSizes:
    """Block sizes for the fused forward kernel.

    block_q:  Q rows per grid step (the reference's BLOCK_M, 64/128).
    block_kv: KV rows per grid step (the reference's BLOCK_N, 64/128).
    Both must be multiples of 128 (TPU lane width / MXU edge).
    """

    block_q: int = 1024
    block_kv: int = 1024

    def __post_init__(self):
        if self.block_q % 128 or self.block_kv % 128:
            raise ValueError(f"block sizes must be multiples of 128, got {self}")


@dataclasses.dataclass(frozen=True)
class DecodeBlockSizes:
    """Block sizes for the decode (single-token query) kernel."""

    block_kv: int = 512


def _ceil_to(x: int, m: int) -> int:
    return max(m, -(-x // m) * m)


def select_block_sizes(seq: int, *, causal: bool, head_dim: int = 128) -> BlockSizes:
    """Pick forward block sizes for a (seq, causal) config.

    Mirrors the dispatch keying of flash_attention.cu:620-661; values from the
    v5e autotune sweep (see module docstring). Rules:
      * seq <= 2048 causal / <= 1024 non-causal: single tile (bq = bkv = seq)
      * 1024 < seq <= 2048 non-causal: (1024, seq)
      * larger: (1024, 1024)
    """
    pad_seq = _ceil_to(seq, 128)
    if causal:
        if pad_seq <= 2048:
            return BlockSizes(block_q=pad_seq, block_kv=pad_seq)
        return BlockSizes(block_q=1024, block_kv=1024)
    if pad_seq <= 1024:
        return BlockSizes(block_q=pad_seq, block_kv=pad_seq)
    if pad_seq <= 2048:
        return BlockSizes(block_q=1024, block_kv=pad_seq)
    return BlockSizes(block_q=1024, block_kv=1024)


def select_bwd_block_sizes(seq: int, *, causal: bool, head_dim: int = 128) -> BlockSizes:
    """Block sizes for the backward (dq / dkv) kernels.

    The backward holds more live fp32 tiles than the forward (score tile,
    dP tile, dS tile, two accumulators), so blocks are capped at 512 to stay
    inside the ~16 MB VMEM budget with double-buffered streaming.
    """
    pad_seq = _ceil_to(seq, 128)
    b = min(512, pad_seq)
    return BlockSizes(block_q=b, block_kv=b)


def select_decode_block_sizes(kv_seq: int, *, head_dim: int = 128) -> DecodeBlockSizes:
    pad = _ceil_to(kv_seq, 128)
    return DecodeBlockSizes(block_kv=min(512, pad))
