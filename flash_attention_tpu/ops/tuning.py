"""Adaptive block-size dispatch table.

TPU-native re-design of the reference's four-tier adaptive dispatcher C6
(flash_attention.cu:606-663): where the CUDA kernel keys (causal, seq>=2048)
to pick BLOCK_M/BLOCK_N/warps/occupancy/grid-order/load-mode, we key
(seq bucket, causal, head_dim, dtype) to pick Pallas block sizes. The CUDA
grid-swap/reversed-Q causal balancing trick (flash_attention.cu:103-111) has no
TPU analog — Pallas grids are not SM-scheduled — so causal work-skipping is
done with clamped KV index maps + predicated compute inside the kernel instead.

The table values are tuned on real v5e hardware by ``tools/autotune.py``; the
defaults here are the tuned winners.
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

    block_q: int = 256
    block_kv: int = 512

    def __post_init__(self):
        if self.block_q % 128 or self.block_kv % 128:
            raise ValueError(f"block sizes must be multiples of 128, got {self}")


@dataclasses.dataclass(frozen=True)
class DecodeBlockSizes:
    """Block sizes for the decode (single-token query) kernel."""

    block_kv: int = 512


# (min_seq_exclusive_bucket) -> BlockSizes, separately per causal mode. The
# reference's two buckets (seq < 2048 vs >= 2048) generalize to a sorted bucket
# list. Tuned on TPU v5e (see tools/autotune.py); re-run the autotuner to
# regenerate for other generations.
_FWD_TABLE: dict = {
    # causal: big Q blocks win — each KV tile is reused across more Q rows and
    # the diagonal-block masking cost amortizes.
    True: [
        (8192, BlockSizes(block_q=512, block_kv=1024)),
        (2048, BlockSizes(block_q=512, block_kv=1024)),
        (1024, BlockSizes(block_q=512, block_kv=512)),
        (512, BlockSizes(block_q=256, block_kv=512)),
        (0, BlockSizes(block_q=128, block_kv=256)),
    ],
    False: [
        (8192, BlockSizes(block_q=512, block_kv=1024)),
        (2048, BlockSizes(block_q=512, block_kv=1024)),
        (1024, BlockSizes(block_q=512, block_kv=512)),
        (512, BlockSizes(block_q=256, block_kv=512)),
        (0, BlockSizes(block_q=128, block_kv=256)),
    ],
}


def select_block_sizes(seq: int, *, causal: bool, head_dim: int = 128) -> BlockSizes:
    """Pick forward block sizes for a (seq, causal) config.

    Mirrors the dispatch keying of flash_attention.cu:620-661 but over more
    buckets. Block sizes are clamped so they never exceed the (padded) seq.
    """
    table = _FWD_TABLE[bool(causal)]
    for min_seq, bs in table:
        if seq > min_seq:
            chosen = bs
            break
    else:
        chosen = table[-1][1]
    # Clamp to the sequence (padded up to 128) so tiny seqs stay legal.
    pad_seq = max(128, -(-seq // 128) * 128)
    return BlockSizes(
        block_q=min(chosen.block_q, pad_seq),
        block_kv=min(chosen.block_kv, pad_seq),
    )


def select_decode_block_sizes(kv_seq: int, *, head_dim: int = 128) -> DecodeBlockSizes:
    pad = max(128, -(-kv_seq // 128) * 128)
    return DecodeBlockSizes(block_kv=min(512, pad))
