"""Adaptive block-size dispatch table.

TPU-native re-design of the reference's four-tier adaptive dispatcher C6
(flash_attention.cu:606-663): where the CUDA kernel keys (causal, seq>=2048)
to pick BLOCK_M/BLOCK_N/warps/occupancy/grid-order/load-mode, we key
(seq, causal) to pick Pallas block sizes. The CUDA grid-swap/reversed-Q causal
balancing trick (flash_attention.cu:103-111) has no TPU analog — Pallas grids
are not SM-scheduled — so causal work-skipping is done with clamped KV index
maps + predicated compute inside the kernel instead.

Tuned on TPU v5e with tools/autotune.py (calibrated in-graph scan slope-fit
timing, utils/benchmarking.py::scan_timer). Measured winners at batch=1,
heads=32, head_dim=128, bf16, with the triangular causal grid and
head-batching (block_q, block_kv, block_h):

  seq      non-causal                       causal
  512      (512,512,h4)    142.1 TF         (512,512,h8,sub128)      82 TF
  768      (384,768,h4)    154.4 TF         (768,768,h8,sub128)     105 TF
  1024     (1024,1024,h2)  164.1 TF         (1024,1024,h4,sub256)   119 TF
  2048     (512,2048,h2)   161.4 TF         (2048,2048,h2,sub256)   137 TF
  4096     (1024,1024,h2)  160.8 TF         (1024,1024,h2) 125.2 TF
  8192     (1024,1024,h2)  169.9 TF         (1024,1024,h2) 137.7 TF
  16384    (1024,1024,h2)  171.2 TF         (1024,1024,h2) 149.3 TF

(v5e bf16 peak 197 TF => non-causal long-seq is ~87% of roofline. The
single-tile rows use the kernel's single-step specialization — plain softmax
with no online-softmax scratch — worth ~1.8x at seq 512.)

The emergent rules: (1024,1024) tiles keep the fp32 score tile plus
double-buffered KV inside the ~16 MB VMEM budget; block_h=2 halves the number
of grid steps (per-step fixed costs and DMA descriptor overhead amortize over
two heads' batched matmuls); at seq <= 768 the whole sequence fits one tile
and larger head batches win until the hb-scaled score tiles hit the VMEM
ceiling (h8 at bq=bkv=512 non-causal; causal also carries mask tiles so h4).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class BlockSizes:
    """Block sizes for the fused forward kernel.

    block_q:  Q rows per grid step (the reference's BLOCK_M, 64/128).
    block_kv: KV rows per grid step (the reference's BLOCK_N, 64/128).
    Both must be multiples of 128 (TPU lane width / MXU edge).
    block_h:  heads per grid step (batched matmuls); >1 amortizes per-step
      fixed costs at short sequence lengths — the TPU analog of the
      reference's MIN_BLOCKS=2 short-seq occupancy boost
      (flash_attention.cu:618). Applied only when it divides batch*heads and
      the layout allows (MHA, or GQA when block_h spans whole groups).
    block_sub: causal single-superblock sub-tiling width (0 = off). When the
      whole (q, kv) problem fits one block pair, the kernel unrolls over
      block_sub-row Q sub-blocks, each doing ONE wide MMA over only its live
      KV prefix — plain per-row-block softmax, no online-softmax scratch, and
      the masked-region MXU waste drops from ~50% (full-tile diagonal) to
      ~1/(n+1) for n = block_q / block_sub sub-blocks.
    """

    block_q: int = 1024
    block_kv: int = 1024
    block_h: int = 1
    block_sub: int = 0
    # Backward only: run the FUSED one-pass backward kernel (dq + dk + dv
    # from ONE score/softmax recompute per block pair — 5 MMAs + 1 exp vs
    # the two-pass kernels' 9 + 2, and K/V+Q/dO stream once instead of
    # twice). Requires whole-KV fp32 dk/dv accumulators in VMEM
    # (2*kv_len*d*4 bytes per head-batch), so only moderate kv lengths fit;
    # MHA without packed segments only. OFF by default — select_bwd_block_sizes
    # never sets it pending the on-chip sweep; opt in via
    # BlockSizes(..., bwd_fused=True).
    bwd_fused: bool = False
    # Forward: keep head_dim=64 UN-padded (block minor dim 64 = the full
    # array dim, which Mosaic accepts) instead of zero-padding to 128 in HBM.
    # Halves Q/K/V/O HBM bytes and VMEM footprint for GPT-2-class models;
    # MXU utilization of a 64-contraction matmul is the same as the padded
    # one, so this is a pure bandwidth win wherever the row is HBM-bound.
    # Off by default pending the on-chip sweep (d=64 configs fall back to
    # generic tiers today — tuning is keyed at d=128).
    d64_unpadded: bool = False
    # Residuals forward: emit the LSE output 1 lane wide ([B*H, S, 1])
    # instead of LANES(128)-broadcast. The broadcast write moves 512 B/row
    # of pure padding — 2x the output tensor's own bytes at d=128 bf16 —
    # on EVERY jax.grad forward. The backward already consumes 1-lane
    # blocks, so only the forward's out BlockSpec changes. Off by default
    # pending the on-chip sweep (narrow stores can hit Mosaic layout
    # quirks; verify standalone compile + bench before dispatching).
    lse_narrow: bool = False

    def __post_init__(self):
        if self.block_q % 128 or self.block_kv % 128:
            raise ValueError(f"block sizes must be multiples of 128, got {self}")
        if self.block_h < 1:
            raise ValueError(f"block_h must be >= 1, got {self}")
        if self.block_sub and (self.block_sub % 128 or self.block_q % self.block_sub):
            raise ValueError(
                f"block_sub must be a multiple of 128 dividing block_q, got {self}"
            )


@dataclasses.dataclass(frozen=True)
class DecodeBlockSizes:
    """Block sizes for the decode (single-token query) kernel."""

    block_kv: int = 512


def _ceil_to(x: int, m: int) -> int:
    return max(m, -(-x // m) * m)


def select_block_sizes(
    seq: int, *, causal: bool, head_dim: int = 128, save_residuals: bool = False,
    group: int = 1, kv_seq: int | None = None,
) -> BlockSizes:
    """Pick forward block sizes for a (seq, causal, residuals, group) config.

    Wraps the raw tier table with the head-batch group resolution _fwd_impl
    applies at trace time (a GQA head-block must span whole KV groups, else it
    runs unbatched): the returned config states the block_h that will actually
    execute, so sweeps and introspection never read a head batch the kernel
    silently drops. The GQA-measured tiers in the raw table already return
    group-spanning batches for the swept shapes; unswept (group, seq) combos
    degrade here explicitly instead of inside the kernel.
    """
    bs = _select_fwd_raw(
        seq, causal=causal, head_dim=head_dim,
        save_residuals=save_residuals, group=group, kv_seq=kv_seq,
    )
    if group > 1 and bs.block_h > 1 and bs.block_h % group:
        bs = dataclasses.replace(bs, block_h=1)
    return bs


def _select_fwd_raw(
    seq: int, *, causal: bool, head_dim: int = 128, save_residuals: bool = False,
    group: int = 1, kv_seq: int | None = None,
) -> BlockSizes:
    """Raw (seq, causal, residuals) tier table.

    Mirrors the dispatch keying of flash_attention.cu:620-661; values from the
    v5e autotune sweep (see module docstring). The residuals path (LSE output
    — used under jax.grad, by ring attention, and by split merging) carries an
    extra fp32 output block, which pushes the (1024,1024,h2) configs over the
    16 MB scoped-VMEM limit; its sweep favors (512,1024,h2) instead (within
    ~2% of the non-residual rates at long seq: 166.6 TF non-causal / 137.3 TF
    causal at 8K).
    """
    pad_seq = _ceil_to(seq, 128)
    if head_dim > 128:
        # Tuned at head_dim=128; larger heads scale the VMEM accumulators, so
        # fall back to unbatched heads rather than risk scoped-VMEM OOM.
        return BlockSizes(block_q=min(1024, pad_seq), block_kv=min(1024, pad_seq))
    if kv_seq is not None and _ceil_to(kv_seq, 128) > 2 * pad_seq:
        # Chunked prefill / cross attention: kv much longer than q, so the
        # short-seq single-superblock configs keyed on min(q, kv) don't
        # apply — the grid is multi-KV-block and their large head batches
        # blow scoped VMEM (measured: (512,512,h8) against kv=4096 OOMs by
        # ~3.8M on v5e — caught driving ServingEngine chunked prefill on
        # chip). Stream KV in 1024-row blocks with the q chunk resident,
        # h2, as in the long-seq residuals config (same VMEM envelope).
        # block_h must span whole KV groups or _fwd_impl silently drops to
        # hb=1: for GQA use h=group (the (512,1024,h4) envelope measured for
        # the long-seq GQA tier below); group 8+ head batches blow scoped
        # VMEM, so stay unbatched there.
        bh = group if group in (2, 4) else (2 if group == 1 else 1)
        return BlockSizes(
            block_q=min(512, pad_seq),
            block_kv=min(1024, _ceil_to(kv_seq, 128)),
            block_h=bh,
        )
    if group in (2, 4) and pad_seq > 1024:
        # GQA: block_h must span whole KV groups; the generic h2 long-seq
        # configs don't divide, so use the GQA-swept winners. At <= 2048 the
        # causal single-superblock sub-tiled form applies with h = 4 (spans
        # whole groups; hb_kv = 4/group): 7B-class (32q/8kv) causal 2048
        # measures 148.6 TF vs 102.8 for the tri grid (v5e, standalone-
        # compile verified; h8 exceeds scoped VMEM). Longer seqs keep
        # (512,1024,h=group) in-kernel KV expansion: 117->145 TF at 8192 vs
        # h1. The residuals variant halves block_q: the LSE output block
        # pushes (512,1024,h4) 876KB over the scoped-VMEM limit.
        if causal and pad_seq <= 2048 and not save_residuals and group == 4:
            return BlockSizes(
                block_q=pad_seq, block_kv=pad_seq, block_h=4, block_sub=128
            )
        if save_residuals:
            return BlockSizes(block_q=256, block_kv=1024, block_h=group)
        return BlockSizes(block_q=512, block_kv=1024, block_h=group)
    if save_residuals:
        if causal:
            # Subtile variants with one head-batch step of VMEM headroom for
            # the extra fp32 LSE output block (all verified to compile
            # STANDALONE on v5e — the in-scan benchmark hides ~1 MB).
            if pad_seq <= 768:
                return BlockSizes(
                    block_q=pad_seq, block_kv=pad_seq, block_h=4, block_sub=128
                )
            if pad_seq <= 1024:
                return BlockSizes(
                    block_q=pad_seq, block_kv=pad_seq, block_h=4, block_sub=128
                )
            if pad_seq <= 2048:
                sub = 256 if pad_seq % 256 == 0 else 128
                return BlockSizes(
                    block_q=pad_seq, block_kv=pad_seq, block_h=2, block_sub=sub
                )
            return BlockSizes(block_q=512, block_kv=1024, block_h=2)
        if pad_seq <= 768:
            return BlockSizes(block_q=pad_seq, block_kv=pad_seq, block_h=2)
        return BlockSizes(block_q=512, block_kv=min(1024, pad_seq), block_h=2)
    if causal:
        # Single-superblock sub-tiled configs (block_sub, v5e sweep
        # 2026-08-17): per-128-row live-prefix MMAs cut masked-region MXU
        # waste from ~50% (full-tile diagonal) to ~1/(n+1), and the plain
        # per-row-block softmax drops the online (m, l, acc) state entirely.
        # Measured (b=1, h=32, d=128): 512 h8 82 TF (was 69), 768 h8 105
        # (was 79), 1024 h4 116 (was 81), 2048 h2 131 (was 94). At 4096 the
        # h1-only single-superblock loses to the tri grid (120 vs 125), and
        # h8 @ 1024 / h4 @ 2048 exceed scoped VMEM when compiled standalone.
        # NOTE: 512 causal is HBM-wall-bound at ~105 TF (QKVO bytes are
        # constant while causal credits half the FLOPs), so ~80 TF is ~78%
        # of the true ceiling, not 42%.
        if pad_seq <= 768:
            return BlockSizes(
                block_q=pad_seq, block_kv=pad_seq, block_h=8, block_sub=128
            )
        if pad_seq <= 1024:
            sub = 256 if pad_seq % 256 == 0 else 128
            return BlockSizes(
                block_q=pad_seq, block_kv=pad_seq, block_h=4, block_sub=sub
            )
        if pad_seq <= 2048:
            sub = 256 if pad_seq % 256 == 0 else 128
            return BlockSizes(
                block_q=pad_seq, block_kv=pad_seq, block_h=2, block_sub=sub
            )
        # Multi-block tri grid with DIAG sub-tiling (v5e sweep 2026-08-17):
        # the diagonal step runs live-prefix sub-MMAs merged into the online
        # state, interior steps are mask-free. 4096: 121.2 -> 134.2 TF;
        # 8192: 142.0 -> 149.8; 16384: 150.6 -> 157.4. (The ~7 min "slow
        # compiles" observed at 4096 during the sweep were the remote
        # compile helper's cold start — the first big Mosaic compile of a
        # session pays it regardless of config; warm compiles run ~3-16 s.)
        return BlockSizes(
            block_q=1024, block_kv=1024, block_h=2, block_sub=256
        )
    # Non-causal (v5e re-sweep 2026-08-17, after the pre-PV normalize and the
    # no-scratch single-KV-block specialization): 512 (512,512,h4) 142 TF,
    # 768 (384,768,h4) 154 (the full-tile (768,768,h4) hits a Mosaic layout
    # pathology at 6 TF — avoid), 1024 (1024,1024,h2) 164, 2048
    # (512,2048,h2) 160. At 4096+ the single-KV-block form loses to the
    # online (1024,1024,h2) path (136-139 vs 161-171 TF) — one giant KV
    # block per head starves the pipeline.
    if pad_seq <= 512:
        return BlockSizes(block_q=pad_seq, block_kv=pad_seq, block_h=4)
    if pad_seq <= 768:
        return BlockSizes(block_q=384 if pad_seq == 768 else pad_seq,
                          block_kv=pad_seq, block_h=4)
    if pad_seq <= 1024:
        return BlockSizes(block_q=pad_seq, block_kv=pad_seq, block_h=2)
    if pad_seq <= 2048:
        return BlockSizes(block_q=512, block_kv=pad_seq, block_h=2)
    return BlockSizes(block_q=1024, block_kv=1024, block_h=2)


def select_bwd_block_sizes(seq: int, *, causal: bool, head_dim: int = 128) -> BlockSizes:
    """Block sizes for the backward (dq / dkv) kernels.

    The backward holds more live fp32 tiles than the forward (score tile,
    dP tile, dS tile, two accumulators), so blocks are capped well below the
    forward's. v5e sweeps (fwd+bwd eff-TF at b=1, h=32, d=128):

      * causal <= 2048: single-superblock sub-tiled form (block_sub — the
        forward's trick in both bwd kernels: live-prefix MMAs for dq,
        live-suffix for dkv), now head-batched: (2048,2048,h2,sub128) 113.9
        vs 112.7 at h1. (h4 superblocks exceed scoped VMEM.)
      * causal > 2048: tri grid with DIAG sub-tiling + head batching —
        (512,512,h4,sub128) 114.3 eff-TF @8K vs 96.1 for the round-2
        (512,512,h1) masked tri. ((1024,1024) diag blocks OOM at h2; h1
        measures 113.5.)
      * non-causal long: head batching alone — (512,512,h4) 134.2 @8K vs
        122.9 at h1.
      * non-causal <= 4096 keeps the single-KV-block forms (whole KV range
        resident per step, Q/dO streaming).
    """
    pad_seq = _ceil_to(seq, 128)
    if causal and 128 < pad_seq <= 2048 and pad_seq % 128 == 0:
        return BlockSizes(
            block_q=pad_seq, block_kv=pad_seq, block_h=2, block_sub=128
        )
    if not causal:
        if pad_seq <= 1024:
            return BlockSizes(block_q=pad_seq, block_kv=pad_seq)
        if pad_seq <= 2048:
            return BlockSizes(block_q=512, block_kv=pad_seq)
        if pad_seq <= 4096:
            return BlockSizes(block_q=256, block_kv=pad_seq)
        return BlockSizes(block_q=512, block_kv=512, block_h=4)
    if pad_seq <= 2048:
        return BlockSizes(
            block_q=min(256, pad_seq), block_kv=min(1024, pad_seq)
        )
    return BlockSizes(block_q=512, block_kv=512, block_h=4, block_sub=128)


def select_decode_block_sizes(kv_seq: int) -> DecodeBlockSizes:
    """Decode KV block: as large as VMEM comfortably allows.

    Decode is grid-step-overhead bound at small blocks (~0.6us/step floor on
    v5e regardless of payload): measured at batch=32, 32q/8kv heads, seq=8192
    the 512->4096 block jump takes bf16 12.7k -> 22.6k tok/s (759 GB/s, 93%
    of HBM peak) and int8 13.1k -> 41.1k tok/s (1.8x bf16 — the quantization
    win only materializes with big blocks).
    """
    pad = _ceil_to(kv_seq, 128)
    bk = min(4096, pad)
    # Largest 128-multiple divisor of the padded length: a non-dividing
    # block would force decode_attention to pad-copy the whole cache per
    # step (e.g. 6144 with a blind 4096 block pads to 8192).
    while pad % bk:
        bk -= 128
    return DecodeBlockSizes(block_kv=bk)
