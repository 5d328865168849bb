"""Fused flash-attention backward kernels (Pallas / Mosaic TPU).

The reference is forward-only (SURVEY.md §2 — no backward kernel exists in
flash_attention.cu); a complete attention engine needs training gradients, so
this module supplies the standard flash-attention-2 backward recurrence as two
Pallas kernels, re-derived for the TPU memory model:

  * ``dq`` kernel: grid (batch·q_heads, q_blocks, kv_blocks) — mirrors the
    forward's layout (Q block resident in VMEM across the KV axis) and reuses
    the forward's causal KV-block clamping so fully-masked blocks issue no
    DMA and no FLOPs.
  * ``dkv`` kernel: grid (batch·kv_heads, kv_blocks, group·q_blocks) — the
    K/V blocks stay resident while Q/dO stream; the innermost axis also walks
    the GQA group so dK/dV accumulate the head-group sum in VMEM instead of
    materializing per-q-head partials in HBM. Score tiles are computed
    *transposed* ([block_kv, block_q]) so the per-row softmax statistics
    (LSE, delta) broadcast along lanes with no relayout.

Recurrence (S = scale·QKᵀ, P = softmax(S), O = PV):
    delta = rowsum(dO ∘ O)            (precomputed in-graph, fp32)
    dV = Pᵀ dO
    dP = dO Vᵀ
    dS = P ∘ (dP − delta)
    dQ = scale · dS K
    dK = scale · dSᵀ Q
with P recomputed from the forward's base-2 LSE residual:
    P = exp2(S·scale·log2e − lse2)
which matches the forward's exp2-domain softmax bit-for-bit (ops/common.py).

Sliding-window masks narrow the live KV (dq) / Q (dkv) block ranges exactly as
in the forward (clamped index maps issue no DMA for dead blocks). Logit
soft-capping (z → c·tanh(z/c)) folds its derivative into dS:
    dS_raw = dS_capped ∘ (1 − tanh²(z/c))
with tanh recomputed from the raw scores (one extra VPU pass; no extra
residual tensor).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attention_tpu.ops.common import LOG2E, MASK_VALUE, ceil_to
from flash_attention_tpu.ops.tuning import BlockSizes


def _bwd_dq_kernel(
    q_ref,      # [1, block_q, d]
    k_ref,      # [1, block_kv, d]
    v_ref,      # [1, block_kv, d]
    do_ref,     # [1, block_q, d]
    lse_ref,    # [1, block_q, 1]
    delta_ref,  # [1, block_q, 1]
    dq_ref,     # [1, block_q, d]
    acc_scr,    # [block_q, d] fp32
    *,
    causal: bool,
    scale: float,
    scale2: float,
    q_len: int,
    kv_len: int,
    block_q: int,
    block_kv: int,
    num_kv_blocks: int,
    kv_pad: bool,
    window: int | None = None,
    softcap_in: float | None = None,
    cap_out2: float | None = None,
    seg_refs=None,
    subtile: int = 0,
):
    iq = pl.program_id(1)
    ikv = pl.program_id(2)
    diag_offset = kv_len - q_len

    if subtile:
        # Causal single-superblock sub-tiling (the backward twin of the
        # forward's block_sub path): the whole (q, kv) problem is one block
        # pair; unroll over `subtile`-row Q sub-blocks, each doing its three
        # MMAs (scores, dP, dS·K) over exactly its live KV prefix. No
        # accumulator scratch at all — each sub-block's dq rows are complete
        # after one pass. Masked-region MXU waste drops from the tri grid's
        # ~25-50% to ~1/(n+1).
        w = subtile
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        kv_block = k.shape[0]
        for i in range(block_q // w):
            qi = jax.lax.slice_in_dim(q, i * w, (i + 1) * w, axis=0)
            doi = jax.lax.slice_in_dim(do, i * w, (i + 1) * w, axis=0)
            lse_i = lse_ref[0, i * w : (i + 1) * w]
            delta_i = delta_ref[0, i * w : (i + 1) * w]
            width = min(kv_block, -(-(diag_offset + (i + 1) * w) // 128) * 128)
            ki = jax.lax.slice_in_dim(k, 0, width, axis=0)
            vi = jax.lax.slice_in_dim(v, 0, width, axis=0)
            raw = jax.lax.dot_general(
                qi, ki, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [w, width]
            if softcap_in is not None:
                t = jnp.tanh(raw * softcap_in)
                s2 = t * cap_out2
            else:
                s2 = raw * scale2
            col = jax.lax.broadcasted_iota(jnp.int32, s2.shape, 1)
            row = (
                jax.lax.broadcasted_iota(jnp.int32, s2.shape, 0)
                + i * w
                + diag_offset
            )
            ok = col <= row
            if kv_pad:
                ok = jnp.logical_and(ok, col < kv_len)
            if seg_refs is not None:
                sq_ref, skv_ref = seg_refs
                sq = sq_ref[0, 0, i * w : (i + 1) * w]
                skv = skv_ref[0, 0, :width]
                ok = jnp.logical_and(ok, sq[:, None] == skv[None, :])
            s2 = jnp.where(ok, s2, MASK_VALUE)
            p = jnp.exp2(s2 - lse_i)
            dp = jax.lax.dot_general(
                doi, vi, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = p * (dp - delta_i)
            if softcap_in is not None:
                ds = ds * (1.0 - t * t)
            dq_i = jax.lax.dot_general(
                ds.astype(k.dtype), ki, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dq_ref[0, i * w : (i + 1) * w, :] = (dq_i * scale).astype(
                dq_ref.dtype
            )
        return

    @pl.when(ikv == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    if causal:
        should_run = ikv * block_kv <= (iq + 1) * block_q - 1 + diag_offset
        if window is not None:
            # The block's last column must be inside the window of the
            # block's first row: col > row - window for some (row, col).
            should_run = jnp.logical_and(
                should_run,
                (ikv + 1) * block_kv - 1 > iq * block_q + diag_offset - window,
            )
    else:
        should_run = True

    @pl.when(should_run)
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        raw = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [block_q, block_kv], raw scores
        if softcap_in is not None:
            t = jnp.tanh(raw * softcap_in)
            s2 = t * cap_out2  # exp2-domain capped logits
        else:
            s2 = raw * scale2

        if causal or kv_pad or seg_refs is not None:
            ok = None
            col = jax.lax.broadcasted_iota(jnp.int32, s2.shape, 1) + ikv * block_kv
            if causal:
                row = (
                    jax.lax.broadcasted_iota(jnp.int32, s2.shape, 0)
                    + iq * block_q
                    + diag_offset
                )
                ok = col <= row
                if window is not None:
                    ok = jnp.logical_and(ok, col > row - window)
            if kv_pad:
                inb = col < kv_len
                ok = inb if ok is None else jnp.logical_and(ok, inb)
            if seg_refs is not None:
                sq_ref, skv_ref = seg_refs
                same = sq_ref[0, 0][:, None] == skv_ref[0, 0][None, :]
                ok = same if ok is None else jnp.logical_and(ok, same)
            s2 = jnp.where(ok, s2, MASK_VALUE)

        p = jnp.exp2(s2 - lse_ref[0])  # [block_q, block_kv]; masked -> 0
        do = do_ref[0]
        v = v_ref[0]
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [block_q, block_kv]
        ds = p * (dp - delta_ref[0])
        if softcap_in is not None:
            ds = ds * (1.0 - t * t)  # tanh' folded into dS (masked rows: p=0)
        acc_scr[...] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ikv == num_kv_blocks - 1)
    def _epilogue():
        dq_ref[0] = (acc_scr[...] * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref,      # [1, block_q, d]
    k_ref,      # [1, block_kv, d]
    v_ref,      # [1, block_kv, d]
    do_ref,     # [1, block_q, d]
    lse_ref,    # [1, 1, block_q]  (lane-oriented)
    delta_ref,  # [1, 1, block_q]
    dk_ref,     # [1, block_kv, d]
    dv_ref,     # [1, block_kv, d]
    dk_scr,     # [block_kv, d] fp32
    dv_scr,     # [block_kv, d] fp32
    *,
    causal: bool,
    scale: float,
    scale2: float,
    q_len: int,
    kv_len: int,
    block_q: int,
    block_kv: int,
    num_q_blocks: int,
    num_steps: int,
    kv_pad: bool,
    window: int | None = None,
    softcap_in: float | None = None,
    cap_out2: float | None = None,
    seg_refs=None,
    subtile: int = 0,
):
    ikv = pl.program_id(1)
    t = pl.program_id(2)
    iq = t % num_q_blocks
    diag_offset = kv_len - q_len

    @pl.when(t == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    if subtile:
        # Causal single-superblock sub-tiling, transposed: unroll over
        # `subtile`-row KV sub-blocks, each doing its three MMAs over
        # exactly its live Q SUFFIX (rows at/after the sub-block's diagonal).
        # The grid's step axis walks the GQA group; dk/dv accumulate in the
        # full-size scratch as before.
        w = subtile
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        q_block = q.shape[0]
        for j in range(block_kv // w):
            # First live q row for kv rows [jw, (j+1)w): qpos >= jw, i.e.
            # col >= jw - diag_offset; floor to the sublane boundary.
            start = max(0, ((j * w - diag_offset) // 128) * 128)
            L = q_block - start
            ksub = jax.lax.slice_in_dim(k, j * w, (j + 1) * w, axis=0)
            vsub = jax.lax.slice_in_dim(v, j * w, (j + 1) * w, axis=0)
            qs = jax.lax.slice_in_dim(q, start, q_block, axis=0)
            dos = jax.lax.slice_in_dim(do, start, q_block, axis=0)
            lse_s = lse_ref[0, :, start:q_block]  # [1, L] lane-oriented
            delta_s = delta_ref[0, :, start:q_block]
            rawt = jax.lax.dot_general(
                ksub, qs, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [w, L]
            if softcap_in is not None:
                tt = jnp.tanh(rawt * softcap_in)
                s2t = tt * cap_out2
            else:
                s2t = rawt * scale2
            kvpos = (
                jax.lax.broadcasted_iota(jnp.int32, s2t.shape, 0) + j * w
            )
            qpos = (
                jax.lax.broadcasted_iota(jnp.int32, s2t.shape, 1)
                + start
                + diag_offset
            )
            ok = kvpos <= qpos
            if kv_pad:
                ok = jnp.logical_and(ok, kvpos < kv_len)
            if seg_refs is not None:
                sq_ref, skv_ref = seg_refs
                skv = skv_ref[0, 0, j * w : (j + 1) * w]
                sq = sq_ref[0, 0, start:q_block]
                ok = jnp.logical_and(ok, skv[:, None] == sq[None, :])
            s2t = jnp.where(ok, s2t, MASK_VALUE)
            pt = jnp.exp2(s2t - lse_s)
            dv_j = jax.lax.dot_general(
                pt.astype(do.dtype), dos, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dpt = jax.lax.dot_general(
                vsub, dos, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [w, L]
            dst = pt * (dpt - delta_s)
            if softcap_in is not None:
                dst = dst * (1.0 - tt * tt)
            dk_j = jax.lax.dot_general(
                dst.astype(q.dtype), qs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dk_scr[j * w : (j + 1) * w, :] += dk_j
            dv_scr[j * w : (j + 1) * w, :] += dv_j

        @pl.when(t == num_steps - 1)
        def _sub_epilogue():
            dk_ref[0] = (dk_scr[...] * scale).astype(dk_ref.dtype)
            dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)

        return

    if causal:
        # The Q block overlaps the live (col <= row) region iff its LAST row
        # reaches the kv block's first column.
        should_run = (iq + 1) * block_q - 1 + diag_offset >= ikv * block_kv
        if window is not None:
            # ... and its FIRST row must be within the window of the kv
            # block's last column (col > row - window for some pair).
            should_run = jnp.logical_and(
                should_run,
                (ikv + 1) * block_kv - 1 > iq * block_q + diag_offset - window,
            )
    else:
        should_run = True

    @pl.when(should_run)
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        # Transposed score tile: kv rows on sublanes, q columns on lanes, so
        # the per-q-row statistics (lse2, delta) broadcast along lanes.
        rawt = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [block_kv, block_q]
        if softcap_in is not None:
            tt = jnp.tanh(rawt * softcap_in)
            s2t = tt * cap_out2
        else:
            s2t = rawt * scale2

        if causal or kv_pad or seg_refs is not None:
            ok = None
            kvpos = (
                jax.lax.broadcasted_iota(jnp.int32, s2t.shape, 0)
                + ikv * block_kv
            )
            if causal:
                qpos = (
                    jax.lax.broadcasted_iota(jnp.int32, s2t.shape, 1)
                    + iq * block_q
                    + diag_offset
                )
                ok = kvpos <= qpos
                if window is not None:
                    ok = jnp.logical_and(ok, kvpos > qpos - window)
            if kv_pad:
                inb = kvpos < kv_len
                ok = inb if ok is None else jnp.logical_and(ok, inb)
            if seg_refs is not None:
                sq_ref, skv_ref = seg_refs
                same = skv_ref[0, 0][:, None] == sq_ref[0, 0][None, :]
                ok = same if ok is None else jnp.logical_and(ok, same)
            s2t = jnp.where(ok, s2t, MASK_VALUE)

        pt = jnp.exp2(s2t - lse_ref[0])  # [block_kv, block_q]
        do = do_ref[0]
        dv_scr[...] += jax.lax.dot_general(
            pt.astype(do.dtype), do, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        v = v_ref[0]
        dpt = jax.lax.dot_general(
            v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [block_kv, block_q]
        dst = pt * (dpt - delta_ref[0])
        if softcap_in is not None:
            dst = dst * (1.0 - tt * tt)
        dk_scr[...] += jax.lax.dot_general(
            dst.astype(q.dtype), q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(t == num_steps - 1)
    def _epilogue():
        dk_ref[0] = (dk_scr[...] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def flash_attention_bwd(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    out: jax.Array,
    lse2: jax.Array,
    do: jax.Array,
    *,
    causal: bool,
    sm_scale: float,
    block_sizes: BlockSizes,
    interpret: bool,
    window: int | None = None,
    softcap: float | None = None,
    segments=None,
):
    """Compute (dq, dk, dv) from the forward residuals.

    Args:
      q: [B, Hq, Sq, D]; k, v: [B, Hkv, Skv, D] (GQA: Hq % Hkv == 0).
      out: forward output [B, Hq, Sq, D].
      lse2: forward base-2 log-sum-exp residual [B, Hq, Sq], fp32.
      do: output cotangent, same shape/dtype as out.
      window: sliding-window size (causal only), matching the forward.
      softcap: logit soft-cap constant, matching the forward.
      segments: optional (q_segment_ids [B, Sq], kv_segment_ids [B, Skv])
        int32 pair (packed sequences), matching the forward.

    Returns:
      dq [B, Hq, Sq, D], dk and dv [B, Hkv, Skv, D], in the input dtypes.
    """
    batch, num_q_heads, q_len, head_dim = q.shape
    _, num_kv_heads, kv_len, _ = k.shape
    group = num_q_heads // num_kv_heads

    block_q = min(block_sizes.block_q, ceil_to(q_len, 128))
    block_kv = min(block_sizes.block_kv, ceil_to(kv_len, 128))
    q_pad = ceil_to(q_len, block_q)
    kv_padded = ceil_to(kv_len, block_kv)
    d_pad = ceil_to(head_dim, 128)
    num_q_blocks = q_pad // block_q
    num_kv_blocks = kv_padded // block_kv
    diag_offset = kv_len - q_len

    # delta = rowsum(dO ∘ O), fp32 — one fused elementwise+reduce pass in XLA.
    delta = jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )  # [B, Hq, Sq]

    qq = q.reshape(batch * num_q_heads, q_len, head_dim)
    dodo = do.reshape(batch * num_q_heads, q_len, head_dim)
    kk = k.reshape(batch * num_kv_heads, kv_len, head_dim)
    vv = v.reshape(batch * num_kv_heads, kv_len, head_dim)
    lse_f = lse2.reshape(batch * num_q_heads, q_len)
    delta_f = delta.reshape(batch * num_q_heads, q_len)

    if q_pad != q_len or d_pad != head_dim:
        pads = ((0, 0), (0, q_pad - q_len), (0, d_pad - head_dim))
        qq = jnp.pad(qq, pads)
        dodo = jnp.pad(dodo, pads)  # zero dO rows => padded q rows contribute 0
    if kv_padded != kv_len or d_pad != head_dim:
        pads = ((0, 0), (0, kv_padded - kv_len), (0, d_pad - head_dim))
        kk = jnp.pad(kk, pads)
        vv = jnp.pad(vv, pads)
    if q_pad != q_len:
        lse_f = jnp.pad(lse_f, ((0, 0), (0, q_pad - q_len)))
        delta_f = jnp.pad(delta_f, ((0, 0), (0, q_pad - q_len)))

    if segments is not None:
        seg_q, seg_kv = segments
        # [B, 1, S]: see the forward's Mosaic block-dim note.
        seg_q = jnp.pad(
            seg_q.astype(jnp.int32), ((0, 0), (0, q_pad - q_len)),
            constant_values=-1,
        )[:, None, :]
        seg_kv = jnp.pad(
            seg_kv.astype(jnp.int32), ((0, 0), (0, kv_padded - kv_len)),
            constant_values=-2,
        )[:, None, :]

    # Sublane-oriented ([bh, Sq, 1]) for the dq kernel, lane-oriented
    # ([bh, 1, Sq]) for the transposed dkv kernel — avoids in-kernel relayouts.
    lse_col = lse_f[:, :, None]
    delta_col = delta_f[:, :, None]
    lse_row = lse_f[:, None, :]
    delta_row = delta_f[:, None, :]

    scale2 = sm_scale * LOG2E

    def kv_head_index(bh):
        if group == 1:
            return bh
        return (bh // num_q_heads) * num_kv_heads + (bh % num_q_heads) // group

    softcap_in = None if softcap is None else sm_scale / softcap
    cap_out2 = None if softcap is None else softcap * LOG2E

    # Causal single-superblock sub-tiling (mirrors the forward's block_sub):
    # applies when the whole problem is one (q, kv) block pair.
    subtile = 0
    if (
        causal and window is None
        and block_sizes.block_sub and num_q_blocks == 1
        and num_kv_blocks == 1 and block_q > block_sizes.block_sub
        and block_q % block_sizes.block_sub == 0
        and block_kv % block_sizes.block_sub == 0
    ):
        subtile = block_sizes.block_sub

    # ---------------- dq ----------------
    def kv_block_index(iq, ikv):
        if not causal:
            return ikv
        last_live = ((iq + 1) * block_q - 1 + diag_offset) // block_kv
        idx = jnp.minimum(ikv, last_live)
        if window is not None:
            # Blocks entirely below the window issue no DMA either.
            first_live = jnp.maximum(
                (iq * block_q + diag_offset - window + 1) // block_kv, 0
            )
            idx = jnp.maximum(idx, first_live)
        return idx

    dq_base = functools.partial(
        _bwd_dq_kernel,
        causal=causal,
        scale=sm_scale,
        scale2=scale2,
        q_len=q_len,
        kv_len=kv_len,
        block_q=block_q,
        block_kv=block_kv,
        num_kv_blocks=num_kv_blocks,
        kv_pad=kv_padded != kv_len,
        window=window,
        softcap_in=softcap_in,
        cap_out2=cap_out2,
        subtile=subtile,
    )
    dq_in_specs = [
        pl.BlockSpec((1, block_q, d_pad), lambda bh, iq, ikv: (bh, iq, 0)),
        pl.BlockSpec(
            (1, block_kv, d_pad),
            lambda bh, iq, ikv: (kv_head_index(bh), kv_block_index(iq, ikv), 0),
        ),
        pl.BlockSpec(
            (1, block_kv, d_pad),
            lambda bh, iq, ikv: (kv_head_index(bh), kv_block_index(iq, ikv), 0),
        ),
        pl.BlockSpec((1, block_q, d_pad), lambda bh, iq, ikv: (bh, iq, 0)),
        pl.BlockSpec((1, block_q, 1), lambda bh, iq, ikv: (bh, iq, 0)),
        pl.BlockSpec((1, block_q, 1), lambda bh, iq, ikv: (bh, iq, 0)),
    ]
    dq_inputs = [qq, kk, vv, dodo, lse_col, delta_col]
    if segments is None:
        dq_kernel = dq_base
    else:
        dq_in_specs += [
            pl.BlockSpec(
                (1, 1, block_q),
                lambda bh, iq, ikv: (bh // num_q_heads, 0, iq),
            ),
            pl.BlockSpec(
                (1, 1, block_kv),
                lambda bh, iq, ikv: (
                    bh // num_q_heads, 0, kv_block_index(iq, ikv)
                ),
            ),
        ]
        dq_inputs += [seg_q, seg_kv]

        def dq_kernel(q_r, k_r, v_r, do_r, lse_r, d_r, sq_r, skv_r, dq_r, acc):
            dq_base(
                q_r, k_r, v_r, do_r, lse_r, d_r, dq_r, acc,
                seg_refs=(sq_r, skv_r),
            )

    dq = pl.pallas_call(
        dq_kernel,
        grid=(batch * num_q_heads, num_q_blocks, num_kv_blocks),
        in_specs=dq_in_specs,
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda bh, iq, ikv: (bh, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((batch * num_q_heads, q_pad, d_pad), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*dq_inputs)

    # ---------------- dk / dv ----------------
    num_steps = group * num_q_blocks

    def q_index(bkv, t):
        b = bkv // num_kv_heads
        h = bkv % num_kv_heads
        g = t // num_q_blocks
        return b * num_q_heads + h * group + g

    def q_block_index(ikv, t):
        iq = t % num_q_blocks
        if not causal:
            return iq
        first_live = jnp.maximum((ikv * block_kv - diag_offset) // block_q, 0)
        iq = jnp.maximum(iq, first_live)
        if window is not None:
            # Q rows beyond the window of this kv block's last column are
            # dead: clamp so their blocks issue no DMA.
            last_live = jnp.minimum(
                ((ikv + 1) * block_kv - 1 + window - 1 - diag_offset)
                // block_q,
                num_q_blocks - 1,
            )
            iq = jnp.minimum(iq, jnp.maximum(last_live, 0))
        return iq

    q_spec = pl.BlockSpec(
        (1, block_q, d_pad),
        lambda bkv, ikv, t: (q_index(bkv, t), q_block_index(ikv, t), 0),
    )
    stat_spec = pl.BlockSpec(
        (1, 1, block_q),
        lambda bkv, ikv, t: (q_index(bkv, t), 0, q_block_index(ikv, t)),
    )
    kv_spec = pl.BlockSpec((1, block_kv, d_pad), lambda bkv, ikv, t: (bkv, ikv, 0))

    dkv_base = functools.partial(
        _bwd_dkv_kernel,
        causal=causal,
        scale=sm_scale,
        scale2=scale2,
        q_len=q_len,
        kv_len=kv_len,
        block_q=block_q,
        block_kv=block_kv,
        num_q_blocks=num_q_blocks,
        num_steps=num_steps,
        kv_pad=kv_padded != kv_len,
        window=window,
        softcap_in=softcap_in,
        cap_out2=cap_out2,
        subtile=subtile,
    )
    dkv_in_specs = [q_spec, kv_spec, kv_spec, q_spec, stat_spec, stat_spec]
    dkv_inputs = [qq, kk, vv, dodo, lse_row, delta_row]
    if segments is None:
        dkv_kernel = dkv_base
    else:
        dkv_in_specs += [
            pl.BlockSpec(
                (1, 1, block_q),
                lambda bkv, ikv, t: (
                    bkv // num_kv_heads, 0, q_block_index(ikv, t)
                ),
            ),
            pl.BlockSpec(
                (1, 1, block_kv),
                lambda bkv, ikv, t: (bkv // num_kv_heads, 0, ikv),
            ),
        ]
        dkv_inputs += [seg_q, seg_kv]

        def dkv_kernel(
            q_r, k_r, v_r, do_r, lse_r, d_r, sq_r, skv_r, dk_r, dv_r, dks, dvs
        ):
            dkv_base(
                q_r, k_r, v_r, do_r, lse_r, d_r, dk_r, dv_r, dks, dvs,
                seg_refs=(sq_r, skv_r),
            )

    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(batch * num_kv_heads, num_kv_blocks, num_steps),
        in_specs=dkv_in_specs,
        out_specs=[kv_spec, kv_spec],
        out_shape=[
            jax.ShapeDtypeStruct((batch * num_kv_heads, kv_padded, d_pad), k.dtype),
            jax.ShapeDtypeStruct((batch * num_kv_heads, kv_padded, d_pad), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_kv, d_pad), jnp.float32),
            pltpu.VMEM((block_kv, d_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*dkv_inputs)

    dq = dq[:, :q_len, :head_dim].reshape(batch, num_q_heads, q_len, head_dim)
    dk = dk[:, :kv_len, :head_dim].reshape(batch, num_kv_heads, kv_len, head_dim)
    dv = dv[:, :kv_len, :head_dim].reshape(batch, num_kv_heads, kv_len, head_dim)
    return dq, dk, dv
