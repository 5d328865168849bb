"""Shared numerics constants + helpers for the attention kernels.

Numerics policy (SURVEY.md §5): fp32 accumulators, exp2-domain softmax with
log2(e) folded into the scale (the reference folds it the same way,
flash_attention.cu:239), and a large finite negative mask value rather than
-inf (the reference uses -10000, flash_attention.cu:238 — ours is fp32-scaled
so exp2 of it underflows to exactly 0).
"""

from __future__ import annotations

import jax.numpy as jnp

LOG2E = 1.4426950408889634
MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
# Floor for the running row max: a fully-masked row's max is MASK_VALUE*scale
# (~-3e37); computing exp2(s*scale - m) there subtracts two ~1e37 values whose
# fma-fused rounding residual can be +-1e28 — and exp2(+1e28) = inf -> NaN
# downstream. Clamping m to this floor (far above any masked score, far below
# any real logit) makes masked rows underflow to exactly 0 instead.
M_FLOOR = -1e30
LANES = 128


def ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def upcast_kv_payload(x, target_dtype):
    """Cast a KV payload tile to the compute dtype, fast-pathing fp8.

    v5e has no native fp8, so ``astype`` lowers to slow emulated conversion
    (~4x the whole decode step). Both fp8 formats embed losslessly in
    bf16/fp16 bit layouts, so widen with integer VPU ops instead:

      * e5m2 is exactly fp16's top byte: widen, shift left 8, bitcast fp16.
      * e4m3 (bias 7) -> bf16 (bias 127): place exp+mant at bit 4, rebias by
        adding (127-7)<<7. Denormals flush to zero (quantized payloads put
        ~absmax-scaled values well above the denormal range; the flush error
        is < 0.4% of one quantization step).

    NaN payloads are not preserved — acceptable for quantized caches (the
    quantizer never emits them).

    See :func:`upcast_kv_payload_expfold` for the cheaper variant used by the
    decode kernels (requires folding a 2**k factor into the dequant scales).
    """
    import jax.numpy as _jnp

    if x.dtype == target_dtype:
        return x
    if x.dtype in (_jnp.float8_e4m3fn, _jnp.float8_e5m2):
        # All arithmetic in int32 (Mosaic vectorizes 32-bit shifts natively;
        # 16-bit shifts are unsupported), assembling the fp32 bit pattern.
        from jax.experimental.pallas import tpu as _pltpu

        u = _pltpu.bitcast(x, _jnp.uint8).astype(_jnp.int32)
        sign = (u & 0x80) << 24
        mag = u & 0x7F
        if x.dtype == _jnp.float8_e4m3fn:
            # exp4:mant3 -> fp32 exp at bit 23 (rebias 7 -> 127), mant3 at 20.
            bits = (mag << 20) + (120 << 23)
            denorm = mag < 8  # exp4 == 0
        else:
            # exp5:mant2 -> fp32 exp at bit 23 (rebias 15 -> 127), mant2 at 21.
            bits = (mag << 21) + (112 << 23)
            denorm = mag < 4  # exp5 == 0
        bits = _jnp.where(denorm, 0, bits) | sign
        f32 = _pltpu.bitcast(bits, _jnp.float32)
        return f32.astype(target_dtype)
    return x.astype(target_dtype)


def upcast_kv_payload_expfold(x, target_dtype):
    """fp8 widen with the exponent rebias FOLDED OUT: returns (values, 2**k).

    Returns ``(y, factor)`` with ``y == true_value / factor`` elementwise —
    the caller must multiply ``factor`` into its dequant scales (one VPU op
    on a tiny scale tile, vs a full-tile add here). Skipping the rebias also
    removes the denormal select: without the +rebias, an fp8 denormal
    assembles to an fp32/bf16 denormal, which the TPU either flushes to the
    exact zero the masked path wants or (if kept) reconstructs the correct
    tiny value after the scale multiply — both acceptable, no compare+where.

    For non-fp8 payloads this is plain astype with factor 1.
    """
    import jax.numpy as _jnp

    if x.dtype == target_dtype:
        return x, 1.0
    if x.dtype in (_jnp.float8_e4m3fn, _jnp.float8_e5m2):
        from jax.experimental.pallas import tpu as _pltpu

        u = _pltpu.bitcast(x, _jnp.uint8).astype(_jnp.int32)
        sign = (u & 0x80) << 24
        mag = u & 0x7F
        if x.dtype == _jnp.float8_e4m3fn:
            # Raw e4 lands in the fp32 exponent field unrebias'd: the
            # assembled value is true * 2**-120 (bias 7 vs 127).
            bits = (mag << 20) | sign
            factor = 2.0 ** 120
        else:
            bits = (mag << 21) | sign
            factor = 2.0 ** 112
        f32 = _pltpu.bitcast(bits, _jnp.float32)
        return f32.astype(target_dtype), factor
    return x.astype(target_dtype), 1.0
