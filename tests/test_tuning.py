"""Dispatch-table contracts (ops/tuning.py).

The tables themselves are measured on v5e; these tests pin the STRUCTURAL
invariants every returned config must satisfy — the silent-degradation bugs
(a block_h the kernel quietly drops to 1) that no on-chip sweep would catch.
"""

import pytest

from flash_attention_tpu.ops.tuning import (
    select_block_sizes,
    select_bwd_block_sizes,
)


@pytest.mark.parametrize("group,want_bh", [(1, 2), (2, 2), (4, 4), (8, 1)])
def test_chunked_prefill_tier_head_batch_spans_groups(group, want_bh):
    """The kv_seq >> q tier (chunked prefill / cross attention) must return a
    block_h that spans whole KV groups — _fwd_impl silently drops a
    non-spanning head batch to 1, so a hardcoded h2 never engaged for the
    primary 32q/8kv serving shape (group 4)."""
    bs = select_block_sizes(256, causal=True, group=group, kv_seq=4096)
    assert bs.block_h == want_bh
    # The invariant the kernel checks: whole groups per head-batch step.
    assert bs.block_h % group == 0 or bs.block_h == 1


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("group", [1, 2, 4, 8])
@pytest.mark.parametrize("seq", [128, 512, 768, 1024, 2048, 4096, 8192, 16384])
@pytest.mark.parametrize("save_residuals", [False, True])
def test_forward_configs_are_well_formed(causal, group, seq, save_residuals):
    bs = select_block_sizes(
        seq, causal=causal, group=group, save_residuals=save_residuals
    )
    assert bs.block_q % 128 == 0 and bs.block_kv % 128 == 0
    assert bs.block_q <= 4096 and bs.block_kv <= 8192
    # Head batching must engage as specified, not silently degrade.
    assert bs.block_h % group == 0 or bs.block_h == 1
    if bs.block_sub:  # 0 = off
        # Sub-tile width must be 128-aligned and tile block_q exactly
        # (block_sub == block_q is the degenerate one-sub-block form).
        assert bs.block_sub % 128 == 0
        assert bs.block_q % bs.block_sub == 0
        # Sub-tiling only applies to causal forms.
        assert causal


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("seq", [256, 2048, 4096, 8192])
def test_bwd_configs_are_well_formed(causal, seq):
    bs = select_bwd_block_sizes(seq, causal=causal)
    assert bs.block_q % 128 == 0 and bs.block_kv % 128 == 0
    if bs.block_sub:  # 0 = off
        assert causal
