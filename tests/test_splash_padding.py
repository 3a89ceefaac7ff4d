"""CPU-checkable pieces of the splash padding strategy (ops/splash.py).

The kernel itself is TPU-only (verified on-chip by
scripts/tpu_splash_check.py, incl. the tpf=65 padded case); here we pin
the block/padding arithmetic and the segment-fence construction that make
AV-interleaved lengths (tokens_per_frame=65, reference
configs/mmdit_v1.yml) servable by the splash kernel.
"""
import numpy as np

from owl_audio_exps_tpu.ops.splash import largest_divisor_block, pad_to_block


def test_largest_divisor_block():
    assert largest_divisor_block(2048) == 512
    assert largest_divisor_block(1536) == 512
    assert largest_divisor_block(128) == 128
    assert largest_divisor_block(16 * 65) == 0  # 1040: no 128-mult divisor
    assert largest_divisor_block(240 * 65) == 0


def test_pad_to_block_identity_when_legal():
    for L in (2048, 1536, 98304, 128):
        assert pad_to_block(L) == L


def test_pad_to_block_av_lengths():
    # every padded length must admit a legal block size, and padding must
    # stay under one block
    for nf in (16, 32, 120, 240, 360, 1536):
        L = nf * 65
        Lp = pad_to_block(L)
        assert Lp >= L and Lp - L < 512
        assert largest_divisor_block(Lp) >= 128, (L, Lp)


def test_pad_to_block_small():
    Lp = pad_to_block(65)
    assert Lp % 128 == 0 and largest_divisor_block(Lp) >= 128


def test_default_block_sizes_round3():
    """Defaults pick the on-chip-swept optima (PERF.md round-3 sweep):
    big KV blocks + fused backward. Caps keep the [bq, bkv] f32 logits
    tile inside VMEM (1024x2048 fused fails to compile)."""
    from owl_audio_exps_tpu.ops.splash import _block_sizes
    bs = _block_sizes(24960, 24960)          # AV 384-frame geometry
    assert (bs.block_q, bs.block_kv) == (640, 1664)   # the sweep optimum
    assert bs.use_fused_bwd_kernel
    bs = _block_sizes(65536, 65536)          # dit_v4 1024-frame
    assert (bs.block_q, bs.block_kv) == (512, 2048)
    # fused dkv stages dq per kv-grid slot (~3 GB at 65k) — long
    # sequences must take the split backward or the training step OOMs
    assert not bs.use_fused_bwd_kernel
    bs = _block_sizes(98304, 98304)          # dit_v4 1536-frame (98k)
    assert (bs.block_q, bs.block_kv) == (512, 2048)
    assert not bs.use_fused_bwd_kernel
    assert bs.block_q * bs.block_kv * 4 <= 5 * (1 << 20)


def test_short_sequence_gate():
    """q_len < 16384 keeps the legacy 512-cap split defaults (the
    memory-margin 5B config OOMs under wide layouts); the boundary
    length 16384 gets wide blocks + fused backward."""
    from owl_audio_exps_tpu.ops.splash import _block_sizes
    bs = _block_sizes(8192, 8192)            # dit_v4_5B geometry
    assert (bs.block_q, bs.block_kv) == (512, 512)
    assert not bs.use_fused_bwd_kernel
    bs = _block_sizes(16384, 16384)
    assert (bs.block_q, bs.block_kv) == (512, 2048)
    assert bs.use_fused_bwd_kernel           # validated on-chip: 31.0% MFU
