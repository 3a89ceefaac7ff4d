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
