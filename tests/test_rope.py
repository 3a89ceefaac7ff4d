"""RoPE property tests — executable ports of the reference sanity suite
(reference: sanity/rope_test.py, sanity/cache_test.py; SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from owl_audio_exps_tpu.configs import transformer_config
from owl_audio_exps_tpu.ops.rope import (
    get_rope_freqs, apply_rope, rope_table_for,
    _pixel_freqs, _lang_freqs,
)


def make_cfg(**kw):
    base = dict(n_layers=2, n_heads=4, d_model=64, sample_size=4,
                tokens_per_frame=17, n_frames=8, has_audio=True,
                rope_impl="ortho", causal=True)
    base.update(kw)
    return transformer_config(**base)


def test_freq_families():
    pf = _pixel_freqs(8, 256.0)
    assert pf.shape == (4,)
    assert np.isclose(pf[0], np.pi)
    assert np.isclose(pf[-1], 128.0 * np.pi)
    lf = _lang_freqs(16, 10000.0)
    assert lf.shape == (8,)
    assert np.isclose(lf[0], 1.0)
    assert lf[-1] < lf[0]


@pytest.mark.parametrize("impl", ["ortho", "motion", "audio1d"])
def test_freq_table_shapes(impl):
    # tables carry decode headroom (default doubles n_frames); pin it to 0
    # here so the shape contract stays explicit
    cfg = make_cfg(rope_impl=impl, rope_headroom=0)
    freqs = get_rope_freqs(cfg)
    head_dim = cfg.d_model // cfg.n_heads
    if impl == "audio1d":
        assert freqs.shape == (cfg.n_frames, head_dim // 2)
    else:
        # per frame: sample_size^2 video tokens + 1 audio token
        assert freqs.shape == (cfg.n_frames * (cfg.sample_size ** 2 + 1),
                               head_dim // 2)
    assert freqs.dtype == np.float32


@pytest.mark.parametrize("impl", ["ortho", "motion", "audio1d"])
def test_headroom_extends_table_prefix_unchanged(impl):
    """Decode headroom (rope_headroom / _table_frames) appends rows past
    n_frames; the first n_frames' angles must be unchanged so cached
    rotations and checksums are headroom-invariant."""
    cfg0 = make_cfg(rope_impl=impl, rope_headroom=0)
    cfg2 = make_cfg(rope_impl=impl, rope_headroom=8)
    f0 = get_rope_freqs(cfg0)
    f2 = get_rope_freqs(cfg2)
    per_frame = f0.shape[0] // cfg0.n_frames
    assert f2.shape[0] == f0.shape[0] + 8 * per_frame
    # extension uses start + step*arange (vs np.linspace's endpoint-exact
    # arithmetic): identical grid up to f32 ulps on ~400-magnitude angles
    np.testing.assert_allclose(f2[: f0.shape[0]], f0, rtol=1e-6, atol=1e-4)


def test_out_of_table_positions_clamp_not_nan():
    """jnp.take's default fill mode writes NaN for out-of-bounds gathers —
    regression for the self-forcing rollout NaN (decode one frame past
    n_frames poisoned the trainer). Past the headroom, positions must
    clamp to the last row, never NaN."""
    cfg = make_cfg(rope_headroom=0)
    table = rope_table_for(cfg)
    rng = np.random.RandomState(9)
    x = jnp.asarray(np.tile(rng.randn(1, 4, 1, 16).astype(np.float32),
                            (1, 1, 3, 1)))
    far = jnp.asarray([table.n_tokens - 1, table.n_tokens,
                       table.n_tokens + 1000], jnp.int32)
    y = np.asarray(apply_rope(x, table.cos, table.sin, far))
    assert np.isfinite(y).all()
    # clamped rows rotate identically to the last table row
    np.testing.assert_allclose(y[:, :, 1], y[:, :, 0], rtol=1e-6)
    np.testing.assert_allclose(y[:, :, 2], y[:, :, 0], rtol=1e-6)


def test_audio_slot_removed_without_audio():
    cfg_a = make_cfg(has_audio=True)
    cfg_v = make_cfg(has_audio=False)
    fa = get_rope_freqs(cfg_a)
    fv = get_rope_freqs(cfg_v)
    p2 = cfg_a.sample_size ** 2
    frames = 2 * cfg_a.n_frames  # default headroom doubles the table
    assert fv.shape[0] == frames * p2
    # video slots identical; only the per-frame audio slot is dropped
    fa_frames = fa.reshape(frames, p2 + 1, -1)
    np.testing.assert_allclose(fv.reshape(frames, p2, -1),
                               fa_frames[:, :-1], rtol=0, atol=0)


def test_rotation_preserves_norm():
    cfg = make_cfg()
    table = rope_table_for(cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 4, 10, 16).astype(np.float32))
    pos = jnp.arange(10, dtype=jnp.int32)
    y = apply_rope(x, table.cos, table.sin, pos)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(y), axis=-1),
                               np.linalg.norm(np.asarray(x), axis=-1),
                               rtol=1e-5)


def test_relative_position_invariance():
    """Dot products of equidistant positions must match — the property test
    from reference sanity/rope_test.py:96-126."""
    cfg = make_cfg(rope_impl="audio1d", tokens_per_frame=1, n_frames=64)
    table = rope_table_for(cfg)
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(1, 1, 1, 16).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 1, 1, 16).astype(np.float32))

    def score(pq, pk):
        qq = apply_rope(q, table.cos, table.sin, jnp.array([pq], jnp.int32))
        kk = apply_rope(k, table.cos, table.sin, jnp.array([pk], jnp.int32))
        return float(jnp.sum(qq * kk))

    # pairs with the same relative distance
    assert np.isclose(score(5, 2), score(25, 22), rtol=1e-4)
    assert np.isclose(score(10, 10), score(40, 40), rtol=1e-4)
    # different distance differs
    assert not np.isclose(score(5, 2), score(5, 4), rtol=1e-3)


def test_offset_equals_slice():
    """Rotating at offset positions == rotating the full sequence and
    slicing (the KV-cache decode contract, reference sanity/cache_test.py)."""
    cfg = make_cfg()
    table = rope_table_for(cfg)
    rng = np.random.RandomState(2)
    n = 34  # 2 frames of 17
    x = jnp.asarray(rng.randn(1, 4, n, 16).astype(np.float32))
    full = apply_rope(x, table.cos, table.sin, jnp.arange(n, dtype=jnp.int32))
    tail = apply_rope(x[:, :, 17:], table.cos, table.sin,
                      jnp.arange(17, n, dtype=jnp.int32))
    np.testing.assert_allclose(np.asarray(full[:, :, 17:]), np.asarray(tail),
                               rtol=1e-6)


@pytest.mark.parametrize("impl,expected", [
    ("motion", 907.830322265625),
    ("ortho", 528.0000610351562),
    ("audio1d", 61.35810089111328),
])
def test_deterministic_checksum(impl, expected):
    """Seeded checksum regression (reference sanity/rope_test.py:74-93 idiom):
    locks the freq-table math so refactors can't silently change it.
    headroom=0 keeps the table exactly the historical shape the expected
    values were recorded against (the prefix-invariance test above covers
    the extended tables)."""
    cfg = make_cfg(rope_impl=impl, rope_headroom=0)
    freqs = get_rope_freqs(cfg)
    checksum = float(np.sum(np.cos(freqs)) + np.sum(np.sin(freqs)))
    assert np.isclose(checksum, expected, rtol=1e-5)


def test_interleaved_layout_preserves_attention_scores():
    """The TPU-friendly interleaved rotation is a fixed feature
    permutation of the reference's [y0 | y1] halves layout — q.k scores
    (and therefore model outputs) must match the halves-layout oracle
    exactly."""
    cfg = make_cfg()
    table = rope_table_for(cfg)
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(2, 4, 6, 16).astype(np.float32))
    k = jnp.asarray(rng.randn(2, 4, 6, 16).astype(np.float32))
    pos = jnp.arange(6, dtype=jnp.int32)

    def halves_oracle(x):
        c = np.asarray(table.cos)[np.asarray(pos)]
        s = np.asarray(table.sin)[np.asarray(pos)]
        xn = np.asarray(x)
        f = c.shape[-1]
        pairs = xn[..., :2 * f].reshape(*xn.shape[:-1], f, 2)
        x0, x1 = pairs[..., 0], pairs[..., 1]
        out = np.concatenate([x0 * c - x1 * s, x1 * c + x0 * s], axis=-1)
        return np.concatenate([out, xn[..., 2 * f:]], axis=-1)

    qr = np.asarray(apply_rope(q, table.cos, table.sin, pos))
    kr = np.asarray(apply_rope(k, table.cos, table.sin, pos))
    scores = np.einsum("bhqd,bhkd->bhqk", qr, kr)
    scores_ref = np.einsum("bhqd,bhkd->bhqk", halves_oracle(q),
                           halves_oracle(k))
    np.testing.assert_allclose(scores, scores_ref, rtol=1e-5, atol=1e-5)
