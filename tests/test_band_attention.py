"""Band-attention Pallas kernel == dense oracle (interpret mode, CPU).

ops/band.band_attention must reproduce dot_attention under
dense_mask(L, tpf, window, causal=True) — forward and gradients —
including the first chunk's missing predecessor and the last chunk's
missing successor (dkv edge).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from owl_audio_exps_tpu.ops.attention import dot_attention
from owl_audio_exps_tpu.ops.band import band_attention, band_available
from owl_audio_exps_tpu.ops.masks import dense_mask


def _qkv(rs, B, H, L, Dh):
    return tuple(jnp.asarray(rs.randn(B, H, L, Dh), jnp.float32)
                 for _ in range(3))


@pytest.mark.parametrize("tpf,window,n_chunks", [
    (64, 2, 2),     # C=128, minimal
    (64, 2, 5),
    (32, 8, 3),     # C=256
    (128, 1, 4),    # window == 1 frame
    (65, 8, 2),     # AV-interleaved tpf: C=520, non-lane-aligned
])
def test_forward_matches_dense(tpf, window, n_chunks):
    rs = np.random.RandomState(0)
    C = window * tpf
    L = n_chunks * C
    B, H, Dh = 1, 2, 64
    assert band_available(L, tpf, window, True)
    q, k, v = _qkv(rs, B, H, L, Dh)
    want = dot_attention(q, k, v, dense_mask(L, tpf, window, None, 0, True))
    got = band_attention(q, k, v, tpf, window, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


def test_forward_batched():
    rs = np.random.RandomState(1)
    tpf, window, L = 64, 2, 512
    q, k, v = _qkv(rs, 3, 2, L, 64)
    want = dot_attention(q, k, v, dense_mask(L, tpf, window, None, 0, True))
    got = band_attention(q, k, v, tpf, window, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


def test_gradients_match_dense():
    rs = np.random.RandomState(2)
    tpf, window, n_chunks = 64, 2, 3
    C = window * tpf
    L = n_chunks * C
    q, k, v = _qkv(rs, 1, 2, L, 64)
    gw = jnp.asarray(rs.randn(1, 2, L, 64), jnp.float32)  # cotangent

    def loss_band(q, k, v):
        return jnp.vdot(band_attention(q, k, v, tpf, window,
                                       interpret=True), gw)

    def loss_dense(q, k, v):
        return jnp.vdot(dot_attention(
            q, k, v, dense_mask(L, tpf, window, None, 0, True)), gw)

    g = jax.grad(loss_band, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g, gd):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4,
            err_msg=f"d{name} mismatch")


def test_availability_gate():
    assert not band_available(512, 64, None, True)    # no window
    assert not band_available(512, 64, 2, False)      # bidirectional
    assert not band_available(600, 64, 2, True)       # C does not divide L
    assert not band_available(128, 64, 2, True)       # single chunk
    assert not band_available(260, 65, 1, True)       # C % 8 != 0 (65)
    assert band_available(512, 64, 2, True)
    assert band_available(98304, 64, 16, True)        # the dit_v4 config
    assert band_available(1040, 65, 8, True)          # AV tpf=65 layout


def test_head_chunks_equivalent():
    rs = np.random.RandomState(5)
    tpf, window, L, H = 64, 2, 512, 4
    q, k, v = (jnp.asarray(rs.randn(1, H, L, 64), jnp.float32)
               for _ in range(3))
    a = band_attention(q, k, v, tpf, window, interpret=True)
    b = band_attention(q, k, v, tpf, window, head_chunks=2,
                       interpret=True)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               atol=2e-6, rtol=2e-6)


@pytest.mark.parametrize("tpf,window,n_chunks", [
    (64, 2, 3),
    (65, 8, 2),     # AV-interleaved tpf: C=520
])
def test_fixed_shift_matches_dense(tpf, window, n_chunks):
    """logit_bound (fixed-shift softmax) is exact: forward + grads.

    rms-normalized q/k model the real call site (nn/attn.py QK-norm:
    post-scale logits bounded by sqrt(Dh)); the shift constant only
    guards overflow, so the softmax is mathematically unchanged.
    """
    rs = np.random.RandomState(7)
    C = window * tpf
    L = n_chunks * C
    B, H, Dh = 1, 2, 64
    q, k, v = _qkv(rs, B, H, L, Dh)
    # unit-RMS q/k as produced by the attn module's rms_norm
    q = q / jnp.sqrt(jnp.mean(q * q, axis=-1, keepdims=True) + 1e-6)
    k = k / jnp.sqrt(jnp.mean(k * k, axis=-1, keepdims=True) + 1e-6)
    bound = float(Dh) ** 0.5
    gw = jnp.asarray(rs.randn(B, H, L, Dh), jnp.float32)

    want = dot_attention(q, k, v, dense_mask(L, tpf, window, None, 0, True))
    got = band_attention(q, k, v, tpf, window, interpret=True,
                         logit_bound=bound)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)

    def loss_band(q, k, v):
        return jnp.vdot(band_attention(q, k, v, tpf, window,
                                       interpret=True,
                                       logit_bound=bound), gw)

    def loss_dense(q, k, v):
        return jnp.vdot(dot_attention(
            q, k, v, dense_mask(L, tpf, window, None, 0, True)), gw)

    g = jax.grad(loss_band, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g, gd):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4,
            err_msg=f"d{name} mismatch (fixed shift)")


def test_fixed_shift_generic_bound():
    """A conservative bound on unnormalized inputs is still exact."""
    rs = np.random.RandomState(8)
    tpf, window, L = 64, 2, 384
    q, k, v = _qkv(rs, 1, 2, L, 64)
    want = band_attention(q, k, v, tpf, window, interpret=True)
    got = band_attention(q, k, v, tpf, window, interpret=True,
                         logit_bound=40.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


@pytest.mark.parametrize("tpf,window,n_chunks", [
    (65, 8, 2),     # AV-interleaved ragged layout (the target geometry)
    (65, 8, 3),     # odd chunk count (parity-plane edge)
    (65, 16, 2),    # C=1040
    (64, 2, 3),     # lane-aligned also exact (policy may not pick it)
    (128, 1, 4),    # window == 1: no prev branch at all
])
def test_frame_exact_matches_dense(tpf, window, n_chunks):
    """The frame-exact (fw) bodies are oracle-exact: forward + grads,
    with and without the fixed-shift bound."""
    rs = np.random.RandomState(21)
    C = window * tpf
    L = n_chunks * C
    B, H, Dh = 1, 2, 64
    q, k, v = _qkv(rs, B, H, L, Dh)
    gw = jnp.asarray(rs.randn(B, H, L, Dh), jnp.float32)
    want = dot_attention(q, k, v, dense_mask(L, tpf, window, None, 0, True))
    for bound in (None, 40.0):
        got = band_attention(q, k, v, tpf, window, interpret=True,
                             logit_bound=bound, frame_exact=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5, rtol=3e-5)

    def loss_band(q, k, v):
        return jnp.vdot(band_attention(q, k, v, tpf, window,
                                       interpret=True, logit_bound=40.0,
                                       frame_exact=True), gw)

    def loss_dense(q, k, v):
        return jnp.vdot(dot_attention(
            q, k, v, dense_mask(L, tpf, window, None, 0, True)), gw)

    g = jax.grad(loss_band, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g, gd):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4,
            err_msg=f"d{name} mismatch (frame_exact)")


def test_frame_exact_env_override(monkeypatch):
    monkeypatch.setenv("OWL_BAND_FW", "1")
    rs = np.random.RandomState(22)
    tpf, window, L = 65, 8, 1040
    q, k, v = _qkv(rs, 1, 2, L, 64)
    want = dot_attention(q, k, v, dense_mask(L, tpf, window, None, 0, True))
    got = band_attention(q, k, v, tpf, window, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


@pytest.mark.parametrize("mode", ["0", "1", "prev", "self"])
def test_colslice_modes_match_dense(mode, monkeypatch):
    """Every OWL_BAND_COLSLICE mode is exact (the column windows only
    skip mask-zero work; tpf=65 so auto engages the sliced path)."""
    monkeypatch.setenv("OWL_BAND_COLSLICE", mode)
    rs = np.random.RandomState(11)
    tpf, window, n_chunks = 65, 8, 3
    C = window * tpf
    L = n_chunks * C
    q, k, v = _qkv(rs, 1, 2, L, 64)
    want = dot_attention(q, k, v, dense_mask(L, tpf, window, None, 0, True))
    got = band_attention(q, k, v, tpf, window, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


def test_sub_rows_env_override(monkeypatch):
    monkeypatch.setenv("OWL_BAND_SUB", "40")
    rs = np.random.RandomState(12)
    tpf, window, L = 65, 8, 1040
    q, k, v = _qkv(rs, 1, 2, L, 64)
    want = dot_attention(q, k, v, dense_mask(L, tpf, window, None, 0, True))
    got = band_attention(q, k, v, tpf, window, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)
