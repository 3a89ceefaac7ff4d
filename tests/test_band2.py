"""band2 (generalized sub-window chunks) == dense oracle, interpret mode.

ops/band2.band2_attention must reproduce dot_attention under
dense_mask(L, tpf, window, causal=True) — forward and gradients — for
frame-aligned AND ragged chunk spans, every ref-count m, chunk
boundaries (first m chunks missing predecessors, last chunks' dkv
edge), and the fixed-shift softmax.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from owl_audio_exps_tpu.ops.attention import dot_attention
from owl_audio_exps_tpu.ops.band2 import (band2_attention, best_plan,
                                          plan_candidates)
from owl_audio_exps_tpu.ops.masks import dense_mask


def _qkv(rs, B, H, L, Dh):
    return tuple(jnp.asarray(rs.randn(B, H, L, Dh), jnp.float32)
                 for _ in range(3))


CASES = [
    # tpf, window, span, m, n_chunks
    (16, 4, 32, 2, 6),      # aligned half-window (the doc's cf=W/2)
    (16, 8, 32, 4, 8),      # aligned quarter-window, 5 refs
    (16, 8, 64, 2, 5),      # aligned, span 4 frames
    (8, 4, 16, 2, 12),      # many chunks > several plane cycles
    (65, 8, 192, 3, 5),     # ragged AV span (S % tpf != 0)
    (65, 4, 96, 3, 6),      # ragged, small window
]


@pytest.mark.parametrize("tpf,window,span,m,n_chunks", CASES)
def test_forward_matches_dense(tpf, window, span, m, n_chunks):
    rs = np.random.RandomState(0)
    L = n_chunks * span
    B, H, Dh = 1, 2, 64
    q, k, v = _qkv(rs, B, H, L, Dh)
    want = dot_attention(q, k, v, dense_mask(L, tpf, window, None, 0, True))
    got = band2_attention(q, k, v, tpf, window, span, m, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


@pytest.mark.parametrize("tpf,window,span,m,n_chunks", CASES)
def test_gradients_match_dense(tpf, window, span, m, n_chunks):
    rs = np.random.RandomState(2)
    L = n_chunks * span
    q, k, v = _qkv(rs, 1, 2, L, 64)
    gw = jnp.asarray(rs.randn(1, 2, L, 64), jnp.float32)

    def loss_band(q, k, v):
        return jnp.vdot(band2_attention(q, k, v, tpf, window, span, m,
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


def test_fixed_shift_matches_dense():
    """logit_bound is exact with rms-normalized q/k (the real call
    site) — forward + grads, on an aligned AND a ragged case."""
    for tpf, window, span, m, n_chunks in [(16, 4, 32, 2, 6),
                                           (65, 8, 192, 3, 5)]:
        rs = np.random.RandomState(7)
        L = n_chunks * span
        q, k, v = _qkv(rs, 1, 2, L, 64)
        q = q / jnp.sqrt(jnp.mean(q * q, axis=-1, keepdims=True) + 1e-6)
        k = k / jnp.sqrt(jnp.mean(k * k, axis=-1, keepdims=True) + 1e-6)
        bound = 64.0 ** 0.5
        gw = jnp.asarray(rs.randn(1, 2, L, 64), jnp.float32)

        want = dot_attention(q, k, v,
                             dense_mask(L, tpf, window, None, 0, True))
        got = band2_attention(q, k, v, tpf, window, span, m,
                              interpret=True, logit_bound=bound)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5, rtol=3e-5)

        g = jax.grad(lambda q, k, v: jnp.vdot(
            band2_attention(q, k, v, tpf, window, span, m,
                            interpret=True, logit_bound=bound), gw),
            argnums=(0, 1, 2))(q, k, v)
        gd = jax.grad(lambda q, k, v: jnp.vdot(dot_attention(
            q, k, v, dense_mask(L, tpf, window, None, 0, True)), gw),
            argnums=(0, 1, 2))(q, k, v)
        for name, a, b in zip("qkv", g, gd):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4,
                err_msg=f"d{name} mismatch (fixed shift)")


def test_head_chunks_and_batch():
    rs = np.random.RandomState(5)
    tpf, window, span, m = 16, 4, 32, 2
    L, H = 192, 4
    q, k, v = _qkv(rs, 3, H, L, 64)
    a = band2_attention(q, k, v, tpf, window, span, m, interpret=True)
    b = band2_attention(q, k, v, tpf, window, span, m, head_chunks=2,
                        interpret=True)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               atol=2e-6, rtol=2e-6)
    want = dot_attention(q, k, v, dense_mask(L, tpf, window, None, 0, True))
    np.testing.assert_allclose(np.asarray(a), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


def test_plan_candidates_shipped_geometries():
    # dit_v4 65k: C=1024; best work plan is S=128,m=8 then S=256,m=4
    cands = plan_candidates(65536, 64, 16)
    assert (256, 4) in cands and (512, 2) in cands
    for S, m in cands:
        assert m * S >= 1023 and 65536 % S == 0 and S % 8 == 0
    # AV tpf=65, 384 frames: C=520, ragged spans
    cands = plan_candidates(24960, 65, 8)
    assert (192, 3) in cands
    for S, m in cands:
        assert m * S >= 519 and 24960 % S == 0 and S % 8 == 0
    # plans sorted by wide work (incl. the ragged next-ref columns)
    from owl_audio_exps_tpu.ops.band2 import _next_cols
    work = [(m + 1) * S + _next_cols(S, 65) for S, m in cands]
    assert work == sorted(work)


def test_best_plan_env_override(monkeypatch):
    monkeypatch.setenv("OWL_BAND2", "0")
    assert best_plan(65536, 64, 16) is None
    monkeypatch.setenv("OWL_BAND2", "512,2")
    assert best_plan(65536, 64, 16) == (512, 2)
    monkeypatch.setenv("OWL_BAND2", "504,2")   # illegal: 504 !| 65536
    assert best_plan(65536, 64, 16) is None
    monkeypatch.delenv("OWL_BAND2")
    assert best_plan(65536, 64, 16) in plan_candidates(65536, 64, 16)
