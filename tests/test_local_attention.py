"""Chunked dense local attention == dense oracle (ops/masks.dense_mask).

The chunked path (ops/local.py) must reproduce the reference's
frame-causal sliding-window semantics (owl_wms/nn/attn.py:43-58) exactly,
including document packing and the first chunk's missing predecessor.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from owl_audio_exps_tpu.ops.attention import dot_attention
from owl_audio_exps_tpu.ops.local import (
    chunked_local_attention, chunked_local_available)
from owl_audio_exps_tpu.ops.masks import dense_mask


def _qkv(rs, B, H, L, Dh):
    return (jnp.asarray(rs.randn(B, H, L, Dh), jnp.float32),
            jnp.asarray(rs.randn(B, H, L, Dh), jnp.float32),
            jnp.asarray(rs.randn(B, H, L, Dh), jnp.float32))


@pytest.mark.parametrize("tpf,window,n_frames", [
    (4, 2, 8),       # smallest: 4 chunks
    (4, 3, 6),       # window does not divide tpf*128 anything special
    (65, 2, 8),      # AV-interleaved tokens_per_frame (non-128 shapes)
])
def test_matches_dense_oracle(tpf, window, n_frames):
    rs = np.random.RandomState(0)
    B, H, Dh = 2, 3, 8
    L = n_frames * tpf
    assert chunked_local_available(L, tpf, window, True)
    q, k, v = _qkv(rs, B, H, L, Dh)

    mask = dense_mask(L, tpf, window, None, 0, True)
    want = dot_attention(q, k, v, mask)
    got = chunked_local_attention(q, k, v, tpf, window)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_matches_dense_oracle_with_docs():
    rs = np.random.RandomState(1)
    B, H, Dh, tpf, window, n_frames = 2, 2, 8, 4, 2, 12
    L = n_frames * tpf
    q, k, v = _qkv(rs, B, H, L, Dh)
    # doc boundaries straddle chunk boundaries
    doc_id = jnp.asarray(
        [[0] * 5 + [1] * 4 + [2] * 3,
         [0] * 12], jnp.int32)

    mask = dense_mask(L, tpf, window, doc_id, 0, True)
    want = dot_attention(q, k, v, mask)
    got = chunked_local_attention(q, k, v, tpf, window, doc_id=doc_id)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_first_chunk_sees_no_phantom_predecessor():
    """Tokens in chunk 0 attend only within chunk 0 — the zero-filled
    carry must be fully masked, not merely down-weighted."""
    rs = np.random.RandomState(2)
    tpf, window = 2, 2
    L, C = 16, 4
    q, k, v = _qkv(rs, 1, 1, L, 2)
    got = chunked_local_attention(q, k, v, tpf, window)
    want = dot_attention(q[:, :, :C], k[:, :, :C], v[:, :, :C],
                         dense_mask(C, tpf, window, None, 0, True))
    np.testing.assert_allclose(np.asarray(got[:, :, :C]),
                               np.asarray(want), atol=2e-5, rtol=2e-5)


def test_availability_gate():
    assert not chunked_local_available(32, 4, None, True)   # no window
    assert not chunked_local_available(32, 4, 2, False)     # bidirectional
    assert not chunked_local_available(30, 4, 2, True)      # indivisible
    assert not chunked_local_available(8, 4, 2, True)       # single chunk
    assert chunked_local_available(32, 4, 2, True)


def test_gradients_flow():
    import jax
    rs = np.random.RandomState(3)
    tpf, window, L = 4, 2, 32
    q, k, v = _qkv(rs, 1, 2, L, 4)
    g = jax.grad(lambda q, k, v: chunked_local_attention(
        q, k, v, tpf, window).astype(jnp.float32).sum(),
        argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(lambda q, k, v: dot_attention(
        q, k, v, dense_mask(L, tpf, window, None, 0, True))
        .astype(jnp.float32).sum(), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)


def test_train_attention_routing_local_vs_global():
    """nn.attn.train_attention sends causal local-window layers to the
    chunked path (no Pallas kernel touched — runs on CPU) and raises on
    an explicit chunked request it cannot honor."""
    from owl_audio_exps_tpu.configs import transformer_config
    from owl_audio_exps_tpu.nn.attn import train_attention

    rs = np.random.RandomState(4)
    tpf, window, n_frames = 4, 2, 8
    L = n_frames * tpf
    cfg = transformer_config(
        tokens_per_frame=tpf, local_window=window, global_window=None,
        causal=True, d_model=16, n_heads=2)
    q, k, v = _qkv(rs, 1, 2, L, 8)

    got = train_attention(cfg, local=True, q=q, k=k, v=v)
    want = dot_attention(q, k, v, dense_mask(L, tpf, window, None, 0, True))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)

    bad = cfg.merge({"local_attn_impl": "chunked", "local_window": 3})
    with pytest.raises(ValueError):
        train_attention(bad, local=True, q=q, k=k, v=v)
