"""Flash-decode Pallas kernel vs the dense reference (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from owl_audio_exps_tpu.ops.flash_decode import flash_decode
from owl_audio_exps_tpu.ops.attention import dot_attention

F32 = jnp.float32


def dense_reference(q, k_cache, v_cache, k_cur, v_cur, start, length):
    B, H, Lq, Dh = q.shape
    S = k_cache.shape[2]
    rel = np.mod(np.arange(S) - int(start), S)
    valid = rel < int(length)
    mask = np.concatenate([valid, np.ones(Lq, bool)])[None, :]
    k = jnp.concatenate([k_cache, k_cur], axis=2)
    v = jnp.concatenate([v_cache, v_cur], axis=2)
    return dot_attention(q, k, v, jnp.asarray(mask))


@pytest.mark.parametrize("start,length,Lq", [
    (0, 96, 8),      # contiguous, partial fill
    (100, 120, 1),   # wrapped full-ish ring
    (60, 0, 8),      # empty cache (only current tokens)
    (32, 128, 5),    # full ring, odd Lq (padding path)
])
def test_flash_decode_matches_dense(start, length, Lq):
    B, H, S, Dh = 1, 2, 128, 128
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(B, H, Lq, Dh), F32)
    k_cache = jnp.asarray(rs.randn(B, H, S, Dh), F32)
    v_cache = jnp.asarray(rs.randn(B, H, S, Dh), F32)
    k_cur = jnp.asarray(rs.randn(B, H, Lq, Dh), F32)
    v_cur = jnp.asarray(rs.randn(B, H, Lq, Dh), F32)

    out = flash_decode(q, k_cache, v_cache, k_cur, v_cur,
                       jnp.int32(start), jnp.int32(length),
                       block_k=64, interpret=True)
    want = dense_reference(q, k_cache, v_cache, k_cur, v_cur, start, length)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=2e-5, rtol=1e-4)
