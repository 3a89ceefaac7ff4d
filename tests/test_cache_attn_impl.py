"""cache_attn_impl routing: the concat (default) and noconcat cached
attention paths must both equal the full forward, and equal each other.

The concat path materializes [ring | new] K/V and runs one fused
attention (the on-chip winner — XLA fuses the concatenate into the
consumer); noconcat (``cached_dot_attention``) keeps the ring in place
with split QK^T / prob@V matmuls for backends where concat does copy.
Replaces the single hard-wired path from the reference's cached decode
(owl_wms/nn/attn.py:96-116).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from owl_audio_exps_tpu.configs import transformer_config
from owl_audio_exps_tpu.models.gamerft import GameRFTCore
from owl_audio_exps_tpu.nn.kv_cache import KVCache
from owl_audio_exps_tpu.ops.attention import dot_attention, cached_dot_attention

F32 = jnp.float32


def test_cached_dot_attention_equals_concat_op():
    rs = np.random.RandomState(0)
    b, h, s, t, dh = 2, 3, 24, 5, 16
    q = jnp.asarray(rs.randn(b, h, t, dh), F32)
    ck = jnp.asarray(rs.randn(b, h, s, dh), F32)
    cv = jnp.asarray(rs.randn(b, h, s, dh), F32)
    nk = jnp.asarray(rs.randn(b, h, t, dh), F32)
    nv = jnp.asarray(rs.randn(b, h, t, dh), F32)
    mask = jnp.asarray(rs.rand(t, s + t) > 0.3)
    # keep at least one visible key per query row
    mask = mask.at[:, -1].set(True)
    ref = dot_attention(q, jnp.concatenate([ck, nk], axis=2),
                        jnp.concatenate([cv, nv], axis=2), mask)
    out = cached_dot_attention(q, ck, cv, nk, nv, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("impl", ["concat", "noconcat"])
def test_model_decode_matches_full_forward(impl):
    cfg = transformer_config(
        model_id="game_rft", n_layers=4, n_heads=2, d_model=64, channels=8,
        tokens_per_frame=16, n_frames=64, sample_size=4, causal=True,
        uncond=True, rope_impl="motion", local_window=4, global_window=None,
        cfg_prob=0.0, backbone="dit", n_buttons=3,
        cache_attn_impl=impl)
    core = GameRFTCore(cfg, dtype=F32)
    rs = np.random.RandomState(7)
    n = 10
    x = jnp.asarray(rs.randn(1, n, 8, 4, 4), F32)
    t = jnp.asarray(rs.rand(1, n), F32)
    mouse = jnp.asarray(rs.randn(1, n, 2), F32)
    btn = jnp.asarray(rs.rand(1, n, 3) > 0.5, F32)
    params = core.init(jax.random.key(0), x, t, mouse, btn)

    full, _ = jax.jit(lambda p: core.apply(p, x, t, mouse, btn))(params)

    cache = KVCache.from_config(cfg, batch_size=1, capacity_frames=32,
                                dtype=F32)
    _, cache = jax.jit(lambda p, c: core.apply(
        p, x[:, :n - 1], t[:, :n - 1], mouse[:, :n - 1], btn[:, :n - 1],
        kv_cache=c, write=True))(params, cache)
    last, _ = jax.jit(lambda p, c: core.apply(
        p, x[:, n - 1:], t[:, n - 1:], mouse[:, n - 1:], btn[:, n - 1:],
        kv_cache=c, decoding=True))(params, cache)
    np.testing.assert_allclose(np.asarray(last[:, 0]),
                               np.asarray(full[:, -1]), atol=3e-4)


def test_impls_agree_exactly_on_shapes():
    # same model, both impls, identical params: decode outputs must agree
    outs = {}
    for impl in ("concat", "noconcat"):
        cfg = transformer_config(
            model_id="game_rft", n_layers=2, n_heads=2, d_model=64,
            channels=8, tokens_per_frame=16, n_frames=64, sample_size=4,
            causal=True, uncond=True, rope_impl="motion", local_window=None,
            global_window=None, cfg_prob=0.0, backbone="dit", n_buttons=3,
            cache_attn_impl=impl)
        core = GameRFTCore(cfg, dtype=F32)
        rs = np.random.RandomState(11)
        n = 6
        x = jnp.asarray(rs.randn(1, n, 8, 4, 4), F32)
        t = jnp.asarray(rs.rand(1, n), F32)
        mouse = jnp.asarray(rs.randn(1, n, 2), F32)
        btn = jnp.asarray(rs.rand(1, n, 3) > 0.5, F32)
        params = core.init(jax.random.key(0), x, t, mouse, btn)
        cache = KVCache.from_config(cfg, batch_size=1, capacity_frames=16,
                                    dtype=F32)
        _, cache = core.apply(p := params, x[:, :n - 1], t[:, :n - 1],
                              mouse[:, :n - 1], btn[:, :n - 1],
                              kv_cache=cache, write=True)
        last, _ = core.apply(p, x[:, n - 1:], t[:, n - 1:], mouse[:, n - 1:],
                             btn[:, n - 1:], kv_cache=cache, decoding=True)
        outs[impl] = np.asarray(last)
    np.testing.assert_allclose(outs["concat"], outs["noconcat"], atol=1e-5)
