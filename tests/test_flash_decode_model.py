"""Flash-decode kernel exercised through the full model decode path
(interpret mode on CPU): cached decode must still equal the full
forward."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from owl_audio_exps_tpu.configs import transformer_config
from owl_audio_exps_tpu.models.audiorft import AudioRFTCore
from owl_audio_exps_tpu.nn.kv_cache import KVCache

F32 = jnp.float32


def test_model_decode_via_flash_kernel(monkeypatch):
    monkeypatch.setenv("OWL_PALLAS_INTERPRET", "1")
    cfg = transformer_config(
        model_id="audio_rft", n_layers=2, n_heads=2, d_model=128, channels=8,
        tokens_per_frame=1, n_frames=300, sample_size=8, causal=True,
        uncond=True, has_audio=True, rope_impl="audio1d",
        local_window=None, global_window=None, cfg_prob=0.0, backbone="dit",
        decode_impl="flash")
    core = AudioRFTCore(cfg, dtype=F32)
    rs = np.random.RandomState(3)
    n = 12
    x = jnp.asarray(rs.randn(1, n, 8), F32)
    t = jnp.asarray(rs.rand(1, n), F32)
    params = core.init(jax.random.key(0), x, t)

    full, _ = jax.jit(lambda p: core.apply(p, x, t))(params)

    cache = KVCache.from_config(cfg, batch_size=1, capacity_frames=256,
                                dtype=F32)
    _, cache = jax.jit(lambda p, c: core.apply(
        p, x[:, :n - 1], t[:, :n - 1], kv_cache=c, write=True))(params, cache)
    last, _ = jax.jit(lambda p, c: core.apply(
        p, x[:, n - 1:], t[:, n - 1:], kv_cache=c, decoding=True))(
        params, cache)
    np.testing.assert_allclose(np.asarray(last[:, 0]),
                               np.asarray(full[:, -1]), atol=3e-4)
