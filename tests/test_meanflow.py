"""MeanFlow (game_mft_audio) tests: timestep sampling law, unified-JVP
objective, r=t reduction to instant velocity."""

import numpy as np
import jax
import jax.numpy as jnp

from owl_audio_exps_tpu.configs import transformer_config
from owl_audio_exps_tpu.models.gamemft_audio import (GameMFTAudio,
                                                     GameMFTAudioCore)

F32 = jnp.float32


def mft_cfg(**kw):
    base = dict(model_id="game_mft_audio", n_layers=2, n_heads=2, d_model=32,
                channels=4, audio_channels=4, sample_size=2,
                tokens_per_frame=5, n_frames=8, n_buttons=3, causal=True,
                uncond=False, has_audio=True, rope_impl="ortho",
                local_window=2, global_window=None, cfg_prob=0.1,
                backbone="dit")
    base.update(kw)
    return transformer_config(**base)


def _data(n=4, b=2):
    rs = np.random.RandomState(0)
    return (jnp.asarray(rs.randn(b, n, 4, 2, 2), F32),
            jnp.asarray(rs.randn(b, n, 4), F32),
            jnp.asarray(rs.randn(b, n, 2), F32),
            jnp.asarray((rs.rand(b, n, 3) > 0.5), F32))


def test_timestep_sampling_law():
    cfg = mft_cfg()
    model = GameMFTAudio(cfg, dtype=F32)
    x, audio, mouse, btn = _data()
    params = model.init({"params": jax.random.key(0),
                         "noise": jax.random.key(1)}, x, audio, mouse, btn)

    ts, rs = model.apply(params, jax.random.key(3), 512, 16,
                         method=model.sample_timesteps)
    ts, rs = np.asarray(ts), np.asarray(rs)
    assert (rs <= ts + 1e-6).all()
    assert ((ts > 0) & (ts < 1)).all()
    eq_frac = (rs == ts).mean()
    assert 0.2 < eq_frac < 0.45  # ~25% forced + ties


def test_meanflow_loss_and_grad():
    cfg = mft_cfg()
    model = GameMFTAudio(cfg, dtype=F32)
    x, audio, mouse, btn = _data()
    params = model.init({"params": jax.random.key(0),
                         "noise": jax.random.key(1)}, x, audio, mouse, btn)

    def loss_fn(p):
        loss, _, _ = model.apply({"params": p["params"]}, x, audio, mouse,
                                 btn, rngs={"noise": jax.random.key(2)})
        return loss

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert np.isfinite(float(loss)) and float(loss) > 0
    gnorm = float(jnp.sqrt(sum(jnp.sum(jnp.square(g))
                               for g in jax.tree.leaves(grads))))
    assert gnorm > 0


def test_core_interval_embedding_changes_output():
    """u(x, r, t) must depend on the interval length (r_embed path)."""
    cfg = mft_cfg()
    core = GameMFTAudioCore(cfg, dtype=F32)
    x, audio, mouse, btn = _data()
    t = jnp.full((2, 4), 0.8, F32)
    params = core.init(jax.random.key(0), x, audio, t, mouse, btn)

    (u1, _), _ = jax.jit(lambda r: core.apply(params, x, audio, t, mouse,
                                              btn, r=r))(jnp.zeros_like(t))
    (u2, _), _ = jax.jit(lambda r: core.apply(params, x, audio, t, mouse,
                                              btn, r=r))(t * 0.5)
    assert float(jnp.abs(u1 - u2).max()) > 1e-6
