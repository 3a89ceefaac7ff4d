"""Sampler tests: schedule math, shapes, scan compilation, determinism."""

import numpy as np
import jax
import jax.numpy as jnp

from owl_audio_exps_tpu.configs import transformer_config
from owl_audio_exps_tpu.models.audiorft import AudioRFTCore
from owl_audio_exps_tpu.models.gamerft import GameRFTCore
from owl_audio_exps_tpu.models.gamerft_audio import GameRFTAudioCore
from owl_audio_exps_tpu.sampling.schedulers import get_sd3_euler, get_deltas
from owl_audio_exps_tpu.sampling import get_sampler_cls

F32 = jnp.float32


def test_sd3_euler_schedule():
    dt = np.asarray(get_sd3_euler(10))
    assert dt.shape == (10,)
    assert np.isclose(dt.sum(), 1.0, atol=1e-6)  # t goes 1 -> 0
    assert (dt > 0).all()
    # shift=3 front-loads time near t=1: first step smaller than last
    assert dt[0] < dt[-1]


def test_get_deltas():
    dt = np.asarray(get_deltas([1.0, 0.5]))
    np.testing.assert_allclose(dt, [0.5, 0.5])
    dt = np.asarray(get_deltas([1.0, 0.3, 0.0]))
    np.testing.assert_allclose(dt, [0.7, 0.3], atol=1e-7)


def _audio_core():
    cfg = transformer_config(
        model_id="audio_rft", n_layers=2, n_heads=2, d_model=32, channels=8,
        tokens_per_frame=1, n_frames=32, sample_size=16, causal=True,
        uncond=True, has_audio=True, rope_impl="audio1d", local_window=4,
        global_window=None, cfg_prob=0.0, backbone="dit")
    core = AudioRFTCore(cfg, dtype=F32)
    x = jnp.zeros((1, 8, 8), F32)
    t = jnp.zeros((1, 8), F32)
    params = core.init(jax.random.key(0), x, t)
    return cfg, core, params


def test_audio_caching_sampler():
    cfg, core, params = _audio_core()
    sampler = get_sampler_cls("audio_caching")(n_steps=2, num_tokens=6,
                                               noise_prev=0.2)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8), F32)
    out = sampler(core, params, x, jax.random.key(1))
    assert out.shape == (1, 14, 8)
    np.testing.assert_allclose(np.asarray(out[:, :8]), np.asarray(x))
    assert np.isfinite(np.asarray(out)).all()
    # determinism: same rng -> same tokens
    out2 = sampler(core, params, x, jax.random.key(1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2))
    # different rng -> different tokens
    out3 = sampler(core, params, x, jax.random.key(2))
    assert np.abs(np.asarray(out3[:, 8:]) - np.asarray(out[:, 8:])).max() > 1e-4


def test_audio_caching_custom_schedule_and_window():
    cfg, core, params = _audio_core()
    sampler = get_sampler_cls("audio_caching")(
        n_steps=16, num_tokens=5, custom_schedule=[1.0, 0.5], max_window=6)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 4, 8), F32)
    out = sampler(core, params, x, jax.random.key(1))
    assert out.shape == (1, 9, 8)
    assert np.isfinite(np.asarray(out)).all()


def _video_core():
    cfg = transformer_config(
        model_id="game_rft", n_layers=2, n_heads=2, d_model=32, channels=4,
        sample_size=2, tokens_per_frame=4, n_frames=16, n_buttons=3,
        causal=True, uncond=False, has_audio=False, rope_impl="ortho",
        local_window=2, global_window=None, cfg_prob=0.0)
    core = GameRFTCore(cfg, dtype=F32)
    x = jnp.zeros((1, 4, 4, 2, 2), F32)
    t = jnp.zeros((1, 4), F32)
    m = jnp.zeros((1, 4, 2), F32)
    b = jnp.zeros((1, 4, 3), F32)
    params = core.init(jax.random.key(0), x, t, m, b)
    return cfg, core, params


def test_av_caching_v2_sampler():
    cfg, core, params = _video_core()
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(1, 4, 4, 2, 2), F32)
    mouse = jnp.asarray(rs.randn(1, 10, 2), F32)
    btn = jnp.asarray(rs.rand(1, 10, 3) > 0.5, F32)
    sampler = get_sampler_cls("av_caching")(n_steps=2, cfg_scale=1.3,
                                            num_frames=6, noise_prev=0.2)
    out = sampler(core, params, x, mouse, btn, jax.random.key(1))
    assert out.shape == (1, 10, 4, 2, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_av_caching_chunked_prefill_matches_oneshot():
    """Frame-by-frame decode-path prefill == the one-shot whole-context
    prefill (autoregressive caching identity) — the giant-ring serve
    route (chunked_prefill)."""
    cfg, core, params = _video_core()
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(1, 4, 4, 2, 2), F32)
    mouse = jnp.asarray(rs.randn(1, 10, 2), F32)
    btn = jnp.asarray(rs.rand(1, 10, 3) > 0.5, F32)
    kw = dict(n_steps=2, cfg_scale=1.3, num_frames=6, noise_prev=0.2)
    ref = get_sampler_cls("av_caching")(chunked_prefill=False, **kw)(
        core, params, x, mouse, btn, jax.random.key(1))
    got = get_sampler_cls("av_caching")(chunked_prefill=True, **kw)(
        core, params, x, mouse, btn, jax.random.key(1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_av_caching_one_step_sampler():
    cfg, core, params = _video_core()
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(1, 4, 4, 2, 2), F32)
    mouse = jnp.asarray(rs.randn(1, 7, 2), F32)
    btn = jnp.asarray(rs.rand(1, 7, 3) > 0.5, F32)
    sampler = get_sampler_cls("av_caching_one_step")(num_frames=3)
    out = sampler(core, params, x, mouse, btn, jax.random.key(1))
    assert out.shape == (1, 7, 4, 2, 2)


def _av_core():
    cfg = transformer_config(
        model_id="game_rft_audio", n_layers=2, n_heads=2, d_model=32,
        channels=4, audio_channels=4, sample_size=2, tokens_per_frame=5,
        n_frames=16, n_buttons=3, causal=True, uncond=False, has_audio=True,
        rope_impl="ortho", local_window=2, global_window=None, cfg_prob=0.1,
        backbone="dit")
    core = GameRFTAudioCore(cfg, dtype=F32)
    x = jnp.zeros((1, 4, 4, 2, 2), F32)
    a = jnp.zeros((1, 4, 4), F32)
    t = jnp.zeros((1, 4), F32)
    m = jnp.zeros((1, 4, 2), F32)
    b = jnp.zeros((1, 4, 3), F32)
    params = core.init(jax.random.key(0), x, a, t, m, b)
    return cfg, core, params


def test_av_window_sampler():
    cfg, core, params = _av_core()
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 4, 4, 2, 2), F32)
    audio = jnp.asarray(rs.randn(2, 4, 4), F32)
    mouse = jnp.asarray(rs.randn(2, 4, 2), F32)
    btn = jnp.asarray(rs.rand(2, 4, 3) > 0.5, F32)
    sampler = get_sampler_cls("av_window")(
        n_steps=2, cfg_scale=1.3, window_length=4, num_frames=3,
        noise_prev=0.2)
    _, _, xl, al, em, eb = sampler(core, params, x, audio, mouse, btn,
                                   jax.random.key(1))
    assert xl.shape == (2, 7, 4, 2, 2)
    assert al.shape == (2, 7, 4)
    assert em.shape == (2, 7, 2)
    assert np.isfinite(np.asarray(xl)).all()


def test_causal_av_window_samplers():
    cfg, core, params = _av_core()
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(1, 4, 4, 2, 2), F32)
    audio = jnp.asarray(rs.randn(1, 4, 4), F32)
    mouse = jnp.asarray(rs.randn(1, 4, 2), F32)
    btn = jnp.asarray(rs.rand(1, 4, 3) > 0.5, F32)
    for sid in ("av_causal", "av_causal_no_cfg"):
        sampler = get_sampler_cls(sid)(
            n_steps=2, cfg_scale=1.3, window_length=4, num_frames=2,
            noise_prev=0.2)
        _, _, xl, al, _, _ = sampler(core, params, x, audio, mouse, btn,
                                     jax.random.key(1))
        assert xl.shape == (1, 6, 4, 2, 2)
        assert np.isfinite(np.asarray(xl)).all()


def test_av_caching_v2_host_loop_matches_scan():
    # loop_mode="host" (the serve default) runs a donated per-frame tick
    # from the host; rng schedule is identical to the one-scan mode, so
    # outputs must match exactly (fp32 on CPU), incl. CFG and a rolling
    # window that truncates the context.
    cfg, core, params = _video_core()
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(1, 4, 4, 2, 2), F32)
    mouse = jnp.asarray(rs.randn(1, 10, 2), F32)
    btn = jnp.asarray(rs.rand(1, 10, 3) > 0.5, F32)
    for kw in ({"cfg_scale": 1.3}, {"cfg_scale": 1.0, "max_window": 3}):
        mk = lambda mode: get_sampler_cls("av_caching")(
            n_steps=2, num_frames=6, noise_prev=0.2, loop_mode=mode, **kw)
        out_scan = mk("scan")(core, params, x, mouse, btn, jax.random.key(1))
        out_host = mk("host")(core, params, x, mouse, btn, jax.random.key(1))
        assert out_host.shape == out_scan.shape
        np.testing.assert_allclose(np.asarray(out_host),
                                   np.asarray(out_scan), atol=1e-5)
