"""Streaming pipeline + CLI smoke tests (CPU, tiny models)."""

import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp

from owl_audio_exps_tpu.configs import transformer_config
from owl_audio_exps_tpu.models.gamerft_audio import GameRFTAudioCore


def test_causvid_pipeline_tick():
    sys.path.insert(0, "inference")
    from pipeline import CausvidPipeline

    cfg = transformer_config(
        model_id="game_rft_audio", n_layers=2, n_heads=2, d_model=32,
        channels=4, audio_channels=4, sample_size=2, tokens_per_frame=5,
        n_frames=8, n_buttons=11, causal=True, uncond=False, has_audio=True,
        rope_impl="ortho", local_window=2, global_window=None, cfg_prob=0.0)
    core = GameRFTAudioCore(cfg, dtype=jnp.float32)
    W = 4
    x = jnp.zeros((1, W, 4, 2, 2), jnp.float32)
    a = jnp.zeros((1, W, 4), jnp.float32)
    t = jnp.zeros((1, W), jnp.float32)
    m = jnp.zeros((1, W, 2), jnp.float32)
    b = jnp.zeros((1, W, 11), jnp.float32)
    params = core.init(jax.random.key(0), x, a, t, m, b)

    pipe = CausvidPipeline(core, params, cfg, window_length=W,
                           sampling_steps=2)
    # buffers default-initialized to bf16 — run 3 ticks
    for i in range(3):
        frame, audio, model_time = pipe(np.asarray([0.5, -0.2]),
                                        np.zeros(11))
        assert frame.shape == (1, 4, 2, 2)
        assert audio.shape == (1, 4)
        assert np.isfinite(np.asarray(frame, dtype=np.float32)).all()

    # runtime step adjustment compiles a second program
    pipe.up_sampling_steps()
    assert pipe.sampling_steps == 3
    frame, _, _ = pipe(np.zeros(2), np.zeros(11))
    assert frame.shape == (1, 4, 2, 2)

    # restart restores the warm-start state
    pipe.restart_from_buffer()
    assert float(jnp.sum(jnp.abs(pipe.buffers.history.astype(
        jnp.float32)))) == 0.0


def test_train_cli_smoke(tmp_path):
    """python train.py --config_path configs/smoke_audio.yml runs."""
    res = subprocess.run(
        [sys.executable, "train.py", "--config_path",
         "configs/smoke_audio.yml", "--max_steps", "2"],
        capture_output=True, text=True, timeout=420,
        env={"PATH": "/usr/bin:/bin:/usr/local/bin",
             "JAX_PLATFORMS": "cpu",
             "HOME": "/root",
             "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_cache",
             "XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
        cwd=".",
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "diffusion_loss" in res.stdout


def test_cached_streaming_pipeline():
    sys.path.insert(0, "inference")
    from pipeline import CachedStreamingPipeline
    from owl_audio_exps_tpu.models.gamerft import GameRFTCore

    cfg = transformer_config(
        model_id="game_rft", n_layers=2, n_heads=2, d_model=32, channels=4,
        sample_size=2, tokens_per_frame=4, n_frames=16, n_buttons=3,
        causal=True, uncond=False, has_audio=False, rope_impl="ortho",
        local_window=2, global_window=None, cfg_prob=0.0)
    core = GameRFTCore(cfg, dtype=jnp.bfloat16)
    x = jnp.zeros((1, 4, 4, 2, 2), jnp.bfloat16)
    t = jnp.zeros((1, 4), jnp.bfloat16)
    m = jnp.zeros((1, 4, 2), jnp.bfloat16)
    b = jnp.zeros((1, 4, 3), jnp.bfloat16)
    params = core.init(jax.random.key(0), x, t, m, b)

    pipe = CachedStreamingPipeline(core, params, cfg, window_frames=8,
                                   sampling_steps=2)
    pipe.prime(jnp.zeros((1, 3, 4, 2, 2), jnp.bfloat16), m[:, :3], b[:, :3])
    # fused write-forward: 2 of 3 context frames committed, the last one
    # pends into the first tick's fused forward
    assert int(pipe.cache.length) == 8
    assert pipe._pending is not None

    for i in range(10):  # runs past the ring capacity (eviction)
        frame, _, _ = pipe(np.zeros(2), np.zeros(3))
        assert frame.shape == (1, 4, 2, 2)
        assert np.isfinite(np.asarray(frame, np.float32)).all()
    assert int(pipe.cache.length) <= 8 * 4


def test_av_cached_streaming_pipeline():
    """KV-cached joint AV serve: frame + audio latent per tick, ring
    eviction past capacity, unbounded via rope rebase (no reference
    analogue — its AV serve recomputes the whole window per tick)."""
    sys.path.insert(0, "inference")
    from pipeline import AVCachedStreamingPipeline

    cfg = transformer_config(
        model_id="game_rft_audio", n_layers=2, n_heads=2, d_model=32,
        channels=4, audio_channels=4, sample_size=2, tokens_per_frame=5,
        n_frames=8, n_buttons=3, causal=True, uncond=False, has_audio=True,
        rope_impl="ortho", local_window=2, global_window=None, cfg_prob=0.0)
    core = GameRFTAudioCore(cfg, dtype=jnp.bfloat16)
    x = jnp.zeros((1, 3, 4, 2, 2), jnp.bfloat16)
    a = jnp.zeros((1, 3, 4), jnp.bfloat16)
    t = jnp.zeros((1, 3), jnp.bfloat16)
    m = jnp.zeros((1, 3, 2), jnp.bfloat16)
    b = jnp.zeros((1, 3, 3), jnp.bfloat16)
    params = core.init(jax.random.key(0), x, a, t, m, b)

    pipe = AVCachedStreamingPipeline(core, params, cfg, window_frames=6,
                                     sampling_steps=2)
    pipe.prime(x, a, m, b)
    # fused write-forward: last context frame pends into the first tick
    assert int(pipe.cache.length) == 2 * 5

    # run well past both the ring capacity AND the RoPE table horizon
    # (n_frames=8 + headroom) so eviction and rebase both execute
    for i in range(20):
        frame, audio, _ = pipe(np.zeros(2), np.zeros(3))
        assert frame.shape == (1, 4, 2, 2)
        assert audio.shape == (1, 4)
        assert np.isfinite(np.asarray(frame, np.float32)).all()
        assert np.isfinite(np.asarray(audio, np.float32)).all()
    assert int(pipe.cache.length) <= 6 * 5


def test_av_cached_pipeline_multi_session():
    """n_sessions > 1: N independent sessions tick in lockstep from one
    program (batched ring rows). Cross-session ISOLATION: session 0's
    outputs must be bit-identical regardless of what controls session 1
    receives (same seed => same noise draws; only controls differ)."""
    sys.path.insert(0, "inference")
    from pipeline import AVCachedStreamingPipeline

    cfg = transformer_config(
        model_id="game_rft_audio", n_layers=2, n_heads=2, d_model=32,
        channels=4, audio_channels=4, sample_size=2, tokens_per_frame=5,
        n_frames=8, n_buttons=3, causal=True, uncond=False, has_audio=True,
        rope_impl="ortho", local_window=2, global_window=None, cfg_prob=0.0)
    core = GameRFTAudioCore(cfg, dtype=jnp.bfloat16)
    x1 = jnp.zeros((1, 3, 4, 2, 2), jnp.bfloat16)
    a1 = jnp.zeros((1, 3, 4), jnp.bfloat16)
    t1 = jnp.zeros((1, 3), jnp.bfloat16)
    m1 = jnp.zeros((1, 3, 2), jnp.bfloat16)
    b1 = jnp.zeros((1, 3, 3), jnp.bfloat16)
    params = core.init(jax.random.key(0), x1, a1, t1, m1, b1)

    rs = np.random.RandomState(0)
    ctrl0_m = rs.randn(6, 2).astype(np.float32)  # session 0's controls
    ctrl0_b = (rs.rand(6, 3) > 0.5).astype(np.float32)

    def run(sess1_scale):
        pipe = AVCachedStreamingPipeline(
            core, params, cfg, window_frames=6, sampling_steps=2,
            n_sessions=2, seed=7)
        # both sessions primed with the same context clip
        pipe.prime(jnp.tile(x1, (2, 1, 1, 1, 1)), jnp.tile(a1, (2, 1, 1)),
                   jnp.tile(m1, (2, 1, 1)), jnp.tile(b1, (2, 1, 1)))
        frames, audios = [], []
        for i in range(6):
            mouse = np.stack([ctrl0_m[i], ctrl0_m[i] * sess1_scale])
            btn = np.stack([ctrl0_b[i], 1.0 - ctrl0_b[i]
                            if sess1_scale != 1.0 else ctrl0_b[i]])
            frame, audio, _ = pipe(mouse, btn)
            assert frame.shape == (2, 4, 2, 2)
            assert audio.shape == (2, 4)
            frames.append(np.asarray(frame, np.float32))
            audios.append(np.asarray(audio, np.float32))
        return frames, audios

    fa, aa = run(1.0)     # session 1 mirrors session 0
    fb, ab = run(-3.0)    # session 1 gets completely different controls
    for i in range(6):
        assert np.isfinite(fa[i]).all() and np.isfinite(aa[i]).all()
        # session 0 is unaffected by session 1's controls
        np.testing.assert_array_equal(fa[i][0], fb[i][0])
        np.testing.assert_array_equal(aa[i][0], ab[i][0])
    # and the two sessions in run b actually diverged
    assert any(not np.array_equal(fb[i][0], fb[i][1]) for i in range(6))


def test_video_cached_pipeline_multi_session():
    """Video pipeline n_sessions: same isolation contract as the AV
    variant — session 0's outputs invariant to session 1's controls."""
    sys.path.insert(0, "inference")
    from pipeline import CachedStreamingPipeline
    from owl_audio_exps_tpu.models.gamerft import GameRFTCore

    cfg = transformer_config(
        model_id="game_rft", n_layers=2, n_heads=2, d_model=32, channels=4,
        sample_size=2, tokens_per_frame=4, n_frames=16, n_buttons=3,
        causal=True, uncond=False, has_audio=False, rope_impl="ortho",
        local_window=2, global_window=None, cfg_prob=0.0)
    core = GameRFTCore(cfg, dtype=jnp.bfloat16)
    x1 = jnp.zeros((1, 3, 4, 2, 2), jnp.bfloat16)
    t1 = jnp.zeros((1, 3), jnp.bfloat16)
    m1 = jnp.zeros((1, 3, 2), jnp.bfloat16)
    b1 = jnp.zeros((1, 3, 3), jnp.bfloat16)
    params = core.init(jax.random.key(0), x1, t1, m1, b1)

    rs = np.random.RandomState(1)
    ctrl_m = rs.randn(5, 2).astype(np.float32)
    ctrl_b = (rs.rand(5, 3) > 0.5).astype(np.float32)

    def run(sess1_scale):
        pipe = CachedStreamingPipeline(core, params, cfg, window_frames=8,
                                       sampling_steps=2, n_sessions=2,
                                       seed=5)
        pipe.prime(jnp.tile(x1, (2, 1, 1, 1, 1)), jnp.tile(m1, (2, 1, 1)),
                   jnp.tile(b1, (2, 1, 1)))
        frames = []
        for i in range(5):
            mouse = np.stack([ctrl_m[i], ctrl_m[i] * sess1_scale])
            btn = np.stack([ctrl_b[i], ctrl_b[i]])
            frame, _, _ = pipe(mouse, btn)
            assert frame.shape == (2, 4, 2, 2)
            frames.append(np.asarray(frame, np.float32))
        return frames

    fa = run(1.0)
    fb = run(-2.0)
    for i in range(5):
        assert np.isfinite(fa[i]).all()
        np.testing.assert_array_equal(fa[i][0], fb[i][0])
