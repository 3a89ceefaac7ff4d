"""Fused write-forward equivalence: folding token i's cache re-encode
into token i+1's first denoise forward (one 2-token causal forward with a
partial write_len=1 ring commit) must reproduce the separate-forward
sampler EXACTLY up to float reassociation — the deferred token attends to
[ring | itself] either way, and the new token sees the deferred token's
KV in-flight instead of from the ring (same visibility set; reference
cache-update semantics owl_wms/sampling/audio_caching.py:22-159)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from owl_audio_exps_tpu.configs import transformer_config
from owl_audio_exps_tpu.models.audiorft import AudioRFTCore
from owl_audio_exps_tpu.nn.kv_cache import KVCache
from owl_audio_exps_tpu.sampling.audio_caching import AudioCachingSampler

F32 = jnp.float32


def _core(**over):
    kw = dict(
        model_id="audio_rft", n_layers=3, n_heads=2, d_model=32, channels=8,
        tokens_per_frame=1, n_frames=64, sample_size=16, causal=True,
        uncond=True, has_audio=True, rope_impl="audio1d", local_window=4,
        global_window=None, cfg_prob=0.0, backbone="dit", local_idx=2)
    kw.update(over)
    cfg = transformer_config(**kw)
    core = AudioRFTCore(cfg, dtype=F32)
    x = jnp.zeros((1, 8, 8), F32)
    t = jnp.zeros((1, 8), F32)
    params = core.init(jax.random.key(0), x, t)
    return cfg, core, params


def test_write_len_partial_commit():
    """A 2-token forward with write_len=1 advances the ring by ONE token
    and stores exactly the same KV as a 1-token write forward."""
    cfg, core, params = _core()
    b, c = 1, cfg.channels
    rs = np.random.RandomState(3)
    ctx = jnp.asarray(rs.randn(b, 6, c), F32)
    t_ctx = jnp.full((b, 6), 0.2, F32)

    cache = KVCache.from_config(cfg, b, capacity_frames=16, dtype=F32)
    _, cache = core.apply(params, ctx, t_ctx, kv_cache=cache, write=True)

    nxt = jnp.asarray(rs.randn(b, 2, c), F32)
    t2 = jnp.asarray([[0.2, 1.0]], F32)

    _, partial = core.apply(params, nxt, t2, kv_cache=cache, write=True,
                            write_len=1)
    _, full1 = core.apply(params, nxt[:, :1], t2[:, :1], kv_cache=cache,
                          write=True)

    assert int(partial.length) == int(full1.length) == 7
    assert int(partial.rope_offset) == int(full1.rope_offset) == 7
    for name in ("k", "v", "lk", "lv"):
        a, bb = getattr(partial, name), getattr(full1, name)
        if a is None:
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("split_local", [True, False])
def test_fused_sampler_matches_unfused(split_local):
    cfg, core, params = _core(split_local_cache=split_local)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8), F32)
    kw = dict(n_steps=2, num_tokens=6, noise_prev=0.2,
              custom_schedule=[1.0, 0.5], max_window=8)
    ref = AudioCachingSampler(fused_write=False, **kw)(
        core, params, x, jax.random.key(1))
    fused = AudioCachingSampler(fused_write=True, **kw)(
        core, params, x, jax.random.key(1))
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_sampler_one_step_schedule():
    """n_steps=1: the fused forward IS the only denoise forward."""
    cfg, core, params = _core()
    x = jnp.asarray(np.random.RandomState(2).randn(1, 4, 8), F32)
    kw = dict(n_steps=1, num_tokens=5, noise_prev=0.2)
    ref = AudioCachingSampler(fused_write=False, **kw)(
        core, params, x, jax.random.key(7))
    fused = AudioCachingSampler(fused_write=True, **kw)(
        core, params, x, jax.random.key(7))
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_sampler_rolling_eviction():
    """Generation well past max_window: ring eviction identical."""
    cfg, core, params = _core()
    x = jnp.asarray(np.random.RandomState(5).randn(1, 6, 8), F32)
    kw = dict(n_steps=2, num_tokens=14, noise_prev=0.2, max_window=6)
    ref = AudioCachingSampler(fused_write=False, **kw)(
        core, params, x, jax.random.key(9))
    fused = AudioCachingSampler(fused_write=True, **kw)(
        core, params, x, jax.random.key(9))
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)


def test_fused_sampler_init_len_one():
    cfg, core, params = _core()
    x = jnp.asarray(np.random.RandomState(6).randn(1, 1, 8), F32)
    kw = dict(n_steps=2, num_tokens=4, noise_prev=0.2)
    ref = AudioCachingSampler(fused_write=False, **kw)(
        core, params, x, jax.random.key(4))
    fused = AudioCachingSampler(fused_write=True, **kw)(
        core, params, x, jax.random.key(4))
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------- AV/video

from owl_audio_exps_tpu.models.gamerft import GameRFTCore
from owl_audio_exps_tpu.sampling.av_caching import AVCachingSamplerV2


def _video_core():
    cfg = transformer_config(
        model_id="game_rft", n_layers=2, n_heads=2, d_model=32, channels=4,
        sample_size=2, tokens_per_frame=4, n_frames=32, n_buttons=3,
        causal=True, uncond=False, has_audio=False, rope_impl="ortho",
        local_window=2, global_window=None, cfg_prob=0.0)
    core = GameRFTCore(cfg, dtype=F32)
    x = jnp.zeros((1, 4, 4, 2, 2), F32)
    t = jnp.zeros((1, 4), F32)
    m = jnp.zeros((1, 4, 2), F32)
    b = jnp.zeros((1, 4, 3), F32)
    params = core.init(jax.random.key(0), x, t, m, b)
    return cfg, core, params


def _av_inputs(seed=0, frames=12):
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.randn(1, 4, 4, 2, 2), F32)
    mouse = jnp.asarray(rs.randn(1, frames, 2), F32)
    btn = jnp.asarray(rs.rand(1, frames, 3) > 0.5, F32)
    return x, mouse, btn


@pytest.mark.parametrize("cfg_scale", [1.0, 1.3])
def test_av_fused_matches_unfused(cfg_scale):
    cfg, core, params = _video_core()
    x, mouse, btn = _av_inputs()
    kw = dict(n_steps=2, cfg_scale=cfg_scale, num_frames=6, noise_prev=0.2,
              custom_schedule=[1.0, 0.5])
    ref = AVCachingSamplerV2(fused_write=False, **kw)(
        core, params, x, mouse, btn, jax.random.key(1))
    fused = AVCachingSamplerV2(fused_write=True, **kw)(
        core, params, x, mouse, btn, jax.random.key(1))
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_av_fused_rolling_window():
    """max_window smaller than the session: ring eviction identical
    (the partial-commit mask's post-commit rows)."""
    cfg, core, params = _video_core()
    x, mouse, btn = _av_inputs(seed=4, frames=16)
    kw = dict(n_steps=2, cfg_scale=1.3, num_frames=12, noise_prev=0.2,
              max_window=5)
    ref = AVCachingSamplerV2(fused_write=False, **kw)(
        core, params, x, mouse, btn, jax.random.key(2))
    fused = AVCachingSamplerV2(fused_write=True, **kw)(
        core, params, x, mouse, btn, jax.random.key(2))
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)


def test_av_fused_host_mode_matches_scan():
    """The interactive host-tick loop reproduces the one-scan program
    with fused writes (same rng schedule)."""
    cfg, core, params = _video_core()
    x, mouse, btn = _av_inputs(seed=7)
    kw = dict(n_steps=2, cfg_scale=1.3, num_frames=6, noise_prev=0.2,
              fused_write=True)
    scan = AVCachingSamplerV2(loop_mode="scan", **kw)(
        core, params, x, mouse, btn, jax.random.key(3))
    host = AVCachingSamplerV2(loop_mode="host", **kw)(
        core, params, x, mouse, btn, jax.random.key(3))
    np.testing.assert_allclose(np.asarray(host), np.asarray(scan),
                               rtol=1e-5, atol=1e-5)


# ------------------------------------------------------------- pipelines

def test_cached_pipeline_fused_matches_plain():
    """The serve pipeline's fused ticks reproduce the plain
    write-per-tick pipeline frame for frame (same rng schedule)."""
    import sys
    sys.path.insert(0, "inference")
    from pipeline import CachedStreamingPipeline

    cfg, core, params = _video_core()
    x = jnp.asarray(np.random.RandomState(1).randn(1, 3, 4, 2, 2), F32)
    m = jnp.zeros((1, 3, 2), F32)
    b = jnp.zeros((1, 3, 3), F32)

    outs = {}
    for fused in (False, True):
        pipe = CachedStreamingPipeline(core, params, cfg, window_frames=6,
                                       sampling_steps=2, seed=11,
                                       fused_write=fused)
        pipe.prime(x, m, b)
        frames = []
        for i in range(8):  # past ring capacity: eviction inside fusion
            frame, _, _ = pipe(np.full(2, 0.1 * i, np.float32),
                               np.zeros(3, np.float32))
            frames.append(np.asarray(frame, np.float32))
        outs[fused] = np.stack(frames)
    # bf16 pipeline: reassociation differences compound over the
    # autoregressive feedback — bound the drift, don't expect exactness
    np.testing.assert_allclose(outs[True], outs[False], rtol=0.1, atol=0.1)


@pytest.mark.parametrize("backbone", ["dit", "uvit"])
def test_av_cached_pipeline_fused_matches_plain(backbone):
    import sys
    sys.path.insert(0, "inference")
    from pipeline import AVCachedStreamingPipeline
    from owl_audio_exps_tpu.models.gamerft_audio import GameRFTAudioCore

    cfg = transformer_config(
        model_id="game_rft_audio", n_layers=2, n_heads=2, d_model=32,
        channels=4, audio_channels=4, sample_size=2, tokens_per_frame=5,
        n_frames=16, n_buttons=3, causal=True, uncond=False, has_audio=True,
        rope_impl="ortho", local_window=2, global_window=None, cfg_prob=0.0,
        backbone=backbone)
    core = GameRFTAudioCore(cfg, dtype=jnp.bfloat16)
    x = jnp.zeros((1, 3, 4, 2, 2), jnp.bfloat16)
    a = jnp.zeros((1, 3, 4), jnp.bfloat16)
    t = jnp.zeros((1, 3), jnp.bfloat16)
    m = jnp.zeros((1, 3, 2), jnp.bfloat16)
    b = jnp.zeros((1, 3, 3), jnp.bfloat16)
    params = core.init(jax.random.key(0), x, a, t, m, b)
    xr = jnp.asarray(np.random.RandomState(2).randn(1, 3, 4, 2, 2),
                     jnp.bfloat16)

    outs = {}
    for fused in (False, True):
        pipe = AVCachedStreamingPipeline(core, params, cfg, window_frames=6,
                                         sampling_steps=2, seed=5,
                                         fused_write=fused)
        pipe.prime(xr, a, m, b)
        frames, audios = [], []
        for i in range(8):
            frame, audio, _ = pipe(np.zeros(2, np.float32),
                                   np.zeros(3, np.float32))
            frames.append(np.asarray(frame, np.float32))
            audios.append(np.asarray(audio, np.float32))
        outs[fused] = (np.stack(frames), np.stack(audios))
    np.testing.assert_allclose(outs[True][0], outs[False][0],
                               rtol=0.1, atol=0.1)
    np.testing.assert_allclose(outs[True][1], outs[False][1],
                               rtol=0.1, atol=0.1)


def test_cached_pipeline_fused_unprimed_start():
    """A session with NO prime: the first tick has nothing pending and
    must still produce a frame and seed the pending chain."""
    import sys
    sys.path.insert(0, "inference")
    from pipeline import CachedStreamingPipeline

    cfg, core, params = _video_core()
    pipe = CachedStreamingPipeline(core, params, cfg, window_frames=6,
                                   sampling_steps=2, fused_write=True)
    assert pipe._pending is None
    for i in range(3):
        frame, _, _ = pipe(np.zeros(2, np.float32), np.zeros(3, np.float32))
        assert np.isfinite(np.asarray(frame, np.float32)).all()
    assert pipe._pending is not None
    # fused ticks lag the ring by one frame: 3 ticks -> 2 committed
    assert int(pipe.cache.length) == 2 * 4

def test_fresh_cache_has_no_aliased_buffers():
    """Aliasing audit: donating a fresh/reset cache whole must be safe —
    no two leaves may share an on-device buffer (XLA rejects a double
    donation of the same buffer; serve contract of
    reference inference/causvid_pipeline.py:112-163, a session may start
    from zero buffers)."""
    from owl_audio_exps_tpu.nn.kv_cache import KVCache

    def audit(cache):
        leaves = jax.tree_util.tree_leaves(cache)
        ptrs = [l.unsafe_buffer_pointer() for l in leaves]
        assert len(ptrs) == len(set(ptrs)), "aliased leaves in KVCache"

    plain = KVCache.create(n_layers=3, batch_size=1, capacity=8,
                           n_heads=2, head_dim=4, tokens_per_frame=4)
    split = KVCache.create(n_layers=3, batch_size=1, capacity=16,
                           n_heads=2, head_dim=4, tokens_per_frame=4,
                           local_flags=(True, False, True),
                           local_capacity=8)
    quant = KVCache.create(n_layers=2, batch_size=1, capacity=8,
                           n_heads=2, head_dim=4, quant=True)
    for c in (plain, split, quant, plain.reset(), split.reset()):
        audit(c)
