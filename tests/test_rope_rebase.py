"""RoPE ring re-basing (unbounded serve sessions): shift equivariance,
cache-rebase exactness, and a sampler run that outlives its table."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from owl_audio_exps_tpu.configs import transformer_config
from owl_audio_exps_tpu.models import get_core_cls
from owl_audio_exps_tpu.nn.kv_cache import (KVCache, rope_rebase_plan,
                                            rope_rebase_segments)
from owl_audio_exps_tpu.ops.rope import (get_rope_freqs, rope_rebase_tables,
                                         _table_frames)
from owl_audio_exps_tpu.sampling.audio_caching import AudioCachingSampler

F32 = jnp.float32


@pytest.mark.parametrize("impl", ["ortho", "motion", "audio1d"])
def test_shift_equivariance(impl):
    """angles[(f+d)*per + j] - angles[f*per + j] must be one constant
    vector — independent of frame f AND slot j. This is the property the
    whole rebase mechanism rests on."""
    cfg = transformer_config(
        n_layers=1, n_heads=4, d_model=64, sample_size=4,
        tokens_per_frame=17, n_frames=8, has_audio=True, rope_impl=impl,
        causal=True, rope_headroom=8)
    angles = get_rope_freqs(cfg)
    F = _table_frames(cfg)
    per = angles.shape[0] // F
    d = 3
    base = angles[d * per: (d + 1) * per] - angles[:per]  # f=0, all slots
    for f in (1, 4, F - d - 1):
        diff = angles[(f + d) * per: (f + d + 1) * per] \
            - angles[f * per: (f + 1) * per]
        np.testing.assert_allclose(diff, base, rtol=1e-5, atol=1e-4)
    # every slot in a frame shares the same delta
    np.testing.assert_allclose(
        base, np.broadcast_to(base[:1], base.shape), rtol=1e-5, atol=1e-4)


def _tiny_core(**over):
    base = dict(model_id="game_rft", n_layers=2, n_heads=2, d_model=32,
                channels=4, sample_size=2, tokens_per_frame=4, n_frames=8,
                n_buttons=3, causal=True, uncond=False, has_audio=False,
                rope_impl="ortho", local_window=2, global_window=None,
                cfg_prob=0.0)
    base.update(over)
    cfg = transformer_config(**base)
    return cfg, get_core_cls("game_rft")(cfg, dtype=F32)


def test_rebase_preserves_decode_output():
    """Decoding against a rebased cache must equal decoding against the
    original: the rotation shifts every implicit position AND rope_offset
    uniformly, and attention depends only on relative positions."""
    cfg, core = _tiny_core(rope_headroom=8)
    rs = np.random.RandomState(0)
    b, W = 2, 6
    vid = jnp.asarray(rs.randn(b, W, 4, 2, 2), F32)
    mouse = jnp.asarray(rs.randn(b, W, 2), F32)
    btn = jnp.asarray(rs.rand(b, W, 3) > 0.5, F32)
    ts0 = jnp.zeros((b, W), F32)
    params = core.init(jax.random.key(0), vid, ts0, mouse, btn)["params"]
    cache = KVCache.from_config(cfg, b, capacity_frames=W, dtype=F32)
    _, cache = core.apply({"params": params}, vid, ts0, mouse, btn,
                          kv_cache=cache, write=True)

    delta_frames = 3
    cos_d, sin_d = rope_rebase_tables(cfg, delta_frames)
    cache_rb = cache.rebase_rope(cos_d, sin_d,
                                 delta_frames * cfg.tokens_per_frame)
    assert int(cache_rb.rope_offset) == int(cache.rope_offset) \
        - delta_frames * cfg.tokens_per_frame

    x1 = jnp.asarray(rs.randn(b, 1, 4, 2, 2), F32)
    t1 = jnp.ones((b, 1), F32)

    def dec(c):
        out, _ = core.apply({"params": params}, x1, t1, mouse[:, :1],
                            btn[:, :1], kv_cache=c, decoding=True)
        return out

    np.testing.assert_allclose(np.asarray(dec(cache_rb)),
                               np.asarray(dec(cache)),
                               rtol=2e-4, atol=2e-4)


def test_rebase_plan_and_segments():
    cfg, _ = _tiny_core(rope_headroom=8)  # table = 16 frames
    tpf = cfg.tokens_per_frame
    table_f, delta_f, _ = rope_rebase_plan(cfg, 6)
    assert table_f == 16 and delta_f == 16 - 6 - 1

    # fits the table: one segment, zero rebase code
    assert rope_rebase_segments(6, 10, table_f, delta_f) == [10]
    # outlives it: first segment to the edge, then delta-sized chunks
    segs = rope_rebase_segments(6, 40, table_f, delta_f)
    assert segs[0] == 10 and all(s == delta_f for s in segs[1:-1])
    assert sum(segs) == 40
    # ring as large as the table: cannot rebase -> single clamping segment
    t2, d2, _ = rope_rebase_plan(cfg, 16)
    assert d2 < 1
    assert rope_rebase_segments(16, 40, t2, d2) == [40]


def test_sampler_outlives_table():
    """An audio serve session generating far past its position table must
    stay finite and match a same-weights model whose table covers the
    whole run (audio1d tables are prefix-identical across headroom, and
    the rebase is exact)."""
    mk = dict(model_id="audio_rft", n_layers=2, n_heads=2, d_model=32,
              channels=8, tokens_per_frame=1, n_frames=8, sample_size=8,
              causal=True, uncond=True, has_audio=True, rope_impl="audio1d",
              local_window=2, global_window=None, cfg_prob=0.0,
              backbone="dit", local_idx=4)
    cfg_small = transformer_config(**mk, rope_headroom=8)    # 16 rows
    cfg_big = transformer_config(**mk, rope_headroom=64)     # 72 rows
    core_s = get_core_cls("audio_rft")(cfg_small, dtype=F32)
    core_b = get_core_cls("audio_rft")(cfg_big, dtype=F32)

    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(1, 4, 8), F32)
    t0 = jnp.zeros((1, 4), F32)
    params = core_s.init(jax.random.key(0), x, t0)
    sampler = AudioCachingSampler(n_steps=2, num_tokens=40, noise_prev=0.2,
                                  custom_schedule=[1.0, 0.5], max_window=6)
    # 4 ctx + 40 generated = offset 44 >> the small model's 16-row table
    out_s = sampler(core_s, params, x, jax.random.key(1))
    sampler2 = AudioCachingSampler(n_steps=2, num_tokens=40, noise_prev=0.2,
                                   custom_schedule=[1.0, 0.5], max_window=6)
    out_b = sampler2(core_b, params, x, jax.random.key(1))
    assert np.isfinite(np.asarray(out_s)).all()
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_b),
                               rtol=2e-3, atol=2e-3)
