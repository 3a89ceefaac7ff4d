"""MMDiT dual-stream backbone tests (working version of the reference's
stale mmdit path, SURVEY.md §2.11)."""

import numpy as np
import jax
import jax.numpy as jnp

from owl_audio_exps_tpu.configs import transformer_config
from owl_audio_exps_tpu.models.gamerft_audio import (GameRFTAudio,
                                                     GameRFTAudioCore)
from owl_audio_exps_tpu.nn.kv_cache import KVCache

F32 = jnp.float32


def mm_cfg(**kw):
    base = dict(model_id="game_rft_audio", n_layers=2, n_heads=2, d_model=32,
                channels=4, audio_channels=4, sample_size=2,
                tokens_per_frame=5, n_frames=8, n_buttons=3, causal=True,
                uncond=False, has_audio=True, rope_impl="ortho",
                local_window=2, global_window=None, cfg_prob=0.1,
                backbone="mmdit")
    base.update(kw)
    return transformer_config(**base)


def japply(module, *args, **kwargs):
    statics = {k: kwargs.pop(k) for k in ("write", "decoding", "return_dict")
               if k in kwargs}
    rngs = kwargs.pop("rngs", None)

    def fn(*a, **kw):
        return module.apply(*a, **kw, **statics,
                            **({"rngs": rngs} if rngs else {}))

    return jax.jit(fn)(*args, **kwargs)


def _data(n=6, b=1):
    rs = np.random.RandomState(0)
    return (jnp.asarray(rs.randn(b, n, 4, 2, 2), F32),
            jnp.asarray(rs.randn(b, n, 4), F32),
            jnp.asarray(rs.rand(b, n), F32),
            jnp.asarray(rs.randn(b, n, 2), F32),
            jnp.asarray((rs.rand(b, n, 3) > 0.5), F32))


def test_mmdit_loss_and_shapes():
    cfg = mm_cfg()
    model = GameRFTAudio(cfg, dtype=F32)
    x, audio, t, mouse, btn = _data()
    params = model.init({"params": jax.random.key(0),
                         "noise": jax.random.key(1)}, x, audio, mouse, btn)
    out = japply(model, params, x, audio, mouse, btn, return_dict=True,
                 rngs={"noise": jax.random.key(2)})
    assert out["pred_video"].shape == x.shape
    assert out["pred_audio"].shape == audio.shape
    assert np.isfinite(float(out["diffusion_loss"]))
    # dual-stream params exist
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = ["/".join(str(k.key) for k in p) for p, _ in flat]
    assert any("qkv_projs_0" in n for n in names)
    assert any("qkv_projs_1" in n for n in names)
    assert any("cond_proj" in n for n in names)


def test_mmdit_kv_cache_equivalence():
    cfg = mm_cfg()
    core = GameRFTAudioCore(cfg, dtype=F32)
    x, audio, t, mouse, btn = _data()
    n = x.shape[1]
    params = core.init(jax.random.key(0), x, audio, t, mouse, btn)

    (full_v, full_a), _ = japply(core, params, x, audio, t, mouse, btn)

    cache = KVCache.from_config(cfg, batch_size=1, dtype=F32)
    _, cache = japply(core, params, x[:, :n - 1], audio[:, :n - 1],
                      t[:, :n - 1], mouse[:, :n - 1], btn[:, :n - 1],
                      kv_cache=cache, write=True)
    (lv, la), _ = japply(core, params, x[:, n - 1:], audio[:, n - 1:],
                         t[:, n - 1:], mouse[:, n - 1:], btn[:, n - 1:],
                         kv_cache=cache, decoding=True)
    np.testing.assert_allclose(np.asarray(lv[:, 0]), np.asarray(full_v[:, -1]),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(la[:, 0]), np.asarray(full_a[:, -1]),
                               atol=2e-4)
