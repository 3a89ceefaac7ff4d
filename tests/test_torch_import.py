"""Torch checkpoint import/export round-trip tests."""

import numpy as np
import jax
import jax.numpy as jnp

from owl_audio_exps_tpu.configs import transformer_config
from owl_audio_exps_tpu.models.audiorft import AudioRFTCore
from owl_audio_exps_tpu.models.gamerft import GameRFTCore
from owl_audio_exps_tpu.utils.torch_import import (
    import_torch_state_dict, export_torch_state_dict,
    permute_qkv_rows, inverse_permute_qkv_rows, normalize_torch_keys,
    assert_tree_matches,
)

F32 = jnp.float32


def test_qkv_permute_roundtrip():
    rs = np.random.RandomState(0)
    w = rs.randn(3 * 8, 8).astype(np.float32)  # d=8, H=2, Dh=4
    fwd = permute_qkv_rows(w, 2)
    back = inverse_permute_qkv_rows(fwd, 2)
    np.testing.assert_array_equal(back, w)
    # permute maps torch row (three=1, h=0, dh=2) -> flax row (h=0, three=1, dh=2)
    d, H, dh = 8, 2, 4
    torch_row = 1 * d + 0 * dh + 2       # k, head0, dh2
    flax_row = 0 * (3 * dh) + 1 * dh + 2
    np.testing.assert_array_equal(fwd[flax_row], w[torch_row])


def test_normalize_keys():
    sd = {"module._orig_mod.core.proj_in.weight": np.zeros(2),
          "ema_model.core.t_embed.mlp.fc1.bias": np.zeros(2)}
    out = normalize_torch_keys(sd)
    assert set(out) == {"core.proj_in.weight", "core.t_embed.mlp.fc1.bias"}


def _roundtrip(core, params, apply_args):
    n_heads = core.config.n_heads
    p = jax.tree.map(np.asarray, params["params"])
    torch_sd = export_torch_state_dict(p, n_heads)
    # all names look like torch module paths
    assert all(k.endswith((".weight", ".bias")) for k in torch_sd)
    imported = import_torch_state_dict(torch_sd, n_heads)
    assert_tree_matches(imported, p)

    out_orig, _ = jax.jit(lambda pp: core.apply({"params": pp},
                                                *apply_args))(p)
    imported_j = jax.tree.map(jnp.asarray, imported)
    out_imp, _ = jax.jit(lambda pp: core.apply({"params": pp},
                                               *apply_args))(imported_j)
    np.testing.assert_allclose(np.asarray(out_orig), np.asarray(out_imp),
                               atol=1e-6)


def test_audio_core_roundtrip():
    cfg = transformer_config(
        model_id="audio_rft", n_layers=2, n_heads=2, d_model=32, channels=8,
        tokens_per_frame=1, n_frames=8, sample_size=8, causal=True,
        uncond=True, has_audio=True, rope_impl="audio1d", local_window=4,
        global_window=None, cfg_prob=0.0, backbone="dit")
    core = AudioRFTCore(cfg, dtype=F32)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(1, 8, 8), F32)
    t = jnp.asarray(rs.rand(1, 8), F32)
    params = core.init(jax.random.key(0), x, t)
    _roundtrip(core, params, (x, t))


def test_mmdit_core_roundtrip():
    # regression: export must apply the inverse head permutation to the
    # MMDiT per-stream projections (qkv_projs_N -> qkv_projs.N) and emit
    # the reference's Sequential name cond_proj.1 (owl_wms/nn/mmattn.py:127)
    from owl_audio_exps_tpu.models.gamerft_audio import GameRFTAudioCore
    cfg = transformer_config(
        model_id="game_rft_audio", n_layers=2, n_heads=2, d_model=32,
        channels=4, audio_channels=4, sample_size=2, tokens_per_frame=5,
        n_frames=8, n_buttons=3, causal=True, uncond=False, has_audio=True,
        rope_impl="ortho", local_window=2, global_window=None, cfg_prob=0.0,
        backbone="mmdit")
    core = GameRFTAudioCore(cfg, dtype=F32)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(1, 4, 4, 2, 2), F32)
    a = jnp.asarray(rs.randn(1, 4, 4), F32)
    t = jnp.asarray(rs.rand(1, 4), F32)
    m = jnp.asarray(rs.randn(1, 4, 2), F32)
    bt = jnp.asarray(rs.rand(1, 4, 3) > 0.5, F32)
    params = core.init(jax.random.key(0), x, a, t, m, bt)
    p = jax.tree.map(np.asarray, params["params"])

    torch_sd = export_torch_state_dict(p, cfg.n_heads)
    assert "transformer.cond_proj.1.weight" in torch_sd
    assert any(k.startswith("transformer.blocks.0.attn.qkv_projs.0.")
               for k in torch_sd)
    imported = import_torch_state_dict(torch_sd, cfg.n_heads)
    assert_tree_matches(imported, p)

    def run(pp):
        (v, au), _ = core.apply({"params": pp}, x, a, t, m, bt)
        return v, au

    v0, a0 = jax.jit(run)(p)
    v1, a1 = jax.jit(run)(jax.tree.map(jnp.asarray, imported))
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a0), np.asarray(a1), atol=1e-6)


def test_video_core_roundtrip():
    cfg = transformer_config(
        model_id="game_rft", n_layers=2, n_heads=2, d_model=32, channels=4,
        sample_size=2, tokens_per_frame=4, n_frames=8, n_buttons=3,
        causal=True, uncond=False, has_audio=False, rope_impl="ortho",
        local_window=2, global_window=None, cfg_prob=0.0)
    core = GameRFTCore(cfg, dtype=F32)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(1, 4, 4, 2, 2), F32)
    t = jnp.asarray(rs.rand(1, 4), F32)
    m = jnp.asarray(rs.randn(1, 4, 2), F32)
    b = jnp.asarray(rs.rand(1, 4, 3) > 0.5, F32)
    params = core.init(jax.random.key(0), x, t, m, b)
    _roundtrip(core, params, (x, t, m, b))
