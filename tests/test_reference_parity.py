"""Full-model numerical parity against the ACTUAL torch reference
(VERDICT.md Missing #3): instantiate the reference's GameRFTCore /
GameRFTAudioCore from /root/reference on CPU torch, transfer its live
state_dict through utils/torch_import.py, and assert the JAX forward
matches the torch forward in fp32.

This is the end-to-end check that the importer name-mapping, the QKV row
permutation, RoPE tables, AdaLN broadcast, block masks, and the
velocity-head math all line up with the reference
(owl_wms/models/gamerft.py:33-59, gamerft_audio.py:49-97).

The reference needs torch.compile for flex_attention (its eager path
requires dynamo); first run compiles inductor-CPU kernels (~1-2 min),
cached afterwards.
"""

import sys
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# the second distinct sequence length in one process flips dynamo into
# automatic-dynamic mode, whose inductor-CPU flex-attention codegen is
# broken (emits invalid C++); static per-shape specialization is fine
torch._dynamo.config.automatic_dynamic_shapes = False

import reference_shims  # noqa: E402

reference_shims.install()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from owl_audio_exps_tpu.configs import transformer_config  # noqa: E402
from owl_audio_exps_tpu.utils.torch_import import (  # noqa: E402
    import_torch_state_dict, normalize_torch_keys, assert_tree_matches)

F32 = jnp.float32


def _cfg_dict(**over):
    base = dict(
        model_id="game_rft", n_layers=2, n_heads=2, d_model=32,
        channels=4, sample_size=2, tokens_per_frame=4, n_frames=8,
        n_buttons=3, causal=True, uncond=False, cfg_prob=0.0,
        backbone="dit", has_audio=False, rope_impl="ortho",
        local_window=2, global_window=None, audio_channels=6)
    base.update(over)
    return base


def _torch_state_to_jax(core_t, n_heads, target_params):
    sd = {k: v.detach().float().numpy()
          for k, v in core_t.state_dict().items()}
    sd = normalize_torch_keys(sd)
    imported = import_torch_state_dict(sd, n_heads)
    assert_tree_matches(imported, target_params)
    return jax.tree.map(jnp.asarray, imported)


def _inputs(cfg, rs, with_audio=False):
    b, n = 2, cfg["n_frames"]
    x = rs.randn(b, n, cfg["channels"], cfg["sample_size"],
                 cfg["sample_size"]).astype(np.float32)
    t = rs.rand(b, n).astype(np.float32)
    mouse = rs.randn(b, n, 2).astype(np.float32)
    btn = (rs.rand(b, n, cfg["n_buttons"]) > 0.5).astype(np.float32)
    out = [x, t, mouse, btn]
    if with_audio:
        out.insert(1, rs.randn(b, n, cfg["audio_channels"]).astype(
            np.float32))
    return out


@pytest.mark.slow
def test_gamerft_core_matches_reference():
    from owl_wms.models.gamerft import GameRFTCore as TorchCore
    from owl_audio_exps_tpu.models.gamerft import GameRFTCore

    cfg = _cfg_dict()
    torch.manual_seed(0)
    core_t = TorchCore(SimpleNamespace(**cfg)).eval().float()

    rs = np.random.RandomState(0)
    x, t, mouse, btn = _inputs(cfg, rs)
    with torch.no_grad():
        ref = core_t(torch.from_numpy(x), torch.from_numpy(t),
                     torch.from_numpy(mouse),
                     torch.from_numpy(btn)).numpy()

    jcfg = transformer_config(**cfg)
    core_j = GameRFTCore(jcfg, dtype=F32)
    init = core_j.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(t),
                       jnp.asarray(mouse), jnp.asarray(btn))
    params = _torch_state_to_jax(core_t, cfg["n_heads"],
                                 jax.tree.map(np.asarray, init["params"]))
    out, _ = jax.jit(lambda p: core_j.apply(
        {"params": p}, jnp.asarray(x), jnp.asarray(t), jnp.asarray(mouse),
        jnp.asarray(btn)))(params)
    out = np.asarray(out, np.float32)

    assert ref.shape == out.shape
    scale = max(1e-3, float(np.abs(ref).max()))
    max_rel = float(np.abs(ref - out).max()) / scale
    assert max_rel < 5e-4, f"velocity mismatch: max rel diff {max_rel}"


@pytest.mark.slow
def test_gamerft_audio_core_matches_reference():
    # the reference's mmattn module is stale/broken (imports a
    # non-existent create_causal_block_mask, SURVEY.md §2.11); the dit
    # backbone never touches it, so satisfy the import with a stub
    if "owl_wms.nn.mmattn" not in sys.modules:
        import types as _types
        stub = _types.ModuleType("owl_wms.nn.mmattn")
        stub.MMDIT = None
        sys.modules["owl_wms.nn.mmattn"] = stub
    from owl_wms.models.gamerft_audio import GameRFTAudioCore as TorchCore
    from owl_audio_exps_tpu.models.gamerft_audio import GameRFTAudioCore

    cfg = _cfg_dict(model_id="game_rft_audio", has_audio=True,
                    tokens_per_frame=5)
    torch.manual_seed(0)
    # the reference torch.compile(…, dynamic=True)s the backbone at
    # construction (gamerft_audio.py:36) — a perf wrapper that breaks
    # inductor-CPU on dynamic shapes; bypass it (flex_attention itself
    # stays compiled, which is what carries the attention semantics)
    orig_compile = torch.compile
    torch.compile = lambda m, *a, **k: m
    try:
        core_t = TorchCore(SimpleNamespace(**cfg)).eval().float()
    finally:
        torch.compile = orig_compile

    rs = np.random.RandomState(1)
    x, audio, t, mouse, btn = _inputs(cfg, rs, with_audio=True)
    with torch.no_grad():
        ref_v, ref_a = core_t(torch.from_numpy(x), torch.from_numpy(audio),
                              torch.from_numpy(t), torch.from_numpy(mouse),
                              torch.from_numpy(btn))
    ref_v, ref_a = ref_v.numpy(), ref_a.numpy()

    jcfg = transformer_config(**cfg)
    core_j = GameRFTAudioCore(jcfg, dtype=F32)
    args = tuple(jnp.asarray(a) for a in (x, audio, t, mouse, btn))
    init = core_j.init(jax.random.key(0), *args)
    params = _torch_state_to_jax(core_t, cfg["n_heads"],
                                 jax.tree.map(np.asarray, init["params"]))
    (out_v, out_a), _ = jax.jit(
        lambda p: core_j.apply({"params": p}, *args))(params)
    out_v = np.asarray(out_v, np.float32)
    out_a = np.asarray(out_a, np.float32)

    for name, ref, out in (("video", ref_v, out_v), ("audio", ref_a, out_a)):
        assert ref.shape == out.shape
        scale = max(1e-3, float(np.abs(ref).max()))
        max_rel = float(np.abs(ref - out).max()) / scale
        assert max_rel < 5e-4, f"{name} mismatch: max rel diff {max_rel}"
