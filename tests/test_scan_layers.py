"""scan_layers mode: scanned-group forward must equal the unrolled stack
given converted params; grads flow with remat."""

import numpy as np
import jax
import jax.numpy as jnp

from owl_audio_exps_tpu.configs import transformer_config
from owl_audio_exps_tpu.models.audiorft import AudioRFT, AudioRFTCore
from owl_audio_exps_tpu.utils.layer_stacking import convert_params

F32 = jnp.float32


def cfg_pair():
    base = dict(model_id="audio_rft", n_layers=8, n_heads=2, d_model=32,
                channels=8, tokens_per_frame=1, n_frames=16, sample_size=16,
                causal=True, uncond=True, has_audio=True,
                rope_impl="audio1d", local_window=4, global_window=None,
                cfg_prob=0.0, backbone="dit", local_idx=4)
    return (transformer_config(**base),
            transformer_config(**dict(base, scan_layers=True)))


def test_scanned_equals_unrolled():
    cfg_u, cfg_s = cfg_pair()
    core_u = AudioRFTCore(cfg_u, dtype=F32)
    core_s = AudioRFTCore(cfg_s, dtype=F32)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 12, 8), F32)
    t = jnp.asarray(rs.rand(2, 12), F32)

    params_u = core_u.init(jax.random.key(0), x, t)["params"]
    params_s = convert_params(params_u, to_scanned=True,
                              n_layers=cfg_u.n_layers)

    out_u, _ = jax.jit(lambda p: core_u.apply({"params": p}, x, t))(params_u)
    out_s, _ = jax.jit(lambda p: core_s.apply({"params": p}, x, t))(params_s)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_u),
                               atol=2e-5)

    # round-trip conversion
    back = convert_params(params_s, to_scanned=False,
                          n_layers=cfg_u.n_layers)
    for a, b in zip(jax.tree.leaves(back), jax.tree.leaves(params_u)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_scanned_init_shapes_and_grads():
    _, cfg_s = cfg_pair()
    cfg_s.gradient_checkpointing = True
    model = AudioRFT(cfg_s, dtype=F32)
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, 12, 8), F32)
    params = model.init({"params": jax.random.key(0),
                         "noise": jax.random.key(1)}, x)
    # stacked leading axis = n_groups
    tr = params["params"]["core"]["transformer"]["groups"]
    leaf = jax.tree.leaves(tr["blocks_0"])[0]
    assert leaf.shape[0] == cfg_s.n_layers // 4

    grads = jax.jit(jax.grad(lambda p: model.apply(
        p, x, rngs={"noise": jax.random.key(2)})))(params)
    for g in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(g)).all()


def test_muon_batched_ns5_on_stacked_params():
    """Stacked [groups, in, out] params must be orthogonalized per group,
    not flattened into one matrix."""
    from owl_audio_exps_tpu.muon import zeropower_via_newtonschulz5
    rs = np.random.RandomState(0)
    g = jnp.asarray(rs.randn(3, 64, 32).astype(np.float32))
    o = np.asarray(zeropower_via_newtonschulz5(g, 5), np.float32)
    assert o.shape == (3, 64, 32)
    for i in range(3):
        s = np.linalg.svd(o[i], compute_uv=False)
        assert s.max() < 2.0 and s.min() > 0.2, i


def test_muon_trains_scanned_model(tmp_path):
    from owl_audio_exps_tpu.configs import Config
    from owl_audio_exps_tpu.trainers import get_trainer_cls
    cfg = Config.from_dict({
        "model": {
            "model_id": "audio_rft", "n_layers": 4, "n_heads": 2,
            "d_model": 32, "channels": 8, "tokens_per_frame": 1,
            "n_frames": 16, "sample_size": 8, "causal": True,
            "uncond": True, "has_audio": True, "rope_impl": "audio1d",
            "local_window": 4, "global_window": None, "cfg_prob": 0.0,
            "backbone": "dit", "local_idx": 2, "scan_layers": True,
        },
        "train": {
            "trainer_id": "audio_rft", "data_id": "synthetic_audio_latent",
            "data_kwargs": {"window_length": 8, "channels": 8},
            "target_batch_size": 4, "batch_size": 4, "epochs": 1,
            "opt": "Muon",
            "opt_kwargs": {"lr": 1e-3, "momentum": 0.95, "adamw_lr": 1e-3,
                           "adamw_keys": ["t_embed", "proj_in", "proj_out",
                                          "adaln", "gate"]},
            "checkpoint_dir": str(tmp_path / "ckpt"), "save_interval": 100,
            "sample_interval": 1000, "vae_scale": 1.0,
        },
        "wandb": {"run_name": "scan_muon"},
    })
    trainer = get_trainer_cls("audio_rft")(cfg)
    state = trainer.train(max_steps=2)
    assert int(state.step) == 2
    for leaf in jax.tree.leaves(state.params):
        assert np.isfinite(np.asarray(leaf)).all()
