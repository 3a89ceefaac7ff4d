"""End-to-end trainer tests on the 8-device CPU mesh: the minimum slice
(config -> data -> model -> optimizer -> EMA -> checkpoint) plus Muon."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from owl_audio_exps_tpu.configs import Config
from owl_audio_exps_tpu.muon import zeropower_via_newtonschulz5, init_muon
from owl_audio_exps_tpu.trainers import get_trainer_cls


def audio_cfg_dict(tmp_path, opt="AdamW", steps=3):
    return {
        "model": {
            "model_id": "audio_rft", "n_layers": 2, "n_heads": 2,
            "d_model": 32, "channels": 8, "tokens_per_frame": 1,
            "n_frames": 16, "sample_size": 8, "causal": True,
            "uncond": True, "has_audio": True, "rope_impl": "audio1d",
            "local_window": 4, "global_window": None, "cfg_prob": 0.0,
            "backbone": "dit",
        },
        "train": {
            "trainer_id": "audio_rft",
            "data_id": "synthetic_audio_latent",
            "data_kwargs": {"window_length": 8, "channels": 8},
            "target_batch_size": 8, "batch_size": 4,
            "epochs": 1, "opt": opt,
            "opt_kwargs": ({"lr": 1e-3} if opt == "AdamW" else
                           {"lr": 1e-3, "momentum": 0.95,
                            "adamw_lr": 1e-3,
                            "adamw_keys": ["t_embed", "proj_in",
                                           "proj_out", "adaln", "gate"]}),
            "scheduler": None,
            "checkpoint_dir": str(tmp_path / "ckpt"),
            "sample_interval": 1000, "save_interval": 2,
            "sampler_id": "audio_caching",
            "sampler_kwargs": {"n_steps": 2, "num_tokens": 2},
            "n_samples": 2, "vae_scale": 1.0,
        },
        "wandb": {"run_name": "test", "project": None},
    }


def test_ns5_orthogonalizes():
    rs = np.random.RandomState(0)
    g = jnp.asarray(rs.randn(64, 32).astype(np.float32))
    o = zeropower_via_newtonschulz5(g, steps=5).astype(jnp.float32)
    # columns should be near-orthonormal-ish: singular values ~ U(0.5, 1.5)
    s = np.linalg.svd(np.asarray(o), compute_uv=False)
    assert s.max() < 2.0
    assert s.min() > 0.2


def test_muon_labels_and_update():
    params = {
        "core": {
            "transformer": {"blocks_0": {"attn": {
                "qkv": {"kernel": jnp.ones((8, 24)),
                        "bias": jnp.zeros((24,))}}}},
            "t_embed": {"mlp": {"fc1": {"kernel": jnp.ones((8, 16))}}},
        }
    }
    tx = init_muon(params, lr=1e-3, momentum=0.9, adamw_lr=1e-3,
                   adamw_keys=["t_embed"])
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # every leaf got a nonzero update
    for leaf in jax.tree.leaves(updates):
        assert float(jnp.abs(leaf).max()) > 0


@pytest.mark.parametrize("opt", ["AdamW", "Muon"])
def test_audio_rft_trainer_end_to_end(tmp_path, opt):
    cfg = Config.from_dict(audio_cfg_dict(tmp_path, opt=opt))
    trainer = get_trainer_cls("audio_rft")(cfg)
    state = trainer.train(max_steps=3)
    assert int(state.step) == 3
    # EMA differs from params but tracks them
    p0 = jax.tree.leaves(state.params)[0]
    e0 = jax.tree.leaves(state.ema_params)[0]
    assert p0.shape == e0.shape
    # checkpoint written at step 2
    import os
    assert os.path.isdir(str(tmp_path / "ckpt" / "step_2"))


def test_trainer_resume(tmp_path):
    cfg = Config.from_dict(audio_cfg_dict(tmp_path))
    trainer = get_trainer_cls("audio_rft")(cfg)
    state = trainer.train(max_steps=2)

    cfg2 = Config.from_dict(audio_cfg_dict(tmp_path))
    cfg2.train.resume_ckpt = str(tmp_path / "ckpt" / "step_2")
    trainer2 = get_trainer_cls("audio_rft")(cfg2)
    state2 = trainer2.train(max_steps=4)
    assert int(state2.step) == 4
    # resumed params start from saved ones (loss continuity proxy: the
    # step counter advanced and params are finite)
    for leaf in jax.tree.leaves(state2.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_rft_video_trainer_smoke(tmp_path):
    cfg = Config.from_dict({
        "model": {
            "model_id": "game_rft", "n_layers": 2, "n_heads": 2,
            "d_model": 32, "channels": 4, "sample_size": 2,
            "tokens_per_frame": 4, "n_frames": 8, "n_buttons": 3,
            "causal": True, "uncond": False, "has_audio": False,
            "rope_impl": "ortho", "local_window": 2, "global_window": None,
            "cfg_prob": 0.1,
        },
        "train": {
            "trainer_id": "rft", "data_id": "synthetic_latent",
            "data_kwargs": {"window_length": 8, "channels": 4,
                            "sample_size": 2, "n_buttons": 3},
            "target_batch_size": 4, "batch_size": 2, "epochs": 1,
            "opt": "AdamW", "opt_kwargs": {"lr": 1e-3},
            "checkpoint_dir": str(tmp_path / "ckpt"), "save_interval": 100,
            "sample_interval": 1000, "vae_scale": 1.0,
        },
        "wandb": {"run_name": "test2"},
    })
    trainer = get_trainer_cls("rft")(cfg)
    state = trainer.train(max_steps=2)
    assert int(state.step) == 2


def test_audio_eval_media_export(tmp_path):
    """eval_step decodes and writes a wav when eval_media_dir is set."""
    import os
    cfg_d = audio_cfg_dict(tmp_path)
    cfg_d["train"]["eval_media_dir"] = str(tmp_path / "media")
    cfg_d["train"]["sample_interval"] = 2
    cfg_d["model"]["channels"] = 64  # in-repo VAE latent width
    cfg_d["train"]["data_kwargs"] = {"window_length": 8, "channels": 64}
    cfg = Config.from_dict(cfg_d)
    trainer = get_trainer_cls("audio_rft")(cfg)
    trainer.train(max_steps=2)
    wavs = [f for f in os.listdir(tmp_path / "media") if f.endswith(".wav")]
    assert wavs, "no wav exported at the sample interval"
