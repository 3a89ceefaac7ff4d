"""Coverage for the remaining inventory items: UViT backbone, mixed_av
trainer, local_waveform loader, AudioRFT waveform-encode path."""

import numpy as np
import jax
import jax.numpy as jnp

from owl_audio_exps_tpu.configs import Config, transformer_config
from owl_audio_exps_tpu.models.gamerft_audio import GameRFTAudio
from owl_audio_exps_tpu.trainers import get_trainer_cls

F32 = jnp.float32


def test_uvit_backbone():
    cfg = transformer_config(
        model_id="game_rft_audio", n_layers=3, n_heads=2, d_model=32,
        channels=4, audio_channels=4, sample_size=2, tokens_per_frame=5,
        n_frames=8, n_buttons=3, causal=False, uncond=True, has_audio=True,
        rope_impl="ortho", local_window=None, global_window=None,
        cfg_prob=0.0, backbone="uvit")
    model = GameRFTAudio(cfg, dtype=F32)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(1, 4, 4, 2, 2), F32)
    audio = jnp.asarray(rs.randn(1, 4, 4), F32)
    params = model.init({"params": jax.random.key(0),
                         "noise": jax.random.key(1)}, x, audio)
    out = jax.jit(lambda p: model.apply(
        p, x, audio, return_dict=True,
        rngs={"noise": jax.random.key(2)}))(params)
    assert out["pred_video"].shape == x.shape
    assert np.isfinite(float(out["diffusion_loss"]))
    # skip connections exist (n_layers=3 -> 1 skip proj)
    names = []
    jax.tree_util.tree_map_with_path(
        lambda p, _: names.append("/".join(str(k.key) for k in p)),
        params)
    assert any("skip_projs_0" in n for n in names)


def test_mixed_av_trainer(tmp_path):
    """Mixed trainer trains the JOINT AV model on [vid, audio, mouse,
    btn, has_controls] batches, logs unlabelled_proportion, and exports
    AV eval media (reference: mixed_av_trainer.py:154-162,190 and the
    audio decoder eval at :54-57)."""
    import json
    import os
    run_name = f"mixed_test_{os.getpid()}"
    cfg = Config.from_dict({
        "model": {
            "model_id": "game_rft_audio", "n_layers": 2, "n_heads": 2,
            "d_model": 32, "channels": 4, "audio_channels": 16,
            "sample_size": 2, "tokens_per_frame": 5, "n_frames": 8,
            "n_buttons": 3, "causal": True, "uncond": False,
            "has_audio": True, "rope_impl": "ortho", "local_window": 2,
            "global_window": None, "cfg_prob": 0.1,
        },
        "train": {
            "trainer_id": "mixed_av", "data_id": "synthetic_mixed",
            "data_kwargs": {"window_length": 8, "channels": 4,
                            "audio_channels": 16, "sample_size": 2,
                            "n_buttons": 3},
            "target_batch_size": 4, "batch_size": 4, "epochs": 1,
            "opt": "AdamW", "opt_kwargs": {"lr": 1e-3},
            "checkpoint_dir": str(tmp_path / "ckpt"), "save_interval": 100,
            "sample_interval": 2, "vae_scale": 1.0, "audio_vae_scale": 1.0,
            "sampler_id": "av_window",
            "sampler_kwargs": {"n_steps": 2, "window_length": 4,
                               "num_frames": 2},
            "sample_data_id": "synthetic_mixed",
            "sample_data_kwargs": {"window_length": 8, "channels": 4,
                                   "audio_channels": 16, "sample_size": 2,
                                   "n_buttons": 3},
            "n_samples": 2,
            "eval_media_dir": str(tmp_path / "media"),
            "vae_id": "pixel_shuffle", "vae_batch_size": 1,
        },
        "wandb": {"run_name": run_name},
    })
    trainer = get_trainer_cls("mixed_av")(cfg)
    state = trainer.train(max_steps=2)
    assert int(state.step) == 2
    # unlabelled_proportion reached the metrics log
    with open(os.path.join("runs", f"{run_name}.jsonl")) as f:
        recs = [json.loads(l) for l in f if l.strip()]
    assert any("unlabelled_proportion" in r for r in recs)
    # AV eval media exported (video + audio artifacts)
    media = os.listdir(tmp_path / "media")
    assert media, "no AV media exported at the sample interval"


def test_local_waveform_loader(tmp_path):
    import torch
    from owl_audio_exps_tpu.data.local_waveform import get_loader

    for i in range(2):
        wf = torch.randn(5000, 2)
        torch.save(wf, tmp_path / f"clip{i}_wf.pt")
    loader = get_loader(batch_size=3, root_dir=str(tmp_path),
                        window_length=2000)
    batch = next(iter(loader))
    assert batch.shape == (3, 2000, 2)
    assert batch.dtype == np.float32
    # short-file zero-padding path
    torch.save(torch.randn(100, 2), tmp_path / "short_wf.pt")
    loader2 = get_loader(batch_size=8, root_dir=str(tmp_path),
                         window_length=2000)
    batch2 = next(iter(loader2))
    assert batch2.shape == (8, 2000, 2)


def test_audio_rft_trainer_waveform_encode(tmp_path):
    """AudioRFT trainer with the in-repo VAE encoder on raw waveforms
    (reference: audio_rft_trainer.py:103-104 on-device encode)."""
    cfg = Config.from_dict({
        "model": {
            "model_id": "audio_rft", "sample_size": 8, "channels": 64,
            "n_layers": 2, "n_heads": 2, "d_model": 32,
            "tokens_per_frame": 1, "n_frames": 16, "cfg_prob": 0.0,
            "causal": True, "uncond": True, "backbone": "dit",
            "has_audio": True, "rope_impl": "audio1d", "local_window": 4,
            "global_window": None,
        },
        "train": {
            "trainer_id": "audio_rft", "data_id": "synthetic_waveform",
            "data_kwargs": {"n_samples": 735 * 8},
            "target_batch_size": 2, "batch_size": 2, "epochs": 1,
            "opt": "AdamW", "opt_kwargs": {"lr": 1e-3},
            "checkpoint_dir": str(tmp_path / "ckpt"), "save_interval": 100,
            "sample_interval": 1000, "vae_scale": 1.0,
            "vae_cfg_path": "in_repo",  # triggers bridge encoder
        },
        "wandb": {"run_name": "wf_test"},
    })
    trainer = get_trainer_cls("audio_rft")(cfg)
    assert trainer.encode_fn is not None
    state = trainer.train(max_steps=1)
    assert int(state.step) == 1
