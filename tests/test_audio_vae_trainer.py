"""Audio VAE trainer: loss terms + a 2-step training run on synthetic
waveforms."""

import numpy as np
import jax.numpy as jnp

from owl_audio_exps_tpu.configs import Config
from owl_audio_exps_tpu.trainers import get_trainer_cls
from owl_audio_exps_tpu.trainers.audio_vae_trainer import (stft_mag,
                                                           multires_stft_loss)


def test_stft_mag_shapes():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 4096), jnp.float32)
    m = stft_mag(x, 512, 128)
    assert m.shape == (2, 1 + (4096 - 512) // 128, 257)
    assert np.isfinite(np.asarray(m)).all()


def test_stft_loss_zero_for_identical():
    x = jnp.asarray(np.random.RandomState(0).randn(1, 4096, 2), jnp.float32)
    loss = multires_stft_loss(x, x, resolutions=((512, 128),))
    assert float(loss) < 1e-5
    y = x + 0.5
    assert float(multires_stft_loss(y, x, resolutions=((512, 128),))) > 0.01


def test_audio_vae_trainer_runs(tmp_path):
    cfg = Config.from_dict({
        "model": {"model_id": "audio_vae", "channels": 64},
        "train": {
            "trainer_id": "audio_vae",
            "data_id": "synthetic_waveform",
            "data_kwargs": {"n_samples": 735 * 4},
            "batch_size": 2, "target_batch_size": 2,
            "opt_kwargs": {"lr": 1e-4},
            "checkpoint_dir": str(tmp_path / "ckpt"),
            "save_interval": 100, "sample_interval": 100,
        },
        "wandb": {"run_name": "vae_test"},
    })
    trainer = get_trainer_cls("audio_vae")(cfg)
    state = trainer.train(max_steps=2)
    assert int(state.step) == 2
    import jax
    for leaf in jax.tree.leaves(state.params):
        assert np.isfinite(np.asarray(leaf, dtype=np.float32)).all()
