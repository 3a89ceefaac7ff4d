"""Cross-topology checkpoint restore (SURVEY §7 build-order item 12).

The reference's resume story survives wrapper changes via prefix
regexes (owl_wms/trainers/rft_trainer.py:84-92); the TPU analogue is
surviving MESH changes: a checkpoint saved on an 8-device dp x fsdp
mesh must restore bit-equal onto 4- and 2-device meshes (and
dp-only), and keep training. Orbax restores by logical pytree; the
trainer's load() re-places leaves onto the live state's shardings —
this test proves that end-to-end on the virtual CPU mesh via the
``mesh.devices`` sub-topology knob.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from owl_audio_exps_tpu.configs import Config
from owl_audio_exps_tpu.trainers import get_trainer_cls
from owl_audio_exps_tpu.utils.checkpoints import wait_for_checkpoints


def _cfg(tmp_path, mesh):
    return Config.from_dict({
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
            "target_batch_size": 8, "batch_size": 8,
            "mesh": mesh,
            "log_interval": 1, "epochs": 1,
            "opt": "AdamW", "opt_kwargs": {"lr": 1e-3},
            "scheduler": None,
            "sample_interval": 10 ** 9, "save_interval": 10 ** 9,
            "vae_scale": 1.0,
            "checkpoint_dir": str(tmp_path / "ckpt"),
        },
        "wandb": {"run_name": "xtopo_test", "project": None},
    })


def _host_params(params):
    return jax.tree.map(lambda l: np.asarray(l, np.float32), params)


def _assert_equal(a, b):
    flat_a = jax.tree.leaves(a)
    flat_b = jax.tree.leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_array_equal(x, y)


@pytest.mark.slow
def test_restore_onto_smaller_meshes(tmp_path):
    assert jax.device_count() == 8

    # save on the full 8-device dp x fsdp mesh
    t8 = get_trainer_cls("audio_rft")(_cfg(tmp_path, {"data": 4,
                                                      "fsdp": 2}))
    state = t8.train(max_steps=2)
    t8.save(state)
    wait_for_checkpoints()
    want = _host_params(state.params)
    path = t8.ckpt_path(2)

    for mesh in ({"data": 2, "fsdp": 2, "devices": 4},
                 {"data": 2, "fsdp": 1, "devices": 2},   # dp-only
                 {"data": 1, "fsdp": 2, "devices": 2}):
        tr = get_trainer_cls("audio_rft")(_cfg(tmp_path, mesh))
        fresh = tr.init_state()
        restored = tr.load(path, fresh)
        assert int(restored.step) == 2
        _assert_equal(want, _host_params(restored.params))
        n_dev = mesh["devices"]
        for leaf in jax.tree.leaves(restored.params):
            assert len(leaf.sharding.device_set) == n_dev, (
                mesh, leaf.sharding)
        if mesh.get("fsdp", 1) > 1:
            # fsdp still strictly shards on the smaller mesh
            assert any(
                l.addressable_shards[0].data.shape != l.shape
                for l in jax.tree.leaves(restored.params)), mesh
        # and the restored state actually trains on the new topology
        # (the trainer's own resume path: cfg.resume_ckpt -> load)
        tr.train_cfg.resume_ckpt = path
        state2 = tr.train(max_steps=3)
        assert int(state2.step) == 3
        norm = float(sum(jnp.sum(jnp.square(l.astype(jnp.float32)))
                         for l in jax.tree.leaves(state2.params)))
        assert np.isfinite(norm)
