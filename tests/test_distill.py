"""Distillation trainer tests: CausVid, Self-Forcing, ODE distill.

Verifies the alternating optimization runs end-to-end on the CPU mesh,
critic/student params actually move, gradients flow through the
AR-rollout final step, and layer-pruned weight transfer maps correctly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from owl_audio_exps_tpu.configs import Config
from owl_audio_exps_tpu.trainers import get_trainer_cls
from owl_audio_exps_tpu.trainers.ode_distill import (prune_layer_indices,
                                                     transfer_pruned_params)


def distill_cfg(tmp_path, trainer_id="causvid_vid", **train_extra):
    train = {
        "trainer_id": trainer_id, "data_id": "synthetic_latent",
        "data_kwargs": {"window_length": 4, "channels": 4,
                        "sample_size": 2, "n_buttons": 3},
        "target_batch_size": 2, "batch_size": 2, "epochs": 1,
        "opt": "AdamW", "opt_kwargs": {"lr": 1e-3},
        "d_opt_kwargs": {"lr": 1e-3},
        "checkpoint_dir": str(tmp_path / "ckpt"),
        "save_interval": 1000, "sample_interval": 1000,
        "vae_scale": 1.0, "update_ratio": 2,
        "rollout_steps": 2, "min_rollout_frames": 2,
        "regression_weight": 0.1,
    }
    train.update(train_extra)
    return Config.from_dict({
        "model": {
            "model_id": "game_rft", "n_layers": 2, "n_heads": 2,
            "d_model": 32, "channels": 4, "sample_size": 2,
            "tokens_per_frame": 4, "n_frames": 8, "n_buttons": 3,
            "causal": True, "uncond": False, "has_audio": False,
            "rope_impl": "ortho", "local_window": 2, "global_window": None,
            "cfg_prob": 0.0,
        },
        "train": train,
        "wandb": {"run_name": f"test_{trainer_id}"},
    })


@pytest.mark.parametrize("trainer_id", ["causvid_vid", "sforce_vid"])
def test_dmd_trainers_update_both_nets(tmp_path, trainer_id):
    cfg = distill_cfg(tmp_path, trainer_id)
    trainer = get_trainer_cls(trainer_id)(cfg)
    state0 = trainer.init_distill_state(trainer.example_args())
    s0 = jax.tree.leaves(state0.student_params)[0].copy()
    c0 = jax.tree.leaves(state0.critic_params)[0].copy()

    state = trainer.train(max_steps=2)
    assert int(state.step) == 2
    s1 = jax.tree.leaves(state.student_params)[0]
    c1 = jax.tree.leaves(state.critic_params)[0]
    assert float(jnp.abs(s1 - s0).max()) > 0, "student never updated"
    assert float(jnp.abs(c1 - c0).max()) > 0, "critic never updated"
    for leaf in jax.tree.leaves(state.student_params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_sforce_rollout_grad_flows(tmp_path):
    """Gradient must flow through the AR rollout's final denoise step
    (the reference sf_sanity.py check, SURVEY.md §4)."""
    cfg = distill_cfg(tmp_path, "sforce_vid")
    trainer = get_trainer_cls("sforce_vid")(cfg)
    trainer.init_distill_state(trainer.example_args())

    rs = np.random.RandomState(0)
    vid = jnp.asarray(rs.randn(2, 4, 4, 2, 2), jnp.bfloat16)
    mouse = jnp.asarray(rs.randn(2, 4, 2), jnp.bfloat16)
    btn = jnp.asarray(rs.rand(2, 4, 3) > 0.5, jnp.bfloat16)

    def loss(params):
        rollout, mask, _, _, _ = trainer.get_rollouts(
            params, vid, mouse, btn, jax.random.key(0), with_grad=True)
        return jnp.sum(rollout * mask[:, :, None, None, None])

    state = trainer.init_distill_state(trainer.example_args())
    grads = jax.jit(jax.grad(loss))(state.student_params)
    gnorm = float(
        jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                     for g in jax.tree.leaves(grads))))
    assert gnorm > 0, "no gradient through the rollout"
    n_nonzero = sum(int(jnp.any(g != 0)) for g in jax.tree.leaves(grads))
    assert n_nonzero > len(jax.tree.leaves(grads)) // 2, \
        "most params should receive gradient through the final step"


def test_sforce_rollout_past_n_frames_finite(tmp_path):
    """Regression: rollouts decode PAST the training context — with
    window_length == n_frames the rollout frames sit at RoPE positions
    beyond the table, where jnp.take's default fill mode wrote NaN
    (caught by the on-chip trainer check, scripts/tpu_distill_check.py).
    Tables now carry decode headroom and clamp instead."""
    cfg = distill_cfg(tmp_path, "sforce_vid")
    cfg.model.n_frames = 4          # == data window_length
    cfg.train.data_kwargs["window_length"] = 4
    trainer = get_trainer_cls("sforce_vid")(cfg)
    state = trainer.init_distill_state(trainer.example_args())

    rs = np.random.RandomState(0)
    vid = jnp.asarray(rs.randn(2, 4, 4, 2, 2), jnp.bfloat16)
    mouse = jnp.asarray(rs.randn(2, 4, 2), jnp.bfloat16)
    btn = jnp.asarray(rs.rand(2, 4, 3) > 0.5, jnp.bfloat16)
    rollout, *_ = jax.jit(lambda p, r: trainer.get_rollouts(
        p, vid, mouse, btn, r, with_grad=False))(
        state.student_params, jax.random.key(0))
    assert np.isfinite(np.asarray(rollout, np.float32)).all(), \
        "rollout past n_frames produced non-finite frames"


def test_prune_indices():
    assert prune_layer_indices(8, 4) == [0, 2, 5, 7]
    assert prune_layer_indices(4, 4) == [0, 1, 2, 3]
    idx = prune_layer_indices(36, 16)
    assert idx[0] == 0 and idx[-1] == 35 and len(idx) == 16


def test_transfer_pruned_params():
    teacher = {
        "transformer": {f"blocks_{i}": {"w": jnp.full((2,), float(i))}
                        for i in range(4)},
        "proj_in": {"kernel": jnp.ones((3, 3))},
    }
    teacher["transformer"]["extra"] = {"w": jnp.zeros((1,))}
    student = transfer_pruned_params(teacher, 4, 2)
    assert set(k for k in student["transformer"] if k.startswith("blocks_")) \
        == {"blocks_0", "blocks_1"}
    np.testing.assert_allclose(student["transformer"]["blocks_0"]["w"], 0.0)
    np.testing.assert_allclose(student["transformer"]["blocks_1"]["w"], 3.0)


def test_ode_distill_trainer(tmp_path):
    cfg = distill_cfg(tmp_path, "ode_distill_vid", ode_steps=3,
                      subsample=0.5)
    trainer = get_trainer_cls("ode_distill_vid")(cfg)
    state = trainer.train(max_steps=2)
    assert int(state.step) == 2
    for leaf in jax.tree.leaves(state.student_params):
        assert np.isfinite(np.asarray(leaf)).all()
