"""Pipeline parallelism (parallel/pipeline.py): the pipelined group
stack must match the plain scan_layers forward and its gradients, and a
full sharded train step must run on a data x pipe mesh.

Runs on the 8-device virtual CPU mesh (conftest).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from owl_audio_exps_tpu.configs import transformer_config, Config
from owl_audio_exps_tpu.models.audiorft import AudioRFTCore
from owl_audio_exps_tpu.parallel.mesh import (make_mesh, MeshConfig,
                                              AXIS_PIPE)

F32 = jnp.float32


def _cfg(pipeline: bool, n_layers=8, local_idx=2):
    return transformer_config(
        model_id="audio_rft", n_layers=n_layers, n_heads=2, d_model=32,
        channels=8, tokens_per_frame=1, n_frames=16, sample_size=16,
        causal=True, uncond=True, has_audio=True, rope_impl="audio1d",
        local_window=4, global_window=None, cfg_prob=0.0, backbone="dit",
        local_idx=local_idx, scan_layers=True,
        pipeline_parallel=pipeline)


@pytest.mark.parametrize("data,pipe,micro", [
    (1, 2, 2), (2, 2, 2), (2, 4, 1), (1, 4, 4),
])
def test_pipelined_forward_matches_scan(data, pipe, micro):
    cfg_s = _cfg(False)
    cfg_p = _cfg(True)
    cfg_p.pipeline_microbatches = micro

    core_s = AudioRFTCore(cfg_s, dtype=F32)
    core_p = AudioRFTCore(cfg_p, dtype=F32)
    rs = np.random.RandomState(0)
    B = 4
    x = jnp.asarray(rs.randn(B, 12, 8), F32)
    t = jnp.asarray(rs.rand(B, 12), F32)
    params = core_s.init(jax.random.key(0), x, t)["params"]

    want, _ = jax.jit(lambda p: core_s.apply({"params": p}, x, t))(params)

    try:
        make_mesh(MeshConfig(data=data, pipe=pipe),
                  devices=jax.devices()[:data * pipe])
        got, _ = jax.jit(
            lambda p: core_p.apply({"params": p}, x, t))(params)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)
    finally:
        make_mesh(MeshConfig())


def test_pipelined_gradients_match_scan():
    cfg_s = _cfg(False)
    cfg_p = _cfg(True)
    cfg_p.pipeline_microbatches = 2

    core_s = AudioRFTCore(cfg_s, dtype=F32)
    core_p = AudioRFTCore(cfg_p, dtype=F32)
    rs = np.random.RandomState(1)
    B = 4
    x = jnp.asarray(rs.randn(B, 12, 8), F32)
    t = jnp.asarray(rs.rand(B, 12), F32)
    params = core_s.init(jax.random.key(0), x, t)["params"]

    def loss(core):
        def f(p):
            out, _ = core.apply({"params": p}, x, t)
            return jnp.mean(out.astype(jnp.float32) ** 2)
        return f

    g_want = jax.jit(jax.grad(loss(core_s)))(params)
    try:
        make_mesh(MeshConfig(data=2, pipe=4))
        g_got = jax.jit(jax.grad(loss(core_p)))(params)
    finally:
        make_mesh(MeshConfig())

    flat_w = jax.tree.leaves(g_want)
    flat_g = jax.tree.leaves(g_got)
    assert len(flat_w) == len(flat_g)
    for a, b in zip(flat_g, flat_w):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-5)


def test_pipeline_rejects_seq():
    """seq > 1 must be rejected loudly (context parallelism is its own
    manual shard_map and cannot nest inside the pipeline region)."""
    from owl_audio_exps_tpu.parallel.pipeline import pipeline_apply
    try:
        mesh = make_mesh(MeshConfig(data=2, seq=2, pipe=2),
                         devices=jax.devices()[:8])
        stacked = {"w": jnp.zeros((2, 4, 4))}
        x = jnp.zeros((4, 8, 4))
        cond = jnp.zeros((4, 8, 4))
        with pytest.raises(AssertionError, match="seq"):
            pipeline_apply(mesh, stacked, x, cond, None, None,
                           lambda gp, h, c, lm, gm: h, 2)
    finally:
        make_mesh(MeshConfig())


@pytest.mark.parametrize("axes", [
    {"data": 2, "tensor": 2, "pipe": 2},
    {"fsdp": 2, "tensor": 2, "pipe": 2},
    {"data": 2, "fsdp": 2, "pipe": 2},
])
def test_pipelined_forward_and_grads_compose_tensor_fsdp(axes):
    """pipe x tensor / pipe x fsdp composition: the shard_map is manual
    over pipe+data only, so GSPMD propagates tensor/fsdp shardings (and
    inserts the row-parallel psums) inside each stage. Forward and grads
    must match the unsharded sequential scan, with params genuinely
    sharded by the path rules."""
    from owl_audio_exps_tpu.parallel.sharding import shard_params

    cfg_s = _cfg(False)
    cfg_p = _cfg(True)
    cfg_p.pipeline_microbatches = 2

    core_s = AudioRFTCore(cfg_s, dtype=F32)
    core_p = AudioRFTCore(cfg_p, dtype=F32)
    rs = np.random.RandomState(2)
    B = 4
    x = jnp.asarray(rs.randn(B, 12, 8), F32)
    t = jnp.asarray(rs.rand(B, 12), F32)
    params = core_s.init(jax.random.key(0), x, t)["params"]

    def loss(core):
        def f(p):
            out, _ = core.apply({"params": p}, x, t)
            return jnp.mean(out.astype(jnp.float32) ** 2)
        return f

    want = jax.jit(lambda p: core_s.apply({"params": p}, x, t)[0])(params)
    g_want = jax.jit(jax.grad(loss(core_s)))(params)
    try:
        mesh = make_mesh(MeshConfig(**axes))
        sharded = shard_params(params, mesh)
        # sanity: at least one qkv kernel is sharded over tensor/fsdp
        flat = jax.tree_util.tree_flatten_with_path(sharded)[0]
        assert any(
            leaf.addressable_shards[0].data.shape != leaf.shape
            for _, leaf in flat), "path rules sharded nothing"
        got = jax.jit(lambda p: core_p.apply({"params": p}, x, t)[0])(
            sharded)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)
        g_got = jax.jit(jax.grad(loss(core_p)))(sharded)
        for a, b in zip(jax.tree.leaves(g_got), jax.tree.leaves(g_want)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5, rtol=5e-5)
    finally:
        make_mesh(MeshConfig())


def test_trainer_step_on_data_pipe_mesh(tmp_path):
    """Full sharded train step (grads + optimizer + EMA) on a
    data=4 x pipe=2 mesh; stacked group params must actually shard over
    the pipe axis."""
    from owl_audio_exps_tpu.trainers import get_trainer_cls
    cfg = Config.from_dict({
        "model": {
            "model_id": "audio_rft", "n_layers": 4, "n_heads": 2,
            "d_model": 32, "channels": 8, "tokens_per_frame": 1,
            "n_frames": 16, "sample_size": 8, "causal": True,
            "uncond": True, "has_audio": True, "rope_impl": "audio1d",
            "local_window": 4, "global_window": None, "cfg_prob": 0.0,
            "backbone": "dit", "local_idx": 2, "scan_layers": True,
            "pipeline_parallel": True, "pipeline_microbatches": 2,
        },
        "train": {
            "trainer_id": "audio_rft", "data_id": "synthetic_audio_latent",
            "data_kwargs": {"window_length": 8, "channels": 8},
            "target_batch_size": 16, "batch_size": 8, "epochs": 1,
            "opt": "AdamW", "opt_kwargs": {"lr": 1e-3},
            "mesh": {"data": 4, "pipe": 2},
            "checkpoint_dir": str(tmp_path / "ckpt"), "save_interval": 100,
            "sample_interval": 1000, "vae_scale": 1.0,
        },
        "wandb": {"run_name": "pipe_step"},
    })
    try:
        trainer = get_trainer_cls("audio_rft")(cfg)
        state = trainer.train(max_steps=1)
        assert int(state.step) == 1
        for leaf in jax.tree.leaves(state.params):
            assert np.isfinite(np.asarray(leaf)).all()
        # the stacked group leaves must be sharded over pipe
        groups = state.params["core"]["transformer"]["groups"]
        leaf = jax.tree.leaves(groups)[0]
        assert AXIS_PIPE in jax.tree.leaves(
            [leaf.sharding.spec])[0:] or any(
            AXIS_PIPE == s or (isinstance(s, tuple) and AXIS_PIPE in s)
            for s in leaf.sharding.spec), leaf.sharding
        shard = leaf.addressable_shards[0].data
        assert shard.shape[0] < leaf.shape[0], (
            "group stack not sharded over pipe")
    finally:
        make_mesh(MeshConfig())
