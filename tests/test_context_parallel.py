"""Context parallelism == full-sequence attention (8-device CPU mesh).

parallel/context.py shards the sequence over a mesh axis: local-window
layers do a one-chunk halo exchange, global causal layers run ring
attention with exact logsumexp merging. Both must match the dense
full-sequence oracle, forward and gradients.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from owl_audio_exps_tpu.ops.attention import dot_attention
from owl_audio_exps_tpu.ops.masks import dense_mask
from owl_audio_exps_tpu.parallel.context import shard_attention

B, H, DH = 1, 2, 8
TPF = 4


def _mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), ("seq",))


def _qkv(rs, L):
    return tuple(jnp.asarray(rs.randn(B, H, L, DH), jnp.float32)
                 for _ in range(3))


def _oracle(q, k, v, window):
    L = q.shape[2]
    return dot_attention(q, k, v, dense_mask(L, TPF, window, None, 0, True))


@pytest.mark.parametrize("n_shards,window", [
    (2, 2), (3, 2), (4, 2), (8, 2),        # local halo
    (2, None), (3, None), (4, None), (8, None),  # global ring
])
def test_matches_full_sequence(n_shards, window):
    rs = np.random.RandomState(n_shards)
    # per-shard length: 2 chunks of C = window*tpf (local needs >= 2)
    per = 2 * (window or 2) * TPF
    L = n_shards * per
    q, k, v = _qkv(rs, L)
    mesh = _mesh(n_shards)

    want = _oracle(q, k, v, window)
    fn = jax.jit(lambda q, k, v: shard_attention(mesh, "seq")(
        q, k, v, TPF, window))
    got = fn(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


@pytest.mark.parametrize("window", [2, None])
def test_gradients_match_full_sequence(window):
    n_shards = 4
    rs = np.random.RandomState(7)
    per = 2 * (window or 2) * TPF
    L = n_shards * per
    q, k, v = _qkv(rs, L)
    gw = jnp.asarray(rs.randn(B, H, L, DH), jnp.float32)
    mesh = _mesh(n_shards)

    def loss_sp(q, k, v):
        return jnp.vdot(shard_attention(mesh, "seq")(
            q, k, v, TPF, window), gw)

    def loss_full(q, k, v):
        return jnp.vdot(_oracle(q, k, v, window), gw)

    g = jax.jit(jax.grad(loss_sp, argnums=(0, 1, 2)))(q, k, v)
    gd = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g, gd):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-4, rtol=3e-4,
            err_msg=f"d{name} mismatch (window={window})")


@pytest.mark.parametrize("n_shards,sp_bwd", [
    (2, "fused"), (4, "fused"),
    (2, "splash"), (4, "splash"), (4, "dense")])
def test_ring_splash_partial_matches_oracle(n_shards, sp_bwd, monkeypatch):
    """The splash-kernel ring partial (save_residuals fwd; bwd on any
    engine — the fused di-shift backward, the splash lse-cotangent
    decomposition, or the dense vjp) == the dense ring == the
    full-sequence oracle, fwd and grads.
    Runs the real Pallas kernel in interpret mode on the CPU mesh."""
    monkeypatch.setenv("OWL_SP_GLOBAL", "splash_interpret")
    monkeypatch.setenv("OWL_SP_BWD", sp_bwd)
    rs = np.random.RandomState(21)
    per = 4 * TPF
    L = n_shards * per
    q, k, v = _qkv(rs, L)
    gw = jnp.asarray(rs.randn(B, H, L, DH), jnp.float32)
    mesh = _mesh(n_shards)

    def loss_sp(q, k, v):
        return jnp.vdot(shard_attention(mesh, "seq")(
            q, k, v, TPF, None), gw)

    want = _oracle(q, k, v, None)
    got = jax.jit(lambda q, k, v: shard_attention(mesh, "seq")(
        q, k, v, TPF, None))(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)

    g = jax.jit(jax.grad(loss_sp, argnums=(0, 1, 2)))(q, k, v)
    gd = jax.grad(lambda q, k, v: jnp.vdot(_oracle(q, k, v, None), gw),
                  argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g, gd):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-4, rtol=3e-4,
            err_msg=f"d{name} mismatch (splash ring partial)")


def test_sharded_inputs_stay_sharded():
    """shard_attention consumes and produces seq-sharded arrays without
    gathering the sequence axis (the whole point)."""
    n_shards = 8
    rs = np.random.RandomState(3)
    per = 2 * 2 * TPF
    L = n_shards * per
    q, k, v = _qkv(rs, L)
    mesh = _mesh(n_shards)
    sh = NamedSharding(mesh, P(None, None, "seq", None))
    q, k, v = (jax.device_put(a, sh) for a in (q, k, v))
    out = jax.jit(lambda q, k, v: shard_attention(mesh, "seq")(
        q, k, v, TPF, 2))(q, k, v)
    assert out.sharding.is_equivalent_to(sh, out.ndim)


def test_model_forward_matches_non_sp():
    """GameRFT forward with sequence_parallel over a seq-axis mesh ==
    the plain dense forward on identical params."""
    from owl_audio_exps_tpu.configs import transformer_config
    from owl_audio_exps_tpu.models.gamerft import GameRFT
    from owl_audio_exps_tpu.parallel.mesh import make_mesh, MeshConfig

    base = dict(
        model_id="game_rft", sample_size=2, channels=4, n_layers=2,
        n_heads=2, d_model=32, tokens_per_frame=4, n_buttons=3,
        cfg_prob=0.0, n_frames=16, causal=True, uncond=False,
        backbone="dit", has_audio=False, rope_impl="ortho",
        local_window=2, global_window=None)
    rs = np.random.RandomState(11)
    x = jnp.asarray(rs.randn(2, 16, 4, 2, 2), jnp.float32)
    mouse = jnp.asarray(rs.randn(2, 16, 2), jnp.float32)
    btn = jnp.asarray(rs.rand(2, 16, 3) > 0.5, jnp.float32)

    ref_model = GameRFT(transformer_config(**base), dtype=jnp.float32)
    rngs = {"params": jax.random.key(0), "noise": jax.random.key(1)}
    params = ref_model.init(rngs, x, mouse, btn)["params"]

    def run(model):
        return model.apply({"params": params}, x, mouse, btn,
                           rngs={"noise": jax.random.key(2)})

    want = run(ref_model)
    try:
        make_mesh(MeshConfig(seq=4))     # data absorbs the rest
        sp_model = GameRFT(
            transformer_config(**base, sequence_parallel=True),
            dtype=jnp.float32)
        got = run(sp_model)
    finally:
        make_mesh(MeshConfig())          # restore the default mesh
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


@pytest.mark.slow
def test_cp_training_converges_and_matches_single_device(tmp_path):
    """Context parallelism TRAINS, not just steps: the dit_v4_98k_sp
    axes (seq-sharded mesh + scan_layers + group remat + Muon) at
    scaled-down geometry run 50 steps on the virtual mesh; the loss must
    decrease and match a seq=1 run of the identical config at tolerance
    (VERDICT r2 item 9; production config configs/dit_v4_98k_sp.yml,
    reference context target configs/dit_v4.yml:15)."""
    import json
    import os
    from owl_audio_exps_tpu.configs import Config
    from owl_audio_exps_tpu.parallel.mesh import make_mesh, MeshConfig
    from owl_audio_exps_tpu.trainers import get_trainer_cls

    def cfg_dict(seq, run_name):
        return {
            "model": {
                "model_id": "game_rft", "sample_size": 2, "channels": 4,
                "n_layers": 4, "n_heads": 2, "d_model": 32,
                "tokens_per_frame": 4, "n_buttons": 3, "cfg_prob": 0.0,
                "n_frames": 16, "causal": True, "uncond": False,
                "backbone": "dit", "has_audio": False,
                "rope_impl": "motion", "rope_ats_delta": 2.0,
                "local_window": 2, "global_window": None,
                "sequence_parallel": seq > 1,
                "gradient_checkpointing": True,
                "remat_granularity": "group", "scan_layers": True,
            },
            "train": {
                "trainer_id": "rft", "data_id": "synthetic_latent",
                "data_kwargs": {"window_length": 16, "channels": 4,
                                "sample_size": 2, "n_buttons": 3},
                "target_batch_size": 2, "batch_size": 2, "epochs": 1,
                "opt": "Muon",
                "opt_kwargs": {"lr": 1e-3, "momentum": 0.95,
                               "adamw_lr": 1e-3,
                               "adamw_keys": ["t_embed", "control_embed",
                                              "proj_in", "proj_out",
                                              "adaln", "gate"]},
                "scheduler": None, "log_interval": 5,
                "checkpoint_dir": str(tmp_path / f"ckpt_{run_name}"),
                "save_interval": 10000, "sample_interval": 10000,
                "vae_scale": 1.0,
                # seq=1 ctor gets a full-pool placeholder mesh; run()
                # swaps in the 2-device data-only mesh before training
                "mesh": ({"data": 2, "seq": seq} if seq > 1
                         else {"data": -1}),
            },
            "wandb": {"run_name": run_name},
        }

    def run(seq):
        name = f"cp_conv_{seq}_{os.getpid()}"
        trainer = get_trainer_cls("rft")(Config.from_dict(
            cfg_dict(seq, name)))
        if seq == 1:
            # the no-CP reference run lives on a 2-device data-only mesh
            # (the full 8-device pool must be covered otherwise; subset
            # meshes are the __graft_entry__ restricted-mesh pattern)
            from owl_audio_exps_tpu.parallel.mesh import batch_sharding
            trainer.mesh = make_mesh(MeshConfig(data=2),
                                     devices=jax.devices()[:2])
            trainer.batch_sharding = batch_sharding(trainer.mesh)
        try:
            trainer.train(max_steps=50)
        finally:
            make_mesh(MeshConfig())  # restore the default mesh
        with open(os.path.join("runs", f"{name}.jsonl")) as f:
            recs = [json.loads(l) for l in f if l.strip()]
        return [r["diffusion_loss"] for r in recs
                if "diffusion_loss" in r]

    losses_cp = run(4)
    losses_ref = run(1)
    assert len(losses_cp) >= 5
    # it trains: the synthetic targets are unlearnable noise, but the
    # model still fits the conditional mean — early >> late loss
    assert np.mean(losses_cp[-2:]) < np.mean(losses_cp[:2])
    # and it computes the same optimization trajectory as seq=1
    np.testing.assert_allclose(losses_cp, losses_ref, rtol=2e-2)
