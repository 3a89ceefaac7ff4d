"""Sequenced-remat custom vjp (nn/attn.py DiTGroup._sequenced_block):
gradients must be bit-comparable to plain remat / no remat.

The sequenced form exists for long-context memory: the backward chains
each block's recompute behind the incoming cotangent (optimization
barrier), so the latency-hiding scheduler cannot hold several blocks'
activations at once. Math must be unchanged.
"""

import numpy as np
import jax
import jax.numpy as jnp

from owl_audio_exps_tpu.configs import transformer_config
from owl_audio_exps_tpu.nn.attn import DiTGroup

F32 = jnp.float32


def _cfg(**over):
    base = dict(
        model_id="game_rft", n_layers=4, n_heads=2, d_model=32, channels=4,
        sample_size=2, tokens_per_frame=4, n_frames=8, n_buttons=3,
        causal=False, uncond=True, has_audio=False, rope_impl="ortho",
        local_window=None, global_window=None, cfg_prob=0.0, backbone="dit",
        gradient_checkpointing=True, local_idx=4)
    base.update(over)
    return transformer_config(**base)


def _grads(cfg, params, x, cond):
    grp = DiTGroup(cfg, dtype=F32)

    def loss(p, x):
        y, _ = grp.apply(p, x, cond, None, None, None, False)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    return jax.jit(jax.grad(loss))(params, x)


def test_sequenced_remat_grads_match():
    rs = np.random.RandomState(0)
    n_frames, tpf, d = 8, 4, 32
    x = jnp.asarray(rs.randn(1, n_frames * tpf, d), F32)
    cond = jnp.asarray(rs.randn(1, n_frames, d), F32)

    cfg_plain = _cfg(remat_sequenced=False)
    cfg_seq = _cfg(remat_sequenced=True)

    params = DiTGroup(cfg_plain, dtype=F32).init(
        jax.random.key(0), x, cond, None, None, None, False)

    g_plain = _grads(cfg_plain, params, x, cond)
    g_seq = _grads(cfg_seq, params, x, cond)

    flat_p = jax.tree_util.tree_leaves_with_path(g_plain)
    flat_s = jax.tree.leaves(g_seq)
    assert len(flat_p) == len(flat_s)
    for (path, a), b in zip(flat_p, flat_s):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5,
            err_msg=str(path))


def test_sequenced_forward_matches():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(1, 32, 32), F32)
    cond = jnp.asarray(rs.randn(1, 8, 32), F32)
    cfg_plain = _cfg(remat_sequenced=False)
    cfg_seq = _cfg(remat_sequenced=True)
    params = DiTGroup(cfg_plain, dtype=F32).init(
        jax.random.key(0), x, cond, None, None, None, False)
    y0, _ = DiTGroup(cfg_plain, dtype=F32).apply(
        params, x, cond, None, None, None, False)
    y1, _ = DiTGroup(cfg_seq, dtype=F32).apply(
        params, x, cond, None, None, None, False)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-6, atol=1e-6)
