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
