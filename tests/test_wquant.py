"""Weight-only int8 serving (nn/wquant.py): quantization error bounds,
model-forward closeness, scan-stacked kernels, sampler end-to-end."""

import numpy as np
import jax
import jax.numpy as jnp

from owl_audio_exps_tpu.configs import transformer_config
from owl_audio_exps_tpu.models.audiorft import AudioRFTCore
from owl_audio_exps_tpu.nn.wquant import (quantize_kernel,
                                          dequantize_kernel,
                                          quantize_params_int8)
from owl_audio_exps_tpu.sampling.audio_caching import AudioCachingSampler
from owl_audio_exps_tpu.utils.layer_stacking import convert_params

F32 = jnp.float32


def audio_cfg(**over):
    base = dict(model_id="audio_rft", n_layers=4, n_heads=2, d_model=64,
                channels=8, tokens_per_frame=1, n_frames=32, sample_size=32,
                causal=True, uncond=True, has_audio=True,
                rope_impl="audio1d", local_window=4, global_window=None,
                cfg_prob=0.0, backbone="dit", local_idx=4)
    base.update(over)
    return transformer_config(**base)


def test_roundtrip_error_bound():
    rs = np.random.RandomState(0)
    w = jnp.asarray(rs.randn(128, 512) * 0.05, F32)
    qk = quantize_kernel(w)
    assert qk["q"].dtype == jnp.int8 and qk["q"].shape == w.shape
    assert qk["s"].shape == (1, 512)
    wd = dequantize_kernel(qk, F32)
    # symmetric per-channel: error <= s/2 per element, s = amax/127
    amax = np.max(np.abs(np.asarray(w)), axis=0, keepdims=True)
    bound = np.asarray(amax, np.float32) / 127.0 * 0.51 + 1e-6
    # bf16 scale rounding adds <= 2^-8 relative on top
    assert (np.abs(np.asarray(wd - w)) <= bound * 1.01).all()


def test_selective_quantization():
    rs = np.random.RandomState(1)
    params = {
        "big": {"kernel": jnp.asarray(rs.randn(512, 512), F32),
                "bias": jnp.zeros((512,), F32)},
        "small": {"kernel": jnp.asarray(rs.randn(8, 8), F32)},
        "emb": {"w": jnp.asarray(rs.randn(512, 512), F32)},
    }
    out = quantize_params_int8(params)
    assert out["big"]["kernel"]["q"].dtype == jnp.int8
    assert out["small"]["kernel"].dtype == F32      # below min_elems
    assert out["emb"]["w"].dtype == F32             # not named kernel
    assert out["big"]["bias"].dtype == F32


def test_model_forward_close():
    cfg = audio_cfg()
    core = AudioRFTCore(cfg, dtype=F32)
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(2, 16, 8), F32)
    t = jnp.asarray(rs.rand(2, 16), F32)
    params = core.init(jax.random.key(0), x, t)["params"]
    pq = quantize_params_int8(params, min_elems=1024)

    out, _ = jax.jit(lambda p: core.apply({"params": p}, x, t))(params)
    out_q, _ = jax.jit(lambda p: core.apply({"params": p}, x, t))(pq)
    a, b = np.asarray(out).ravel(), np.asarray(out_q).ravel()
    cos = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > 0.995, f"quantized forward diverged: cos={cos}"
    assert np.isfinite(b).all()


def test_scan_stacked_kernels():
    cfg_u = audio_cfg(n_layers=4)
    cfg_s = audio_cfg(n_layers=4, scan_layers=True)
    core_u = AudioRFTCore(cfg_u, dtype=F32)
    core_s = AudioRFTCore(cfg_s, dtype=F32)
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(1, 8, 8), F32)
    t = jnp.asarray(rs.rand(1, 8), F32)
    params_u = core_u.init(jax.random.key(0), x, t)["params"]
    params_s = convert_params(params_u, to_scanned=True, n_layers=4)
    # stacked [L, in, out] kernels quantize along the right axis and the
    # scan slices the {"q","s"} dict per layer
    pq_s = quantize_params_int8(params_s, min_elems=1024)
    pq_u = quantize_params_int8(params_u, min_elems=1024)
    out_s, _ = jax.jit(lambda p: core_s.apply({"params": p}, x, t))(pq_s)
    out_u, _ = jax.jit(lambda p: core_u.apply({"params": p}, x, t))(pq_u)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_u),
                               atol=2e-5)


def test_sampler_end_to_end():
    cfg = audio_cfg()
    core = AudioRFTCore(cfg, dtype=F32)
    rs = np.random.RandomState(4)
    x = jnp.asarray(rs.randn(1, 8, 8), F32)
    t0 = jnp.zeros((1, 8), F32)
    params = core.init(jax.random.key(0), x, t0)["params"]
    pq = quantize_params_int8(params, min_elems=1024)
    sampler = AudioCachingSampler(n_steps=2, num_tokens=4, noise_prev=0.2,
                                  custom_schedule=[1.0, 0.5], max_window=8)
    out = sampler(core, {"params": pq}, x, jax.random.key(1))
    assert out.shape == (1, 12, 8)
    assert np.isfinite(np.asarray(out)).all()
