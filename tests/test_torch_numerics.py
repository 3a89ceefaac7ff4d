"""Numerical parity of primitives against torch (CPU) as the oracle —
supports the sample-fidelity requirement (BASELINE.md): same math, same
results within float tolerance."""

import numpy as np
import torch
import torch.nn.functional as TF
import jax.numpy as jnp

from owl_audio_exps_tpu.ops.norms import rms_norm, layer_norm
from owl_audio_exps_tpu.nn.embeddings import sincos_embed
from owl_audio_exps_tpu.sampling.schedulers import get_sd3_euler

RS = np.random.RandomState(0)


def test_rms_norm_parity():
    x = RS.randn(4, 33).astype(np.float32)
    ours = np.asarray(rms_norm(jnp.asarray(x)))
    theirs = TF.rms_norm(torch.from_numpy(x), (33,)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_layer_norm_parity():
    x = RS.randn(4, 33).astype(np.float32)
    ours = np.asarray(layer_norm(jnp.asarray(x)))
    theirs = TF.layer_norm(torch.from_numpy(x), (33,)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_sincos_embed_parity():
    """theta=300, mult=1000, [sin | cos] halves
    (reference: owl_wms/nn/embeddings.py:30-72)."""
    t = RS.rand(3, 5).astype(np.float32)
    dim = 16
    ours = np.asarray(sincos_embed(jnp.asarray(t), dim))

    # independent torch transcription of the published formula
    tt = torch.from_numpy(t).reshape(-1) * 1000.0
    half = dim // 2
    emb = torch.log(torch.tensor(300.0)) / (half - 1)
    freqs = torch.exp(torch.arange(half) * -emb)
    ang = tt[:, None] * freqs[None, :]
    want = torch.cat([torch.sin(ang), torch.cos(ang)], -1).reshape(3, 5, dim)
    np.testing.assert_allclose(ours, want.numpy(), atol=1e-5)


def test_mouse_polar_math_parity():
    """symlog -> polar conversion (reference: owl_wms/nn/embeddings.py:
    133-148) — check the non-learned math path against torch."""
    x = (RS.randn(2, 4, 2) * 10).astype(np.float32)
    xt = torch.from_numpy(x)
    sym_t = torch.sign(xt) * torch.log1p(torch.abs(xt))
    ang_t = torch.atan2(sym_t[..., 1], sym_t[..., 0]).numpy()
    mag_t = torch.norm(sym_t, dim=-1).numpy()

    xf = jnp.asarray(x)
    sym = jnp.sign(xf) * jnp.log1p(jnp.abs(xf))
    ang = np.asarray(jnp.arctan2(sym[..., 1], sym[..., 0]))
    mag = np.asarray(jnp.linalg.norm(sym, axis=-1))
    np.testing.assert_allclose(ang, ang_t, atol=1e-5)
    np.testing.assert_allclose(mag, mag_t, atol=1e-5)


def test_silu_gelu_parity():
    x = RS.randn(64).astype(np.float32)
    import jax
    np.testing.assert_allclose(np.asarray(jax.nn.silu(jnp.asarray(x))),
                               TF.silu(torch.from_numpy(x)).numpy(),
                               atol=1e-6)


def test_sd3_schedule_matches_flowmatch_formula():
    """sigma' = shift*s/(1+(shift-1)s) over descending s (the diffusers
    FlowMatchEulerDiscreteScheduler math the reference uses)."""
    n = 16
    s = torch.linspace(1, n, n).flip(0) / n
    shifted = 3.0 * s / (1 + 2.0 * s)
    ts = torch.cat([shifted, torch.zeros(1)])
    want = (ts[:-1] - ts[1:]).numpy()
    np.testing.assert_allclose(np.asarray(get_sd3_euler(n)), want,
                               atol=1e-6)
