"""Torch audio-VAE checkpoint import parity (VERDICT r4 item 7).

A randomly-initialized torch mirror (audio_vae_torch_mirror.py) stands
in for a trained owl-vaes audio checkpoint (submodule empty — SURVEY.md
intro; reference consumption: owl_wms/utils/owl_vae_bridge.py:104-120).
import_audio_vae must reproduce the torch forward to <= 1e-3 on both
the encode and decode paths, mirroring the DCAE harness
(tests/test_dcae.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from audio_vae_torch_mirror import AudioVAE as TorchAudioVAE  # noqa: E402
from owl_audio_exps_tpu.nn.audio_vae import AudioVAE  # noqa: E402
from owl_audio_exps_tpu.utils.torch_import import (  # noqa: E402
    import_audio_vae, assert_tree_matches)

T = 735 * 4  # 4 latents


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    tm = TorchAudioVAE().eval()
    sd = {k: v.float().numpy() for k, v in tm.state_dict().items()}
    params = import_audio_vae(sd)
    fm = AudioVAE(dtype=jnp.float32)
    rs = np.random.RandomState(0)
    x = rs.randn(2, T, 2).astype(np.float32) * 0.5
    ref_shapes = fm.init(jax.random.key(0), jnp.asarray(x))["params"]
    assert_tree_matches(params, jax.tree.map(np.asarray, ref_shapes))
    return tm, fm, params, x


def test_audio_vae_encode_parity(pair):
    tm, fm, params, x = pair
    with torch.no_grad():
        z_t = tm.encoder(torch.from_numpy(x)).float().numpy()
    z_f = np.asarray(fm.apply({"params": params}, jnp.asarray(x),
                              method=fm.encode))
    assert z_t.shape == z_f.shape == (2, 4, 64)
    np.testing.assert_allclose(z_f, z_t, atol=1e-3)


def test_audio_vae_decode_parity(pair):
    tm, fm, params, x = pair
    rs = np.random.RandomState(1)
    z = rs.randn(2, 4, 64).astype(np.float32)
    with torch.no_grad():
        w_t = tm.decoder(torch.from_numpy(z)).float().numpy()
    w_f = np.asarray(fm.apply({"params": params}, jnp.asarray(z),
                              method=fm.decode))
    assert w_t.shape == w_f.shape == (2, T, 2)
    np.testing.assert_allclose(w_f, w_t, atol=1e-3)


def test_audio_vae_roundtrip_parity(pair):
    tm, fm, params, x = pair
    with torch.no_grad():
        r_t, _ = tm(torch.from_numpy(x))
    r_f, _ = fm.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(r_f), r_t.float().numpy(),
                               atol=1e-3)
