"""int8-quantized KV cache (nn/kv_cache.py, ``kv_quant: int8``).

The quantized ring must (a) round-trip writes within the int8
granularity, (b) keep every ring mechanic (eviction, drop-newest,
split local ring) identical to the bf16 cache, and (c) leave cached
decode outputs within quantization tolerance of the unquantized path —
the serve-facing guarantee. The reference has no analogue (its cache is
concat-grown bf16, owl_wms/nn/kv_cache.py); this is a TPU-serve memory/
bandwidth capability: ~0.52x ring bytes, half the HBM read traffic on
the bandwidth-bound long-ring path (PERF.md 98k ring).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from owl_audio_exps_tpu.configs import transformer_config
from owl_audio_exps_tpu.models.audiorft import AudioRFTCore
from owl_audio_exps_tpu.nn.kv_cache import KVCache

F32 = jnp.float32


def audio_cfg(**kw):
    base = dict(model_id="audio_rft", n_layers=2, n_heads=2, d_model=32,
                channels=8, tokens_per_frame=1, n_frames=16, sample_size=16,
                causal=True, uncond=True, has_audio=True, rope_impl="audio1d",
                local_window=4, global_window=None, cfg_prob=0.0,
                backbone="dit")
    base.update(kw)
    return transformer_config(**base)


def _roundtrip_err(orig, deq):
    """max |err| / per-row amax — int8 symmetric quant bounds this by
    ~1/(2*127) plus scale-storage rounding."""
    amax = np.abs(orig).max(axis=-1, keepdims=True)
    return (np.abs(deq - orig) / np.maximum(amax, 1e-8)).max()


def test_quant_roundtrip_single_ring():
    cache = KVCache.create(n_layers=2, batch_size=1, capacity=8,
                           n_heads=2, head_dim=16, tokens_per_frame=1,
                           dtype=F32, quant=True)
    assert cache.quantized and cache.k.dtype == jnp.int8
    rs = np.random.RandomState(0)
    new = jnp.asarray(rs.randn(2, 1, 2, 6, 16) * 3.0, F32)
    newv = jnp.asarray(rs.randn(2, 1, 2, 6, 16), F32)
    cache = cache.update_all(new, newv).advance(6)
    k, v = cache.read_layer(0)
    assert k.dtype == F32
    assert _roundtrip_err(np.asarray(new[0]),
                          np.asarray(k[:, :, :6])) < 0.006
    assert _roundtrip_err(np.asarray(newv[0]),
                          np.asarray(v[:, :, :6])) < 0.006


def test_quant_ring_mechanics_match_unquantized():
    """Eviction/drop/advance counters and window contents track the
    bf16 twin exactly (values within quant tolerance)."""
    kw = dict(n_layers=1, batch_size=1, capacity=6, n_heads=1, head_dim=8,
              tokens_per_frame=2, dtype=F32)
    ref = KVCache.create(**kw)
    qnt = KVCache.create(**kw, quant=True)
    rs = np.random.RandomState(1)
    for step in range(5):  # wraps the 6-slot ring
        nk = jnp.asarray(rs.randn(1, 1, 1, 2, 8), F32)
        nv = jnp.asarray(rs.randn(1, 1, 1, 2, 8), F32)
        ref = ref.update_all(nk, nv).advance(2)
        qnt = qnt.update_all(nk, nv).advance(2)
    ref, qnt = ref.pop_oldest(1), qnt.pop_oldest(1)
    ref, qnt = ref.drop_newest(1), qnt.drop_newest(1)
    for attr in ("start", "length", "rope_offset"):
        assert int(getattr(ref, attr)) == int(getattr(qnt, attr)), attr
    rk, rv = ref.read_layer(0)
    qk, qv = qnt.read_layer(0)
    # compare the valid window slot-for-slot
    rel = np.asarray(ref.slot_rel_idx())
    valid = rel < int(ref.length)
    assert _roundtrip_err(np.asarray(rk)[:, :, valid],
                          np.asarray(qk)[:, :, valid]) < 0.006
    assert _roundtrip_err(np.asarray(rv)[:, :, valid],
                          np.asarray(qv)[:, :, valid]) < 0.006


def test_quant_gather_trailing_matches():
    """The decode local-window read (shadow-mirrored slice) dequantizes
    only the gathered window and matches the bf16 twin."""
    kw = dict(n_layers=2, batch_size=1, capacity=12, n_heads=2, head_dim=8,
              tokens_per_frame=1, dtype=F32, shadow=4)
    ref = KVCache.create(**kw)
    qnt = KVCache.create(**kw, quant=True)
    rs = np.random.RandomState(2)
    for _ in range(15):  # wrap => the shadow mirror is exercised
        nk = jnp.asarray(rs.randn(2, 1, 2, 1, 8), F32)
        nv = jnp.asarray(rs.randn(2, 1, 2, 1, 8), F32)
        ref = ref.update_all(nk, nv).advance(1)
        qnt = qnt.update_all(nk, nv).advance(1)
    rk, rv, rvalid = ref.gather_trailing(1, 4, local=False)
    qk, qv, qvalid = qnt.gather_trailing(1, 4, local=False)
    np.testing.assert_array_equal(np.asarray(rvalid), np.asarray(qvalid))
    assert _roundtrip_err(np.asarray(rk), np.asarray(qk)) < 0.006
    assert _roundtrip_err(np.asarray(rv), np.asarray(qv)) < 0.006


@pytest.mark.parametrize("decoding", [False, True])
def test_quant_cached_decode_close_to_unquantized(decoding):
    """Model-level guarantee: a cached decode on the int8 ring stays
    within quantization tolerance of the bf16-ring decode (split local
    ring engages via from_config's auto routing: local span 4 <= 256)."""
    cfg = audio_cfg()
    core = AudioRFTCore(cfg, dtype=F32)
    rs = np.random.RandomState(3)
    n = 12
    x = jnp.asarray(rs.randn(2, n, 8), F32)
    t = jnp.asarray(rs.rand(2, n), F32)
    params = core.init(jax.random.key(0), x, t)

    def run(quant_cfg):
        cache = KVCache.from_config(quant_cfg, batch_size=2,
                                    capacity_frames=16, dtype=F32)
        def fn(p, xa, ta, xb, tb, c):
            _, c = core.apply(p, xa, ta, kv_cache=c, write=True)
            out, _ = core.apply(p, xb, tb, kv_cache=c, decoding=decoding)
            return out
        return jax.jit(fn)(params, x[:, :n - 1], t[:, :n - 1],
                           x[:, n - 1:], t[:, n - 1:], cache), cache

    want, c_ref = run(cfg)
    qcfg = audio_cfg(kv_quant="int8")
    got, c_q = run(qcfg)
    assert not c_ref.quantized and c_q.quantized
    assert c_q.split == c_ref.split  # same ring topology either way
    err = np.abs(np.asarray(got) - np.asarray(want)).max()
    scale = np.abs(np.asarray(want)).max()
    assert err < 0.05 * max(scale, 1.0), (err, scale)
    assert np.isfinite(np.asarray(got)).all()


def test_quant_sampler_end_to_end():
    """audio_caching sampler runs on the int8 ring: finite, deterministic,
    and close to the bf16-ring generation."""
    from owl_audio_exps_tpu.sampling import get_sampler_cls
    cfg = audio_cfg(n_frames=32)
    core = AudioRFTCore(cfg, dtype=F32)
    xz = jnp.zeros((1, 8, 8), F32)
    tz = jnp.zeros((1, 8), F32)
    params = core.init(jax.random.key(0), xz, tz)

    sampler = get_sampler_cls("audio_caching")(n_steps=2, num_tokens=6,
                                               noise_prev=0.2)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8), F32)
    want = sampler(core, params, x, jax.random.key(1))

    qcfg = audio_cfg(n_frames=32, kv_quant="int8")
    qcore = AudioRFTCore(qcfg, dtype=F32)
    got = sampler(qcore, params, x, jax.random.key(1))
    assert got.shape == want.shape
    assert np.isfinite(np.asarray(got)).all()
    # same rng, same weights: generations diverge only by quant noise
    err = np.abs(np.asarray(got) - np.asarray(want)).max()
    assert err < 0.25, err
    # determinism on the quantized path
    got2 = sampler(qcore, params, x, jax.random.key(1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(got2))
