"""Band v1 head-group / sub-row sweep + chunked-XLA baseline.

The band2 sweep showed total time tracks GRID STEP COUNT more than
wide-column work (fit: ~17 us fixed per (head, chunk) step at C=1024).
If so, the lever is FATTER steps: hg > 1 (amortize refill across
heads) with smaller sub (bound the logits tiles). This sweeps
OWL_BAND_HG x OWL_BAND_SUB for v1 at the shipped geometries, plus the
chunked-XLA local attention (ops/local.py) as an XLA-fusion baseline.

Usage: python scripts/tpu_band_hg_sweep.py [dit16k|av384|dit65k ...]
"""
import sys, pathlib, os, time, itertools
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_tpu_cache")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/jax_tpu_cache")

GEOS = {
    "dit16k": (16384, 64, 16, 24, 64, 1),
    "dit65k": (65536, 64, 16, 24, 64, 4),
    "av384": (24960, 65, 8, 24, 64, 1),
}
BOUND = 64.0 ** 0.5


def bench(fn, qs, k, v, n=5):
    np.asarray(fn(qs[0], k, v))
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        np.asarray(fn(qs[1 + i], k, v))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def gsum(loss):
    def f(q, k, v):
        gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        return (jnp.sum(gq.astype(jnp.float32))
                + jnp.sum(gk.astype(jnp.float32))
                + jnp.sum(gv.astype(jnp.float32)))
    return jax.jit(f)


def run(name):
    from owl_audio_exps_tpu.ops import band as band_mod
    from owl_audio_exps_tpu.ops.band import band_attention
    from owl_audio_exps_tpu.ops.local import (chunked_local_attention,
                                              chunked_local_available)
    L, tpf, win, H, Dh, hc = GEOS[name]
    C = win * tpf
    rs = np.random.RandomState(0)
    N = 6
    base = jnp.asarray(rs.randn(1, H, L, Dh), jnp.bfloat16)
    qs = [base * jnp.bfloat16(1.0 + 0.001 * i) for i in range(N + 1)]
    k = jnp.asarray(rs.randn(1, H, L, Dh), jnp.bfloat16)
    v = jnp.asarray(rs.randn(1, H, L, Dh), jnp.bfloat16)

    def v1_loss(q, k, v):
        return jnp.sum(band_attention(
            q, k, v, tpf, win, head_chunks=hc,
            logit_bound=BOUND).astype(jnp.float32))

    t_base = bench(gsum(v1_loss), qs, k, v)
    print(f"{name}: v1 default            {t_base*1e3:8.2f} ms")

    subs = sorted({s for s in (64, 128, 256, 520, C)
                   if s <= C and C % s == 0 and s % 8 == 0})
    for hg, sub in itertools.product((2, 4, 8), subs):
        if H % hg:
            continue
        os.environ["OWL_BAND_HG"] = str(hg)
        os.environ["OWL_BAND_SUB"] = str(sub)
        try:
            t = bench(gsum(v1_loss), qs, k, v)
            print(f"{name}: v1 hg={hg} sub={sub:4d}     {t*1e3:8.2f} ms "
                  f"({(1 - t/t_base)*100:+.1f}%)")
        except Exception as ex:
            print(f"{name}: v1 hg={hg} sub={sub:4d} FAILED "
                  f"{type(ex).__name__}: {str(ex)[:100]}")
        finally:
            os.environ.pop("OWL_BAND_HG", None)
            os.environ.pop("OWL_BAND_SUB", None)

    if chunked_local_available(L, tpf, win, True):
        def ch_loss(q, k, v):
            return jnp.sum(chunked_local_attention(
                q, k, v, tpf, win).astype(jnp.float32))
        try:
            t = bench(gsum(ch_loss), qs, k, v)
            print(f"{name}: chunked-XLA           {t*1e3:8.2f} ms "
                  f"({(1 - t/t_base)*100:+.1f}%)")
        except Exception as ex:
            print(f"{name}: chunked-XLA FAILED {type(ex).__name__}: "
                  f"{str(ex)[:100]}")


if __name__ == "__main__":
    for n in (sys.argv[1:] or ["dit16k", "av384"]):
        run(n)
