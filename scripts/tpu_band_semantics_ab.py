"""Band kernel dimension-semantics + fwd/bwd split A/B.

The band2 sweep fit ~17 us of FIXED cost per (head, chunk) grid step.
One candidate cause: the forward grid is declared ("parallel",
"arbitrary") although it never revisits an output block — "arbitrary"
may constrain Mosaic's cross-step pipelining. This measures v1
forward-only under both semantics, plus the fused backward alone, to
locate where the fixed cost lives.

Usage: python scripts/tpu_band_semantics_ab.py [dit16k|av384|dit65k]
"""
import sys, pathlib, os, time, functools
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_tpu_cache")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/jax_tpu_cache")

from owl_audio_exps_tpu.ops import band

GEOS = {
    "dit16k": (16384, 64, 16, 24, 64),
    "dit65k": (65536, 64, 16, 24, 64),
    "av384": (24960, 65, 8, 24, 64),
}
BOUND = 64.0 ** 0.5


def bench(fn, qs, *rest, n=5):
    np.asarray(fn(qs[0], *rest))
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        np.asarray(fn(qs[1 + i], *rest))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def fwd_with_semantics(sem):
    """Rebuild v1's forward pallas_call with given dimension semantics."""
    def f(q, k, v, tpf, window):
        H, L, Dh = q.shape
        C = window * tpf
        nc = L // C
        hg = band._head_group(H, C, Dh, 6)
        cur = pl.BlockSpec((hg, C, Dh), lambda g, i: (g, i, 0))
        prev = pl.BlockSpec((hg, C, Dh),
                            lambda g, i: (g, jnp.maximum(i - 1, 0), 0))
        return pl.pallas_call(
            functools.partial(band._fwd_kernel, tpf=tpf, window=window,
                              sub=band._sub_rows(C), hg=hg, bound=BOUND),
            grid=(H // hg, nc),
            in_specs=[cur, prev, cur, prev, cur],
            out_specs=cur,
            out_shape=jax.ShapeDtypeStruct((H, L, Dh), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=sem),
        )(q, k, k, v, v)
    return f


def run(name):
    L, tpf, win, H, Dh = GEOS[name]
    C = win * tpf
    rs = np.random.RandomState(0)
    N = 6
    base = jnp.asarray(rs.randn(H, L, Dh), jnp.bfloat16)
    qs = [base * jnp.bfloat16(1.0 + 0.001 * i) for i in range(N + 1)]
    k = jnp.asarray(rs.randn(H, L, Dh), jnp.bfloat16)
    v = jnp.asarray(rs.randn(H, L, Dh), jnp.bfloat16)
    scale = jnp.bfloat16(Dh ** -0.5)

    for sem in (("parallel", "arbitrary"), ("parallel", "parallel"),
                ("arbitrary", "arbitrary")):
        fwd = fwd_with_semantics(sem)
        f = jax.jit(lambda q, k, v: jnp.sum(
            fwd((q * scale).astype(q.dtype), k, v, tpf, win)
            .astype(jnp.float32)))
        try:
            t = bench(f, qs, k, v)
            print(f"{name}: fwd {str(sem):28s} {t*1e3:8.2f} ms")
        except Exception as ex:
            print(f"{name}: fwd {str(sem):28s} FAILED "
                  f"{type(ex).__name__}: {str(ex)[:80]}")

    # fused backward alone (residuals fixed, cotangent varies)
    g = jax.jit(lambda dy, q, k, v: jnp.sum(
        band._bwd(tpf, win, False, BOUND,
                  ((q * scale).astype(q.dtype), k, v), dy)[0]
        .astype(jnp.float32)))
    t = bench(g, qs, qs[0], k, v)
    print(f"{name}: bwd (fused, arbitrary)       {t*1e3:8.2f} ms")


if __name__ == "__main__":
    for n in (sys.argv[1:] or ["dit16k", "av384"]):
        run(n)
