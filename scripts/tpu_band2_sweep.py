"""Band v1 vs v2 sweep: per-layer fwd+bwd at the shipped geometries.

v2 (ops/band2.py) shrinks the chunk span to S tokens with m prev refs
((m+1)*S context columns vs v1's 2*C) — docs/KERNELS.md round-4 plan.
This sweep measures the per-layer attention fwd+bwd (the unit the
PERF.md band rows use) for v1 and every legal v2 plan, with the
fixed-shift softmax on (the shipped default: QK rms-norm bounds
logits by sqrt(Dh)).

Measurement discipline (all three axon-relay gotchas bite here):
executions memoize on (executable, args); block_until_ready is lazy;
and a bare grad-of-sum elides the FORWARD kernel entirely (the
custom-vjp residuals are just (q, k, v), so XLA DCEs the fwd
pallas_call — round-4 discovery that invalidated a first sweep).
So: K iterations chained through a lax.scan carry (q_{i+1} depends on
this iteration's loss AND grads) inside ONE jitted call, one scalar
fetched at the end; per-iteration time = wall / K.

Usage: python scripts/tpu_band2_sweep.py [geometry ...]
"""
import sys, pathlib, os, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_tpu_cache")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/jax_tpu_cache")

import sys as _sys
_sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
from chain_harness import make_stepper, bench  # the shared harness
from owl_audio_exps_tpu.ops.band import band_attention
from owl_audio_exps_tpu.ops.band2 import band2_attention, plan_candidates

GEOS = {
    # name: (L, tpf, window, H, Dh, head_chunks)
    "dit16k": (16384, 64, 16, 24, 64, 1),
    "dit65k": (65536, 64, 16, 24, 64, 4),
    "dit98k": (98304, 64, 16, 24, 64, 4),
    "av384": (24960, 65, 8, 24, 64, 1),
    "av512": (33280, 65, 8, 24, 64, 1),
}

BOUND = 64.0 ** 0.5
K = 8          # chained iterations per timed call


def run(name):
    L, tpf, win, H, Dh, hc = GEOS[name]
    rs = np.random.RandomState(0)
    base = jnp.asarray(rs.randn(1, H, L, Dh), jnp.bfloat16)
    qs = [base * jnp.bfloat16(1.0 + 0.001 * i) for i in range(5)]
    k = jnp.asarray(rs.randn(1, H, L, Dh), jnp.bfloat16)
    v = jnp.asarray(rs.randn(1, H, L, Dh), jnp.bfloat16)

    f1 = make_stepper(lambda q, k, v: band_attention(
        q, k, v, tpf, win, head_chunks=hc, logit_bound=BOUND))
    try:
        t1 = bench(f1, qs, k, v)
        print(f"{name}: v1 band fwd+bwd {t1*1e3:8.2f} ms/layer")
    except Exception as ex:
        t1 = float("inf")
        print(f"{name}: v1 band FAILED {type(ex).__name__}: "
              f"{str(ex)[:120]}")

    for S, m in plan_candidates(L, tpf, win):
        f2 = make_stepper(lambda q, k, v, S=S, m=m: band2_attention(
            q, k, v, tpf, win, S, m, head_chunks=hc, logit_bound=BOUND))
        try:
            t2 = bench(f2, qs, k, v)
            print(f"{name}: v2 S={S:4d} m={m}   {t2*1e3:8.2f} ms/layer "
                  f"({(1 - t2 / t1) * 100:+.1f}% vs v1)")
        except Exception as ex:
            print(f"{name}: v2 S={S:4d} m={m} FAILED "
                  f"{type(ex).__name__}: {str(ex)[:120]}")


if __name__ == "__main__":
    names = sys.argv[1:] or list(GEOS)
    for n in names:
        run(n)
