"""Band v1 (masked [C,2C] body) vs frame-exact (fw) body A/B.

Per-layer attention fwd+bwd at the shipped geometries with the
chained-scan harness (see scripts/tpu_band2_sweep.py docstring for the
three axon-relay gotchas this guards against: execution memoization,
lazy block_until_ready, and grad-of-sum forward-DCE).

The fw bodies compute per-query-frame exact windows — no visibility
masks, no 2C logit width — at the cost of sublane-misaligned VMEM
slices for ragged tpf (ops/band._fwd_kernel_fw). This A/B decides the
OWL_BAND_FW auto policy.

Usage: python scripts/tpu_band_fw_ab.py [geometry ...]
"""
import sys, pathlib, os, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_tpu_cache")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/jax_tpu_cache")

from owl_audio_exps_tpu.ops.band import band_attention

GEOS = {
    # name: (L, tpf, window, H, Dh, head_chunks)
    "av384": (24960, 65, 8, 24, 64, 1),
    "av384w16": (24960, 65, 16, 24, 64, 1),   # the step bench's window
    "av512": (33280, 65, 8, 24, 64, 1),
    "av640": (41600, 65, 8, 24, 64, 1),
    "dit16k": (16384, 64, 16, 24, 64, 1),
    "dit65k": (65536, 64, 16, 24, 64, 4),
    "dit98k": (98304, 64, 16, 24, 64, 4),
}

BOUND = 64.0 ** 0.5
K = 8


def make_stepper(attn_fn, fwd_only=False):
    def loss(q, k, v):
        return jnp.sum(attn_fn(q, k, v).astype(jnp.float32))

    vg = jax.value_and_grad(loss, argnums=(0, 1, 2))

    @jax.jit
    def run(q, k, v):
        def body(carry, _):
            q, acc = carry
            if fwd_only:
                o = attn_fn(q, k, v)
                val = jnp.sum(o.astype(jnp.float32))
                q2 = q + o * jnp.asarray(1e-4, q.dtype)
            else:
                val, (gq, gk, gv) = vg(q, k, v)
                q2 = (q + gq.astype(q.dtype) * jnp.asarray(1e-4, q.dtype)
                      + val.astype(q.dtype) * jnp.asarray(1e-6, q.dtype))
            return (q2, acc + val), None
        (qf, acc), _ = jax.lax.scan(body, (q, jnp.float32(0.0)), None,
                                    length=K)
        return acc + jnp.sum(qf.astype(jnp.float32))
    return run


def bench(fn, qs, k, v, n=3):
    np.asarray(fn(qs[0], k, v))
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        np.asarray(fn(qs[1 + i], k, v))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / K


def run(name):
    L, tpf, win, H, Dh, hc = GEOS[name]
    rs = np.random.RandomState(0)
    base = jnp.asarray(rs.randn(1, H, L, Dh), jnp.bfloat16)
    qs = [base * jnp.bfloat16(1.0 + 0.001 * i) for i in range(5)]
    k = jnp.asarray(rs.randn(1, H, L, Dh), jnp.bfloat16)
    v = jnp.asarray(rs.randn(1, H, L, Dh), jnp.bfloat16)

    for fwd_only in (True, False):
        tag = "fwd    " if fwd_only else "fwd+bwd"
        res = {}
        for fe in (False, True):
            f = make_stepper(
                lambda q, k, v, fe=fe: band_attention(
                    q, k, v, tpf, win, head_chunks=hc,
                    logit_bound=BOUND, frame_exact=fe),
                fwd_only=fwd_only)
            try:
                res[fe] = bench(f, qs, k, v)
            except Exception as ex:
                print(f"{name} {tag} fe={fe} FAILED "
                      f"{type(ex).__name__}: {str(ex)[:120]}")
                res[fe] = float("inf")
        d = (1 - res[True] / res[False]) * 100 if res[False] > 0 else 0
        print(f"{name} {tag}: v1 {res[False]*1e3:8.2f} ms  "
              f"fw {res[True]*1e3:8.2f} ms  ({d:+.1f}%)")


if __name__ == "__main__":
    names = sys.argv[1:] or ["av384", "av512", "dit16k"]
    for n in names:
        run(n)
