"""Global (full-causal) splash layer at AV geometries — chained-scan
re-measure, plus the honest step decomposition.

The round-3 AV-384 component isolation (tpu_av_mfu_decompose.py) was
per-call through the relay: its "band x18 = 1.36 s" is inconsistent
with the round-5 chained-harness per-layer numbers (12.37 ms x 18 =
0.22 s). This script re-measures the GLOBAL causal layer the same
honest way so the step decomposition adds up, which determines where
the next AV-384 second actually lives.

Usage: python scripts/tpu_av_global_ab.py [n_frames ...]
"""
import sys, pathlib, os, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_tpu_cache")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/jax_tpu_cache")

from owl_audio_exps_tpu.ops.splash import splash_attention

H, Dh, TPF = 24, 64, 65
K = 8


def make_stepper(attn_fn):
    def loss(q, k, v):
        return jnp.sum(attn_fn(q, k, v).astype(jnp.float32))

    vg = jax.value_and_grad(loss, argnums=(0, 1, 2))

    @jax.jit
    def run(q, k, v):
        def body(carry, _):
            q, acc = carry
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


def run(frames):
    L = frames * TPF
    rs = np.random.RandomState(0)
    base = jnp.asarray(rs.randn(1, H, L, Dh), jnp.bfloat16)
    qs = [base * jnp.bfloat16(1.0 + 0.001 * i) for i in range(5)]
    k = jnp.asarray(rs.randn(1, H, L, Dh), jnp.bfloat16)
    v = jnp.asarray(rs.randn(1, H, L, Dh), jnp.bfloat16)
    f = make_stepper(lambda q, k, v: splash_attention(
        q, k, v, TPF, None, True, None,
        head_chunks=int(os.environ.get("OWL_SPLASH_HEAD_CHUNKS", "4"))))
    t = bench(f, qs, k, v)
    # causal attention flops: ~L^2/2 * Dh * 2 (QK) * 3.5 (fwd+bwd passes)
    print(f"av{frames} global causal splash: {t*1e3:8.2f} ms/layer "
          f"fwd+bwd (L={L})")


if __name__ == "__main__":
    for n in (sys.argv[1:] or ["384", "512"]):
        run(int(n))
