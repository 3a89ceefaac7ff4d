"""Flash-decode vs dense cached attention — chained-scan re-measure.

The round-2/3 head-to-head (docs/KERNELS.md §2b) was measured per-call
through the axon relay; the round-4 harness discovery (chained-scan,
see §1c) means those absolute numbers carry dispatch overhead. This
re-measures both paths with K iterations chained through a lax.scan
carry (out feeds the next q — no memoization, no laziness, forward
kept live by the carry), at the shipped serve geometries, before the
win-or-delete decision on ops/flash_decode.py (VERDICT r3 item 6).

Usage: python scripts/tpu_decode_rebench.py [S ...]
"""
import sys, pathlib, os, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_tpu_cache")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/jax_tpu_cache")

from owl_audio_exps_tpu.ops.attention import cached_dot_attention
# ops/flash_decode.py was DELETED at round-5 HEAD after losing this
# re-measure (docs/KERNELS.md §2b): dense won at every geometry and the
# in-scan flash program failed remote compilation. This script remains
# as the dense in-scan decode baseline; `git show 953c78f^ --
# owl_audio_exps_tpu/ops/flash_decode.py` recovers the kernel.

H, Dh, Lq = 24, 64, 65
K = 16


def bench(fn, q0, n=3):
    np.asarray(fn(q0))
    ts = []
    for i in range(n):
        qv = q0 * jnp.bfloat16(1.0 + 0.001 * i)
        t0 = time.perf_counter()
        np.asarray(fn(qv))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / K


def run(S, B):
    rs = np.random.RandomState(0)
    q0 = jnp.asarray(rs.randn(B, H, Lq, Dh), jnp.bfloat16)
    kc = jnp.asarray(rs.randn(B, H, S, Dh), jnp.bfloat16)
    vc = jnp.asarray(rs.randn(B, H, S, Dh), jnp.bfloat16)
    kcur = jnp.asarray(rs.randn(B, H, Lq, Dh), jnp.bfloat16)
    vcur = jnp.asarray(rs.randn(B, H, Lq, Dh), jnp.bfloat16)
    valid = jnp.ones((1, Lq, S + Lq), bool)

    # caches/masks enter as ARGUMENTS — closed-over arrays inline into
    # the HLO as literals and blow the relay's request cap (HTTP 413 at
    # S >= 32k; same fix as utils/owl_vae_bridge.py round 5)
    @jax.jit
    def dense_k(q0, kc, vc, kcur, vcur, valid):
        def body(q, _):
            o = cached_dot_attention(q, kc, vc, kcur, vcur, valid)
            return o.astype(q.dtype), ()
        qf, _ = jax.lax.scan(body, q0, None, length=K)
        return jnp.sum(qf.astype(jnp.float32))

    td = bench(lambda q: dense_k(q, kc, vc, kcur, vcur, valid), q0)
    bw = (2 * B * H * S * Dh * 2) / 1e9      # K+V bytes read, GB
    print(f"S={S:6d} B={B}: dense {td*1e3:7.3f} ms ({bw/td:.0f} GB/s)")


if __name__ == "__main__":
    sizes = [int(s) for s in sys.argv[1:]] or [32768, 98304]
    for S in sizes:
        for B in (1, 8):
            run(S, B)
