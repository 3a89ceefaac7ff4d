"""Ring-attention partial A/B on the real chip: splash save_residuals
fwd (dense-vjp bwd) vs the dense lax.map blocked partial, at the 98k
config's per-shard geometry (12,288 tokens/shard on a v5e-8).
"""
import sys, pathlib, os, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_tpu_cache")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/jax_tpu_cache")
from owl_audio_exps_tpu.parallel import context as ctx

L = int(sys.argv[1]) if len(sys.argv) > 1 else 12288
B, H, DH, TPF = 1, 24, 64, 64
rs = np.random.RandomState(0)


def inputs(seed):
    r = np.random.RandomState(seed)
    return (jnp.asarray(r.randn(B, H, L, DH), jnp.bfloat16),
            jnp.asarray(r.randn(B, H, L, DH), jnp.bfloat16),
            jnp.asarray(r.randn(B, H, L, DH), jnp.bfloat16))


def bench(fn, tag):
    # reduce to one scalar and float() it: a hard device sync per timing
    # (block_until_ready alone under-measures through the axon relay)
    red = jax.jit(lambda *a: jax.tree.reduce(
        lambda x, y: x + y,
        jax.tree.map(lambda t: jnp.sum(t.astype(jnp.float32)), fn(*a))))
    # stage varied inputs on device BEFORE timing: the tunnel moves
    # ~113 MB per fresh input set (~600 ms), which would swamp compute
    staged = [jax.block_until_ready(
        jax.tree.map(jax.device_put, inputs(seed))) for seed in range(6)]
    t0 = time.perf_counter()
    float(red(*staged[0]))
    compile_s = time.perf_counter() - t0
    times = []
    for i in range(5):
        t0 = time.perf_counter()
        float(red(*staged[1 + i]))
        times.append(time.perf_counter() - t0)
    print("%-28s %7.2f ms   (compile %.1fs)"
          % (tag, 1e3 * float(np.median(times)), compile_s))


def loss(q, k, v):
    out, lse = ctx._partial_attn(q, k, v, TPF, True)
    return jnp.sum(out.astype(jnp.float32)) + jnp.sum(lse)


for impl in ("dense", "splash"):
    os.environ["OWL_SP_GLOBAL"] = impl
    for causal in (True, False):
        fwd = jax.jit(lambda q, k, v, c=causal:
                      ctx._partial_attn(q, k, v, TPF, c))
        bench(fwd, f"{impl} fwd causal={causal}")

    bwds = ("dense",) if impl == "dense" else ("fused", "splash")
    for bwd_impl in bwds:
        os.environ["OWL_SP_BWD"] = bwd_impl
        bench(jax.jit(jax.grad(loss, argnums=(0, 1, 2))),
              f"{impl} fwd+bwd[{bwd_impl}]")
