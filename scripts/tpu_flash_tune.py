"""Flash-decode block-size tuning at large cache sizes."""
import sys, pathlib, os, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_tpu_cache")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/jax_tpu_cache")
from owl_audio_exps_tpu.ops.flash_decode import flash_decode
from owl_audio_exps_tpu.ops.attention import dot_attention

B, H, Dh, Lq = 1, 24, 64, 65
S = 32768
rs = np.random.RandomState(0)
q = jnp.asarray(rs.randn(B, H, Lq, Dh), jnp.bfloat16)
kc = jnp.asarray(rs.randn(B, H, S, Dh), jnp.bfloat16)
vc = jnp.asarray(rs.randn(B, H, S, Dh), jnp.bfloat16)
k1 = jnp.asarray(rs.randn(B, H, Lq, Dh), jnp.bfloat16)
v1 = jnp.asarray(rs.randn(B, H, Lq, Dh), jnp.bfloat16)
start, length = jnp.int32(100), jnp.int32(S - 64)

def timeit(f, n=20):
    jax.block_until_ready(f())
    t0 = time.perf_counter()
    for _ in range(n):
        o = f()
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / n * 1e3

for bk in (256, 512, 1024, 2048):
    try:
        f = jax.jit(lambda bk=bk: flash_decode(q, kc, vc, k1, v1, start, length, block_k=bk))
        print("flash bk=%d: %.3f ms" % (bk, timeit(f)))
    except Exception as e:
        print("flash bk=%d: FAIL %s" % (bk, str(e)[:100]))

rel = np.mod(np.arange(S) - 100, S); valid = rel < (S - 64)
mask = jnp.asarray(np.concatenate([valid, np.ones(Lq, bool)])[None])
def dense():
    k = jnp.concatenate([kc, k1], axis=2)
    v = jnp.concatenate([vc, v1], axis=2)
    return dot_attention(q, k, v, mask)
print("dense: %.3f ms" % timeit(jax.jit(dense)))
