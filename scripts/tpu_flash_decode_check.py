"""TPU: flash_decode numerics + perf vs dense concat attention."""
import sys, pathlib, os, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_tpu_cache")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/jax_tpu_cache")
from owl_audio_exps_tpu.ops.flash_decode import flash_decode
from owl_audio_exps_tpu.ops.attention import dot_attention

B, H, Dh = 1, 24, 64
S, Lq = 1536 * 64 // 16, 72   # 6144 slots (96 frames x 64), 72-token q pad-free... use 65
Lq = 65
rs = np.random.RandomState(0)
q = jnp.asarray(rs.randn(B, H, Lq, Dh), jnp.bfloat16)
k_cache = jnp.asarray(rs.randn(B, H, S, Dh), jnp.bfloat16)
v_cache = jnp.asarray(rs.randn(B, H, S, Dh), jnp.bfloat16)
k_cur = jnp.asarray(rs.randn(B, H, Lq, Dh), jnp.bfloat16)
v_cur = jnp.asarray(rs.randn(B, H, Lq, Dh), jnp.bfloat16)
start, length = jnp.int32(800), jnp.int32(S - 64)

out = flash_decode(q, k_cache, v_cache, k_cur, v_cur, start, length, block_k=256)
rel = np.mod(np.arange(S) - 800, S); valid = rel < (S - 64)
mask = jnp.asarray(np.concatenate([valid, np.ones(Lq, bool)])[None])
def dense(q, kc, vc, k1, v1):
    k = jnp.concatenate([kc, k1], axis=2)
    v = jnp.concatenate([vc, v1], axis=2)
    return dot_attention(q, k, v, mask)
dense_j = jax.jit(dense)
want = dense_j(q, k_cache, v_cache, k_cur, v_cur)
diff = np.abs(np.asarray(out, dtype=np.float32) - np.asarray(want, dtype=np.float32)).max()
print(f"S={S} Lq={Lq}: max|diff|={diff:.5f}")
assert diff < 0.05

def timeit(f, *args, n=20):
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / n * 1e3

fd = jax.jit(lambda *a: flash_decode(*a, jnp.int32(800), jnp.int32(S-64), block_k=256))
t_flash = timeit(fd, q, k_cache, v_cache, k_cur, v_cur)
t_dense = timeit(dense_j, q, k_cache, v_cache, k_cur, v_cur)
print(f"flash_decode: {t_flash:.3f} ms | dense: {t_dense:.3f} ms | speedup {t_dense/t_flash:.2f}x")
