"""Block-size sweep for the LOCAL-window splash layers (dit_v4: 24
heads, Dh=64, window=16 frames x tpf=64 = 1024-token band).

The 65k decomposition put these layers at 5% MFU with the default
512/512 blocks: each Q block sees only ~3 KV steps, so the kernel's
pipeline never fills. Larger blocks trade wasted band-edge compute for
pipeline depth. Fwd and bwd sweep independently.

Usage: python scripts/tpu_local_splash_sweep.py [n_tokens]
"""
import sys, pathlib, os, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_tpu_cache")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/jax_tpu_cache")
from jax.experimental.pallas.ops.tpu.splash_attention import (
    splash_attention_kernel as sk, splash_attention_mask as sm)
from owl_audio_exps_tpu.ops.splash import FrameMask

L = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
H, DH, TPF, WIN = 24, 64, 64, 16
rs = np.random.RandomState(0)
q = jnp.asarray(rs.randn(H, L, DH), jnp.bfloat16)
k = jnp.asarray(rs.randn(H, L, DH), jnp.bfloat16)
v = jnp.asarray(rs.randn(H, L, DH), jnp.bfloat16)

tf_fwd = 4.0 * (H * DH) * L * (WIN * TPF)


def bench(fn, *args, n=5):
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


mask = sm.MultiHeadMask([FrameMask((L, L), TPF, WIN, True)])

COMBOS = [
    (512, 512, False),
    (1024, 1024, False),
    (2048, 1024, False),
    (2048, 2048, False),
    (4096, 2048, False),
    (1024, 1024, True),
    (2048, 2048, True),
]

for bq, bkv, fused in COMBOS:
    if L % bq or L % bkv:
        continue
    kw = dict(block_q=bq, block_kv=bkv, block_kv_compute=bkv,
              block_q_dkv=bq, block_kv_dkv=bkv, block_kv_dkv_compute=bkv)
    if fused:
        bs = sk.BlockSizes(use_fused_bwd_kernel=True, **kw)
    else:
        bs = sk.BlockSizes(block_q_dq=bq, block_kv_dq=bkv, **kw)
    try:
        kern = sk.make_splash_mha_single_device(mask=mask, block_sizes=bs)
        fwd = jax.jit(lambda q, k, v, kern=kern: kern(q, k, v))
        bwd = jax.jit(jax.grad(
            lambda q, k, v, kern=kern: kern(q, k, v)
            .astype(jnp.float32).sum(), argnums=(0, 1, 2)))
        t_f = bench(fwd, q, k, v)
        t_b = bench(bwd, q, k, v)
    except Exception as e:
        print("bq=%-5d bkv=%-5d fused=%d  FAILED: %s"
              % (bq, bkv, fused, str(e)[:90]))
        continue
    t = t_f + t_b
    print("bq=%-5d bkv=%-5d fused=%d  fwd %6.2f ms  fwd+bwd %7.2f ms  "
          "%5.1f TF/s (%4.1f%% MFU)"
          % (bq, bkv, fused, t_f * 1e3, t * 1e3,
             3 * tf_fwd / t / 1e12, 100 * 3 * tf_fwd / t / 197e12))
