"""Diagnose flash-decode mismatch on TPU: isolate cache-blocks vs
current-fold, single head vs many, one block vs many."""
import sys, pathlib, os, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_tpu_cache")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/jax_tpu_cache")
from owl_audio_exps_tpu.ops.flash_decode import flash_decode
from owl_audio_exps_tpu.ops.attention import dot_attention

def dense_ref(q, kc, vc, k1, v1, start, length):
    S = kc.shape[2]; Lq = q.shape[2]
    rel = np.mod(np.arange(S) - int(start), S)
    mask = jnp.asarray(np.concatenate([rel < int(length), np.ones(Lq, bool)])[None])
    return dot_attention(q, jnp.concatenate([kc, k1], 2),
                         jnp.concatenate([vc, v1], 2), mask)

def check(name, B, H, S, Dh, Lq, start, length, bk):
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(B, H, Lq, Dh), jnp.bfloat16)
    kc = jnp.asarray(rs.randn(B, H, S, Dh), jnp.bfloat16)
    vc = jnp.asarray(rs.randn(B, H, S, Dh), jnp.bfloat16)
    k1 = jnp.asarray(rs.randn(B, H, Lq, Dh), jnp.bfloat16)
    v1 = jnp.asarray(rs.randn(B, H, Lq, Dh), jnp.bfloat16)
    out = flash_decode(q, kc, vc, k1, v1, jnp.int32(start), jnp.int32(length), block_k=bk)
    want = dense_ref(q, kc, vc, k1, v1, start, length)
    d = np.abs(np.asarray(out, np.float32) - np.asarray(want, np.float32)).max()
    print(f"{name}: diff={d:.5f}")

check("empty cache (fold only)", 1, 4, 512, 64, 8, 0, 0, 256)
check("one block", 1, 4, 256, 64, 8, 0, 256, 256)
check("two blocks", 1, 4, 512, 64, 8, 0, 512, 256)
check("many heads", 1, 24, 512, 64, 8, 0, 512, 256)
check("wrapped", 1, 4, 512, 64, 8, 300, 400, 256)
check("big", 1, 24, 6144, 64, 65, 100, 6080, 256)
