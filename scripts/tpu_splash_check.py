"""TPU check: splash path vs dense XLA attention on the frame mask."""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_tpu_cache")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/jax_tpu_cache")

from owl_audio_exps_tpu.ops.splash import splash_attention
from owl_audio_exps_tpu.ops.attention import dot_attention
from owl_audio_exps_tpu.ops.masks import dense_mask

B, H, L, Dh = 1, 4, 2048, 64
tpf, window, causal = 16, 4, True
rs = np.random.RandomState(0)
q = jnp.asarray(rs.randn(B, H, L, Dh), jnp.bfloat16)
k = jnp.asarray(rs.randn(B, H, L, Dh), jnp.bfloat16)
v = jnp.asarray(rs.randn(B, H, L, Dh), jnp.bfloat16)

for win, cz in [(window, True), (None, True)]:
    out_s = jax.jit(lambda q,k,v: splash_attention(q,k,v,tpf,win,cz))(q,k,v)
    mask = dense_mask(L, tpf, win, None, 0, cz)
    out_d = jax.jit(lambda q,k,v: dot_attention(q,k,v,mask))(q,k,v)
    diff = np.abs(np.asarray(out_s,dtype=np.float32)-np.asarray(out_d,dtype=np.float32)).max()
    print(f"win={win} causal={cz}: max|diff|={diff:.5f}")
    assert diff < 0.05, diff

# doc_id path
nf = L // tpf
doc = jnp.asarray((np.arange(nf) // 37)[None].astype(np.int32))
out_s = jax.jit(lambda q,k,v: splash_attention(q,k,v,tpf,None,True,doc))(q,k,v)
mask = dense_mask(L, tpf, None, doc, 0, True)
out_d = jax.jit(lambda q,k,v: dot_attention(q,k,v,mask))(q,k,v)
diff = np.abs(np.asarray(out_s,dtype=np.float32)-np.asarray(out_d,dtype=np.float32)).max()
print(f"doc_id: max|diff|={diff:.5f}")
assert diff < 0.05
print("SPLASH OK")
