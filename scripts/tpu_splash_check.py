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

# tpf=65 (AV-interleaved, no 128-multiple divisor): pad + segment fence
tpf65, nf65 = 65, 32
L65 = tpf65 * nf65  # 2080 — pads to 2560
q65 = jnp.asarray(rs.randn(B, H, L65, Dh), jnp.bfloat16)
k65 = jnp.asarray(rs.randn(B, H, L65, Dh), jnp.bfloat16)
v65 = jnp.asarray(rs.randn(B, H, L65, Dh), jnp.bfloat16)
for win, cz in [(4, True), (None, True)]:
    out_s = jax.jit(lambda q,k,v: splash_attention(q,k,v,tpf65,win,cz))(q65,k65,v65)
    mask = dense_mask(L65, tpf65, win, None, 0, cz)
    out_d = jax.jit(lambda q,k,v: dot_attention(q,k,v,mask))(q65,k65,v65)
    diff = np.abs(np.asarray(out_s,dtype=np.float32)-np.asarray(out_d,dtype=np.float32)).max()
    print(f"tpf=65 win={win} causal={cz}: max|diff|={diff:.5f}")
    assert diff < 0.05, diff
print("SPLASH OK")
