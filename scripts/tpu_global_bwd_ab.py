"""On-chip A/B of the GLOBAL splash layers' backward: separate dq/dkv
kernels (default) vs the library's fused backward kernel
(OWL_SPLASH_FUSED_BWD=1 -> use_fused_bwd_kernel).

The 65k MFU decomposition (scripts/tpu_mfu_decompose.py) puts the 4
global layers' fwd+bwd at 60% of the training step with the backward
2.4x the forward; this probes the one library lever not yet swept.

Usage: OWL_SPLASH_FUSED_BWD=0|1 python scripts/tpu_global_bwd_ab.py [L]
"""
import sys, pathlib, os, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_tpu_cache")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/jax_tpu_cache")
from owl_audio_exps_tpu.ops.splash import splash_attention

L = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
H, DH, TPF = 24, 64, 64
rs = np.random.RandomState(0)
q = jnp.asarray(rs.randn(1, H, L, DH), jnp.bfloat16)
k = jnp.asarray(rs.randn(1, H, L, DH), jnp.bfloat16)
v = jnp.asarray(rs.randn(1, H, L, DH), jnp.bfloat16)

gfn = jax.jit(jax.grad(
    lambda q, k, v: splash_attention(q, k, v, TPF, None, True)
    .astype(jnp.float32).sum(), argnums=(0, 1, 2)))

out = jax.block_until_ready(gfn(q, k, v))
gsum = [float(jnp.asarray(g, jnp.float32).sum()) for g in out]
del out
ts = []
for j in range(4):
    # distinct inputs per timing: the axon relay memoizes repeated
    # (executable, args) executions across processes
    qj = q + jnp.bfloat16(0.001 * (j + 1))
    t0 = time.perf_counter()
    jax.block_until_ready(gfn(qj, k, v))
    ts.append(time.perf_counter() - t0)
t = float(np.median(ts))
# bwd performed FLOPs ~= 2x fwd performed (causal half of 4*HDh*L^2)
tf = 2 * (4.0 * H * DH * L * L / 2)
print("fused_bwd=%s  bwd %7.1f ms  %5.1f TF/s performed (%4.1f%% of 197)"
      % (os.environ.get("OWL_SPLASH_FUSED_BWD", "0"), t * 1e3,
         tf / t / 1e12, 100 * tf / t / 1e12 / 197.0))
print("grad checksums:", " ".join("%.3f" % g for g in gsum))
