"""Global (full-causal) splash layer at AV geometries — chained-scan
re-measure, plus the honest step decomposition.

The round-3 AV-384 component isolation (tpu_av_mfu_decompose.py) was
per-call through the relay: its "band x18 = 1.36 s" is inconsistent
with the round-5 chained-harness per-layer numbers (12.37 ms x 18 =
0.22 s). This script re-measures the GLOBAL causal layer the same
honest way (scripts/chain_harness.py) so the step decomposition adds
up, which determines where the next AV-384 second actually lives.

Usage: python scripts/tpu_av_global_ab.py [n_frames ...]
"""
import sys, pathlib, os
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_tpu_cache")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/jax_tpu_cache")

from chain_harness import make_stepper, bench, qkv_inputs
from owl_audio_exps_tpu.ops.splash import splash_attention

H, Dh, TPF = 24, 64, 65


def run(frames):
    L = frames * TPF
    qs, k, v = qkv_inputs(L, H, Dh)
    f = make_stepper(lambda q, k, v: splash_attention(
        q, k, v, TPF, None, True, None,
        head_chunks=int(os.environ.get("OWL_SPLASH_HEAD_CHUNKS", "4"))))
    t = bench(f, qs, k, v)
    print(f"av{frames} global causal splash: {t*1e3:8.2f} ms/layer "
          f"fwd+bwd (L={L})")


if __name__ == "__main__":
    for n in (sys.argv[1:] or ["384", "512"]):
        run(int(n))
